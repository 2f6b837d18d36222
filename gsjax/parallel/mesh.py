"""Device-mesh construction helpers.

Axes: ``data`` = camera batch (gradients pmean-reduced), ``gauss`` = the
Gaussian/model axis (parameters sharded, tile strips distributed). On a
multi-host pod, call ``jax.distributed.initialize()`` before building the
mesh; layout puts ``gauss`` innermost so its all_gather/psum_scatter ride
ICI within a host/slice while ``data`` crosses hosts (DCN-friendly).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    gauss: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if gauss is None:
        gauss = len(devices) // data
    if data * gauss < len(devices) and devices is not None:
        # an explicit smaller mesh uses a prefix of the available devices
        devices = devices[: data * gauss]
    if data * gauss != len(devices):
        raise ValueError(
            f"mesh {data}x{gauss} does not match {len(devices)} devices"
        )
    grid = np.asarray(devices).reshape(data, gauss)
    return Mesh(grid, ("data", "gauss"))
