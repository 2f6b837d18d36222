"""Multi-host (multi-process) bootstrap and host-local <-> global helpers.

The reference is strictly single-process (its CUDA rasterizer binds one
device; multi-GPU training is out of scope upstream). gsjax targets TPU
pods, where one Python process per host drives a slice of the chips and
``jax.distributed.initialize`` stitches the processes into one logical
device set (SURVEY.md §2.3/§5.8, BASELINE.json config 5).

Bootstrap resolution order (first hit wins):

1. explicit arguments (``--dist_coordinator`` etc. from the CLI),
2. ``GSJAX_COORDINATOR`` / ``GSJAX_NUM_PROCESSES`` / ``GSJAX_PROCESS_ID``
   environment variables (how the multi-process CPU test launches),
3. TPU-pod auto-detection: ``jax.distributed.initialize()`` with no
   arguments works on Cloud TPU where the metadata server provides the
   topology — requested with ``--multihost``/``GSJAX_MULTIHOST=1``.

On a pod, every process must execute the same jitted computations in the
same order; per-host work (data loading, logging, checkpoint writes) is
gated on :func:`is_main_process` or sharded by process index.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def maybe_initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    multihost: bool = False,
) -> bool:
    """Initialize ``jax.distributed`` if a multi-process run is requested.

    Returns True when running multi-process (after initialization),
    False for plain single-process runs. Must be called before any other
    JAX API touches the backend.
    """
    # JAX_PLATFORMS can be frozen by a sitecustomize that pre-imports the
    # TPU plugin; the config update wins (used by the multi-process CPU
    # tests to pin children to the host platform)
    platform = os.environ.get("GSJAX_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    coordinator = coordinator or os.environ.get("GSJAX_COORDINATOR")
    if num_processes is None and "GSJAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["GSJAX_NUM_PROCESSES"])
    if process_id is None and "GSJAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["GSJAX_PROCESS_ID"])
    multihost = multihost or os.environ.get("GSJAX_MULTIHOST", "") == "1"

    if coordinator is not None:
        if num_processes is None or process_id is None:
            raise ValueError(
                "multi-process runs need num_processes and process_id "
                "alongside the coordinator address"
            )
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    if multihost:
        jax.distributed.initialize()  # TPU-pod auto-detection
        return True
    return False


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def host_local_to_global(mesh, spec, local_data):
    """Assemble a global jax.Array from this process's shard of the data.

    ``local_data`` is a host numpy/JAX pytree holding the rows this process
    owns under ``spec`` (e.g. its scenes on a scene-axis mesh). In
    single-process runs this is just ``jax.device_put`` with the sharding.
    """
    sharding = jax.sharding.NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: jax.device_put(x, sharding), local_data
        )
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        local_data,
    )


def global_to_host_local(garr):
    """Gather a (small) global array fully onto every host — for metrics
    and logging only. Uses a fully-replicated resharding so each process
    can read the value without owning all shards."""
    out_sharding = jax.sharding.NamedSharding(
        garr.sharding.mesh, jax.sharding.PartitionSpec()
    )
    with garr.sharding.mesh:
        rep = jax.jit(lambda x: x, out_shardings=out_sharding)(garr)
    return np.asarray(rep.addressable_data(0))
