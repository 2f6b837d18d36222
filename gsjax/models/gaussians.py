"""Fixed-capacity Gaussian scene state.

The reference grows/shrinks its parameter tensors (and performs Adam
state-dict surgery) on every densification step
(reference: scene/gaussian_model.py:258-327). XLA cannot re-JIT per step, so
gsjax stores all attributes in *fixed-capacity* structure-of-arrays buffers
(capacity C, boolean ``active`` mask). Densification becomes masked writes
into free slots at constant shape (gsjax.models.densify); capacity grows by
re-bucketing (a host-side copy into a 2x buffer, one recompile) only when
full.

Parameter layout (pre-activation, identical semantics to
reference scene/gaussian_model.py:47-52):
  xyz (C,3) | features_dc (C,1,3) | features_rest (C,15,3) |
  scaling (C,3) log | rotation (C,4) quat wxyz | opacity (C,1) logit

Activations (reference :33-41): exp / L2-normalize / sigmoid.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.data.ply import read_ply, write_ply
from gsjax.utils.math import inverse_sigmoid
from gsjax.utils.sh import num_sh_coeffs, rgb_to_sh
from gsjax.utils.system import to_device_chunked

Params = Dict[str, jax.Array]

INIT_OPACITY = 0.1  # reference: scene/gaussian_model.py:139


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianState:
    """All per-Gaussian training state. A pytree; capacity is static."""

    params: Params
    active: jax.Array  # (C,) bool
    max_radii2d: jax.Array  # (C,) float32 — max observed screen radius
    xyz_grad_accum: jax.Array  # (C,) float32 — sum ||grad means2d (ndc)||
    denom: jax.Array  # (C,) float32 — observation counts
    active_sh_degree: jax.Array  # () int32 (traced: SH ramp without recompile)
    max_sh_degree: int = dataclasses.field(metadata=dict(static=True), default=3)
    spatial_lr_scale: float = dataclasses.field(
        metadata=dict(static=True), default=1.0
    )

    @property
    def capacity(self) -> int:
        return self.params["xyz"].shape[0]

    @property
    def num_active(self) -> jax.Array:
        return jnp.sum(self.active.astype(jnp.int32))


def activated_params(p: Params):
    """Post-activation attributes from a raw parameter dict:
    (means3d, scales, quats, opacities, shs). Activations per
    reference scene/gaussian_model.py:33-41."""
    from gsjax.utils.math import safe_normalize

    scales = jnp.exp(p["scaling"])
    quats = safe_normalize(p["rotation"])
    opacities = jax.nn.sigmoid(p["opacity"][:, 0])
    shs = jnp.concatenate([p["features_dc"], p["features_rest"]], axis=1)
    return p["xyz"], scales, quats, opacities, shs


def activated(state: GaussianState):
    """Post-activation attributes: (means3d, scales, quats, opacities, shs)."""
    return activated_params(state.params)


def _pad(a, capacity):
    # pad on DEVICE (the array is usually already there) and transfer
    # chunked otherwise: a growth at 2M gaussians pads a ~360MB f_rest,
    # which as one host transfer 413s the remote-compile endpoint
    if not isinstance(a, jax.Array):
        a = to_device_chunked(np.asarray(a))
    pad = [(0, capacity - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad)


def knn_mean_sq_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean squared distance of each point to its k nearest neighbors.

    Host-side replacement for the reference's ``simple_knn._C.distCUDA2``
    CUDA kernel (reference: scene/gaussian_model.py:134) — exact kNN via
    the native C++ KD-tree in gsjax/native/simple_knn.cpp (the upstream
    uses an approximate Morton-window search). Runs once at init; falls
    back to scipy when the native build is unavailable.
    """
    pts = np.asarray(points, dtype=np.float32)
    try:
        from gsjax.native import knn_mean_sq_dist as native_knn

        return native_knn(pts, k)
    except Exception:
        from scipy.spatial import cKDTree

        d, _ = cKDTree(pts).query(pts, k=k + 1, workers=-1)  # includes self
        return (d[:, 1:] ** 2).mean(axis=1).astype(np.float32)


def create_empty(capacity: int, max_sh_degree: int = 3, spatial_lr_scale=1.0):
    rest = num_sh_coeffs(max_sh_degree) - 1
    params = {
        "xyz": jnp.zeros((capacity, 3)),
        "features_dc": jnp.zeros((capacity, 1, 3)),
        "features_rest": jnp.zeros((capacity, rest, 3)),
        "scaling": jnp.zeros((capacity, 3)),
        "rotation": jnp.zeros((capacity, 4)).at[:, 0].set(1.0),
        "opacity": jnp.zeros((capacity, 1)),
    }
    return GaussianState(
        params=params,
        active=jnp.zeros(capacity, bool),
        max_radii2d=jnp.zeros(capacity),
        xyz_grad_accum=jnp.zeros(capacity),
        denom=jnp.zeros(capacity),
        active_sh_degree=jnp.int32(0),
        max_sh_degree=max_sh_degree,
        spatial_lr_scale=float(spatial_lr_scale),
    )


def round_capacity(n: int, multiple: int = 4096) -> int:
    return max(multiple, int(math.ceil(n / multiple)) * multiple)


def create_from_pcd(
    points,
    colors,
    spatial_lr_scale: float,
    max_sh_degree: int = 3,
    capacity: int | None = None,
) -> GaussianState:
    """Initialize one Gaussian per SfM point.

    Same init as reference scene/gaussian_model.py:124-147: SH DC from RGB,
    isotropic log-scale from sqrt(mean 3-NN squared distance) clamped at
    1e-7, identity rotations, opacity 0.1.
    """
    points = np.asarray(points, np.float32)
    colors = np.asarray(colors, np.float32)
    n = points.shape[0]
    capacity = capacity or round_capacity(int(n * 1.5))
    if capacity < n:
        raise ValueError(f"capacity {capacity} < number of points {n}")

    dist2 = np.maximum(knn_mean_sq_dist(points), 1e-7)
    log_scales = np.repeat(np.log(np.sqrt(dist2))[:, None], 3, axis=1)

    state = create_empty(capacity, max_sh_degree, spatial_lr_scale)
    p = dict(state.params)
    p["xyz"] = p["xyz"].at[:n].set(points)
    p["features_dc"] = p["features_dc"].at[:n, 0].set(np.asarray(rgb_to_sh(colors)))
    p["scaling"] = p["scaling"].at[:n].set(log_scales)
    p["opacity"] = p["opacity"].at[:n].set(
        float(inverse_sigmoid(jnp.float32(INIT_OPACITY)))
    )
    return dataclasses.replace(
        state, params=p, active=state.active.at[:n].set(True)
    )


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side re-bucket into a larger buffer (triggers one recompile)."""
    if new_capacity < state.capacity:
        raise ValueError("can only grow")
    c = new_capacity
    return dataclasses.replace(
        state,
        params={k: _pad(v, c) for k, v in state.params.items()},
        active=_pad(state.active, c),
        max_radii2d=_pad(state.max_radii2d, c),
        xyz_grad_accum=_pad(state.xyz_grad_accum, c),
        denom=_pad(state.denom, c),
    )


# --------------------------------------------------------------------------
# PLY interchange — byte-compatible with the 3DGS ecosystem format
# (reference: scene/gaussian_model.py:177-256). Attribute order:
# x y z nx ny nz f_dc_0..2 f_rest_0..44 opacity scale_0..2 rot_0..3,
# f_dc/f_rest flattened channel-major (torch .transpose(1,2).flatten(1)).
# --------------------------------------------------------------------------


def save_gaussian_ply(state: GaussianState, path):
    keep = np.asarray(state.active)
    p = {k: np.asarray(v, np.float32)[keep] for k, v in state.params.items()}
    n = p["xyz"].shape[0]
    f_dc = p["features_dc"].transpose(0, 2, 1).reshape(n, -1)  # (n, 3)
    f_rest = p["features_rest"].transpose(0, 2, 1).reshape(n, -1)  # (n, 45)
    props = {}
    for i, name in enumerate("xyz"):
        props[name] = p["xyz"][:, i]
    for name in ("nx", "ny", "nz"):
        props[name] = np.zeros(n, np.float32)
    for i in range(f_dc.shape[1]):
        props[f"f_dc_{i}"] = f_dc[:, i]
    for i in range(f_rest.shape[1]):
        props[f"f_rest_{i}"] = f_rest[:, i]
    props["opacity"] = p["opacity"][:, 0]
    for i in range(p["scaling"].shape[1]):
        props[f"scale_{i}"] = p["scaling"][:, i]
    for i in range(p["rotation"].shape[1]):
        props[f"rot_{i}"] = p["rotation"][:, i]
    write_ply(path, props)


def load_gaussian_ply(
    path, max_sh_degree: int = 3, capacity: int | None = None, spatial_lr_scale=1.0
) -> GaussianState:
    v = read_ply(path)["vertex"]
    n = len(v["x"])
    rest = num_sh_coeffs(max_sh_degree) - 1
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1)
    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], axis=1)[:, None, :]
    f_rest = (
        np.stack([v[f"f_rest_{i}"] for i in range(3 * rest)], axis=1)
        .reshape(n, 3, rest)
        .transpose(0, 2, 1)
    )
    scaling = np.stack([v[f"scale_{i}"] for i in range(3)], axis=1)
    rotation = np.stack([v[f"rot_{i}"] for i in range(4)], axis=1)
    opacity = v["opacity"][:, None]

    capacity = capacity or round_capacity(int(n * 1.5))
    state = create_empty(capacity, max_sh_degree, spatial_lr_scale)
    p = dict(state.params)
    for key, arr in [
        ("xyz", xyz),
        ("features_dc", f_dc),
        ("features_rest", f_rest),
        ("scaling", scaling),
        ("rotation", rotation),
        ("opacity", opacity),
    ]:
        # chunked device transfer: a 2M-gaussian f_rest is ~360MB, which
        # as a single eager-op operand 413s the remote-compile endpoint
        p[key] = p[key].at[:n].set(to_device_chunked(arr.astype(np.float32)))
    return dataclasses.replace(
        state,
        params=p,
        active=state.active.at[:n].set(True),
        # loaded models render at full SH degree (reference :256)
        active_sh_degree=jnp.int32(max_sh_degree),
    )
