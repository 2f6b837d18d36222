"""Quaternion / covariance math for anisotropic 3D Gaussians.

Semantics match the reference implementation's conventions
(reference: utils/general_utils.py:64-110):

* quaternions are stored ``(w, x, y, z)`` and normalized before use;
* the Gaussian covariance is ``Sigma = (R S)(R S)^T`` with ``S = diag(scale)``;
* symmetric 3x3 matrices are "stripped" to their 6 upper-triangular elements
  in the order ``[xx, xy, xz, yy, yz, zz]``.

All functions are pure jnp, shape-polymorphic over a leading batch dimension
where noted, and safe to ``vmap`` / ``jit`` / differentiate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_sigmoid(x):
    """Logit: inverse of the sigmoid opacity activation."""
    return jnp.log(x / (1.0 - x))


def safe_normalize(x, axis=-1, eps=1e-12):
    """L2-normalize with a VJP that stays finite at x = 0.

    ``x / max(|x|, eps)`` back-propagates NaN at exactly zero (the max picks
    the eps branch, but 0 * d|x|/dx = 0 * (x/|x|) = 0 * NaN); padding slots
    in the fixed-capacity buffers hold zeros, so this form matters.
    """
    n2 = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(n2 + eps * eps)


def quat_to_rotmat(q):
    """Unit-normalize quaternion(s) ``(..., 4)`` in (w,x,y,z) order -> (..., 3, 3).

    Matches reference build_rotation (utils/general_utils.py:78-99).
    """
    q = safe_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    r1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    r2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([r0, r1, r2], axis=-2)


def build_scaling_rotation(scale, quat):
    """L = R @ diag(scale); scale ``(..., 3)``, quat ``(..., 4)`` -> ``(..., 3, 3)``.

    Matches reference build_scaling_rotation (utils/general_utils.py:101-110).
    """
    R = quat_to_rotmat(quat)
    return R * scale[..., None, :]


def build_covariance(scale, quat, scale_modifier=1.0):
    """Full 3D covariance Sigma = L L^T, ``(..., 3, 3)``.

    Matches GaussianModel.build_covariance_from_scaling_rotation
    (reference: scene/gaussian_model.py:27-31).
    """
    L = build_scaling_rotation(scale * scale_modifier, quat)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(sym):
    """Symmetric ``(..., 3, 3)`` -> 6-vector [xx, xy, xz, yy, yz, zz].

    Matches reference strip_lowerdiag (utils/general_utils.py:64-73).
    """
    return jnp.stack(
        [
            sym[..., 0, 0],
            sym[..., 0, 1],
            sym[..., 0, 2],
            sym[..., 1, 1],
            sym[..., 1, 2],
            sym[..., 2, 2],
        ],
        axis=-1,
    )


def unstrip_symmetric(v):
    """Inverse of :func:`strip_symmetric`: 6-vector -> symmetric ``(..., 3, 3)``."""
    xx, xy, xz, yy, yz, zz = (v[..., i] for i in range(6))
    r0 = jnp.stack([xx, xy, xz], axis=-1)
    r1 = jnp.stack([xy, yy, yz], axis=-1)
    r2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def covariance6(scale, quat, scale_modifier=1.0):
    """3D covariance directly as the 6-vector [xx, xy, xz, yy, yz, zz].

    Same math as ``strip_symmetric(build_covariance(...))`` but written in
    scalar channels: XLA lowers batched (N, 3, 3) matmul chains poorly on
    TPU (measured ~6x slower than the fused elementwise form at N = 1M).
    """
    q = safe_normalize(quat)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s = scale * scale_modifier
    u0, u1, u2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    xx = r00 * r00 * u0 + r01 * r01 * u1 + r02 * r02 * u2
    xy = r00 * r10 * u0 + r01 * r11 * u1 + r02 * r12 * u2
    xz = r00 * r20 * u0 + r01 * r21 * u1 + r02 * r22 * u2
    yy = r10 * r10 * u0 + r11 * r11 * u1 + r12 * r12 * u2
    yz = r10 * r20 * u0 + r11 * r21 * u1 + r12 * r22 * u2
    zz = r20 * r20 * u0 + r21 * r21 * u1 + r22 * r22 * u2
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)
