"""Real spherical harmonics, degrees 0..3 (+ band-4 constants for parity).

Same hardcoded real SH basis as the reference (utils/sh_utils.py:26-118) and
the standard 3DGS convention: colors are stored as SH coefficients with the
DC term offset so that ``rgb = clamp(eval_sh(...) + 0.5, 0)``.

Unlike the reference's ``eval_sh(deg, ...)`` with Python branching on degree,
:func:`eval_sh` here takes the active degree as a (possibly traced) integer
and masks coefficient bands — one compiled XLA program serves the whole
SH-degree ramp of training (reference: train.py:72-73).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)

# band index (0..3) of each of the 16 coefficients, for degree masking.
# numpy on purpose: a module-level jnp.array would initialize the JAX
# backend at import time (before callers can pin jax_platforms)
_BAND = np.array([0] + [1] * 3 + [2] * 5 + [3] * 7, dtype=np.int32)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(dirs):
    """Evaluate the 16 real SH basis functions at unit directions ``(..., 3)``.

    Returns ``(..., 16)``. Sign/ordering conventions match the reference's
    eval_sh (utils/sh_utils.py:57-112).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            C0 * one,
            -C1 * y,
            C1 * z,
            -C1 * x,
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ],
        axis=-1,
    )


def eval_sh(sh, dirs, degree):
    """Evaluate SH color. ``sh``: ``(..., 16, 3)``, ``dirs``: ``(..., 3)``.

    ``degree`` may be a Python int or a traced int32 scalar — bands above it
    are masked out, so the active-degree ramp does not force recompilation.
    Returns raw SH color ``(..., 3)`` (callers add the +0.5 DC offset,
    reference: gaussian_renderer/__init__.py:78).
    """
    basis = sh_basis(dirs)  # (..., 16)
    mask = (jnp.asarray(_BAND) <= degree).astype(sh.dtype)  # (16,)
    return jnp.einsum("...k,...kc->...c", basis * mask, sh)


def rgb_to_sh(rgb):
    """DC coefficient from linear RGB (reference: utils/sh_utils.py RGB2SH)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh):
    """Linear RGB from DC coefficient (reference: utils/sh_utils.py SH2RGB)."""
    return sh * C0 + 0.5
