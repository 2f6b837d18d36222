"""Per-Gaussian preprocess: culling, EWA splatting, SH->RGB.

Reproduces the semantics of the reference CUDA ``preprocess`` kernel
(diff-gaussian-rasterization forward.cu [upstream]; contract documented in
SURVEY.md §2.2 N1): near-plane cull at view z <= 0.2, EWA projection
J W Sigma W^T J^T with the +0.3 px low-pass on the 2D covariance diagonal,
3-sigma pixel radius from the larger eigenvalue, 16x16 touched-tile
rectangles, and SH evaluation clamped at 0 after the +0.5 DC offset.

Everything is batched jnp over the Gaussian axis — no loops, differentiable
end-to-end, so ``jax.vjp`` through this stage yields the scale / rotation /
SH / mean gradients the CUDA backward computes by hand.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gsjax.data.cameras import RenderCamera
from gsjax.utils.math import (
    build_covariance,
    covariance6,
    safe_normalize,
    strip_symmetric,
    unstrip_symmetric,
)
from gsjax.utils.sh import eval_sh

TILE = 16
NEAR_CULL_Z = 0.2  # reference CUDA in_frustum near threshold
LOW_PASS = 0.3  # EWA low-pass added to cov2d diagonal
MIN_LAMBDA = 0.1  # eigenvalue clamp inside radius computation


class Splats(NamedTuple):
    """Per-Gaussian screen-space quantities (all shape (N, ...))."""

    means2d: jnp.ndarray  # (N, 2) pixel coords
    depths: jnp.ndarray  # (N,) view-space z
    conics: jnp.ndarray  # (N, 3) inverse 2D covariance [a, b, c]
    colors: jnp.ndarray  # (N, 3) RGB
    opacities: jnp.ndarray  # (N,)
    radii: jnp.ndarray  # (N,) int32 pixel radius, 0 => culled
    rect_min: jnp.ndarray  # (N, 2) int32 tile coords (x, y), inclusive
    rect_max: jnp.ndarray  # (N, 2) int32 tile coords, exclusive
    tiles_touched: jnp.ndarray  # (N,) int32


def num_tiles(width: int, height: int):
    return -(-width // TILE), -(-height // TILE)


def quantize_f16(x):
    """Round to the nearest float16 value (denormals flushed to zero),
    returned in float32.

    The rasterizer quantizes per-Gaussian colors and opacities to f16 so
    the Pallas pair table packs two values per f32 word — an 8-column
    table gathers at 209 Mrows/s vs 164 for 16 columns (measured,
    evidence/perf/r4_ab.jsonl) and the composite kernels stream half the
    DMA bytes. Relative error is <= 2^-12 (~2.4e-4), two orders below
    8-bit output quantization (the reference CUDA rasterizer computes f32
    but also emits 8-bit frames). Applied in :func:`preprocess` so every
    backend (pallas / XLA scan / naive oracle) sees identical values and
    cross-backend checks stay at reassociation-level tolerances. Values
    under the f16 normal range (6.1e-5) flush to zero: such opacities sit
    far below the 1/255 alpha cutoff and such color contributions are
    <= 0.016 of an 8-bit LSB."""
    q = x.astype(jnp.float16).astype(jnp.float32)
    return jnp.where(jnp.abs(q) < 2.0 ** -14, 0.0, q)


def project_points(means3d, camera: RenderCamera):
    """World points -> (view z, pixel xy). Differentiable."""
    ones = jnp.ones_like(means3d[:, :1])
    hom = jnp.concatenate([means3d, ones], axis=1)  # (N, 4)
    p_view = hom @ camera.world_view.T  # (N, 4)
    p_hom = hom @ camera.full_proj.T  # (N, 4)
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :2] * p_w[:, None]
    # ndc2Pix(v, S) = ((v + 1) * S - 1) / 2
    px = ((ndc[:, 0] + 1.0) * camera.width - 1.0) * 0.5
    py = ((ndc[:, 1] + 1.0) * camera.height - 1.0) * 0.5
    return p_view[:, 2], jnp.stack([px, py], axis=1)


def ewa_project(means3d, cov3d_flat, camera: RenderCamera):
    """EWA: 3D covariance -> 2D screen covariance (upper-left 2x2 of
    J W Sigma W^T J^T) with the +0.3 low-pass. Returns (N, 3) [xx, xy, yy].

    Written in scalar channels (no (N, 3, 3) batched matmuls, which lower
    poorly on TPU): M = J @ W has rows m0 = fx/tz * W0 - fx tx/tz^2 * W2
    and m1 = fy/tz * W1 - fy ty/tz^2 * W2, and cov2d = M Sigma M^T expands
    over the six symmetric Sigma entries."""
    W = camera.world_view[:3, :3]
    ones = jnp.ones_like(means3d[:, :1])
    t = (jnp.concatenate([means3d, ones], axis=1) @ camera.world_view.T)[:, :3]
    # keep 1/z finite for culled/inactive points so their (discarded) VJP
    # paths cannot produce inf * 0 = NaN cotangents
    tz = t[:, 2]
    tz = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    lim_x = 1.3 * camera.tan_fov_x
    lim_y = 1.3 * camera.tan_fov_y
    tx = jnp.clip(t[:, 0] / tz, -lim_x, lim_x) * tz
    ty = jnp.clip(t[:, 1] / tz, -lim_y, lim_y) * tz
    inv_z = 1.0 / tz
    a = camera.focal_x * inv_z  # (N,)
    b = camera.focal_y * inv_z
    c = -camera.focal_x * tx * inv_z * inv_z
    d = -camera.focal_y * ty * inv_z * inv_z

    # m0 = a * W[0] + c * W[2], m1 = b * W[1] + d * W[2]  (per-gaussian rows)
    m0 = [a * W[0, k] + c * W[2, k] for k in range(3)]
    m1 = [b * W[1, k] + d * W[2, k] for k in range(3)]

    sxx, sxy, sxz = cov3d_flat[:, 0], cov3d_flat[:, 1], cov3d_flat[:, 2]
    syy, syz, szz = cov3d_flat[:, 3], cov3d_flat[:, 4], cov3d_flat[:, 5]

    def sig_dot(v):  # Sigma @ v, v a list of 3 (N,) arrays
        return (
            sxx * v[0] + sxy * v[1] + sxz * v[2],
            sxy * v[0] + syy * v[1] + syz * v[2],
            sxz * v[0] + syz * v[1] + szz * v[2],
        )

    s0 = sig_dot(m0)
    s1 = sig_dot(m1)
    cov00 = m0[0] * s0[0] + m0[1] * s0[1] + m0[2] * s0[2]
    cov01 = m0[0] * s1[0] + m0[1] * s1[1] + m0[2] * s1[2]
    cov11 = m1[0] * s1[0] + m1[1] * s1[1] + m1[2] * s1[2]
    return jnp.stack([cov00 + LOW_PASS, cov01, cov11 + LOW_PASS], axis=1)


def preprocess(
    means3d,
    scales,
    quats,
    opacities,
    shs,
    camera: RenderCamera,
    sh_degree,
    *,
    scale_modifier=1.0,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    active_mask: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
    opacity_aware_radius: bool = True,
) -> Splats:
    """Full preprocess. All inputs post-activation (exp scales, normalized
    quats, sigmoid opacities) — same contract as the CUDA rasterizer binding
    (reference: gaussian_renderer/__init__.py:85-93).

    ``means2d_offset`` is an optional zero (N, 2) array added to the pixel
    means; taking the gradient w.r.t. it yields per-Gaussian screen-position
    gradients for densification — the functional replacement for the
    reference's ``screenspace_points.retain_grad()`` trick
    (gaussian_renderer/__init__.py:26-30).
    """
    depths, means2d = project_points(means3d, camera)
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    # f16 attribute quantization (see quantize_f16) happens before the
    # opacity-aware radius below so the binning rectangle bounds the alpha
    # the compositing kernels actually evaluate.
    opacities = quantize_f16(opacities.reshape(-1))

    if cov3d_precomp is None:
        cov3d_flat = covariance6(scales, quats, scale_modifier)
    else:
        cov3d_flat = cov3d_precomp
    cov2d = ewa_project(means3d, cov3d_flat, camera)

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    det_ok = det > 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    conics = (
        jnp.stack([cov2d[:, 2], -cov2d[:, 1], cov2d[:, 0]], axis=1)
        / safe_det[:, None]
    )

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    lambda1 = mid + jnp.sqrt(jnp.maximum(MIN_LAMBDA, mid * mid - det))
    radii_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    valid = (depths > NEAR_CULL_Z) & det_ok
    if active_mask is not None:
        valid = valid & active_mask

    tiles_x, tiles_y = num_tiles(camera.width, camera.height)

    def rects_of(r):
        rmin = jnp.stack(
            [
                jnp.clip(jnp.floor((means2d[:, 0] - r) / TILE), 0, tiles_x),
                jnp.clip(jnp.floor((means2d[:, 1] - r) / TILE), 0, tiles_y),
            ],
            axis=1,
        ).astype(jnp.int32)
        rmax = jnp.stack(
            [
                jnp.clip(jnp.floor((means2d[:, 0] + r + TILE - 1) / TILE), 0, tiles_x),
                jnp.clip(jnp.floor((means2d[:, 1] + r + TILE - 1) / TILE), 0, tiles_y),
            ],
            axis=1,
        ).astype(jnp.int32)
        touched = (rmax[:, 0] - rmin[:, 0]) * (rmax[:, 1] - rmin[:, 1])
        return rmin, rmax, touched

    # Reported radii / visibility keep the reference's plain 3-sigma rect
    # semantics (visibility_filter, max_radii2D screen-size pruning).
    _, _, tiles3 = rects_of(radii_f)
    valid = valid & (tiles3 > 0)
    radii = jnp.where(valid, radii_f, 0.0).astype(jnp.int32)

    # Binning uses an opacity-aware radius: the compositing kernels zero
    # every pair with alpha < ALPHA_MIN (= 1/255, same as the reference
    # CUDA render kernel), and alpha(d) <= op * exp(-|d|^2 / (2 lambda1)),
    # so pixels beyond r_op = sqrt(2 ln(op/ALPHA_MIN) * lambda1) can never
    # contribute to the image or to any gradient. Shrinking the touched-
    # tile rectangle to min(3 sigma, r_op) is therefore bit-exact while
    # cutting pair count (biggest on trained scenes, where opacities skew
    # low after densification). Structural only: no gradient flows through
    # the rectangle, so the whole radius is stop_gradient'ed.
    if opacity_aware_radius:
        chi = 2.0 * jnp.log(255.0 * jnp.maximum(opacities.reshape(-1), 1e-12))
        # +1: the rect's max edge only covers pixels to mean + r - 1, so a
        # radius of exactly ceil(r_op) can clip a 1-px ring that still
        # clears the alpha threshold
        r_bin = jnp.minimum(
            radii_f, jnp.ceil(jnp.sqrt(jnp.maximum(chi, 0.0) * lambda1)) + 1.0
        )
        r_bin = jax.lax.stop_gradient(r_bin)
        rect_min, rect_max, tiles_bin = rects_of(r_bin)
        tiles_touched = jnp.where(valid & (chi > 0.0), tiles_bin, 0)
    else:
        rect_min, rect_max, tiles_bin = rects_of(radii_f)
        tiles_touched = jnp.where(valid, tiles_bin, 0)

    if colors_precomp is None:
        dirs = safe_normalize(means3d - camera.camera_center[None, :])
        colors = jnp.maximum(eval_sh(shs, dirs, sh_degree) + 0.5, 0.0)
    else:
        colors = colors_precomp
    colors = quantize_f16(colors)

    return Splats(
        means2d=means2d,
        depths=depths,
        conics=conics,
        colors=colors,
        opacities=opacities.reshape(-1),
        radii=radii,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=tiles_touched,
    )
