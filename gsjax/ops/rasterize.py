"""Public rasterizer API + naive all-pairs oracle.

:func:`render` is the functional equivalent of the reference's
``GaussianRasterizer`` call (reference: gaussian_renderer/__init__.py:18-100):
it takes post-activation Gaussian attributes plus a camera and returns the
rendered image, per-Gaussian radii (0 = culled) and auxiliary outputs. It is
an ordinary differentiable JAX function — ``jax.grad`` through it produces
gradients for every input, including the optional ``means2d_offset`` zero
tensor whose cotangent carries the per-Gaussian screen-space gradients used
for densification.

:func:`render_naive` is the O(N x pixels) oracle with identical semantics
(including the tile-rectangle membership test and early-termination), used
as the ground truth in tests — the role the reference's
``--convert_SHs_python`` / ``--compute_cov3D_python`` dual paths play
(SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from gsjax.data.cameras import RenderCamera
from gsjax.ops.binning import build_tile_bins, slot_layout_of
from gsjax.ops.composite import (
    ALPHA_MAX,
    ALPHA_MIN,
    T_EPS,
    assemble_image,
    composite_tiles,
)
from gsjax.ops.projection import TILE, num_tiles, preprocess


@dataclasses.dataclass(frozen=True)
class RasterizeSettings:
    """Static shape budgets for the jitted pipeline.

    ``max_pairs`` bounds the (Gaussian, tile) duplication buffer — the CUDA
    version allocates this dynamically per frame; on TPU it is a compile-time
    budget with overflow counting. ``max_splats_per_tile`` bounds per-tile
    list length (front-most survive; the reference's T < 1e-4 early exit
    makes deep splats contribute nothing anyway).
    """

    max_pairs: int = 1 << 20
    max_splats_per_tile: int = 1024
    chunk: int = 32
    backend: str = "auto"  # "auto" | "xla" (scan) | "pallas" (TPU kernel); all differentiable
    pallas_chunk: int = 128  # pairs staged per DMA in the pallas kernel
    exact_depth_sort: bool = False  # full-f32 depth keys (slower 2-key sort)
    max_tiles_per_gauss: int = 16  # dense pair-grid stride (power of two)
    # fraction of gaussians expanded at mt/4 slots instead of mt (tiered
    # binning: shrinks the pair key sort ~3x; overflow is counted in
    # num_tier_capped and the trainer backs tier_frac off). 0 = off.
    tier_frac: float = 0.0
    grad_dtype: str = "float32"  # "bfloat16" halves backward-reduction traffic
    # backward reduction strategy: "sort" carries the 9 grad columns as
    # sort payload (no row gather; the kernel emits slot keys in-band) —
    # two <=6-operand sorts at float32, ONE 6-operand sort at bfloat16
    # (grad columns bit-packed pairwise into u32 words); "gather" permutes
    # grad rows with one random row gather (~43M rows/s on TPU). See
    # docs/PERF.md.
    grad_reduce: str = "sort"
    # sharded splat exchange (gsjax/parallel/shard.py): "all_gather"
    # replicates every chip's splats (O(N) per-chip memory); "a2a" routes
    # each splat only to the chips owning the tile strips it overlaps
    # (O(N/G) per-chip, overflow counted in num_exchange_dropped).
    splat_exchange: str = "all_gather"
    # per-(source, dest) row budget for "a2a"; 0 = auto (4x the uniform
    # share, rounded up to 128)
    a2a_rows: int = 0
    # bin tiles with the opacity-aware radius min(3 sigma, r_op), where
    # r_op bounds the alpha >= 1/255 support — bit-exact pair-count
    # reduction (gsjax/ops/projection.py). False = plain 3-sigma rects.
    opacity_aware_radius: bool = True
    # pair-expansion strategy: "grid" = dense (N, mt) slot grid (cheapest
    # when footprints are uniform: no per-pair gather); "compact" =
    # budget-sized suffix expansion whose key sort is max_pairs entries
    # regardless of footprint variance (essential when one wide gaussian
    # forces a huge per-gaussian tile cap — see gsjax/ops/binning.py).
    # tier_frac only applies to "grid".
    expansion: str = "grid"

    def __post_init__(self):
        if self.max_splats_per_tile % self.chunk:
            raise ValueError("max_splats_per_tile must be a multiple of chunk")
        if self.backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.grad_reduce not in ("gather", "sort"):
            raise ValueError(f"unknown grad_reduce {self.grad_reduce!r}")
        if self.splat_exchange not in ("all_gather", "a2a"):
            raise ValueError(f"unknown splat_exchange {self.splat_exchange!r}")
        if self.expansion not in ("grid", "compact"):
            raise ValueError(f"unknown expansion {self.expansion!r}")


def render(
    camera: RenderCamera,
    means3d,
    scales,
    quats,
    opacities,
    shs,
    sh_degree,
    bg,
    settings: RasterizeSettings = RasterizeSettings(),
    *,
    scale_modifier=1.0,
    colors_precomp=None,
    cov3d_precomp=None,
    active_mask=None,
    means2d_offset=None,
):
    """Differentiable tile-based render. Returns a dict:

    ``render`` (H, W, 3), ``radii`` (N,) int32, ``visibility_filter`` (N,)
    bool, ``final_T`` (H, W), ``num_dropped`` () — pairs lost to the
    max_pairs budget (0 in a well-sized run).
    """
    tiles_x, tiles_y = num_tiles(camera.width, camera.height)
    splats = preprocess(
        means3d,
        scales,
        quats,
        opacities,
        shs,
        camera,
        sh_degree,
        scale_modifier=scale_modifier,
        cov3d_precomp=cov3d_precomp,
        colors_precomp=colors_precomp,
        active_mask=active_mask,
        means2d_offset=means2d_offset,
        opacity_aware_radius=settings.opacity_aware_radius,
    )
    bins = build_tile_bins(
        splats, tiles_x, tiles_y, settings.max_pairs,
        exact_depth_sort=settings.exact_depth_sort,
        max_tiles_per_gauss=settings.max_tiles_per_gauss,
        tier_frac=settings.tier_frac,
        expansion=settings.expansion,
    )
    backend = settings.backend
    if backend == "auto":
        import jax

        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    num_tile_capped = jnp.int32(0)  # pallas walks every pair: never caps
    if backend == "pallas":
        from gsjax.ops.pallas_composite import composite_pallas

        tile_colors, tile_T = composite_pallas(
            splats.means2d, splats.conics, splats.colors, splats.opacities,
            bins.pair_gauss, bins.pair_slot, bins.tile_start, bins.gauss_count,
            bins.mt, tiles_x, tiles_y, settings.pallas_chunk,
            grad_dtype=settings.grad_dtype,
            grad_reduce=settings.grad_reduce,
            gauss_inv_perm=bins.gauss_inv_perm,
            slot_layout=slot_layout_of(
                settings.expansion, settings.exact_depth_sort
            ),
        )
    else:
        tile_colors, tile_T, num_tile_capped = composite_tiles(
            bins.pair_gauss,
            bins.tile_start,
            splats.means2d,
            splats.conics,
            splats.colors,
            splats.opacities,
            tiles_x,
            tiles_y,
            settings.max_splats_per_tile,
            settings.chunk,
        )
    image, final_T = assemble_image(
        tile_colors, tile_T, jnp.asarray(bg, jnp.float32), tiles_x, tiles_y,
        camera.width, camera.height,
    )
    return {
        "render": image,
        "radii": splats.radii,
        "visibility_filter": splats.radii > 0,
        "final_T": final_T,
        "num_dropped": bins.num_dropped,
        "num_mt_capped": bins.num_mt_capped,
        "num_tier_capped": bins.num_tier_capped,
        "num_tile_capped": num_tile_capped,
    }


def render_naive(
    camera: RenderCamera,
    means3d,
    scales,
    quats,
    opacities,
    shs,
    sh_degree,
    bg,
    *,
    scale_modifier=1.0,
    colors_precomp=None,
    cov3d_precomp=None,
    active_mask=None,
    means2d_offset=None,
):
    """All-pairs oracle: every Gaussian against every pixel, depth-sorted.

    Matches the tile renderer exactly (same culling, same tile-membership
    rule, same early-exit freeze) but with no budgets — O(N * H * W) memory;
    test-scale only.
    """
    splats = preprocess(
        means3d,
        scales,
        quats,
        opacities,
        shs,
        camera,
        sh_degree,
        scale_modifier=scale_modifier,
        cov3d_precomp=cov3d_precomp,
        colors_precomp=colors_precomp,
        active_mask=active_mask,
        means2d_offset=means2d_offset,
    )
    h, w = camera.height, camera.width
    order = jnp.argsort(splats.depths, stable=True)

    mean = splats.means2d[order]  # (N, 2)
    con = splats.conics[order]
    col = splats.colors[order]
    op = splats.opacities[order]
    rect_min = splats.rect_min[order]
    rect_max = splats.rect_max[order]
    visible = splats.radii[order] > 0

    ys, xs = jnp.mgrid[0:h, 0:w]
    pix = jnp.stack([xs, ys], axis=-1).reshape(-1, 2).astype(jnp.float32)  # (P, 2)
    ptile = (pix // TILE).astype(jnp.int32)  # (P, 2)

    d = pix[:, None, :] - mean[None, :, :]  # (P, N, 2)
    dx, dy = d[..., 0], d[..., 1]
    power = (
        -0.5 * (con[None, :, 0] * dx * dx + con[None, :, 2] * dy * dy)
        - con[None, :, 1] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_MAX, op[None, :] * jnp.exp(power))
    in_rect = (
        (ptile[:, None, 0] >= rect_min[None, :, 0])
        & (ptile[:, None, 0] < rect_max[None, :, 0])
        & (ptile[:, None, 1] >= rect_min[None, :, 1])
        & (ptile[:, None, 1] < rect_max[None, :, 1])
    )
    ok = visible[None, :] & in_rect & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(ok, alpha, 0.0)

    cum = jnp.cumsum(jnp.log1p(-alpha), axis=-1)
    T_after = jnp.exp(cum)
    trip = ok & (T_after < T_EPS)
    done = jnp.cumsum(trip.astype(jnp.int32), axis=-1) > 0
    alpha_eff = jnp.where(done, 0.0, alpha)
    l1m_eff = jnp.log1p(-alpha_eff)
    cum_eff = jnp.cumsum(l1m_eff, axis=-1)
    T_before = jnp.exp(cum_eff - l1m_eff)
    weights = T_before * alpha_eff  # (P, N)
    color = weights @ col  # (P, 3)
    final_T = jnp.exp(cum_eff[:, -1])
    image = color + final_T[:, None] * jnp.asarray(bg, jnp.float32)[None, :]
    return {
        "render": image.reshape(h, w, 3),
        "radii": splats.radii,
        "visibility_filter": splats.radii > 0,
        "final_T": final_T.reshape(h, w),
        "num_dropped": jnp.int32(0),
        "num_mt_capped": jnp.int32(0),
        "num_tier_capped": jnp.int32(0),
        "num_tile_capped": jnp.int32(0),
    }


def mark_visible(means3d, camera: RenderCamera, near: float = 0.2):
    """Frustum visibility of 3D points — the rasterizer's ``markVisible``
    API (diff-gaussian-rasterization exposes it for external culling;
    SURVEY.md §2.2 N1). Returns (N,) bool."""
    from gsjax.ops.projection import project_points

    depth, _ = project_points(jnp.asarray(means3d, jnp.float32), camera)
    return depth > near
