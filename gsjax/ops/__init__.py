"""The differentiable tile-based rasterizer.

Pipeline (TPU-native re-design of the reference CUDA rasterizer,
``diff-gaussian-rasterization`` — see SURVEY.md §2.2 N1):

1. :mod:`gsjax.ops.projection` — per-Gaussian preprocess: frustum cull, EWA
   projection of 3D covariances to 2D conics, pixel radii, touched-tile
   rectangles, SH->RGB. Fully vectorized jnp; XLA fuses it.
2. :mod:`gsjax.ops.binning` — static-budget (Gaussian, tile) pair expansion,
   lexicographic ``lax.sort`` on (tile, depth), per-tile ranges. Replaces the
   CUDA duplicateWithKeys + cub radix sort + identifyTileRanges stages.
3. :mod:`gsjax.ops.composite` — front-to-back alpha compositing over 16x16
   pixel tiles. The sequential transmittance recurrence is re-expressed as a
   log-space cumulative sum so blending becomes dense vector/matrix work
   (VPU + MXU) instead of a scalar loop.
4. :mod:`gsjax.ops.rasterize` — the public ``render()`` with the reference
   call contract, plus a naive all-pairs oracle renderer for testing.
"""

from gsjax.ops.rasterize import (
    RasterizeSettings,
    mark_visible,
    render,
    render_naive,
)

__all__ = ["RasterizeSettings", "mark_visible", "render", "render_naive"]
