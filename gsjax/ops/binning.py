"""Tile binning: (Gaussian, tile) pair expansion, depth sort, tile ranges.

TPU-native replacement for the CUDA duplicateWithKeys -> cub radix sort ->
identifyTileRanges pipeline (SURVEY.md §2.2 N1). Dynamic allocation is
replaced by a static ``max_pairs`` budget: pairs beyond the budget are
dropped (counted, so callers can log/grow), everything else is fixed-shape
and jit-stable.

The expansion uses an O(P) scatter + cumulative-max "segment fill" instead of
a per-pair binary search, and the 64-bit radix sort becomes a stable
lexicographic ``jax.lax.sort`` on (tile_id, depth) key pairs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsjax.ops.projection import Splats


class TileBins(NamedTuple):
    pair_gauss: jnp.ndarray  # (P,) int32 gaussian index per sorted pair
    pair_tile: jnp.ndarray  # (P,) int32 tile id per sorted pair (T = sentinel)
    tile_start: jnp.ndarray  # (T + 1,) int32 range starts into sorted pairs
    num_pairs: jnp.ndarray  # () int32 valid pairs after budget clamp
    num_dropped: jnp.ndarray  # () int32 pairs lost to the budget


def build_tile_bins(splats: Splats, tiles_x: int, tiles_y: int, max_pairs: int):
    """Expand per-Gaussian tile rectangles into sorted (tile, depth) pairs."""
    n = splats.depths.shape[0]
    num_tiles = tiles_x * tiles_y
    counts = splats.tiles_touched  # (N,) int32, 0 for culled

    cum = jnp.cumsum(counts)
    offsets = cum - counts  # exclusive prefix sum
    total = cum[-1] if n > 0 else jnp.int32(0)
    num_pairs = jnp.minimum(total, max_pairs)
    num_dropped = total - num_pairs

    # Segment fill: scatter (gauss_index + 1) at each gaussian's first pair
    # slot, then forward-fill with a cumulative max. Gaussians with zero
    # tiles share an offset with their successor; scatter-max keeps the
    # successor. Out-of-budget offsets are dropped by scatter mode="drop".
    gauss_ids = jnp.arange(n, dtype=jnp.int32)
    starts = jnp.where(counts > 0, offsets, max_pairs)  # drop empty
    seg = (
        jnp.zeros(max_pairs, dtype=jnp.int32)
        .at[starts]
        .max(gauss_ids + 1, mode="drop")
    )
    pair_gauss = jax.lax.cummax(seg) - 1  # (P,), -1 before first segment
    slot = jnp.arange(max_pairs, dtype=jnp.int32)
    pair_valid = (slot < num_pairs) & (pair_gauss >= 0)
    g = jnp.clip(pair_gauss, 0, max(n - 1, 0))

    # decode local rect position (row-major: y outer, x inner)
    local = slot - offsets[g]
    rect_w = jnp.maximum(splats.rect_max[g, 0] - splats.rect_min[g, 0], 1)
    tx = splats.rect_min[g, 0] + local % rect_w
    ty = splats.rect_min[g, 1] + local // rect_w
    tile = ty * tiles_x + tx
    tile = jnp.where(pair_valid, tile, num_tiles)  # sentinel sorts to end

    depth = jnp.where(pair_valid, splats.depths[g], jnp.inf)
    tile_s, _, sorted_g = jax.lax.sort(
        (tile, depth, g), num_keys=2, is_stable=True
    )

    tile_start = jnp.searchsorted(
        tile_s, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return TileBins(
        pair_gauss=sorted_g,
        pair_tile=tile_s,
        tile_start=tile_start,
        num_pairs=num_pairs,
        num_dropped=num_dropped,
    )
