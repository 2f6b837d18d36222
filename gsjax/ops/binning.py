"""Tile binning: (Gaussian, tile) pair expansion, depth sort, tile ranges.

TPU-native replacement for the CUDA duplicateWithKeys -> cub radix sort ->
identifyTileRanges pipeline (reference contract documented in SURVEY.md §2.2
N1; call sites gaussian_renderer/__init__.py:85-99).

Layout: pairs live in a dense (N, MT) grid — gaussian g's j-th touched tile
sits at slot ``g * MT + j`` (``MT = max_tiles_per_gauss``, power of two).
Tile ids decode by broadcasting each gaussian's rect over the j axis: pure
elementwise work, no per-pair gathers and no segment-fill scans (both of
which dominate wall time on TPU; measured ~110ms/frame at 1080p for the
compact-layout alternative). Gaussians touching more than MT tiles lose the
overflow (counted in ``num_dropped``); the reference has no such cap, but
trained scenes keep footprints a few tiles wide via the scale prune
(train.py:119-120), so MT=32 is generous.

The 64-bit CUDA radix key (tile << 32 | depth bits) becomes a single
*uint32* key: tile id in the high bits, the top bits of the positive-f32
depth pattern (monotone in depth) in the low bits. A stable single-key sort
orders pairs by (tile, depth, slot). Depth ties within ~2^-9 relative
precision fall back to slot order — invisible in renders; tests needing
bit-exact depth order use ``exact_depth_sort``. Only the leading
``max_pairs`` sorted pairs (all valid ones, when the budget holds) feed the
downstream pipeline, so compositing cost is budget-bound, not N*MT-bound.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsjax.ops.projection import Splats


class TileBins(NamedTuple):
    pair_gauss: jnp.ndarray  # (P,) int32 gaussian index per sorted pair
    pair_tile: jnp.ndarray  # (P,) int32 tile id per sorted pair (T = sentinel)
    pair_slot: jnp.ndarray  # (P,) int32 dense (g * MT + j) slot per pair
    tile_start: jnp.ndarray  # (T + 1,) int32 range starts into sorted pairs
    num_pairs: jnp.ndarray  # () int32 valid pairs after caps
    num_dropped: jnp.ndarray  # () int32 pairs lost to MT / budget caps
    num_mt_capped: jnp.ndarray  # () int32 subset of num_dropped lost to MT
    gauss_count: jnp.ndarray  # (N,) int32 expanded pairs per gaussian
    mt: int  # static: max tiles per gaussian (slot stride)


def build_tile_bins(
    splats: Splats,
    tiles_x: int,
    tiles_y: int,
    max_pairs: int,
    exact_depth_sort: bool = False,
    max_tiles_per_gauss: int = 32,
):
    """Expand per-Gaussian tile rectangles into sorted (tile, depth) pairs."""
    n = splats.depths.shape[0]
    mt = max_tiles_per_gauss
    if mt & (mt - 1):
        raise ValueError("max_tiles_per_gauss must be a power of two")
    num_tiles = tiles_x * tiles_y
    counts = jnp.minimum(splats.tiles_touched, mt)  # (N,)
    total_desired = jnp.sum(splats.tiles_touched)

    j = jnp.arange(mt, dtype=jnp.int32)[None, :]  # (1, MT)
    rect_w = jnp.maximum(
        splats.rect_max[:, 0] - splats.rect_min[:, 0], 1
    )[:, None]
    tx = splats.rect_min[:, 0:1] + j % rect_w  # (N, MT)
    ty = splats.rect_min[:, 1:2] + j // rect_w
    tile = ty * tiles_x + tx
    valid = j < counts[:, None]
    tile = jnp.where(valid, tile, num_tiles)  # sentinel sorts to the end

    slot = jnp.arange(n * mt, dtype=jnp.int32)

    # tile-id bits for the packed key; depth takes the rest of a uint32
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = 32 - tile_bits

    if exact_depth_sort:
        depth = jnp.where(
            valid, jnp.broadcast_to(splats.depths[:, None], (n, mt)), jnp.inf
        )
        tile_flat = tile.reshape(-1)
        tile_s, _, sorted_slot = jax.lax.sort(
            (tile_flat, depth.reshape(-1), slot), num_keys=2, is_stable=True
        )
    else:
        depth_i = jax.lax.bitcast_convert_type(
            jnp.maximum(splats.depths, 0.0).astype(jnp.float32), jnp.int32
        )
        depth_q = jax.lax.shift_right_logical(depth_i, 31 - depth_bits)
        key = (tile.astype(jnp.uint32) << jnp.uint32(depth_bits)) | jnp.where(
            valid, depth_q[:, None], (1 << depth_bits) - 1
        ).astype(jnp.uint32)
        key_s, sorted_slot = jax.lax.sort(
            (key.reshape(-1), slot), num_keys=1, is_stable=True
        )
        tile_s = (key_s >> jnp.uint32(depth_bits)).astype(jnp.int32)

    # only the leading budget feeds compositing; valid pairs sort first
    p = min(max_pairs, n * mt)
    tile_s = tile_s[:p]
    sorted_slot = sorted_slot[:p]
    sorted_g = sorted_slot // mt

    tile_start = jnp.searchsorted(
        tile_s, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    num_pairs = jnp.minimum(jnp.sum(counts), p)
    num_dropped = total_desired - num_pairs
    num_mt_capped = total_desired - jnp.sum(counts)

    return TileBins(
        pair_gauss=sorted_g,
        pair_tile=tile_s,
        pair_slot=sorted_slot,
        tile_start=tile_start,
        num_pairs=num_pairs,
        num_dropped=num_dropped,
        num_mt_capped=num_mt_capped,
        gauss_count=counts,
        mt=mt,
    )
