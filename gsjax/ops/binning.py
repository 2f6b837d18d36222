"""Tile binning: (Gaussian, tile) pair expansion, depth sort, tile ranges.

TPU-native replacement for the CUDA duplicateWithKeys -> cub radix sort ->
identifyTileRanges pipeline (reference contract documented in SURVEY.md §2.2
N1; call sites gaussian_renderer/__init__.py:85-99).

Layout: pairs live in a dense grid (optionally *tiered*). On TPU,
compacting a variable number of pairs per gaussian is itself a sort, so the
grid must be dense — but a single (N, MT) grid pays MT slots for every
gaussian while the vast majority touch only a few tiles (measured at the
1080p/1M bench scene: 83% of visible gaussians touch <= 4 tiles). With
``tier_frac > 0``, a cheap partition sort of the N gaussians (key = tile
count ascending, payload = rect/depth columns) fills a *small* tier of
``tier_frac * N`` rows expanded at ``mt_small = max(2, mt/4)`` slots and a
*big* tier at ``mt`` slots, shrinking the key sort from N*mt to
~N*(tier_frac*mt_small + (1-tier_frac)*mt) entries (16.8M -> ~5.5M at the
bench scene). Slot ids stay in the uniform virtual (N, mt) grid
(slot = row_pos * mt + j), so the downstream gradient reduction is
unchanged except that per-gaussian sums come out in row order and
``gauss_inv_perm`` un-permutes them (one (N, 9) row gather, backward only —
DCE'd in forward graphs).

Capping: a gaussian whose tile count exceeds ``mt`` loses the overflow
(``num_mt_capped`` minus ``num_tier_capped``; trainer grows ``mt``). With
tiering, if more than ``(1 - tier_frac) * N`` gaussians touch more than
``mt_small`` tiles, the ascending-count order puts the *smallest* of them
in the small tier and their overflow is capped too (``num_tier_capped``;
trainer backs off ``tier_frac``). The reference has no such caps, but
trained scenes keep footprints a few tiles wide via the scale prune
(train.py:119-120). ``tier_frac=0`` (the default) disables tiering and
never tier-caps.

The 64-bit CUDA radix key (tile << 32 | depth bits) becomes a single
*uint32* key: tile id in the high bits, the top bits of the positive-f32
depth pattern (monotone in depth) in the low bits. A stable single-key sort
orders pairs by (tile, depth, slot). Depth ties within ~2^-9 relative
precision fall back to slot order — invisible in renders; tests needing
bit-exact depth order use ``exact_depth_sort`` (which skips tiering). Only
the leading ``max_pairs`` sorted pairs (all valid ones, when the budget
holds) feed the downstream pipeline, so compositing cost is budget-bound.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gsjax.ops.projection import Splats


class TileBins(NamedTuple):
    pair_gauss: jnp.ndarray  # (P,) int32 ORIGINAL gaussian index per pair
    pair_tile: jnp.ndarray  # (P,) int32 tile id per sorted pair (T = sentinel)
    pair_slot: jnp.ndarray  # (P,) int32 slot id per pair: virtual
    # (pos * mt + j) for grid layouts, row-major compact pair index
    # (rowstart[pos] + j — always < max_pairs, no capacity*mt bound) for
    # the compact expansion; see ``slot_layout``
    tile_start: jnp.ndarray  # (T + 1,) int32 range starts into sorted pairs
    num_pairs: jnp.ndarray  # () int32 valid pairs after caps
    num_dropped: jnp.ndarray  # () int32 pairs lost to mt / tier / budget caps
    num_mt_capped: jnp.ndarray  # () int32 subset of num_dropped lost to the
    # per-gaussian caps (mt overflow + tier overflow)
    num_tier_capped: jnp.ndarray  # () int32 subset of num_mt_capped lost
    # only because of the small-tier assignment (0 when untiered)
    gauss_count: jnp.ndarray  # (N,) int32 expanded pairs per gaussian, in
    # SLOT (row) order when tiered, original order otherwise
    gauss_inv_perm: Optional[jnp.ndarray]  # (N,) int32: original gaussian i's
    # row position in slot order (None when untiered)
    mt: int  # static: max tiles per gaussian (slot stride in grid layout)
    # NOTE: the slot LAYOUT ("grid" vs "rowmajor") is not carried here —
    # a str field would make TileBins un-returnable from jit. Derive it
    # with :func:`slot_layout_of`.


def _quantized_depth(depths, depth_bits: int):
    """Positive-f32 bit pattern truncated to ``depth_bits`` — monotone in
    depth, so integer order == depth order (ties within ~2^-9 relative)."""
    depth_i = jax.lax.bitcast_convert_type(
        jnp.maximum(depths, 0.0).astype(jnp.float32), jnp.int32
    )
    return jax.lax.shift_right_logical(depth_i, 31 - depth_bits)


def _expand_keys(rect_min_x, rect_min_y, rect_w, depth_q, counts, pos0, mt_tier,
                 mt, tiles_x, num_tiles, depth_bits):
    """Dense (rows, mt_tier) key grid for one tier. Returns flat
    (keys u32, slots i32)."""
    n = rect_min_x.shape[0]
    j = jnp.arange(mt_tier, dtype=jnp.int32)[None, :]
    w = jnp.maximum(rect_w, 1)[:, None]
    tx = rect_min_x[:, None] + j % w
    ty = rect_min_y[:, None] + j // w
    tile = ty * tiles_x + tx
    valid = j < counts[:, None]
    tile = jnp.where(valid, tile, num_tiles)  # sentinel sorts to the end
    key = (tile.astype(jnp.uint32) << jnp.uint32(depth_bits)) | jnp.where(
        valid, depth_q[:, None], (1 << depth_bits) - 1
    ).astype(jnp.uint32)
    pos = pos0 + jnp.arange(n, dtype=jnp.int32)
    slot = pos[:, None] * mt + j
    return key.reshape(-1), slot.reshape(-1)


def build_tile_bins(
    splats: Splats,
    tiles_x: int,
    tiles_y: int,
    max_pairs: int,
    exact_depth_sort: bool = False,
    max_tiles_per_gauss: int = 32,
    tier_frac: float = 0.0,
    expansion: str = "grid",
):
    """Expand per-Gaussian tile rectangles into sorted (tile, depth) pairs.

    ``expansion="compact"`` replaces the dense (N, mt) grid with a
    budget-sized expansion: after the same ascending-count partition sort,
    the rows needing a j-th tile slot form a SUFFIX of the row order for
    every j (counts are non-decreasing), so pair p of the compact
    [0, max_pairs) range maps to (row, j) with two searchsorteds and one
    (P, 5)-column row gather — the key sort is max_pairs entries
    regardless of footprint variance, where the grid pays
    ~N * mt_mix slots (measured pathological case: one near-full-frame
    gaussian forced mt=8192 at capacity 16k -> 46M grid slots for 0.76M
    real pairs). The grid stays the default where N * mt_mix is within a
    small factor of max_pairs (it avoids the per-pair gather; see
    docs/PERF.md round 3). ``tier_frac`` is ignored in compact mode
    (the expansion is exact up to the mt cap; nothing is tier-capped)."""
    n = splats.depths.shape[0]
    mt = max_tiles_per_gauss
    if mt & (mt - 1):
        raise ValueError("max_tiles_per_gauss must be a power of two")
    num_tiles = tiles_x * tiles_y
    total_desired = jnp.sum(splats.tiles_touched)

    # tile-id bits for the packed key; depth takes the rest of a uint32
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    depth_bits = 32 - tile_bits

    if expansion not in ("grid", "compact"):
        raise ValueError(f"unknown expansion {expansion!r}")
    compact = expansion == "compact" and not exact_depth_sort
    # compact slots are row-major compact pair indices (< max_pairs), so
    # unlike the r3-r4 row*mt+j encoding there is NO capacity*mt < 2^31
    # constraint — the case that used to 500 the viewer on trained models
    # whose one frame-spanning gaussian forces mt ~2048 at >=1M capacity

    mt_small = max(2, mt // 4)
    ca = min(int(n * tier_frac) // 8 * 8, n)  # small-tier row budget
    tiered = (not exact_depth_sort and not compact and mt_small < mt
              and 0 < ca < n)

    if exact_depth_sort:
        counts = jnp.minimum(splats.tiles_touched, mt)
        j = jnp.arange(mt, dtype=jnp.int32)[None, :]
        rect_w = jnp.maximum(
            splats.rect_max[:, 0] - splats.rect_min[:, 0], 1
        )[:, None]
        tx = splats.rect_min[:, 0:1] + j % rect_w
        ty = splats.rect_min[:, 1:2] + j // rect_w
        tile = ty * tiles_x + tx
        valid = j < counts[:, None]
        tile = jnp.where(valid, tile, num_tiles)
        depth = jnp.where(
            valid, jnp.broadcast_to(splats.depths[:, None], (n, mt)), jnp.inf
        )
        slot = jnp.arange(n * mt, dtype=jnp.int32)
        tile_s, _, sorted_slot = jax.lax.sort(
            (tile.reshape(-1), depth.reshape(-1), slot),
            num_keys=2, is_stable=True,
        )
        sorted_g = sorted_slot // mt
        inv_perm = None
        gauss_count = counts
        total_slots = n * mt
    elif compact:
        # --- budget-sized expansion: sort size == max_pairs, independent
        # of footprint variance. Ascending-count partition sort (as in the
        # tiered path) makes the rows needing a j-th slot a SUFFIX of the
        # row order for every j, so the compact pair range maps to
        # (row, j) with two searchsorteds — no dense grid. ---
        raw_counts = jnp.minimum(splats.tiles_touched, mt)
        depth_q = _quantized_depth(splats.depths, depth_bits)
        idx = jnp.arange(n, dtype=jnp.int32)
        rect_w = splats.rect_max[:, 0] - splats.rect_min[:, 0]
        if n * (mt + 1) < 2**31:
            pkey = raw_counts * jnp.int32(n) + idx
            pkey_s, rx, ry, rw, dq, cnt = jax.lax.sort(
                (pkey, splats.rect_min[:, 0], splats.rect_min[:, 1],
                 rect_w, depth_q, raw_counts),
                num_keys=1, is_stable=False,  # keys are unique
            )
            orig_idx = pkey_s - cnt * jnp.int32(n)
        else:
            _, orig_idx, rx, ry, rw, dq, cnt = jax.lax.sort(
                (raw_counts, idx, splats.rect_min[:, 0],
                 splats.rect_min[:, 1], rect_w, depth_q, raw_counts),
                num_keys=2, is_stable=False,
            )

        # suffix starts: rows with count > j begin at s[j] (counts are
        # non-decreasing); off[j] = first compact pair index of slot j
        js = jnp.arange(mt + 1, dtype=jnp.int32)
        s_j = jnp.searchsorted(cnt, js, side="right").astype(jnp.int32)
        suffix_len = jnp.int32(n) - s_j
        off = jnp.concatenate([
            jnp.zeros(1, jnp.int32), jnp.cumsum(suffix_len[:mt])
        ]).astype(jnp.int32)
        total = off[mt]  # == sum(cnt)

        p_cap = min(max_pairs, n * mt)
        p_idx = jnp.arange(p_cap, dtype=jnp.int32)
        # pair -> (slot j, row): NO per-pair searchsorted / scalar gathers —
        # TPU lowers those to ~element-at-a-time loads (measured 239ms
        # binning at 2.1M pairs vs 70ms for the 11.5M-slot tiered grid).
        # Instead scatter j/row deltas at the mt segment boundaries and
        # cumsum: j_of[p] = #{j >= 1 : off[j] <= p}; row = base[j_of] + p
        # with base[j] = s_j[j] - off[j] telescoped the same way (duplicate
        # boundaries of empty slots fold correctly under scatter-add).
        j_of = jnp.cumsum(
            jnp.zeros(p_cap, jnp.int32)
            .at[off[1:]]
            .add(1, mode="drop", indices_are_sorted=True)
        )
        base = s_j[:mt] - off[:mt]
        bdelta = jnp.concatenate([base[:1], base[1:] - base[:-1]])
        row_base = jnp.cumsum(
            jnp.zeros(p_cap, jnp.int32)
            .at[off[:mt]]
            .add(bdelta, mode="drop", indices_are_sorted=True)
        )
        valid = p_idx < total
        row = jnp.where(valid, row_base + p_idx, 0)

        # one (P, 6) int32 row gather of the sorted per-row attrs (all
        # integer-valued; an f32 table would corrupt depth bits > 2^24)
        rowstart = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt).astype(jnp.int32)[:-1]]
        )  # exclusive row-major pair offsets
        tbl = jnp.stack(
            [rx, ry, jnp.maximum(rw, 1), dq, orig_idx, rowstart], axis=1
        )
        g = tbl[row]
        tx = g[:, 0] + j_of % g[:, 2]
        ty = g[:, 1] + j_of // g[:, 2]
        tile = jnp.where(valid, ty * tiles_x + tx, num_tiles)
        key = (tile.astype(jnp.uint32) << jnp.uint32(depth_bits)) | (
            jnp.where(valid, g[:, 3], (1 << depth_bits) - 1).astype(
                jnp.uint32
            )
        )
        # row-major compact slot: always < sum(cnt) <= max_pairs, so no
        # capacity * mt overflow; the backward's per-gaussian segments in
        # slot order are exactly [cumsum(cnt)[i], cumsum(cnt)[i+1])
        slot = g[:, 5] + j_of
        gauss = g[:, 4]

        key_s, sorted_slot, sorted_g = jax.lax.sort(
            (key, slot, gauss), num_keys=2, is_stable=False
        )
        tile_s = (key_s >> jnp.uint32(depth_bits)).astype(jnp.int32)
        _, inv_perm = jax.lax.sort(
            (orig_idx, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
            is_stable=False,
        )
        gauss_count = cnt  # slot (row) order
        total_slots = p_cap
        tier_capped = jnp.int32(0)
    elif not tiered:
        counts = jnp.minimum(splats.tiles_touched, mt)
        depth_q = _quantized_depth(splats.depths, depth_bits)
        key, slot = _expand_keys(
            splats.rect_min[:, 0], splats.rect_min[:, 1],
            splats.rect_max[:, 0] - splats.rect_min[:, 0],
            depth_q, counts, jnp.int32(0), mt, mt, tiles_x, num_tiles,
            depth_bits,
        )
        key_s, sorted_slot = jax.lax.sort(
            (key, slot), num_keys=1, is_stable=True
        )
        tile_s = (key_s >> jnp.uint32(depth_bits)).astype(jnp.int32)
        sorted_g = sorted_slot // mt
        inv_perm = None
        gauss_count = counts
        total_slots = n * mt
    else:
        # --- tier partition: ascending tile count (index-tiebroken), so the
        # big tier holds exactly the n-ca largest footprints — the optimal
        # static assignment; tier-capping happens only when >n-ca gaussians
        # genuinely exceed mt_small ---
        raw_counts = jnp.minimum(splats.tiles_touched, mt)
        depth_q = _quantized_depth(splats.depths, depth_bits)
        idx = jnp.arange(n, dtype=jnp.int32)
        rect_w = splats.rect_max[:, 0] - splats.rect_min[:, 0]
        if n * (mt + 1) < 2**31:
            # packed unique key: count * n + index (monotone in (count, idx))
            pkey = raw_counts * jnp.int32(n) + idx
            pkey_s, rx, ry, rw, dq, cnt = jax.lax.sort(
                (pkey, splats.rect_min[:, 0], splats.rect_min[:, 1],
                 rect_w, depth_q, raw_counts),
                num_keys=1, is_stable=False,  # keys are unique
            )
            orig_idx = pkey_s - cnt * jnp.int32(n)
        else:
            _, orig_idx, rx, ry, rw, dq, cnt = jax.lax.sort(
                (raw_counts, idx, splats.rect_min[:, 0],
                 splats.rect_min[:, 1], rect_w, depth_q, raw_counts),
                num_keys=2, is_stable=False,
            )

        # tier caps: rows [0, ca) get mt_small slots, rows [ca, n) get mt.
        cap = jnp.where(jnp.arange(n) < ca, mt_small, mt)
        counts = jnp.minimum(cnt, cap)

        key_a, slot_a = _expand_keys(
            rx[:ca], ry[:ca], rw[:ca], dq[:ca], counts[:ca],
            jnp.int32(0), mt_small, mt, tiles_x, num_tiles, depth_bits,
        )
        key_b, slot_b = _expand_keys(
            rx[ca:], ry[ca:], rw[ca:], dq[ca:], counts[ca:],
            jnp.int32(ca), mt, mt, tiles_x, num_tiles, depth_bits,
        )
        gauss_a = jnp.repeat(orig_idx[:ca], mt_small)
        gauss_b = jnp.repeat(orig_idx[ca:], mt)
        key = jnp.concatenate([key_a, key_b])
        slot = jnp.concatenate([slot_a, slot_b])
        gauss = jnp.concatenate([gauss_a, gauss_b])

        key_s, sorted_slot, sorted_g = jax.lax.sort(
            (key, slot, gauss), num_keys=2, is_stable=False
        )
        tile_s = (key_s >> jnp.uint32(depth_bits)).astype(jnp.int32)
        # original gaussian i sits at slot position inv_perm[i]; used to
        # un-permute per-gaussian gradient sums (backward only — DCE'd in
        # forward graphs)
        _, inv_perm = jax.lax.sort(
            (orig_idx, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
            is_stable=False,
        )
        gauss_count = counts  # slot (row) order
        total_slots = ca * mt_small + (n - ca) * mt
        tier_capped = jnp.sum(cnt) - jnp.sum(counts)

    # only the leading budget feeds compositing; valid pairs sort first
    p = min(max_pairs, total_slots)
    tile_s = tile_s[:p]
    sorted_slot = sorted_slot[:p]
    sorted_g = sorted_g[:p]

    tile_start = jnp.searchsorted(
        tile_s, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    num_pairs = jnp.minimum(jnp.sum(gauss_count), p)
    num_dropped = total_desired - num_pairs
    num_mt_capped = total_desired - jnp.sum(gauss_count)
    if not tiered:
        tier_capped = jnp.int32(0)

    return TileBins(
        pair_gauss=sorted_g,
        pair_tile=tile_s,
        pair_slot=sorted_slot,
        tile_start=tile_start,
        num_pairs=num_pairs,
        num_dropped=num_dropped,
        num_mt_capped=num_mt_capped,
        num_tier_capped=tier_capped,
        gauss_count=gauss_count,
        gauss_inv_perm=inv_perm,
        mt=mt,
    )


def slot_layout_of(expansion: str, exact_depth_sort: bool = False) -> str:
    """Slot-id layout produced by :func:`build_tile_bins` for a config:
    "rowmajor" (compact expansion: slot = cumsum(counts)[row] + j, always
    < max_pairs) or "grid" (slot = row * mt + j). The backward reduction
    needs this to map slots back to gaussian rows."""
    if expansion == "compact" and not exact_depth_sort:
        return "rowmajor"
    return "grid"
