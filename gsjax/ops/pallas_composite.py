"""Pallas TPU kernel for front-to-back tile compositing.

Replaces the XLA scan in :mod:`gsjax.ops.composite` on the hot path. The
CUDA analogue is the ``render`` kernel of diff-gaussian-rasterization
(SURVEY.md §2.2 N1): one thread-block per 16x16 tile walking its sorted
splat list front-to-back with early termination at T < 1e-4.

TPU mapping:

- grid = one program per image tile; the per-tile ranges into the sorted
  pair table arrive as a scalar-prefetch operand, so each program sizes its
  own work loop — tiles only pay for the splats they own, unlike the dense
  XLA path that scans ``max_splats_per_tile`` rounds for every tile.
- the pair table lives in HBM transposed as (16, P): attribute rows on
  sublanes, pairs on lanes. Each program DMAs lane-aligned ``chunk``
  (= 128) windows covering [floor(start/chunk)*chunk, end) of its compact
  sorted range — no padded re-layout of the pair table is needed; pairs
  outside [start, end) are masked in-register. Chunks are double-buffered:
  the DMA for chunk i+1 overlaps the compute of chunk i.
- a chunk is composited as dense (256 pixels x 128 pairs) blocks: pixel
  coordinates broadcast down lanes, per-splat attributes broadcast down
  sublanes. The sequential ``T *= (1 - alpha)`` recurrence re-associates
  into an inclusive cumulative product along the lane (depth) axis,
  computed with log2(128) = 7 roll-multiply steps.
- early-termination parity with the reference: a splat whose blend would
  drop T below 1e-4 is skipped along with everything behind it; the kernel
  replays that decision exactly and records ``n_contrib`` (index of the
  last contributing pair per pixel) for the backward kernel. Whole chunks
  stop early once every pixel in the tile is done.

Pair attribute row order (see :func:`pack_pair_attrs`):
  [0] mean_x [1] mean_y [2] conic_a [3] conic_b [4] conic_c
  [5] opacity [6] r [7] g [8] b [9..11] padding
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsjax.ops.composite import ALPHA_MAX, ALPHA_MIN, T_EPS
from gsjax.ops.projection import TILE

ATTR_W = 16  # attribute rows per pair (12 used; padded to the sublane tile)
PIX = TILE * TILE  # 256
CHUNK = 128  # pairs per DMA chunk; also the tile-range alignment


def _interpret_default():
    return jax.default_backend() != "tpu"


def pack_pair_attrs(pair_gauss, means2d, conics, colors, opacities,
                    chunk: int = CHUNK):
    """Gather per-gaussian attributes into the sorted, transposed
    (16, P + chunk) table the kernel streams. The tail padding keeps the
    last tile's aligned DMA window in bounds; tile ranges never cover it."""
    per_gauss = jnp.concatenate(
        [
            means2d,
            conics,
            opacities[:, None],
            colors,
            jnp.zeros((means2d.shape[0], 7), jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)  # (N, 16)
    pair = per_gauss[pair_gauss]  # (P, 16) one row gather
    pair = jnp.concatenate([pair, jnp.zeros((chunk, 16), jnp.float32)], axis=0)
    return pair.T  # (16, P + chunk)


def _lane_cumprod(x, width):
    """Inclusive cumulative product along axis 1 (width lanes, power of 2)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < width:
        shifted = pltpu.roll(x, s, 1)
        x = x * jnp.where(lanes >= s, shifted, 1.0)
        s *= 2
    return x


def _lane_cumor(x, width):
    """Inclusive cumulative OR (as int32 max) along axis 1."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < width:
        shifted = pltpu.roll(x, s, 1)
        x = jnp.maximum(x, jnp.where(lanes >= s, shifted, 0))
        s *= 2
    return x


def _composite_kernel(
    # scalar prefetch
    tile_start_ref,
    # inputs
    pair_attrs_hbm,  # (16, P + chunk) HBM
    # outputs
    out_ref,  # (1, PIX, 8): r, g, b, T, n_contrib (f32), pad x3
    # scratch
    buf,  # (2, ATTR_W, CHUNK) f32 VMEM
    sems,  # (2,) DMA semaphores
    *,
    chunk,
    tiles_x,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]
    win = (start // chunk) * chunk  # lane-aligned DMA window origin

    tx = t % tiles_x
    ty = t // tiles_x
    # pixel p = py * TILE + px, pixels on sublanes
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tx * TILE + p_idx % TILE).astype(jnp.float32)  # (PIX, 1)
    py = (ty * TILE + p_idx // TILE).astype(jnp.float32)

    num_chunks = pl.cdiv(end - win, chunk)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def dma(slot, ci):
        off = pl.multiple_of(win + ci * chunk, chunk)
        return pltpu.make_async_copy(
            pair_attrs_hbm.at[:, pl.ds(off, chunk)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        dma(0, 0).start()

    def chunk_body(state):
        ci, all_done, T_col, done, acc_r, acc_g, acc_b, ncon = state

        @pl.when(ci + 1 < num_chunks)
        def _():
            dma((ci + 1) % 2, ci + 1).start()

        dma(ci % 2, ci).wait()
        slot = ci % 2
        mean_x = buf[slot, 0:1, :]  # (1, chunk)
        mean_y = buf[slot, 1:2, :]
        ca = buf[slot, 2:3, :]
        cb = buf[slot, 3:4, :]
        cc = buf[slot, 4:5, :]
        op = buf[slot, 5:6, :]
        col_r = buf[slot, 6:7, :]
        col_g = buf[slot, 7:8, :]
        col_b = buf[slot, 8:9, :]

        gidx = win + ci * chunk + lane  # (1, chunk) global pair index
        dx = px - mean_x  # (PIX, chunk)
        dy = py - mean_y
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        ok = (
            (gidx >= start)
            & (gidx < end)
            & (power <= 0.0)
            & (alpha >= ALPHA_MIN)
            & (done < 0.5)
        )
        alpha = jnp.where(ok, alpha, 0.0)

        cp = _lane_cumprod(1.0 - alpha, chunk)  # inclusive, unfrozen
        trip = (ok & (T_col * cp < T_EPS)).astype(jnp.int32)
        done_inc = _lane_cumor(trip, chunk) > 0

        alpha_eff = jnp.where(done_inc, 0.0, alpha)
        one_m = 1.0 - alpha_eff
        cp_eff = _lane_cumprod(one_m, chunk)
        w = T_col * (cp_eff / one_m) * alpha_eff  # (PIX, chunk)

        acc_r = acc_r + jnp.sum(w * col_r, axis=1, keepdims=True)
        acc_g = acc_g + jnp.sum(w * col_g, axis=1, keepdims=True)
        acc_b = acc_b + jnp.sum(w * col_b, axis=1, keepdims=True)

        contrib = alpha_eff > 0.0
        ncon = jnp.maximum(
            ncon,
            jnp.max(jnp.where(contrib, gidx - start + 1, 0), axis=1, keepdims=True),
        )

        # lane reductions (not last-lane slices) so the carried (PIX, 1)
        # vectors keep a lane-replicated layout — Mosaic requires loop
        # carries to have a consistent layout across iterations
        last = jax.lax.broadcasted_iota(jnp.int32, cp_eff.shape, 1) == chunk - 1
        T_col = T_col * jnp.sum(
            jnp.where(last, cp_eff, 0.0), axis=1, keepdims=True
        )
        done = jnp.maximum(done, jnp.max(trip.astype(jnp.float32), axis=1, keepdims=True))
        all_done = (jnp.sum(done) >= PIX).astype(jnp.int32)
        return ci + 1, all_done, T_col, done, acc_r, acc_g, acc_b, ncon

    def chunk_cond(state):
        ci, all_done, *_ = state
        return (ci < num_chunks) & (all_done == 0)

    init = (
        jnp.int32(0),
        jnp.int32(0),
        jnp.ones((PIX, 1), jnp.float32),
        jnp.zeros((PIX, 1), jnp.float32),
        jnp.zeros((PIX, 1), jnp.float32),
        jnp.zeros((PIX, 1), jnp.float32),
        jnp.zeros((PIX, 1), jnp.float32),
        jnp.zeros((PIX, 1), jnp.int32),
    )
    ci, _, T_col, done, acc_r, acc_g, acc_b, ncon = jax.lax.while_loop(
        chunk_cond, chunk_body, init
    )

    # Drain the in-flight DMA if the loop early-exited: at loop exit with
    # state ci, the last body (ci - 1) waited dma(ci - 1) and started
    # dma(ci) (iff ci < num_chunks) — that is the only possible outstanding
    # copy.
    @pl.when(ci < num_chunks)
    def _():
        dma(ci % 2, ci).wait()

    zero = jnp.zeros((PIX, 1), jnp.float32)
    out_ref[0] = jnp.concatenate(
        [acc_r, acc_g, acc_b, T_col, ncon.astype(jnp.float32), zero, zero, zero],
        axis=1,
    )


def composite_tiles_pallas(
    pair_attrs,  # (16, P + chunk) f32 from pack_pair_attrs
    tile_start,  # (T + 1,) int32 compact sorted ranges
    tiles_x: int,
    tiles_y: int,
    chunk: int = CHUNK,
    interpret: bool | None = None,
):
    """Forward compositing. Returns (tile_colors (T, PIX, 3), tile_T (T, PIX),
    n_contrib (T, PIX) int32)."""
    if interpret is None:
        interpret = _interpret_default()
    num_t = tiles_x * tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(
            (1, PIX, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_W, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_composite_kernel, chunk=chunk, tiles_x=tiles_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_t, PIX, 8), jnp.float32),
        interpret=interpret,
    )(tile_start, pair_attrs)
    tile_colors = out[:, :, :3]  # (T, PIX, 3)
    tile_T = out[:, :, 3]
    ncontrib = out[:, :, 4].astype(jnp.int32)
    return tile_colors, tile_T, ncontrib
