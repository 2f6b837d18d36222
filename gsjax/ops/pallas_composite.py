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
  [5] f16(r)<<16 | f16(g)   [6] f16(b)<<16 | f16(opacity)
  [7] pair slot bits (backward reduction only; forward ignores)

The 8-column layout is deliberate: the pack gather moves 8xf32 rows at
209 Mrows/s vs 164 for 16xf32 (measured sweep, evidence/perf/r4_ab.jsonl —
the round-4 roofline's single biggest sanctioned design win), and every
kernel chunk DMA halves from 8KB to 4KB. Colors and opacity are f16-
quantized once in :func:`gsjax.ops.projection.preprocess` (so every
backend composites identical values); the kernels decode the packed
halves with integer ops (:func:`_f16_pair_rows`) that reproduce XLA's
f16->f32 upcast bit-exactly for normal values.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import math

from gsjax.ops.composite import ALPHA_MAX, ALPHA_MIN, T_EPS
from gsjax.ops.projection import TILE

LOG_T_EPS = math.log(T_EPS)

ATTR_W = 8  # attribute rows per pair: 7 data + 1 slot-key row, an exact
# f32 sublane tile — see the gather-rate rationale in the module docstring
SLOT_ROW = 7  # attr row carrying the pair's slot id bits (backward only)
GRAD_W = 16  # backward-kernel output rows per pair: 9 grads + up to 4
# slot-key digit rows, padded to the bf16 sublane tile
PIX = TILE * TILE  # 256
CHUNK = 128  # pairs per DMA chunk; also the tile-range alignment


def _eye8():
    r = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
    return (r == c).astype(jnp.float32)


# All kernel matmuls carry real state (log-transmittance partial sums,
# color accumulators, boundary-array transposes), so they must NOT run at
# plain DEFAULT MXU precision, which truncates f32 operands to bfloat16
# (~0.4% relative) — measured on-chip as a 2e-3 final_T error and a 5e-3
# image error vs the XLA compositor (interpret-mode CPU tests compute
# full f32 and cannot see this). Round 2 pinned everything to HIGHEST
# (exact f32 via 6 MXU passes, bf16x6); rounds 3-5 progressively replaced
# that with 2-3-pass bf16 SPLITS at DEFAULT (~2^-16 relative — see
# _split_dot/_blend_dot/_split_dot2): the round-5 backward-split
# measurement showed the kernels' MXU time is NOT free at scale (the
# backward ran ~52 HIGHEST pass-equivalents per chunk). HIGHEST remains
# only as the terms=0 A/B anchor.
_PREC = jax.lax.Precision.HIGHEST

# The (chunk, chunk) triangular prefix/suffix-sum matmuls are the kernels'
# only BIG dots (3 fwd + 2 bwd per chunk x ~26k chunks at the 1080p bench
# scene). At HIGHEST (bf16x6, Mosaic's only full-f32 mode) their 6 passes
# stop hiding under the VPU work — measured as the round-2 forward-kernel
# regression (docs/PERF.md round 3). Since the triangular operand is
# exactly representable in bf16 (0/1 entries), a k-term bf16 split of the
# DATA operand at DEFAULT precision reproduces the product with
# k*8-bit-mantissa accuracy in k passes (the last term rides DEFAULT's
# own truncation). Measured on-chip (evidence/perf/r3_prec.jsonl, 1080p/1M
# scene): k=0/HIGHEST fwd 120.0ms; k=3 105.9; k=2 100.7; k=1 (plain
# DEFAULT, the known-wrong 2^-8 mode round 2 fixed) 101.6 with 1.1e-3
# image error. k=2 is therefore AT the MXU-hidden ceiling while keeping
# 16-bit-mantissa prefix sums: worst-case |log T_EPS|*2^-17 ~ 7e-5 on
# log T, and the live cross-check diff vs the XLA compositor is
# bit-identical to the HIGHEST run (7.1e-5 img / 8.6e-5 T — dominated by
# reassociation, not the split). Bump to 3 if a scene ever trips the
# bench cross-check.
_TRI_SPLIT = 2


def _split_dot(a, b, dn, terms=None):
    """``dot_general(a, b, dn)`` with ``b`` EXACT in bf16 (0/1 triangular
    masks, ones rows, identity blocks, f16-decoded colors split upstream):
    ``terms`` bf16-split passes of ``a`` at DEFAULT MXU precision
    reproduce the product with terms*8-bit-mantissa accuracy — 2 passes
    ~= f32 (2^-16 relative) at 1/3 the MXU cost of HIGHEST's 6 passes.
    The round-5 backward-kernel measurement (66 ms, evidence/perf/
    r5_ab.jsonl bwdsplit) is what motivated generalizing the round-3
    ``_TRI_SPLIT`` trick to EVERY carried-state matmul: the backward ran
    ~52 HIGHEST pass-equivalents per chunk (six _pix_sum matvecs + two
    color matmuls + two triangular sums). ``terms=0`` = single HIGHEST
    dot (A/B anchor)."""
    if terms is None:
        terms = _TRI_SPLIT
    if terms == 0:
        return jax.lax.dot_general(
            a, b, dn, preferred_element_type=jnp.float32, precision=_PREC
        )
    out = None
    r = a
    for i in range(terms):
        if i < terms - 1:
            t = r.astype(jnp.bfloat16).astype(jnp.float32)
            r = r - t
        else:
            t = r  # DEFAULT truncates the final remainder itself
        d = jax.lax.dot_general(
            t, b, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        out = d if out is None else out + d
    return out


def _tri_dot(a, tri):
    """``a @ tri`` where ``tri`` has only 0/1 entries (bf16-exact)."""
    return _split_dot(a, tri, (((1,), (0,)), ((), ())))


def _bf16_exact_split(x):
    """f16-valued f32 array -> (hi, lo) bf16-exact f32 terms, x == hi+lo.

    An f16 mantissa is 11 bits; bf16 keeps 8, so the remainder has <= 3
    significant bits — itself bf16-exact. Lets DEFAULT-precision matmuls
    consume f16-decoded colors with NO truncation error."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _exact01_dot(a01, tri):
    """``a01 @ tri`` with BOTH operands 0/1-valued: DEFAULT is exact (bf16
    represents 0/1 exactly), so never pay HIGHEST's extra passes here."""
    return jax.lax.dot_general(
        a01, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _blend_dot(a, col3):
    """``a @ col3`` where ``col3`` holds f16-valued colors: split col3
    into its two bf16-EXACT halves (:func:`_bf16_exact_split`), run the
    hi half with the 2-term split of ``a`` and the lo half (<= 2^-9 of
    the value) at plain DEFAULT — 3 MXU passes for ~2^-17 accuracy vs
    HIGHEST's 6. Used for the forward color blend and the backward
    ``cdotv``."""
    dn = (((1,), (0,)), ((), ()))
    c_hi, c_lo = _bf16_exact_split(col3)
    d = _split_dot(a, c_hi, dn)
    return d + jax.lax.dot_general(
        a, c_lo, dn, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _split_dot2(a, b, dn):
    """General dot with BOTH operands inexact at ~2^-16 accuracy in 3
    DEFAULT passes (vs HIGHEST's 6): hi/lo bf16 split of each operand,
    dropping the lo@lo term (~2^-16 relative)."""
    ah, al = _bf16_exact_split(a)  # al is a's bf16 remainder (inexact tail
    # truncated by DEFAULT below — a 2^-17-order term)
    bh, bl = _bf16_exact_split(b)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _transpose_px8(x8):
    """(PIX, 8) -> (8, PIX) as one tiny MXU matmul.

    The kernels' per-pixel state lives in (PIX, 1) column vectors, but the
    arrays crossing the pallas_call boundary must be sublane-major
    (T, 8, PIX): a (T, PIX, 8) boundary array gets the default (8, 128)
    tiled layout, lane-padding the minor dim 8 -> 128 — 16x the HBM bytes
    (measured 1.07GB physical for 67MB logical at 1080p, ~20ms/direction).
    An explicit relayout/transpose on the VPU is slow in Mosaic; the MXU
    does it for free as eye8 @ x8^T."""
    dn = (((1,), (1,)), ((), ()))  # eye8 col-dim with x8 minor dim
    hi, lo = _bf16_exact_split(x8)

    def d(y):
        return jax.lax.dot_general(
            _eye8(), y, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return d(hi) + d(lo)


def _transpose_8px(x8t):
    """(8, PIX) -> (PIX, 8) via the MXU (see :func:`_transpose_px8`)."""
    return _split_dot(x8t, _eye8(), (((0,), (0,)), ((), ())))


def pack_f16_pair(hi, lo):
    """Two f32 arrays -> one f32 array whose bits hold (f16(hi) << 16) |
    f16(lo). Denormal f16 results flush to signed zero so the kernels'
    integer decode (:func:`_f16_pair_rows`, which flushes denormals)
    reproduces XLA's upcast of the same value bit-exactly."""

    def h16(x):
        b = jax.lax.bitcast_convert_type(
            x.astype(jnp.float16), jnp.uint16
        ).astype(jnp.uint32)
        return jnp.where((b & 0x7C00) == 0, b & 0x8000, b)

    w = (h16(hi) << 16) | h16(lo)
    return jax.lax.bitcast_convert_type(w, jnp.float32)


def _f16_pair_rows(row):
    """Decode one packed attr row -> (hi, lo) f32 rows, integer-only.

    Mosaic vregs are 32-bit lanes; rather than materialize 16-bit vectors
    (relayout-heavy) the f16 halves are expanded with shift/mask/add on
    int32: for a normal f16 (s, e, m) the f32 pattern is
    s<<31 | (e+112)<<23 | m<<13, i.e. sign | ((em + 112*1024) << 13) on
    the 15 exponent+mantissa bits — exactly XLA's f16->f32 upcast.
    Denormals (e == 0) flush to zero; :func:`pack_f16_pair` never emits
    them, so decode matches the host value bit-exactly."""
    bits = jax.lax.bitcast_convert_type(row, jnp.int32)

    def dec(h):
        sign = (h & 0x8000) << 16
        em = h & 0x7FFF
        f32b = jnp.where(em < 1024, 0, sign | ((em + (112 << 10)) << 13))
        return jax.lax.bitcast_convert_type(f32b, jnp.float32)

    return dec((bits >> 16) & 0xFFFF), dec(bits & 0xFFFF)


def _pack_bf16_pair_rows(a, b):
    """Two f32 rows -> one f32 row whose bits hold (bf16(a) << 16) |
    bf16(b), via pure int32 ops (round-half-up on the mantissa cut; the
    +0x8000 carry into the exponent is exactly mantissa-overflow
    rounding). No 16-bit vectors anywhere: u16/bf16-typed arrays pay a
    (16, 128)-tile relayout per conversion on TPU, which is where the
    round-4 digit-packed reduction spent its host-graph glue time."""
    ba = jax.lax.bitcast_convert_type(a, jnp.int32)
    bb = jax.lax.bitcast_convert_type(b, jnp.int32)
    hi = (ba + 0x8000) & jnp.int32(-65536)
    lo = jax.lax.shift_right_logical(bb + 0x8000, 16) & 0xFFFF
    return jax.lax.bitcast_convert_type(hi | lo, jnp.float32)


def _unpack_bf16_pair_word(w_i32):
    """Inverse of :func:`_pack_bf16_pair_rows` on an int32 array: returns
    (hi, lo) f32 values (bf16 upcast == shift left 16)."""
    hi = jax.lax.bitcast_convert_type(
        w_i32 & jnp.int32(-65536), jnp.float32
    )
    lo = jax.lax.bitcast_convert_type(w_i32 << 16, jnp.float32)
    return hi, lo


def _pix_sum(x):
    """Sum over pixels (sublanes): (PIX, chunk) -> (1, chunk) on the MXU.

    A VPU sublane reduction is a chain of full-width shuffle-adds; the
    kernels are VPU-bound while their MXU matmuls overlap for free
    (measured round 1 — see the triangular-matmul note in
    :func:`_composite_kernel`), so non-carried reductions ride the MXU.
    CAUTION: never feed an MXU result into a while_loop CARRY — carry
    layouts must stay consistent across iterations (matmul-output layout
    != the replicated layout of a reduction; 'failed to legalize
    scf.yield'). Carried scalars keep VPU reductions; bulk accumulators
    go through VMEM scratch refs instead of carries."""
    ones = jnp.ones((1, x.shape[0]), jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    hi, lo = _bf16_exact_split(x)

    def d(y):
        return jax.lax.dot_general(
            ones, y, dn, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return d(hi) + d(lo)


def _all_done_check(ci, done, exit_every):
    """Saturation early-exit predicate, checked every ``exit_every`` chunks.

    The check itself costs a full (PIX, 1) cross-sublane reduction plus a
    vector->scalar move per chunk (pipeline sync) — measurable against
    what early exit saves, and tiles average only a handful of chunks at
    bench shapes. ``exit_every=0`` disables the check (the loop always
    walks every chunk; the IMAGE is identical either way, exit only skips
    chunks whose contribution is already masked to zero); ``k>1`` checks
    on every k-th chunk. Read from ``GSJAX_EXIT_CHECK_EVERY`` at trace
    time in :func:`composite_tiles_pallas`."""
    if exit_every == 0:
        return jnp.int32(0)
    if exit_every == 1:
        return (jnp.sum(done) >= PIX).astype(jnp.int32)
    return jax.lax.cond(
        (ci + 1) % exit_every == 0,
        lambda d: (jnp.sum(d) >= PIX).astype(jnp.int32),
        lambda d: jnp.int32(0),
        done,
    )


def _interpret_default():
    """Interpret-mode on CPU (tests / virtual meshes); compiled on TPU.

    Any other backend fails fast: silently interpreting the kernels on a
    GPU would "work" at a tiny fraction of hardware speed — route GPU
    users to ``backend="xla"`` explicitly instead (VERDICT r3 weak #7)."""
    be = jax.default_backend()
    if be == "tpu":
        return False
    if be == "cpu":
        return True
    raise NotImplementedError(
        f"Pallas composite kernels support TPU (compiled) and CPU "
        f"(interpret) backends, not {be!r}; use "
        f"RasterizeSettings(backend='xla') on this platform."
    )


def pack_pair_attrs(pair_gauss, means2d, conics, colors, opacities,
                    chunk: int = CHUNK, pair_slot=None):
    """Gather per-gaussian attributes into the sorted, *chunk-major*
    (n_chunks, 8, chunk) table the kernel streams: each leading index is
    one contiguous 4KB DMA block (strided per-attribute-row reads would be
    8 separate 512B transfers). Tail padding keeps the last tile's aligned
    window in bounds; tile ranges never cover it.

    rgb + opacity ride as two packed-f16 words (module docstring) so the
    per-pair row gather moves 8 f32 columns — its measured fast-rate
    width — instead of 16. When ``pair_slot`` is given its int32 bits ride
    in attribute row ``SLOT_ROW`` (unused by the forward kernel); the
    backward kernel forwards them into its output so the grad reduction
    can sort by slot without gathering."""
    per_gauss = jnp.concatenate(
        [
            means2d.astype(jnp.float32),
            conics.astype(jnp.float32),
            pack_f16_pair(colors[:, 0], colors[:, 1])[:, None],
            pack_f16_pair(colors[:, 2], opacities)[:, None],
            jnp.zeros((means2d.shape[0], 1), jnp.float32),
        ],
        axis=1,
    )  # (N, 8)
    pair = per_gauss[pair_gauss]  # (P, 8) one row gather
    if pair_slot is not None:
        pair = pair.at[:, SLOT_ROW].set(
            jax.lax.bitcast_convert_type(pair_slot, jnp.float32)
        )
    p = pair.shape[0]
    pad = (-p) % chunk + chunk
    pair = jnp.concatenate(
        [pair, jnp.zeros((pad, ATTR_W), jnp.float32)], axis=0
    )
    n_chunks = pair.shape[0] // chunk
    return pair.reshape(n_chunks, chunk, ATTR_W).transpose(0, 2, 1)


def _composite_kernel(
    # scalar prefetch
    tile_start_ref,
    # inputs
    pair_attrs_hbm,  # (n_chunks, ATTR_W, chunk) HBM, chunk-major
    # outputs
    out_ref,  # (1, 8, PIX): rows r, g, b, T, n_contrib (f32), pad x3
    # scratch
    buf,  # (2, ATTR_W, CHUNK) f32 VMEM
    sems,  # (2,) DMA semaphores
    acc,  # (PIX, 3) f32 VMEM color accumulator (ref, not a loop carry:
    #       the MXU blend's output layout can't ride a while carry)
    *,
    chunk,
    tiles_x,
    exit_every=1,
):
    # NOTE (round-4 negative result, measured on-chip): moving the
    # per-pixel carries (logT, done, ncon) into VMEM scratch refs and
    # replacing their VPU lane reductions with lane slices of the already-
    # computed triangular matmuls (+10ms fwd) or MXU matvecs against a
    # ones column (+17ms fwd) both LOST to the plain carried reductions —
    # the kernels' MXU budget is already saturated by the prefix-sum
    # matmuls, and Mosaic relayouts around scratch-resident state cost
    # more than the log2(chunk) shuffle-add reductions they replace
    # (evidence/perf/r4_ab.jsonl, snug stage: 92.3 -> 102.5 -> 109.2 ms).
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
        return pltpu.make_async_copy(
            pair_attrs_hbm.at[win // chunk + ci],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        dma(0, 0).start()

    lane_r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri_incl = (lane_r <= lane_c).astype(jnp.float32)  # inclusive cumsum
    tri_excl = (lane_r < lane_c).astype(jnp.float32)  # exclusive cumsum

    eye3 = (
        jax.lax.broadcasted_iota(jnp.int32, (3, 3), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (3, 3), 1)
    ).astype(jnp.float32)

    acc[...] = jnp.zeros((PIX, 3), jnp.float32)

    def chunk_body(state):
        ci, all_done, logT, done, ncon = state

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
        r_row, g_row = _f16_pair_rows(buf[slot, 5:6, :])
        b_row, op = _f16_pair_rows(buf[slot, 6:7, :])
        # colors as one (chunk, 3) MXU transpose: the three per-channel
        # broadcasts + lane reductions become a single (PIX,chunk)@(chunk,3)
        col3 = _split_dot(
            jnp.concatenate([r_row, g_row, b_row], axis=0), eye3,
            (((0,), (0,)), ((), ())),
        )  # (chunk, 3); f16 colors -> the 2-term bf16 split is EXACT

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

        # Prefix products run in log space on the MXU: cumsum along the
        # 128 pair lanes is one (PIX, chunk) @ (chunk, chunk) triangular
        # matmul — far cheaper than log2(chunk) VPU roll-multiply scans.
        # (Measured: collapsing the three matmuls to one via the
        # monotone-threshold identity made the kernel 17ms SLOWER — it is
        # VPU-bound and the MXU matmuls overlap with vector work for free.)
        lg = jnp.log1p(-alpha)  # log(1 - alpha); 0 where skipped
        cum = _tri_dot(lg, tri_incl)
        trip = (ok & (logT + cum < LOG_T_EPS)).astype(jnp.float32)
        tripped = _exact01_dot(trip, tri_incl)
        done_inc = tripped > 0.0

        alpha_eff = jnp.where(done_inc, 0.0, alpha)
        lg_eff = jnp.where(done_inc, 0.0, lg)
        cum_excl = _tri_dot(lg_eff, tri_excl)
        w = alpha_eff * jnp.exp(logT + cum_excl)  # (PIX, chunk)

        acc[...] = acc[...] + _blend_dot(w, col3)

        contrib = alpha_eff > 0.0
        ncon = jnp.maximum(
            ncon,
            jnp.max(jnp.where(contrib, gidx - start + 1, 0), axis=1, keepdims=True),
        )

        # carried scalars use VPU reductions (replicated layout — an MXU
        # matvec output can't ride a while carry; see the round-4 note in
        # the kernel header before "optimizing" these again)
        logT = logT + jnp.sum(lg_eff, axis=1, keepdims=True)
        done = jnp.maximum(done, jnp.max(trip, axis=1, keepdims=True))
        all_done = _all_done_check(ci, done, exit_every)
        return ci + 1, all_done, logT, done, ncon

    def chunk_cond(state):
        ci, all_done, *_ = state
        return (ci < num_chunks) & (all_done == 0)

    init = (
        jnp.int32(0),
        jnp.int32(0),
        jnp.zeros((PIX, 1), jnp.float32),  # log T
        jnp.zeros((PIX, 1), jnp.float32),
        jnp.zeros((PIX, 1), jnp.int32),
    )
    ci, _, logT, done, ncon = jax.lax.while_loop(
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
    out_ref[0] = _transpose_px8(jnp.concatenate(
        [acc[...], jnp.exp(logT), ncon.astype(jnp.float32),
         zero, zero, zero],
        axis=1,
    ))


def _composite_infer_kernel(
    # scalar prefetch
    tile_start_ref,
    # inputs
    pair_attrs_hbm,  # (n_chunks, ATTR_W, chunk) HBM, chunk-major
    # outputs
    out_ref,  # (1, 8, PIX): rows r, g, b, T, pad x4
    # scratch
    buf,  # (2, ATTR_W, CHUNK) f32 VMEM
    sems,  # (2,) DMA semaphores
    acc,  # (PIX, 3) f32 VMEM color accumulator (see _composite_kernel)
    *,
    chunk,
    tiles_x,
    exit_every=1,
):
    """Forward-only (inference) variant of :func:`_composite_kernel`.

    Identical blend + early-termination semantics (a splat whose blend
    would push T under T_EPS is skipped with everything behind it — same
    image and final_T), but no ``n_contrib`` bookkeeping: pure rendering
    (render.py, the viewer, the fwd bench) never replays a backward, so
    those VPU op chains are dead weight there."""
    t = pl.program_id(0)
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]
    win = (start // chunk) * chunk

    tx = t % tiles_x
    ty = t // tiles_x
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tx * TILE + p_idx % TILE).astype(jnp.float32)
    py = (ty * TILE + p_idx // TILE).astype(jnp.float32)

    num_chunks = pl.cdiv(end - win, chunk)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def dma(slot, ci):
        return pltpu.make_async_copy(
            pair_attrs_hbm.at[win // chunk + ci],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        dma(0, 0).start()

    lane_r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tri_incl = (lane_r <= lane_c).astype(jnp.float32)
    tri_excl = (lane_r < lane_c).astype(jnp.float32)

    eye3 = (
        jax.lax.broadcasted_iota(jnp.int32, (3, 3), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (3, 3), 1)
    ).astype(jnp.float32)

    acc[...] = jnp.zeros((PIX, 3), jnp.float32)

    def chunk_body(state):
        ci, all_done, logT, done = state

        @pl.when(ci + 1 < num_chunks)
        def _():
            dma((ci + 1) % 2, ci + 1).start()

        dma(ci % 2, ci).wait()
        slot = ci % 2
        mean_x = buf[slot, 0:1, :]
        mean_y = buf[slot, 1:2, :]
        ca = buf[slot, 2:3, :]
        cb = buf[slot, 3:4, :]
        cc = buf[slot, 4:5, :]
        r_row, g_row = _f16_pair_rows(buf[slot, 5:6, :])
        b_row, op = _f16_pair_rows(buf[slot, 6:7, :])
        col3 = _split_dot(
            jnp.concatenate([r_row, g_row, b_row], axis=0), eye3,
            (((0,), (0,)), ((), ())),
        )  # (chunk, 3); f16 colors -> the 2-term bf16 split is EXACT

        gidx = win + ci * chunk + lane
        dx = px - mean_x
        dy = py - mean_y
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        ok = (
            (gidx >= start) & (gidx < end)
            & (power <= 0.0) & (alpha >= ALPHA_MIN)
            & (done < 0.5)
        )
        alpha = jnp.where(ok, alpha, 0.0)

        lg = jnp.log1p(-alpha)
        cum = _tri_dot(lg, tri_incl)
        trip = (ok & (logT + cum < LOG_T_EPS)).astype(jnp.float32)
        tripped = _exact01_dot(trip, tri_incl)
        done_inc = tripped > 0.0

        alpha_eff = jnp.where(done_inc, 0.0, alpha)
        lg_eff = jnp.where(done_inc, 0.0, lg)
        cum_excl = _tri_dot(lg_eff, tri_excl)
        w = alpha_eff * jnp.exp(logT + cum_excl)

        acc[...] = acc[...] + _blend_dot(w, col3)

        logT = logT + jnp.sum(lg_eff, axis=1, keepdims=True)
        done = jnp.maximum(done, jnp.max(trip, axis=1, keepdims=True))
        all_done = _all_done_check(ci, done, exit_every)
        return ci + 1, all_done, logT, done

    def chunk_cond(state):
        ci, all_done, *_ = state
        return (ci < num_chunks) & (all_done == 0)

    zeros = jnp.zeros((PIX, 1), jnp.float32)
    init = (jnp.int32(0), jnp.int32(0), zeros, zeros)
    ci, _, logT, done = jax.lax.while_loop(
        chunk_cond, chunk_body, init
    )

    @pl.when(ci < num_chunks)
    def _():
        dma(ci % 2, ci).wait()

    zero = jnp.zeros((PIX, 1), jnp.float32)
    out_ref[0] = _transpose_px8(jnp.concatenate(
        [acc[...], jnp.exp(logT), zero, zero, zero, zero],
        axis=1,
    ))


def composite_tiles_pallas(
    pair_attrs,  # (n_chunks, ATTR_W, chunk) f32 from pack_pair_attrs
    tile_start,  # (T + 1,) int32 compact sorted ranges
    tiles_x: int,
    tiles_y: int,
    chunk: int = CHUNK,
    interpret: bool | None = None,
    infer: bool = False,
):
    """Forward compositing. Returns (tile_colors (T, PIX, 3), tile_T (T, PIX),
    n_contrib (T, PIX) int32). With ``infer=True`` the bookkeeping-free
    kernel runs and n_contrib is all zeros (images differ < T_EPS)."""
    if interpret is None:
        interpret = _interpret_default()
    num_t = tiles_x * tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_t,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(
            (1, 8, PIX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_W, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((PIX, 3), jnp.float32),  # color accumulator
        ],
    )
    kern = _composite_infer_kernel if infer else _composite_kernel
    # experiment knob (read at TRACE time — already-traced functions keep
    # the value they saw; retrace to change it): how often the saturation
    # early-exit reduction runs; identical images at any value
    raw = os.environ.get("GSJAX_EXIT_CHECK_EVERY", "1")
    try:
        exit_every = int(raw)
    except ValueError:
        exit_every = -1
    if exit_every < 0:
        raise ValueError(
            f"GSJAX_EXIT_CHECK_EVERY must be an integer >= 0, got {raw!r}"
        )
    # boundary array is sublane-major (T, 8, PIX) — lane-aligned, no
    # 8 -> 128 padding tax (see _transpose_px8); XLA fuses the transpose
    # back into the consumers (assemble_image transposes anyway)
    out = pl.pallas_call(
        functools.partial(kern, chunk=chunk, tiles_x=tiles_x,
                          exit_every=exit_every),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_t, 8, PIX), jnp.float32),
        interpret=interpret,
    )(tile_start, pair_attrs)
    tile_colors = out[:, :3, :].transpose(0, 2, 1)  # (T, PIX, 3)
    tile_T = out[:, 3, :]
    # round, don't truncate: the boundary transpose's 2-term bf16 split
    # reproduces integers only to ~2^-17 relative, so a count like 2000
    # can read back 1999.985 — truncation would walk the backward one
    # pair short
    ncontrib = jnp.round(out[:, 4, :]).astype(jnp.int32)
    return tile_colors, tile_T, ncontrib


def _composite_bwd_kernel(
    # scalar prefetch
    tile_start_ref,
    padded_start_ref,
    # inputs
    pair_attrs_hbm,  # (n_chunks, ATTR_W, chunk) HBM — residual from forward
    io_ref,  # (1, 8, PIX) VMEM rows: vr vg vb u T_N ncon 0 0
    _zeros_in,  # (P_pad // chunk, GRAD_W, chunk) HBM — aliased to grads_hbm
    # outputs
    grads_hbm,  # (P_pad // chunk, GRAD_W, chunk) HBM — per-pair grad blocks
    # scratch
    buf,  # (2, ATTR_W, chunk) f32 VMEM — input double buffer
    obuf,  # (2, GRAD_W, chunk) VMEM — output double buffer (grad dtype)
    sems,  # (2,) input DMA semaphores
    osems,  # (2,) output DMA semaphores
    *,
    chunk,
    tiles_x,
    emit_slot_keys=False,
    packed=False,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]
    win = (start // chunk) * chunk
    pstart = padded_start_ref[t]

    tx = t % tiles_x
    ty = t // tiles_x
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tx * TILE + p_idx % TILE).astype(jnp.float32)
    py = (ty * TILE + p_idx // TILE).astype(jnp.float32)

    io = _transpose_8px(io_ref[0])  # (8, PIX) boundary layout -> (PIX, 8)
    io_lane = jax.lax.broadcasted_iota(jnp.int32, (PIX, 8), 1)

    def col(i):
        return jnp.sum(jnp.where(io_lane == i, io, 0.0), axis=1, keepdims=True)

    vr, vg, vb, u, T_N, ncon_f = col(0), col(1), col(2), col(3), col(4), col(5)
    # +0.5: round-half-up before the int cast — the io8 boundary transpose
    # reproduces integer counts only to ~2^-17 relative (see the ncontrib
    # note in composite_tiles_pallas)
    ncon = (ncon_f + 0.5).astype(jnp.int32)  # (PIX, 1) local index count
    V = jnp.concatenate([vr, vg, vb], axis=1)  # (PIX, 3) pixel cotangents

    # chunks beyond the last contributing pair need no grad walk; their
    # padded grad slots stay zero via the zero-initialized (aliased)
    # output. When emitting slot keys the whole window must be walked so
    # every in-range pair gets its key (grads there are zero but the
    # reduction's boundary bookkeeping counts all valid pairs).
    maxn = jnp.max(ncon)  # scalar
    # this tile's output-block allocation; padded_start is clamped to
    # p_pad on the host (see composite_pallas_grads), so staying under it
    # guarantees the grads_hbm writes are in bounds even in the
    # adversarial case where many tiles straddle chunk boundaries and the
    # average-case p_pad bound would otherwise be exceeded
    alloc = (padded_start_ref[t + 1] - pstart) // chunk
    n_bwd = jnp.where(
        maxn > 0, (start - win + maxn - 1) // chunk + 1, 0
    )
    n_bwd = jnp.minimum(n_bwd, alloc)
    if emit_slot_keys:
        n_bwd = alloc

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def in_dma(slot, ci):
        return pltpu.make_async_copy(
            pair_attrs_hbm.at[win // chunk + ci], buf.at[slot], sems.at[slot]
        )

    def out_dma(slot, ci):
        return pltpu.make_async_copy(
            obuf.at[slot], grads_hbm.at[pstart // chunk + ci], osems.at[slot]
        )

    @pl.when(n_bwd > 0)
    def _():
        in_dma(0, n_bwd - 1).start()

    lane_r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    rtri_incl = (lane_r >= lane_c).astype(jnp.float32)  # suffix sum, incl
    rtri_excl = (lane_r > lane_c).astype(jnp.float32)  # suffix sum, excl

    def body(k, state):
        logTrec, S = state
        ci = n_bwd - 1 - k
        slot = k % 2

        @pl.when(k + 1 < n_bwd)
        def _():
            in_dma((k + 1) % 2, ci - 1).start()

        in_dma(slot, ci).wait()
        mean_x = buf[slot, 0:1, :]
        mean_y = buf[slot, 1:2, :]
        ca = buf[slot, 2:3, :]
        cb = buf[slot, 3:4, :]
        cc = buf[slot, 4:5, :]
        r_row, g_row = _f16_pair_rows(buf[slot, 5:6, :])
        b_row, op = _f16_pair_rows(buf[slot, 6:7, :])
        col3 = jnp.concatenate([r_row, g_row, b_row], axis=0)  # (3, chunk)

        gidx = win + ci * chunk + lane
        dx = px - mean_x
        dy = py - mean_y
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        raw = op * jnp.exp(power)
        alpha = jnp.minimum(ALPHA_MAX, raw)
        contrib = (
            (gidx >= start)
            & (gidx < end)
            & (power <= 0.0)
            & (alpha >= ALPHA_MIN)
            & ((gidx - start) < ncon)
        )
        a = jnp.where(contrib, alpha, 0.0)
        one_m = 1.0 - a

        # transmittance before each pair, reconstructed back-to-front in
        # log space; the suffix sums run as triangular matmuls on the MXU
        lr = jnp.log1p(-a)  # 0 where skipped
        Rlog = _tri_dot(lr, rtri_incl)
        T_i = jnp.exp(logTrec - Rlog)
        w = T_i * a

        # cdotv[p,c] = sum_i col_i[c] * v_i[p]: one MXU matmul instead of
        # three broadcast-muls + adds
        cdotv = _blend_dot(V, col3)  # (PIX, chunk)
        q = w * cdotv
        S_i = S + _tri_dot(q, rtri_excl)
        dalpha = T_i * cdotv - (S_i + T_N * u) / one_m
        live = contrib & (raw <= ALPHA_MAX)  # clamp kills d(op, power)
        g_pow = jnp.where(live, alpha * dalpha, 0.0)

        # Per-pair grads: all pixel reductions ride the MXU (_pix_sum) and
        # the per-pair coefficients (ca, cb, cc, 1/op) factor OUT of the
        # pixel sums — 6 matvecs + 1 (3,PIX)@(PIX,chunk) matmul replace
        # nine (PIX,chunk) mul+sublane-reduction chains:
        #   g_op  = sum_p exp(pow)*dalpha = sum_p g_pow / op  (alpha = raw
        #           = op*exp(pow) on live lanes; clamp excluded by live)
        #   g_mx  = sum_p (ca*dx + cb*dy)*g_pow = ca*S1 + cb*S2
        t1 = dx * g_pow
        t2 = dy * g_pow
        S1 = _pix_sum(t1)
        S2 = _pix_sum(t2)
        g_op = _pix_sum(g_pow) / jnp.maximum(op, 1e-12)
        g_ca = -0.5 * _pix_sum(dx * t1)
        g_cb = -_pix_sum(dy * t1)
        g_cc = -0.5 * _pix_sum(dy * t2)
        g_mx = ca * S1 + cb * S2
        g_my = cc * S2 + cb * S1
        g_rgb = _split_dot2(
            V, w, (((0,), (0,)), ((), ()))
        )  # (3, chunk): rows g_r, g_g, g_b
        g_r = g_rgb[0:1, :]
        g_g = g_rgb[1:2, :]
        g_b = g_rgb[2:3, :]

        # previous write on this slot must land before reuse
        @pl.when(k >= 2)
        def _():
            out_dma(slot, n_bwd - 1 - (k - 2)).wait()

        zero_row = jnp.zeros((1, chunk), jnp.float32)
        if emit_slot_keys:
            # forward the pair's slot id (riding in attr row SLOT_ROW) for
            # the sort-payload reduction; out-of-range lanes belong to a
            # neighboring tile's window and get the max-slot sentinel
            in_range = (gidx >= start) & (gidx < end)
            slot_bits = jax.lax.bitcast_convert_type(
                buf[slot, SLOT_ROW:SLOT_ROW + 1, :], jnp.int32
            )
            key_row = jax.lax.bitcast_convert_type(
                jnp.where(in_range, slot_bits, jnp.int32(2**31 - 1)),
                jnp.float32,
            )
            if packed:
                # bf16-pair-packed mode (8 f32 rows): the 9 grads as 5
                # u32-packed words + the raw slot key — int-only on both
                # sides, so no 16-bit-typed array ever materializes
                rows = [
                    _pack_bf16_pair_rows(g_mx, g_my),
                    _pack_bf16_pair_rows(g_ca, g_cb),
                    _pack_bf16_pair_rows(g_cc, g_op),
                    _pack_bf16_pair_rows(g_r, g_g),
                    _pack_bf16_pair_rows(g_b, zero_row),
                    key_row, zero_row, zero_row,
                ]
            else:
                rows = (
                    [g_mx, g_my, g_ca, g_cb, g_cc, g_op, g_r, g_g, g_b]
                    + [key_row] + [zero_row] * (GRAD_W - 10)
                )
        else:
            rows = (
                [g_mx, g_my, g_ca, g_cb, g_cc, g_op, g_r, g_g, g_b]
                + [zero_row] * (GRAD_W - 9)
            )
        obuf[slot] = jnp.concatenate(rows, axis=0).astype(obuf.dtype)
        out_dma(slot, ci).start()

        # lane reductions keep (PIX, 1) carries lane-replicated (VPU —
        # MXU matvec outputs can't ride fori carries, see _pix_sum and the
        # round-4 negative result in _composite_kernel's header)
        logTrec = logTrec - jnp.sum(lr, axis=1, keepdims=True)
        S = S + jnp.sum(q, axis=1, keepdims=True)
        return logTrec, S

    jax.lax.fori_loop(
        0, n_bwd, body,
        (jnp.log(jnp.maximum(T_N, 1e-30)), jnp.zeros((PIX, 1), jnp.float32)),
    )

    # drain outstanding output DMAs (last two slots)
    @pl.when(n_bwd >= 1)
    def _():
        out_dma((n_bwd - 1) % 2, 0).wait()

    @pl.when(n_bwd >= 2)
    def _():
        out_dma((n_bwd - 2) % 2, 1).wait()


def _blocked_cumsum_1d(x, block: int = 4096):
    """Inclusive cumulative sum of a 1-D array, two-level."""
    n = x.shape[0]
    while block > 128 and n % block:
        block //= 2
    if n % block:
        return jnp.cumsum(x)
    rows = x.reshape(n // block, block)
    within = jnp.cumsum(rows, axis=1)
    carry = jnp.cumsum(within[:, -1])
    carry = jnp.concatenate([jnp.zeros((1,), x.dtype), carry[:-1]])
    return (within + carry[:, None]).reshape(n)


def _blocked_cumsum_rows(x, block: int = 4096):
    """Inclusive cumulative sum along axis 0 of (P, C), two-level."""
    p, c = x.shape
    while block > 128 and p % block:
        block //= 2
    if p % block:
        return jnp.cumsum(x, axis=0)
    rows = x.reshape(p // block, block, c)
    within = jnp.cumsum(rows, axis=1)
    totals = within[:, -1, :]
    carry = jnp.cumsum(totals, axis=0)
    carry = jnp.concatenate([jnp.zeros((1, c), x.dtype), carry[:-1]], axis=0)
    return (within + carry[:, None, :]).reshape(p, c)


def composite_pallas_grads(
    pair_attrs,  # (16, P + chunk) residual
    tile_start,  # (T + 1,)
    d_tile_colors,  # (T, PIX, 3)
    d_tile_T,  # (T, PIX)
    final_T,  # (T, PIX)
    ncontrib,  # (T, PIX) int32 (local indices)
    pair_slot,  # (P,) dense (g * mt + j) slot per sorted pair
    gauss_count,  # (N,) expanded pairs per gaussian (pre-budget)
    mt: int,
    tiles_x: int,
    tiles_y: int,
    chunk: int = CHUNK,
    interpret: bool | None = None,
    grad_dtype=jnp.float32,
    grad_reduce: str = "gather",
    gauss_inv_perm=None,
    slot_layout: str = "grid",
    _kernel_only: bool = False,
):
    """Backward pass: per-pair gradient kernel + deterministic segmented
    reduction to per-gaussian cotangents.

    ``slot_layout``: how ``pair_slot`` encodes the (gaussian row, j) pair
    — "grid" (row * mt + j) or "rowmajor" (cumsum(gauss_count)[row] + j,
    the compact expansion's overflow-free ids).

    ``_kernel_only`` (perf-probe seam, scripts/_r5_session.py): skip the
    reduction and return the raw padded per-pair grad blocks — the
    difference against a full call isolates reduction time under the same
    jit/fusion regime (the method behind docs/PERF.md phase splits).

    Returns (d_means2d (N,2), d_conics (N,3), d_colors (N,3), d_opacities (N,)).

    Replaces the CUDA backward's atomicAdd accumulation (SURVEY.md §5.2)
    with: per-pair grads written to per-tile-exclusive padded slots, an
    index-mapped re-ordering into the dense (N, MT) slot grid, and a plain
    per-gaussian axis reduction — fully deterministic.
    """
    if interpret is None:
        interpret = _interpret_default()
    num_t = tiles_x * tiles_y
    max_pairs = pair_slot.shape[0]
    p_pad = (-(-max_pairs // chunk)) * chunk + chunk * num_t + chunk

    start = tile_start[:num_t]
    end = tile_start[1 : num_t + 1]
    win = (start // chunk) * chunk
    wsize = jnp.where(end > win, ((end - win + chunk - 1) // chunk) * chunk, 0)
    padded_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(wsize).astype(jnp.int32)]
    )
    # p_pad bound soundness: tile ranges are a contiguous partition
    # (start_{t+1} == end_t from searchsorted), so window wastes
    # TELESCOPE — a tile's tail pad and the next tile's head offset sum
    # to exactly `chunk` at each unaligned boundary (pad_t > 0 implies
    # a_{t+1} = chunk - pad_t), giving sum(wsize) <= max_pairs +
    # chunk*T + chunk == p_pad. The clamp below is defense-in-depth for
    # any future caller that violates contiguity: the kernel stops at
    # each tile's allocation (no out-of-bounds DMA), clipped tiles read
    # as zero-grad/sentinel rows, and the reduction switches to the
    # first-occurrence path so segment boundaries stay aligned.
    pad_overflow = padded_start[num_t] > p_pad
    padded_start = jnp.minimum(padded_start, p_pad)

    # sublane-major boundary layout (T, 8, PIX) — see _transpose_px8
    io8 = jnp.concatenate(
        [
            d_tile_colors.astype(jnp.float32).transpose(0, 2, 1),
            d_tile_T[:, None, :].astype(jnp.float32),
            final_T[:, None, :],
            ncontrib[:, None, :].astype(jnp.float32),
            jnp.zeros((num_t, 2, PIX), jnp.float32),
        ],
        axis=1,
    )  # (T, 8, PIX)

    emit_keys = grad_reduce == "sort"
    # bf16 grads + sort reduction ride the PACKED path: the 9 grads as 5
    # u32-pair words + the raw slot key in 8 f32 rows — half the output
    # DMA of GRAD_W=16 bf16 digit rows, and no 16-bit-typed array ever
    # materializes in the host graph (see _pack_bf16_pair_rows)
    packed_keys = emit_keys and jnp.dtype(grad_dtype) == jnp.bfloat16
    grad_w_out = 8 if packed_keys else GRAD_W
    obuf_dtype = jnp.float32 if packed_keys else grad_dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, 8, PIX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_W, chunk), jnp.float32),
            pltpu.VMEM((2, grad_w_out, chunk), obuf_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    zeros_out = jnp.zeros((p_pad // chunk, grad_w_out, chunk), obuf_dtype)
    if emit_keys:
        # unwritten chunks (beyond the last tile window) must read as the
        # +inf-slot sentinel in the key row
        sentinel = jax.lax.bitcast_convert_type(
            jnp.int32(2**31 - 1), jnp.float32
        )
        zeros_out = zeros_out.at[:, 5 if packed_keys else 9, :].set(sentinel)
    grads_padded = pl.pallas_call(
        functools.partial(
            _composite_bwd_kernel, chunk=chunk, tiles_x=tiles_x,
            emit_slot_keys=emit_keys, packed=packed_keys,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (p_pad // chunk, grad_w_out, chunk), obuf_dtype
        ),
        input_output_aliases={4: 0},  # zeros input (after 2 prefetch + 2 inputs) -> output
        interpret=interpret,
    )(tile_start, padded_start, pair_attrs, io8, zeros_out)
    if _kernel_only:
        return grads_padded

    # --- reduction: padded per-pair grads -> per-gaussian cotangents ---
    # TPU scatter-adds (segment_sum) measure in the hundreds of ms at this
    # size and random row gathers run at ~43M rows/s; sorts, by contrast,
    # stream at ~90GB/s. Two deterministic strategies (identical results):
    grad_w = 9  # kernel output rows 0..8 carry gradients
    num_valid = tile_start[num_t]
    n_gauss = gauss_count.shape[0]
    big = jnp.int32(2**31 - 1)
    if packed_keys:
        # packed single-sort mode: the kernel emitted 5 u32 words (bf16
        # grad pairs) + the raw i32 slot key — ONE 6-operand sort carries
        # everything (variadic sort cost degrades past ~6 operands; the
        # f32 path needs two sorts), and pack/unpack is pure 32-bit
        # shift/mask on both sides.
        words = [
            jax.lax.bitcast_convert_type(
                grads_padded[:, r, :].reshape(p_pad), jnp.int32
            )
            for r in range(6)
        ]
        out = jax.lax.sort(
            (words[5],) + tuple(words[:5]), num_keys=1, is_stable=False
        )
        slot_sorted = out[0]  # i32; the 2^31-1 sentinel sorts last
        cols_f = []
        for w in out[1:5]:
            hi, lo = _unpack_bf16_pair_word(w)
            cols_f.extend([hi, lo])
        cols_f.append(_unpack_bf16_pair_word(out[5])[0])
        # 8-wide table + separate 1-D column: a (L, 9) f32 table is
        # sublane-padded 9 -> 16 (1.78x HBM bytes); (L, 8) pads nothing
        # and the ninth column gathers from a 1-D array
        grads8 = jnp.stack(cols_f[:8], axis=-1)
        grads1 = cols_f[8]
    elif emit_keys:
        # sort-payload mode: the kernel emitted each pair's slot id in row
        # 9 (+inf sentinel for holes), so the padded grid itself is sorted
        # by slot directly — the 9 grad columns ride as payload across two
        # small-operand sorts (variadic lax.sort degrades badly past ~6
        # operands) and no row gather is needed at all.
        key_pad = jax.lax.bitcast_convert_type(
            grads_padded[:, 9, :], jnp.int32
        ).reshape(p_pad)
        cols = tuple(
            grads_padded[:, c, :].reshape(p_pad).astype(jnp.float32)
            for c in range(grad_w)
        )
        # two separate sorts, not one: variadic sort cost grows superlinearly
        # with operand count (an 11-operand sort measured 50ms vs 2x17ms).
        # The barrier stops CSE from re-merging them; is_stable=False is
        # safe (valid keys are unique slots; sentinel-key rows are all-zero
        # in every payload column) and sheds the stability iota operand.
        sorted_a = jax.lax.sort(
            (key_pad,) + cols[:4], num_keys=1, is_stable=False
        )
        sorted_b = jax.lax.sort(
            (jax.lax.optimization_barrier(key_pad),) + cols[4:],
            num_keys=1, is_stable=False,
        )
        slot_sorted = sorted_a[0]
        payload = tuple(sorted_a[1:]) + tuple(sorted_b[1:])
        grads8 = jnp.stack(payload[:8], axis=-1)  # see bf16 branch note
        grads1 = payload[8]
    else:
        # gather mode: order pairs by their dense (g * mt + j) slot with
        # one cheap i32 sort (padded positions ride along as the payload),
        # then permute the grad rows with a single natural-layout gather.
        # map sorted pair i (tile t) to its padded slot: i + shift[t], with
        # shift[t] = padded_start[t] - win[t] (nondecreasing in t)
        grads_rows = (
            grads_padded[:, :8, :]
            .transpose(0, 2, 1)
            .reshape(p_pad, 8)
        )
        grads_row9 = grads_padded[:, 8, :].reshape(p_pad)
        shift = padded_start[:num_t] - win
        count = end - start
        starts_fill = jnp.where(count > 0, start, max_pairs)
        seg = (
            jnp.zeros(max_pairs, jnp.int32)
            .at[starts_fill]
            .max(shift, mode="drop")
        )
        shift_fill = _cummax_blocked_1d(seg)
        i_arr = jnp.arange(max_pairs, dtype=jnp.int32)
        padded_pos = jnp.where(
            i_arr < num_valid,
            jnp.minimum(i_arr + shift_fill, p_pad - 1),  # pad_overflow clip
            p_pad - 1,
        )
        slot_key = jnp.where(i_arr < num_valid, pair_slot, big)
        slot_sorted, perm = jax.lax.sort(
            (slot_key, padded_pos), num_keys=1, is_stable=True
        )
        grads8 = grads_rows[perm].astype(jnp.float32)  # (P, 8) row gather
        grads1 = grads_row9[perm].astype(jnp.float32)

    sorted_len = grads8.shape[0]  # max_pairs (gather) or p_pad (sort)
    # boundary-gather source kept in the FAST gather zone: a single
    # (L+1, 8) f32 cumsum table is ~147MB at the bench p_pad — the
    # 120-190MB cliff zone (~59 Mrows/s measured, r5_ab.jsonl
    # boundary_gather). Two (L+1, 4) tables are ~73MB each and gather at
    # the 4xf32 rate (234 Mrows/s): two cheap gathers beat one slow one.
    csum4a = jnp.concatenate(
        [jnp.zeros((1, 4), jnp.float32),
         _blocked_cumsum_rows(grads8[:, :4])], axis=0
    )
    csum4b = jnp.concatenate(
        [jnp.zeros((1, 4), jnp.float32),
         _blocked_cumsum_rows(grads8[:, 4:])], axis=0
    )
    csum1 = jnp.concatenate(
        [jnp.zeros((1,), jnp.float32), _blocked_cumsum_1d(grads1)]
    )

    # per-gaussian segment boundaries in slot-sorted order. Common case
    # (no pairs lost to the budget): every gaussian keeps its gauss_count
    # pairs and boundaries are a plain cumulative sum. Overflow case: find
    # first occurrences with a scatter-min (~20x slower; overflow is an
    # error condition the trainer sizes budgets against).
    total = jnp.sum(gauss_count)

    def fast_lo(_):
        cs = jnp.cumsum(gauss_count).astype(jnp.int32)
        return jnp.concatenate([jnp.zeros(1, jnp.int32), cs])

    def slow_lo(_):
        if slot_layout == "rowmajor":
            bounds = jnp.concatenate([
                jnp.zeros(1, jnp.int32),
                jnp.cumsum(gauss_count).astype(jnp.int32),
            ])
            g_sorted = jnp.clip(
                jnp.searchsorted(bounds, slot_sorted, side="right") - 1,
                0, n_gauss,
            )
        else:
            g_sorted = jnp.minimum(slot_sorted // mt, n_gauss)
        lo = (
            jnp.full(n_gauss + 1, sorted_len, jnp.int32)
            .at[g_sorted]
            .min(jnp.arange(sorted_len, dtype=jnp.int32), mode="drop")
        )
        return jnp.flip(jax.lax.cummin(jnp.flip(lo)))

    lo = jax.lax.cond(
        (num_valid == total) & ~pad_overflow, fast_lo, slow_lo, None
    )
    # valid pairs are a prefix of the slot-sorted order; gaussian i's
    # segment is [lo[i], lo[i+1]) so one monotone (N+1)-row gather of the
    # cumulative sums yields every boundary (hi[i] == lo[i+1])
    loc = jnp.minimum(lo, num_valid)  # (N + 1,) nondecreasing
    cl4a = csum4a[loc]  # (N + 1, 4) monotone row gathers, fast-zone
    cl4b = csum4b[loc]  # sources (see the cumsum split note above)
    cl1 = csum1[loc]  # (N + 1,) 1-D gather
    per_gauss = jnp.concatenate(
        [cl4a[1:] - cl4a[:-1], cl4b[1:] - cl4b[:-1],
         (cl1[1:] - cl1[:-1])[:, None]], axis=1
    )  # (N, 9), row (slot) order
    if gauss_inv_perm is not None:
        # tiered binning: rows are in tile-count-sorted order; one (N, 9)
        # gather maps original gaussian i to its row inv_perm[i]
        per_gauss = per_gauss[gauss_inv_perm]

    d_means2d = per_gauss[:, 0:2]
    d_conics = per_gauss[:, 2:5]
    d_opacities = per_gauss[:, 5]
    d_colors = per_gauss[:, 6:9]
    return d_means2d, d_conics, d_colors, d_opacities


def _cummax_blocked_1d(x, block: int = 1024):
    n = x.shape[0]
    if n % block:
        return jax.lax.cummax(x)
    rows = x.reshape(n // block, block)
    within = jax.lax.cummax(rows, axis=1)
    totals = within[:, -1]
    carry = jax.lax.cummax(totals)
    carry = jnp.concatenate(
        [jnp.full((1,), jnp.iinfo(x.dtype).min, x.dtype), carry[:-1]]
    )
    return jnp.maximum(within, carry[:, None]).reshape(n)


def composite_pallas(
    means2d,
    conics,
    colors,
    opacities,
    pair_gauss,
    pair_slot,
    tile_start,
    gauss_count,
    mt: int,
    tiles_x: int,
    tiles_y: int,
    chunk: int = CHUNK,
    grad_dtype: str = "float32",
    grad_reduce: str = "gather",
    gauss_inv_perm=None,
    slot_layout: str = "grid",
):
    """Differentiable Pallas compositing: custom VJP pairing the forward
    tile kernel with the back-to-front replay kernel (the JAX equivalent of
    diff-gaussian-rasterization's autograd.Function; SURVEY.md §2.2 N1).

    ``mt`` is the dense slot stride (max tiles per gaussian) from binning.
    ``gauss_inv_perm`` (tiered binning) maps original gaussian i to its row
    in slot order; backward-only. Returns (tile_colors (T, PIX, 3),
    tile_T (T, PIX)).
    """
    return _composite_vjp(
        means2d, conics, colors, opacities, pair_gauss, pair_slot,
        tile_start, gauss_count, gauss_inv_perm, mt, tiles_x, tiles_y,
        chunk, grad_dtype, grad_reduce, slot_layout,
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14, 15)
)
def _composite_vjp(
    means2d, conics, colors, opacities, pair_gauss, pair_slot,
    tile_start, gauss_count, gauss_inv_perm, mt, tiles_x, tiles_y, chunk,
    grad_dtype, grad_reduce, slot_layout,
):
    pair_attrs = pack_pair_attrs(
        pair_gauss, means2d, conics, colors, opacities, chunk,
        pair_slot=pair_slot,
    )
    # primal-only call = pure rendering (render.py, viewer, fwd bench):
    # take the bookkeeping-free inference kernel
    tc, tT, _ = composite_tiles_pallas(
        pair_attrs, tile_start, tiles_x, tiles_y, chunk, infer=True
    )
    return tc, tT


def _composite_vjp_fwd(
    means2d, conics, colors, opacities, pair_gauss, pair_slot,
    tile_start, gauss_count, gauss_inv_perm, mt, tiles_x, tiles_y, chunk,
    grad_dtype, grad_reduce, slot_layout,
):
    pair_attrs = pack_pair_attrs(
        pair_gauss, means2d, conics, colors, opacities, chunk,
        pair_slot=pair_slot,
    )
    tc, tT, ncon = composite_tiles_pallas(
        pair_attrs, tile_start, tiles_x, tiles_y, chunk
    )
    res = (pair_attrs, tile_start, tT, ncon, pair_slot, gauss_count,
           gauss_inv_perm)
    return (tc, tT), res


def _composite_vjp_bwd(
    mt, tiles_x, tiles_y, chunk, grad_dtype, grad_reduce, slot_layout,
    res, cts
):
    import numpy as np

    (pair_attrs, tile_start, final_T, ncon, pair_slot, gauss_count,
     gauss_inv_perm) = res
    d_tc, d_tT = cts
    d_means2d, d_conics, d_colors, d_opacities = composite_pallas_grads(
        pair_attrs, tile_start, d_tc, d_tT, final_T, ncon,
        pair_slot, gauss_count, mt, tiles_x, tiles_y, chunk,
        grad_dtype=jnp.dtype(grad_dtype).type,
        grad_reduce=grad_reduce,
        gauss_inv_perm=gauss_inv_perm,
        slot_layout=slot_layout,
    )

    def int_ct(x):
        return np.zeros(x.shape, jax.dtypes.float0)

    return (
        d_means2d, d_conics, d_colors, d_opacities,
        int_ct(pair_slot), int_ct(pair_slot), int_ct(tile_start),
        int_ct(gauss_count),
        None if gauss_inv_perm is None else int_ct(gauss_inv_perm),
    )


_composite_vjp.defvjp(_composite_vjp_fwd, _composite_vjp_bwd)
