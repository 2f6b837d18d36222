"""Front-to-back alpha compositing over 16x16 pixel tiles.

The CUDA render kernel walks each tile's sorted splat list sequentially per
pixel: ``C += T * alpha * c; T *= (1 - alpha)`` with an early exit at
T < 1e-4 (SURVEY.md §2.2 N1). A scalar loop like that starves a TPU. Here
the recurrence is re-associated through a cumulative product::

    T_i = prod_{j<i} (1 - alpha_j)

so one chunk of K splats against all 256 pixels of a tile becomes dense
(pixels x K) vector math plus a (pixels x K) @ (K x 3) matmul for the color
accumulation — VPU + MXU work with no sequential dependence inside the chunk
and a single transcendental (the alpha exp) per pair-pixel. Chunks are
scanned front-to-back carrying (T, done) per pixel.

Early-termination parity: the reference *freezes* T when the test
``T * (1 - alpha) < 1e-4`` trips and skips that splat and all later ones. We
detect the first trip from the unfrozen prefix (identical up to the trip),
zero the effective alphas from there on, and recompute the cumulative sum —
bitwise semantics match the sequential loop up to float reassociation.

This module is the pure-jnp/XLA implementation; gsjax.ops.pallas provides the
hand-tiled kernel with the same contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsjax.ops.projection import TILE

ALPHA_MAX = 0.99  # reference clamp: alpha = min(0.99, ...)
ALPHA_MIN = 1.0 / 255.0  # splats fainter than this are skipped
T_EPS = 1e-4  # early-termination transmittance threshold


def _tile_pixel_coords(tiles_x: int, tiles_y: int):
    """Pixel-center coordinates for every tile: (T, TILE*TILE, 2) float32."""
    ty, tx = jnp.divmod(jnp.arange(tiles_x * tiles_y, dtype=jnp.int32), tiles_x)
    py, px = jnp.divmod(jnp.arange(TILE * TILE, dtype=jnp.int32), TILE)
    x = tx[:, None] * TILE + px[None, :]
    y = ty[:, None] * TILE + py[None, :]
    return jnp.stack([x, y], axis=-1).astype(jnp.float32)


def composite_tiles(
    bins_pair_gauss,
    tile_start,
    means2d,
    conics,
    colors,
    opacities,
    tiles_x: int,
    tiles_y: int,
    max_splats_per_tile: int,
    chunk: int = 32,
    pixel_origin=(0.0, 0.0),
):
    """Blend sorted splats into per-tile pixel buffers.

    ``pixel_origin`` (x, y) offsets the pixel grid — used by the sharded
    renderer whose tile grid covers only a strip of the global image while
    ``means2d`` stay in global pixel coordinates. May be traced.

    Returns ``(tile_colors (T, 256, 3), tile_transmittance (T, 256),
    num_tile_capped ())``: the scan walks exactly
    ``max_splats_per_tile // chunk`` rounds, so a tile deeper than the
    budget loses its tail — ``num_tile_capped`` counts those lost pairs
    (only on tiles where some pixel was still accumulating, i.e. where the
    truncation can actually change the image; the Pallas kernel has no such
    cap, so a non-zero count is where the two backends may diverge and the
    trainer's budget-growth must react). Differentiable w.r.t.
    means2d / conics / colors / opacities.
    """
    num_tiles = tiles_x * tiles_y
    pix = _tile_pixel_coords(tiles_x, tiles_y) + jnp.asarray(
        pixel_origin, jnp.float32
    )  # (T, 256, 2)
    start = tile_start[:num_tiles]  # (T,)
    count = tile_start[1 : num_tiles + 1] - start  # (T,)
    n_rounds = max(max_splats_per_tile // chunk, 1)

    k_local = jnp.arange(chunk, dtype=jnp.int32)

    @jax.checkpoint
    def step(carry, k):
        T_carry, done = carry  # (T, 256), (T, 256) bool
        idx = start[:, None] + k * chunk + k_local[None, :]  # (T, K)
        in_range = (k * chunk + k_local[None, :]) < count[:, None]
        idx = jnp.clip(idx, 0, bins_pair_gauss.shape[0] - 1)
        g = bins_pair_gauss[idx]  # (T, K)

        mean = means2d[g]  # (T, K, 2)
        con = conics[g]  # (T, K, 3)
        col = colors[g]  # (T, K, 3)
        op = opacities[g]  # (T, K)

        d = pix[:, :, None, :] - mean[:, None, :, :]  # (T, 256, K, 2)
        dx, dy = d[..., 0], d[..., 1]
        power = (
            -0.5 * (con[:, None, :, 0] * dx * dx + con[:, None, :, 2] * dy * dy)
            - con[:, None, :, 1] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, op[:, None, :] * jnp.exp(power))
        ok = in_range[:, None, :] & (power <= 0.0) & (alpha >= ALPHA_MIN)
        alpha = jnp.where(ok, alpha, 0.0)

        # Unfrozen cumulative product to locate the early-termination trip
        # point (identical to the sequential prefix up to the trip).
        cp = jnp.cumprod(1.0 - alpha, axis=-1)  # inclusive
        trip = ok & (T_carry[..., None] * cp < T_EPS)
        done_inc = done[..., None] | (jnp.cumsum(trip.astype(jnp.int32), -1) > 0)

        # Frozen semantics: zero alphas at/after the trip, recompute.
        alpha_eff = jnp.where(done_inc, 0.0, alpha)
        one_m = 1.0 - alpha_eff
        cp_eff = jnp.cumprod(one_m, axis=-1)  # inclusive
        T_before = T_carry[..., None] * (cp_eff / one_m)  # exclusive; 1-a >= 0.01
        w = T_before * alpha_eff  # (T, 256, K)
        color_acc = jnp.einsum(
            "tpk,tkc->tpc", w, col, preferred_element_type=jnp.float32
        )

        new_T = T_carry * cp_eff[..., -1]
        new_done = done_inc[..., -1]
        return (new_T, new_done), color_acc

    shape = (num_tiles, TILE * TILE)
    init = (jnp.ones(shape, jnp.float32), jnp.zeros(shape, bool))
    (T_final, done_final), color_chunks = jax.lax.scan(
        step, init, jnp.arange(n_rounds, dtype=jnp.int32)
    )
    tile_colors = color_chunks.sum(axis=0)  # (T, 256, 3)
    overflow = jnp.maximum(count - n_rounds * chunk, 0)
    live = ~jnp.all(done_final, axis=1)  # some pixel still accumulating
    num_tile_capped = jnp.sum(jnp.where(live, overflow, 0))
    return tile_colors, T_final, num_tile_capped


def assemble_image(tile_colors, tile_T, bg, tiles_x, tiles_y, width, height):
    """(T, 256, 3) tiles -> (H, W, 3) image with background compositing.

    ``out = C + T * bg`` as in the CUDA render kernel's epilogue.
    """
    c = tile_colors + tile_T[..., None] * bg[None, None, :]
    c = c.reshape(tiles_y, tiles_x, TILE, TILE, 3)
    c = c.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE, tiles_x * TILE, 3)
    t = tile_T.reshape(tiles_y, tiles_x, TILE, TILE)
    t = t.transpose(0, 2, 1, 3).reshape(tiles_y * TILE, tiles_x * TILE)
    return c[:height, :width], t[:height, :width]
