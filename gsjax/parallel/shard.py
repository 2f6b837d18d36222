"""Gaussian-sharded, tile-strip-distributed rendering and training.

Strategy (SURVEY.md §2.3 / §5.7, BASELINE.json north_star):

* **Preprocess is model-parallel**: each chip runs culling / EWA / SH on its
  shard of the Gaussian buffers (axis ``gauss``).
* **Splat exchange**: the compact screen-space splats (2D mean, conic, color,
  opacity, depth, tile rect — ~16 floats each) are ``all_gather``-ed over
  ICI; raw parameters and optimizer state never move.
* **Compositing is tile-parallel**: each chip bins and blends only its
  horizontal *strip* of 16-px tile rows, with the tile rectangles re-clipped
  to the strip, so sort + blend work and the pair budget split G ways.
* **Loss is computed in place**: L1 partial sums per strip; SSIM runs on the
  strip extended by a 5-row halo exchanged via ``ppermute`` (zero fill at the
  global borders, matching the reference's zero-padded 11x11 window), then
  ``psum`` over ``gauss``. Nothing ever materializes the full image during
  training.
* **Data parallelism**: a second mesh axis ``data`` renders a different
  camera per index; parameter gradients are ``pmean``-ed and densification
  statistics ``psum``-ed across it.

The backward pass needs no hand-written collectives: the transpose of
``all_gather`` is ``psum_scatter``, so each chip automatically receives
exactly the gradients of its own Gaussians.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gsjax.data.cameras import RenderCamera, index_render_camera
from gsjax.models.gaussians import GaussianState, activated_params
from gsjax.ops.binning import build_tile_bins, slot_layout_of
from gsjax.ops.composite import assemble_image, composite_tiles
from gsjax.ops.projection import TILE, num_tiles, preprocess
from gsjax.ops.rasterize import RasterizeSettings
from gsjax.train.loss import _window
from gsjax.utils.system import to_device_chunked


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# sharding of the state pytree
# ---------------------------------------------------------------------------


def state_pspecs(state: GaussianState):
    """PartitionSpecs: per-Gaussian arrays sharded over ``gauss``."""
    row = P("gauss")
    return dataclasses.replace(
        state,
        params={k: row for k in state.params},
        active=row,
        max_radii2d=row,
        xyz_grad_accum=row,
        denom=row,
        active_sh_degree=P(),
    )


def shard_gaussian_state(state: GaussianState, mesh: Mesh) -> GaussianState:
    """Place the state on the mesh (params row-sharded, scalars replicated)."""
    specs = state_pspecs(state)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state,
        specs,
    )


# ---------------------------------------------------------------------------
# splat exchange (runs inside shard_map)
# ---------------------------------------------------------------------------


def _exchange_splats(splats, strips_y: int, gauss_size: int, k_rows: int,
                     axis: str = "gauss"):
    """Route each visible splat only to the chips owning the tile strips its
    rect overlaps — ``lax.all_to_all`` instead of ``all_gather`` (SURVEY.md
    §5.7). Per-chip memory downstream becomes O(gauss_size * k_rows)
    instead of O(N): the receiver bins/blends at most ``gauss_size *
    k_rows`` candidates regardless of the global splat count.

    Compaction is one small stable sort per chip: expand each splat to its
    <= S_MAX destination strips, sort (dst, idx), and slice each dst's
    segment into a fixed (gauss_size, k_rows) send buffer. Send overflow
    (segment longer than ``k_rows``, or a splat spanning > S_MAX strips) is
    truncated and counted — the caller surfaces it like the pair budget.

    Returns (received Splats with ``gauss_size * k_rows`` rows — invalid
    rows have ``tiles_touched == 0`` — and this chip's dropped-send count).
    Gradients flow through the f32 fields: the transpose of the gather is
    a scatter-add into the local shard, and all_to_all transposes to the
    reverse all_to_all.
    """
    from gsjax.ops.projection import Splats

    n = splats.depths.shape[0]
    g_sz = gauss_size
    S_MAX = 4
    visible = splats.tiles_touched > 0
    dst_lo = jnp.clip(splats.rect_min[:, 1] // strips_y, 0, g_sz - 1)
    dst_hi = jnp.clip((splats.rect_max[:, 1] - 1) // strips_y, 0, g_sz - 1)
    n_dst = jnp.where(visible, dst_hi - dst_lo + 1, 0)
    over_span = jnp.sum(jnp.maximum(n_dst - S_MAX, 0))
    n_dst = jnp.minimum(n_dst, S_MAX)

    j = jnp.arange(S_MAX, dtype=jnp.int32)[None, :]
    dst = dst_lo[:, None] + j  # (n, S_MAX)
    valid = j < n_dst[:, None]
    key = jnp.where(valid, dst, g_sz).astype(jnp.int32)
    idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, S_MAX)
    )
    key_s, idx_s = jax.lax.sort(
        (key.reshape(-1), idx.reshape(-1)), num_keys=1, is_stable=True
    )
    seg = jnp.searchsorted(
        key_s, jnp.arange(g_sz + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)  # (g_sz + 1,) segment bounds per dst (g_sz = pad)

    kk = jnp.arange(k_rows, dtype=jnp.int32)[None, :]
    pos = seg[:g_sz, None] + kk  # (g_sz, k_rows)
    valid_out = (pos < seg[1:, None]).reshape(-1)
    rows = idx_s[jnp.clip(pos.reshape(-1), 0, n * S_MAX - 1)]
    seg_len = seg[1:] - seg[:-1]
    dropped = over_span + jnp.sum(jnp.maximum(seg_len - k_rows, 0))

    f32 = jnp.concatenate(
        [splats.means2d, splats.conics, splats.colors,
         splats.opacities[:, None], splats.depths[:, None]], axis=1
    )  # (n, 10)
    i32 = jnp.concatenate([splats.rect_min, splats.rect_max], axis=1)
    send_f = jnp.where(valid_out[:, None], f32[rows], 0.0)
    send_i = jnp.where(valid_out[:, None], i32[rows], 0)
    send_t = valid_out.astype(jnp.int32)
    recv_f = lax.all_to_all(send_f, axis, split_axis=0, concat_axis=0,
                            tiled=True)
    recv_i = lax.all_to_all(send_i, axis, split_axis=0, concat_axis=0,
                            tiled=True)
    recv_t = lax.all_to_all(send_t, axis, split_axis=0, concat_axis=0,
                            tiled=True)
    received = Splats(
        means2d=recv_f[:, 0:2],
        depths=recv_f[:, 9],
        conics=recv_f[:, 2:5],
        colors=recv_f[:, 5:8],
        opacities=recv_f[:, 8],
        radii=recv_t,  # not meaningful post-exchange; stats use local radii
        rect_min=recv_i[:, 0:2],
        rect_max=recv_i[:, 2:4],
        tiles_touched=recv_t,
    )
    return received, dropped


def _a2a_rows_auto(n_local: int, gauss_size: int, a2a_rows: int) -> int:
    """4x the uniform per-destination share, 128-aligned, unless pinned."""
    if a2a_rows:
        return a2a_rows
    return max(128, _cdiv(4 * n_local, gauss_size * 128) * 128)


# ---------------------------------------------------------------------------
# strip renderer (runs inside shard_map)
# ---------------------------------------------------------------------------


def _render_strip(
    params_shard,
    active_shard,
    sh_degree,
    camera: RenderCamera,
    offset_shard,
    bg,
    settings: RasterizeSettings,
    strips_y: int,
    gauss_size: int,
    axis: str = "gauss",
):
    """Render this chip's tile strip from all chips' splats.

    Returns (strip_image (strips_y*16, W, 3), strip_T, radii_shard,
    num_dropped, num_mt_capped, num_tier_capped, num_tile_capped,
    num_exchange_dropped).
    Strip row offset = axis_index * strips_y tiles.
    """
    tiles_x, _ = num_tiles(camera.width, camera.height)
    means3d, scales, quats, opac, shs = activated_params(params_shard)
    splats = preprocess(
        means3d,
        scales,
        quats,
        opac,
        shs,
        camera,
        sh_degree,
        active_mask=active_shard,
        means2d_offset=offset_shard,
        opacity_aware_radius=settings.opacity_aware_radius,
    )
    g = lax.axis_index(axis)
    if settings.splat_exchange == "a2a":
        k_rows = _a2a_rows_auto(
            splats.depths.shape[0], gauss_size, settings.a2a_rows
        )
        alls, exch_dropped = _exchange_splats(
            splats, strips_y, gauss_size, k_rows, axis
        )
    else:
        alls = jax.tree.map(
            lambda x: lax.all_gather(x, axis, axis=0, tiled=True), splats
        )
        exch_dropped = jnp.int32(0)

    # clip tile rects to this strip (strip-local y)
    y0 = g * strips_y
    rmin_y = jnp.clip(alls.rect_min[:, 1] - y0, 0, strips_y)
    rmax_y = jnp.clip(alls.rect_max[:, 1] - y0, 0, strips_y)
    w = alls.rect_max[:, 0] - alls.rect_min[:, 0]
    h = rmax_y - rmin_y
    local_tiles = jnp.where(alls.tiles_touched > 0, w * h, 0)
    local = alls._replace(
        rect_min=jnp.stack([alls.rect_min[:, 0], rmin_y], axis=1),
        rect_max=jnp.stack([alls.rect_max[:, 0], rmax_y], axis=1),
        tiles_touched=local_tiles,
    )
    bins = build_tile_bins(
        local, tiles_x, strips_y, max(settings.max_pairs // gauss_size, 1024),
        max_tiles_per_gauss=settings.max_tiles_per_gauss,
        tier_frac=settings.tier_frac,
        expansion=settings.expansion,
    )
    backend = settings.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        from gsjax.ops.pallas_composite import composite_pallas

        # the kernel derives pixel coords from the strip-local tile index;
        # shifting mean_y down by the strip origin is equivalent to global
        # pixel coords (dx/dy invariant), and costs no kernel change. The
        # constant shift leaves d_means2d untouched.
        shifted = alls.means2d - jnp.stack(
            [jnp.float32(0.0), (y0 * TILE).astype(jnp.float32)]
        )
        tile_colors, tile_T = composite_pallas(
            shifted, alls.conics, alls.colors, alls.opacities,
            bins.pair_gauss, bins.pair_slot, bins.tile_start,
            bins.gauss_count, bins.mt, tiles_x, strips_y,
            settings.pallas_chunk, grad_dtype=settings.grad_dtype,
            grad_reduce=settings.grad_reduce,
            gauss_inv_perm=bins.gauss_inv_perm,
            slot_layout=slot_layout_of(settings.expansion),
        )
        tile_capped = jnp.int32(0)  # the pallas kernel never truncates
    else:
        tile_colors, tile_T, tile_capped = composite_tiles(
            bins.pair_gauss,
            bins.tile_start,
            alls.means2d,
            alls.conics,
            alls.colors,
            alls.opacities,
            tiles_x,
            strips_y,
            settings.max_splats_per_tile,
            settings.chunk,
            pixel_origin=(0.0, (y0 * TILE).astype(jnp.float32)),
        )
    strip_img, strip_T = assemble_image(
        tile_colors, tile_T, bg, tiles_x, strips_y, camera.width, strips_y * TILE
    )
    return (strip_img, strip_T, splats.radii, bins.num_dropped,
            bins.num_mt_capped, bins.num_tier_capped, tile_capped,
            exch_dropped)


# ---------------------------------------------------------------------------
# strip losses (partial sums + halo-exchanged SSIM)
# ---------------------------------------------------------------------------


def _halo_exchange_rows(x, halo: int, axis: str):
    """Attach ``halo`` rows from the previous/next shard along ``axis``.

    x: (rows, ...). Edge shards receive zeros — identical to the zero
    padding a single-device 'same' convolution sees at image borders.
    """
    n = lax.axis_size(axis)
    down = [(i, i + 1) for i in range(n - 1)]  # my bottom rows -> next's top
    up = [(i + 1, i) for i in range(n - 1)]  # my top rows -> prev's bottom
    top_halo = lax.ppermute(x[-halo:], axis, down)
    bot_halo = lax.ppermute(x[:halo], axis, up)
    return jnp.concatenate([top_halo, x, bot_halo], axis=0)


def _ssim_partial_sum(img_strip, gt_strip, row_valid, axis: str):
    """Sum of the SSIM map over this strip's valid pixels (11x11, sigma 1.5,
    semantics of gsjax.train.loss.ssim / reference utils/loss_utils.py:43-58).
    """
    halo = 5
    x = img_strip * row_valid[:, None, None]
    y = gt_strip * row_valid[:, None, None]
    xe = _halo_exchange_rows(x, halo, axis)
    ye = _halo_exchange_rows(y, halo, axis)
    stacked = jnp.concatenate(
        [
            jnp.moveaxis(t, -1, 0)
            for t in (xe, ye, xe * xe, ye * ye, xe * ye)
        ],
        axis=0,
    )  # (15, rows + 2*halo, W)
    w2d = jnp.asarray(_window(11, 1.5))
    kernel = jnp.broadcast_to(w2d, (15, 1, 11, 11))
    f = lax.conv_general_dilated(
        stacked[None],
        kernel,
        (1, 1),
        [(halo, halo), (halo, halo)],
        feature_group_count=15,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0][:, halo:-halo, :]
    # rows: extended conv output ('same' over strip+2*halo rows) cropped back
    # to the strip interior — out[j + halo] is the window centered at strip
    # row j
    mu1, mu2, exx, eyy, exy = (f[i * 3 : (i + 1) * 3] for i in range(5))
    c1, c2 = 0.01**2, 0.03**2
    mu12 = mu1 * mu2
    s12 = exy - mu12
    s11 = exx - mu1 * mu1
    s22 = eyy - mu2 * mu2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (s11 + s22 + c2)
    )
    return jnp.sum(ssim_map * row_valid[None, :, None])


# ---------------------------------------------------------------------------
# public builders
# ---------------------------------------------------------------------------


def make_sharded_render(
    mesh: Mesh, settings: RasterizeSettings, width: int, height: int
):
    """Jitted gaussian-sharded renderer: (state, camera pytree, bg) -> image.

    Uses the full ``gauss`` axis; the ``data`` axis (if >1) replicates.
    """
    gauss_size = mesh.shape["gauss"]
    tiles_x, tiles_y = num_tiles(width, height)
    strips_y = _cdiv(tiles_y, gauss_size)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("gauss"), P("gauss"), P(), P(), P()),
        out_specs=(P("gauss"), P("gauss")),
        check_vma=False,
    )
    def body(params, active, sh_degree, camera, bg):
        offset = jnp.zeros((params["xyz"].shape[0], 2))
        strip, strip_T, _, _, _, _, _, _ = _render_strip(
            params, active, sh_degree, camera, offset, bg,
            settings, strips_y, gauss_size,
        )
        return strip, strip_T

    @jax.jit
    def render_fn(state: GaussianState, camera: RenderCamera, bg):
        img, img_T = body(
            state.params, state.active, state.active_sh_degree, camera, bg
        )
        return img[:height], img_T[:height]

    return render_fn


def make_sharded_train_step(
    tx,
    mesh: Mesh,
    cameras: RenderCamera,  # stacked (M views), replicated
    images,  # (M, H, W, 3) uint8/float, replicated
    cfg,  # gsjax.train.step.TrainConfig
):
    """Build the multi-chip train step.

    step(state, opt_state, cam_idx (data,), key) -> (state, opt_state,
    metrics). Each ``data`` row trains on its own camera; Gaussians and tile
    strips shard over ``gauss``.
    """
    impl = _make_sharded_step_impl(tx, mesh, cameras, cfg)
    images = to_device_chunked(images)
    jimpl = jax.jit(impl)

    # cameras/images go in as ARGUMENTS: multi-process global arrays may
    # not be closed over (they span non-addressable devices)
    def step(state: GaussianState, opt_state, cam_idx, key):
        return jimpl(state, opt_state, cam_idx, key, cameras, images)

    return _attach_lower(step, jimpl, cameras, images)


def make_sharded_train_step_chained(
    tx,
    mesh: Mesh,
    cameras: RenderCamera,
    images,
    cfg,
    n_steps: int,
):
    """``n_steps`` sharded train steps in ONE dispatch: a lax.scan over the
    full dp x gauss step, restoring the ~30ms-RTT amortization the
    single-device path gets from make_train_step_chained
    (gsjax/train/step.py:249-299).

    step(state, opt_state, cam_idxs (n_steps, data), key) ->
        (state, opt_state, last-step metrics + "loss_mean")
    """
    impl = _make_sharded_step_impl(tx, mesh, cameras, cfg)
    images = to_device_chunked(images)

    def chained_impl(state, opt_state, cam_idxs, key, cams, images_arg):
        def body(carry, x):
            st, opt = carry
            i, cam_idx = x
            k = jax.random.fold_in(key, i)
            st, opt, metrics = impl(st, opt, cam_idx, k, cams, images_arg)
            return (st, opt), metrics

        (state, opt_state), ms = jax.lax.scan(
            body,
            (state, opt_state),
            (jnp.arange(n_steps, dtype=jnp.int32), cam_idxs),
        )
        metrics = jax.tree.map(lambda a: a[-1], ms)
        metrics["loss_mean"] = jnp.mean(ms["loss"])
        metrics["num_dropped_pairs"] = jnp.max(ms["num_dropped_pairs"])
        metrics["num_mt_capped_pairs"] = jnp.max(ms["num_mt_capped_pairs"])
        metrics["num_tier_capped_pairs"] = jnp.max(ms["num_tier_capped_pairs"])
        metrics["num_tile_capped"] = jnp.max(ms["num_tile_capped"])
        metrics["num_exchange_dropped"] = jnp.max(ms["num_exchange_dropped"])
        metrics["num_budget_dropped"] = jnp.max(
            ms["num_dropped_pairs"] - ms["num_mt_capped_pairs"]
        )
        # pre-difference per inner step (see make_train_step_chained)
        metrics["num_mt_only_capped"] = jnp.max(
            ms["num_mt_capped_pairs"] - ms["num_tier_capped_pairs"]
        )
        return state, opt_state, metrics

    jchained = jax.jit(chained_impl)

    def step(state, opt_state, cam_idxs, key):
        return jchained(state, opt_state, cam_idxs, key, cameras, images)

    return _attach_lower(step, jchained, cameras, images)


def _attach_lower(step, jfn, cameras, images):
    """AOT support for the CapacityWarmer (gsjax/train/loop.py): the
    wrapper hides the trailing cameras/images arguments, so expose a
    4-arg ``.lower`` whose compiled executable re-appends them — without
    it the background capacity warm cannot precompile sharded steps."""

    class _Lowered:
        def __init__(self, lowered):
            self._lowered = lowered

        def compile(self):
            compiled = self._lowered.compile()
            return lambda s, o, c, k: compiled(s, o, c, k, cameras, images)

    def lower(state_abs, opt_abs, cam_abs, key_abs):
        return _Lowered(
            jfn.lower(state_abs, opt_abs, cam_abs, key_abs, cameras, images)
        )

    step.lower = lower
    return step


def _make_sharded_step_impl(tx, mesh: Mesh, cameras: RenderCamera, cfg):
    """Unjitted single sharded step: (state, opt_state, cam_idx (data,),
    key, cameras, images) -> (state, opt_state, metrics). ``cameras`` is
    passed both here (for the static W/H fields) and at call time (for the
    array leaves)."""
    import optax

    data_size = mesh.shape["data"]
    gauss_size = mesh.shape["gauss"]
    width, height = cameras.width, cameras.height
    tiles_x, tiles_y = num_tiles(width, height)
    strips_y = _cdiv(tiles_y, gauss_size)
    strip_px = strips_y * TILE
    settings = cfg.settings
    bg_color = jnp.full(3, 1.0 if cfg.white_background else 0.0, jnp.float32)
    n_pix = height * width * 3

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P("gauss"),  # params
            P("gauss"),  # active
            P(),  # sh_degree
            P("data"),  # cam_idx
            P("data"),  # key (per data row)
            P(),  # cameras (replicated)
            P(),  # images (replicated)
        ),
        out_specs=(
            P(),  # loss
            P("gauss"),  # grads
            P("gauss"),  # grad stats (norm sums)
            P("gauss"),  # denom increments
            P("gauss"),  # radii max
            P(),  # l1
            P(),  # dropped pairs
            P(),  # mt-capped pairs
            P(),  # tier-capped pairs (small-tier slot overflow)
            P(),  # tile-capped pairs (xla compositor truncation)
            P(),  # exchange-dropped splats (a2a send overflow)
        ),
        check_vma=False,
    )
    def body(params, active, sh_degree, cam_idx, key, cams_all, images_all):
        cam_i = cam_idx[0]
        camera = index_render_camera(cams_all, cam_i)
        gt = images_all[cam_i]
        if gt.dtype == jnp.uint8:
            gt = gt.astype(jnp.float32) / 255.0
        bg = (
            jax.random.uniform(key[0], (3,))
            if cfg.random_background
            else bg_color
        )

        g = lax.axis_index("gauss")
        row0 = g * strip_px
        rows = row0 + jnp.arange(strip_px)
        row_valid = (rows < height).astype(jnp.float32)
        gt_pad = jnp.pad(gt, ((0, gauss_size * strip_px - height), (0, 0), (0, 0)))
        gt_strip = lax.dynamic_slice(
            gt_pad, (row0, 0, 0), (strip_px, width, 3)
        )

        lam = cfg.lambda_dssim

        def local_loss(params, offset):
            """Per-device *partial* of the global loss. Differentiating the
            partial (not the psum'd scalar) keeps gradients exact: the
            transpose of all_gather (psum_scatter) already sums every
            strip's contribution into the owning shard, and psum-of-a-
            replicated-seed would otherwise inflate grads by the axis size.

            loss = (1-lam)*L1 + lam*(1-SSIM) = psum(partial) + lam, with
            partial = ((1-lam)*l1_sum - lam*ssim_sum) / n_pix.
            """
            (strip, _, radii, dropped, capped, tier_capped, tile_capped,
             exch_dropped) = _render_strip(
                params, active, sh_degree, camera, offset, bg,
                settings, strips_y, gauss_size,
            )
            strip = strip * row_valid[:, None, None]
            l1_sum = jnp.sum(jnp.abs(strip - gt_strip) * row_valid[:, None, None])
            ssim_sum = _ssim_partial_sum(strip, gt_strip, row_valid, "gauss")
            partial = ((1.0 - lam) * l1_sum - lam * ssim_sum) / n_pix
            return partial, (l1_sum, radii, dropped, capped, tier_capped,
                             tile_capped, exch_dropped)

        offset = jnp.zeros((params["xyz"].shape[0], 2))
        ((partial, (l1_sum, radii, dropped, capped, tier_capped, tile_capped,
                    exch_dropped)), (g_params, g_offset)) = (
            jax.value_and_grad(local_loss, argnums=(0, 1), has_aux=True)(
                params, offset
            )
        )
        loss = lax.psum(partial, "gauss") + lam
        l1 = lax.psum(l1_sum, "gauss") / n_pix

        # reduce across the camera batch
        g_params = lax.pmean(g_params, "data")
        loss = lax.pmean(loss, "data")
        l1 = lax.pmean(l1, "data")
        # every overflow counter is per-chip: each gauss chip bins its own
        # tile strip, so reduce over BOTH axes or the trainer only sees
        # gauss-chip 0's strip and never reacts to overflow elsewhere
        dropped = lax.psum(dropped, ("data", "gauss"))
        capped = lax.psum(capped, ("data", "gauss"))
        tier_capped = lax.psum(tier_capped, ("data", "gauss"))
        tile_capped = lax.psum(tile_capped, ("data", "gauss"))
        exch_dropped = lax.psum(exch_dropped, ("data", "gauss"))

        # densification stats: accumulate over all cameras in the batch
        visible = radii > 0
        g_ndc = g_offset * jnp.array([width / 2.0, height / 2.0])
        norm_inc = lax.psum(
            jnp.where(visible, jnp.linalg.norm(g_ndc, axis=-1), 0.0), "data"
        )
        denom_inc = lax.psum(visible.astype(jnp.float32), "data")
        radii_max = lax.pmax(radii, "data")

        return (loss, g_params, norm_inc, denom_inc, radii_max, l1, dropped,
                capped, tier_capped, tile_capped, exch_dropped)

    def step(state: GaussianState, opt_state, cam_idx, key, cams, images):
        keys = jax.random.split(key, data_size)
        (loss, g_params, norm_inc, denom_inc, radii_max, l1, dropped, capped,
         tier_capped, tile_capped, exch_dropped) = body(
            state.params,
            state.active,
            state.active_sh_degree,
            cam_idx,
            keys,
            cams,
            images,
        )
        updates, new_opt_state = tx.update(g_params, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        visible = radii_max > 0
        new_state = dataclasses.replace(
            state,
            params=new_params,
            max_radii2d=jnp.where(
                visible,
                jnp.maximum(state.max_radii2d, radii_max.astype(jnp.float32)),
                state.max_radii2d,
            ),
            xyz_grad_accum=state.xyz_grad_accum + norm_inc,
            denom=state.denom + denom_inc,
        )
        metrics = {
            "loss": loss,
            "l1": l1,
            "num_dropped_pairs": dropped,
            "num_mt_capped_pairs": capped,
            "num_tier_capped_pairs": tier_capped,
            "num_tile_capped": tile_capped,
            "num_exchange_dropped": exch_dropped,
            "num_active": new_state.num_active,
        }
        return new_state, new_opt_state, metrics

    return step
