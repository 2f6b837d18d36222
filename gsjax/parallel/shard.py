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
from gsjax.ops.binning import build_tile_bins
from gsjax.ops.composite import assemble_image, composite_tiles
from gsjax.ops.projection import TILE, num_tiles, preprocess
from gsjax.ops.rasterize import RasterizeSettings
from gsjax.train.loss import _window


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
    num_dropped, num_mt_capped, num_tile_capped). Strip row offset =
    axis_index * strips_y tiles.
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
    )
    g = lax.axis_index(axis)
    alls = jax.tree.map(
        lambda x: lax.all_gather(x, axis, axis=0, tiled=True), splats
    )

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
        local, tiles_x, strips_y, max(settings.max_pairs // gauss_size, 1024)
    )
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
            bins.num_mt_capped, tile_capped)


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
        strip, strip_T, _, _, _, _ = _render_strip(
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
    import optax


    data_size = mesh.shape["data"]
    gauss_size = mesh.shape["gauss"]
    width, height = cameras.width, cameras.height
    tiles_x, tiles_y = num_tiles(width, height)
    strips_y = _cdiv(tiles_y, gauss_size)
    strip_px = strips_y * TILE
    settings = cfg.settings
    bg_color = jnp.full(3, 1.0 if cfg.white_background else 0.0, jnp.float32)
    images = jnp.asarray(images)
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
            P(),  # tile-capped pairs (xla compositor truncation)
        ),
        check_vma=False,
    )
    def body(params, active, sh_degree, cam_idx, key, images_all):
        cam_i = cam_idx[0]
        camera = index_render_camera(cameras, cam_i)
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
            strip, _, radii, dropped, capped, tile_capped = _render_strip(
                params, active, sh_degree, camera, offset, bg,
                settings, strips_y, gauss_size,
            )
            strip = strip * row_valid[:, None, None]
            l1_sum = jnp.sum(jnp.abs(strip - gt_strip) * row_valid[:, None, None])
            ssim_sum = _ssim_partial_sum(strip, gt_strip, row_valid, "gauss")
            partial = ((1.0 - lam) * l1_sum - lam * ssim_sum) / n_pix
            return partial, (l1_sum, radii, dropped, capped, tile_capped)

        offset = jnp.zeros((params["xyz"].shape[0], 2))
        (partial, (l1_sum, radii, dropped, capped, tile_capped)), (g_params, g_offset) = (
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
        dropped = lax.psum(dropped, ("data",))
        capped = lax.psum(capped, ("data",))
        tile_capped = lax.psum(tile_capped, ("data", "gauss"))

        # densification stats: accumulate over all cameras in the batch
        visible = radii > 0
        g_ndc = g_offset * jnp.array([width / 2.0, height / 2.0])
        norm_inc = lax.psum(
            jnp.where(visible, jnp.linalg.norm(g_ndc, axis=-1), 0.0), "data"
        )
        denom_inc = lax.psum(visible.astype(jnp.float32), "data")
        radii_max = lax.pmax(radii, "data")

        return (loss, g_params, norm_inc, denom_inc, radii_max, l1, dropped,
                capped, tile_capped)

    @jax.jit
    def step(state: GaussianState, opt_state, cam_idx, key):
        keys = jax.random.split(key, data_size)
        (loss, g_params, norm_inc, denom_inc, radii_max, l1, dropped, capped,
         tile_capped) = body(
            state.params,
            state.active,
            state.active_sh_degree,
            cam_idx,
            keys,
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
            "num_tile_capped": tile_capped,
            "num_active": new_state.num_active,
        }
        return new_state, new_opt_state, metrics

    return step
