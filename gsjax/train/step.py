"""The jitted train step and render helpers.

One compiled XLA program per resolution covers the whole run: camera
selection (``lax`` indexing into a stacked camera batch), rendering, loss,
backward, Adam update, and densification bookkeeping all happen on device.
The reference runs this loop in Python with a CUDA kernel in the middle
(reference: train.py:51-128).

Gradient-stat plumbing: instead of the reference's zero-tensor
``retain_grad`` hack, the loss takes an explicit zero ``means2d_offset``
argument; its gradient is the per-Gaussian screen-space gradient consumed by
densification (SURVEY.md §7.0 item 3).

Semantic delta vs the reference, now selectable: on densification
iterations the reference silently discards that iteration's gradients
(its tensor surgery rebuilds parameters — fresh ``.grad=None`` tensors —
before ``optimizer.step()``, reference train.py:118-128); gsjax applies
every gradient step by default. ``training(densify_iter_grad="discard")``
reproduces the reference behavior exactly via the step's traced
``apply_update`` flag (densification *stats* still accumulate either way,
matching reference train.py:115-117 which runs before the surgery).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gsjax.configs import OptimizationParams
from gsjax.data.cameras import RenderCamera, index_render_camera
from gsjax.models.densify import (
    DensifyConfig,
    add_densification_stats,
    densify_and_prune,
    reset_opacity,
)
from gsjax.models.gaussians import GaussianState, activated
from gsjax.ops.rasterize import RasterizeSettings, render
from gsjax.train.loss import l1_loss, ssim
from gsjax.train.optim import adam_moments, with_adam_moments
from gsjax.utils.system import to_device_chunked


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    settings: RasterizeSettings = RasterizeSettings()
    lambda_dssim: float = 0.2
    white_background: bool = False
    random_background: bool = False
    extent: float = 1.0  # scene radius (cameras_extent)
    # the reference's dual-path toggles (PipelineParams; reference
    # gaussian_renderer/__init__.py:62-80): pre-compute covariance / SH->RGB
    # outside the rasterizer instead of inside its preprocess
    compute_cov3d_python: bool = False
    convert_shs_python: bool = False


def _activated_from(params):
    from gsjax.utils.math import safe_normalize

    scales = jnp.exp(params["scaling"])
    quats = safe_normalize(params["rotation"])
    opac = jax.nn.sigmoid(params["opacity"][:, 0])
    shs = jnp.concatenate([params["features_dc"], params["features_rest"]], axis=1)
    return params["xyz"], scales, quats, opac, shs


def render_state(
    state: GaussianState,
    camera: RenderCamera,
    bg,
    settings: RasterizeSettings,
    *,
    scale_modifier=1.0,
    sh_degree=None,
    means2d_offset=None,
):
    """Render the active Gaussians of ``state`` through ``camera``."""
    means3d, scales, quats, opac, shs = activated(state)
    return render(
        camera,
        means3d,
        scales,
        quats,
        opac,
        shs,
        state.active_sh_degree if sh_degree is None else sh_degree,
        bg,
        settings,
        scale_modifier=scale_modifier,
        active_mask=state.active,
        means2d_offset=means2d_offset,
    )


def make_render_fn(
    cfg: TrainConfig, with_stats: bool = False, as_uint8: bool = False
):
    """A jitted (state, camera, bg) -> image function for eval/viewer use.

    ``as_uint8=True`` quantizes to uint8 ON DEVICE before the result leaves
    the chip — a 4x device->host transfer cut (24.9MB -> 6.2MB per 1080p
    frame) that is the difference between tunnel-bound and interactive for
    a remote-attached viewer, and saves the host a full-frame f32
    clip/scale pass either way.

    ``scale_modifier`` is a traced scalar (the viewer slider changes it per
    request without recompiling); the ``shs_python`` / ``cov3d_python``
    dual-path toggles are static — each combination compiles once on first
    use, matching the reference's live ``pipe`` mutation from the wire
    message (reference train.py:57-60, network_gui.py:70-73).

    ``with_stats=True`` returns ``(image, num_dropped)`` instead — the
    pair-drop counter inference callers (render.py, render_bench.py) must
    check: the trainer reacts to overflow and regrows budgets, inference
    has no reaction, so an unprobed view exceeding the probe headroom
    would otherwise silently darken renders (ADVICE r3 medium #2; the
    reference CUDA rasterizer allocates per frame and never drops)."""

    @functools.partial(
        jax.jit, static_argnames=("shs_python", "cov3d_python")
    )
    def render_fn(
        state: GaussianState,
        camera: RenderCamera,
        bg,
        scale_modifier=1.0,
        *,
        shs_python: bool = False,
        cov3d_python: bool = False,
    ):
        means3d, scales, quats, opac, shs = activated(state)
        cov3d = colors = None
        if cov3d_python:
            from gsjax.utils.math import build_covariance, strip_symmetric

            cov3d = strip_symmetric(
                build_covariance(scales, quats, scale_modifier)
            )
        if shs_python:
            from gsjax.utils.math import safe_normalize
            from gsjax.utils.sh import eval_sh

            dirs = safe_normalize(means3d - camera.camera_center[None, :])
            colors = jnp.maximum(
                eval_sh(shs, dirs, state.active_sh_degree) + 0.5, 0.0
            )
        out = render(
            camera,
            means3d,
            scales,
            quats,
            opac,
            shs,
            state.active_sh_degree,
            bg,
            cfg.settings,
            scale_modifier=scale_modifier,
            active_mask=state.active,
            cov3d_precomp=cov3d,
            colors_precomp=colors,
        )
        img = out["render"]
        if as_uint8:
            img = jnp.clip(
                img * 255.0 + 0.5, 0.0, 255.0
            ).astype(jnp.uint8)
        if with_stats:
            return img, out["num_dropped"]
        return img

    return render_fn


def _train_step_body(
    tx, cameras, images, cfg: TrainConfig, bg_color,
    state: GaussianState, opt_state, cam_idx, key, apply_update=None,
):
    camera = index_render_camera(cameras, cam_idx)
    gt = images[cam_idx]
    if gt.dtype == jnp.uint8:
        gt = gt.astype(jnp.float32) / 255.0
    bg = (
        jax.random.uniform(key, (3,))
        if cfg.random_background
        else bg_color
    )
    offset = jnp.zeros((state.capacity, 2))

    def loss_fn(params, offset):
        means3d, scales, quats, opac, shs = _activated_from(params)
        cov3d = colors = None
        if cfg.compute_cov3d_python:
            from gsjax.utils.math import build_covariance, strip_symmetric

            cov3d = strip_symmetric(build_covariance(scales, quats, 1.0))
        if cfg.convert_shs_python:
            from gsjax.utils.sh import eval_sh

            from gsjax.utils.math import safe_normalize

            dirs = safe_normalize(means3d - camera.camera_center[None, :])
            colors = jnp.maximum(
                eval_sh(shs, dirs, state.active_sh_degree) + 0.5, 0.0
            )
        out = render(
            camera,
            means3d,
            scales,
            quats,
            opac,
            shs,
            state.active_sh_degree,
            bg,
            cfg.settings,
            active_mask=state.active,
            means2d_offset=offset,
            cov3d_precomp=cov3d,
            colors_precomp=colors,
        )
        img = out["render"]
        ll1 = l1_loss(img, gt)
        loss = (1.0 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * (
            1.0 - ssim(img, gt)
        )
        return loss, (out, ll1)

    (loss, (out, ll1)), (g_params, g_offset) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(state.params, offset)

    updates, new_opt_state = tx.update(g_params, opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    if apply_update is not None:
        # reference-exact densify-iteration semantics: when the flag is
        # False the whole Adam application (params AND moments/count) is
        # dropped, exactly as torch's step() with grad=None tensors after
        # the reference's densify surgery (reference train.py:118-128)
        keep = jnp.asarray(apply_update)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(keep, new, old),
            new_params, state.params,
        )
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(keep, new, old),
            new_opt_state, opt_state,
        )
    new_state = dataclasses.replace(state, params=new_params)
    new_state = add_densification_stats(
        new_state, g_offset, out["radii"], camera.width, camera.height
    )
    metrics = {
        "loss": loss,
        "l1": ll1,
        "num_dropped_pairs": out["num_dropped"],
        "num_mt_capped_pairs": out["num_mt_capped"],
        "num_tier_capped_pairs": out["num_tier_capped"],
        "num_tile_capped": out["num_tile_capped"],
        "num_active": new_state.num_active,
    }
    return new_state, new_opt_state, metrics


def make_train_step(
    tx: optax.GradientTransformation,
    cameras: RenderCamera,  # stacked batch (leading axis = view)
    images,  # (M, H, W, 3) float32 in [0,1] or uint8
    cfg: TrainConfig,
):
    """Build the jitted train step.

    step(state, opt_state, cam_idx, key[, apply_update]) ->
        (state, opt_state, metrics dict)

    ``apply_update`` (optional traced bool): False renders, accumulates
    densification stats and reports metrics but drops the Adam update —
    the reference's densify-iteration behavior (see module docstring).
    Omitting it compiles the select-free graph.
    """
    bg_color = jnp.full(3, 1.0 if cfg.white_background else 0.0, jnp.float32)
    # chunked transfer AND runtime argument: jit closure captures ship in
    # the remote compile payload (413/broken pipe at garden1m's ~400MB
    # image stack), so the stack enters through the argument list
    images = to_device_chunked(images)

    @jax.jit
    def _step(state: GaussianState, opt_state, cam_idx, key, imgs,
              apply_update=None):
        return _train_step_body(
            tx, cameras, imgs, cfg, bg_color, state, opt_state, cam_idx,
            key, apply_update,
        )

    def step(state, opt_state, cam_idx, key, apply_update=None):
        if apply_update is None:
            return _step(state, opt_state, cam_idx, key, images)
        return _step(state, opt_state, cam_idx, key, images, apply_update)

    return _attach_lower_images(step, _step, images)


def make_train_step_chained(
    tx: optax.GradientTransformation,
    cameras: RenderCamera,
    images,
    cfg: TrainConfig,
    n_steps: int,
):
    """A jitted scan over ``n_steps`` full train steps — one host dispatch.

    The per-dispatch host round trip (~30ms through the device tunnel)
    otherwise dominates the step time; the reference has no analogue
    because CUDA launches are ~10us. Densification, SH ramps, eval and
    checkpoints happen at chunk boundaries, so the driver only uses this
    for event-free iteration ranges.

    step(state, opt_state, cam_idxs (n_steps,), key) ->
        (state, opt_state, metrics of last step + "loss_mean")
    """
    bg_color = jnp.full(3, 1.0 if cfg.white_background else 0.0, jnp.float32)
    images = to_device_chunked(images)  # runtime arg, see make_train_step

    @jax.jit
    def _chained(state: GaussianState, opt_state, cam_idxs, key, imgs):
        def body(carry, x):
            state, opt_state = carry
            i, cam_idx = x
            k = jax.random.fold_in(key, i)
            state, opt_state, metrics = _train_step_body(
                tx, cameras, imgs, cfg, bg_color, state, opt_state, cam_idx, k
            )
            return (state, opt_state), metrics

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
        # budget drops must be differenced per inner step, then reduced:
        # max(dropped) - max(capped) across different steps can read 0 even
        # when one step dropped pairs to the global budget
        metrics["num_budget_dropped"] = jnp.max(
            ms["num_dropped_pairs"] - ms["num_mt_capped_pairs"]
        )
        # same for the mt-cap share not explained by the tier cap: a step
        # with pure mt overflow must not be masked by another step's
        # equal-sized tier overflow
        metrics["num_mt_only_capped"] = jnp.max(
            ms["num_mt_capped_pairs"] - ms["num_tier_capped_pairs"]
        )
        return state, opt_state, metrics

    def chained(state, opt_state, cam_idxs, key):
        return _chained(state, opt_state, cam_idxs, key, images)

    return _attach_lower_images(chained, _chained, images)


def _attach_lower_images(step, jfn, images):
    """AOT support for the CapacityWarmer (see _attach_lower in
    gsjax/parallel/shard.py): the wrapper hides the image-stack argument,
    so expose a ``.lower`` that re-injects it. An optional 5th abstract
    arg (the discard-mode apply_update flag) maps to the jit's trailing
    parameter."""

    class _Lowered:
        def __init__(self, lowered, has_apply):
            self._lowered = lowered
            self._has_apply = has_apply

        def compile(self):
            compiled = self._lowered.compile()
            if self._has_apply:
                return lambda s, o, c, k, a: compiled(s, o, c, k, images, a)
            return lambda s, o, c, k: compiled(s, o, c, k, images)

    def lower(state_abs, opt_abs, cam_abs, key_abs, *rest):
        return _Lowered(
            jfn.lower(state_abs, opt_abs, cam_abs, key_abs, images, *rest),
            bool(rest),
        )

    step.lower = lower
    return step


def make_densify_step(opt: OptimizationParams, cfg: TrainConfig):
    dcfg = DensifyConfig(
        grad_threshold=opt.densify_grad_threshold,
        percent_dense=opt.percent_dense,
    )

    @functools.partial(jax.jit, static_argnames=("use_screen_size",))
    def densify_step(state, opt_state, key, use_screen_size: bool):
        mu, nu = adam_moments(opt_state)
        state, mu, nu, stats = densify_and_prune(
            state,
            mu,
            nu,
            key,
            cfg.extent,
            dcfg,
            use_screen_size=use_screen_size,
        )
        return state, with_adam_moments(opt_state, mu, nu), stats

    @jax.jit
    def opacity_reset_step(state, opt_state):
        mu, nu = adam_moments(opt_state)
        state, mu, nu = reset_opacity(state, mu, nu, dcfg)
        return state, with_adam_moments(opt_state, mu, nu)

    return densify_step, opacity_reset_step


def stack_images(cameras_list, dtype=np.uint8):
    """Stack per-camera GT images (applying alpha masks,
    reference scene/cameras.py:39-46) into one (M, H, W, 3) array."""
    imgs = []
    for cam in cameras_list:
        img = cam.image
        if cam.alpha_mask is not None:
            img = img * cam.alpha_mask[..., None]
        if dtype == np.uint8:
            img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
        imgs.append(img)
    return np.stack(imgs)
