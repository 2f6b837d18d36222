"""Multi-scene data parallelism: scene = outermost mesh axis.

The reference trains benchmark scenes *serially* through ``os.system``
calls (reference: full_eval.py:39-52). Scenes are independent, so on a pod
they become the outermost mesh axis (BASELINE.json config 5): every scene's
Gaussian state, optimizer state, camera batch and images live on its own
device group, and one compiled program steps all of them — no cross-scene
collectives at all, so scaling is bandwidth-free by construction.

All scenes must share capacity, camera count (pad by repeating cameras) and
resolution — true of the benchmark suites, which train per-dataset groups
at one resolution.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gsjax.models.gaussians import GaussianState
from gsjax.train.step import TrainConfig, _train_step_body
from gsjax.utils.system import to_device_chunked


def make_scene_mesh(n_scenes: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    per = len(devices) // n_scenes
    if per * n_scenes != len(devices):
        raise ValueError(
            f"{len(devices)} devices do not split into {n_scenes} scenes"
        )
    grid = np.asarray(devices[: n_scenes * per]).reshape(n_scenes, per)
    return Mesh(grid, ("scene", "inner"))


def stack_scene_states(states):
    """Stack per-scene GaussianStates along a leading scene axis. Static
    fields must match across scenes."""
    s0 = states[0]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    return dataclasses.replace(
        stacked, max_sh_degree=s0.max_sh_degree, spatial_lr_scale=s0.spatial_lr_scale
    )


def unstack_scene_state(stacked, i: int) -> GaussianState:
    return jax.tree.map(lambda x: x[i], stacked)


def make_multi_scene_train_step(
    tx,
    cameras,  # stacked render cameras with leading (S, M) axes
    images,  # (S, M, H, W, 3)
    cfg: TrainConfig,
    mesh: Mesh,
):
    """One jitted step advancing every scene in parallel.

    step(states, opt_states, cam_idx (S,), keys (S, 2)) ->
        (states, opt_states, metrics with leading scene axis)
    """
    bg_color = jnp.full(3, 1.0 if cfg.white_background else 0.0, jnp.float32)
    images = to_device_chunked(images)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P("scene"), P("scene"), P("scene"), P("scene"), P("scene"),
            P("scene"),
        ),
        out_specs=(P("scene"), P("scene"), P("scene")),
        check_vma=False,
    )
    def body(states, opt_states, cams_all, cam_idx, keys, images_shard):
        state = jax.tree.map(lambda x: x[0], states)
        opt_state = jax.tree.map(lambda x: x[0], opt_states)
        cams = jax.tree.map(lambda x: x[0], cams_all)
        new_state, new_opt, metrics = _train_step_body(
            tx, cams, images_shard[0], cfg, bg_color,
            state, opt_state, cam_idx[0], keys[0],
        )
        expand = lambda t: jax.tree.map(lambda x: x[None], t)
        return expand(new_state), expand(new_opt), expand(metrics)

    # cameras/images go in as ARGUMENTS: multi-process global arrays may
    # not be closed over (they span non-addressable devices)
    jbody = jax.jit(body)

    def step(states, opt_states, cam_idx, keys):
        return jbody(states, opt_states, cameras, cam_idx, keys, images)

    return step


def make_multi_scene_train_step_chained(
    tx,
    cameras,  # stacked render cameras with leading (S, M) axes
    images,  # (S, M, H, W, 3)
    cfg: TrainConfig,
    mesh: Mesh,
    n_steps: int,
):
    """``n_steps`` train steps for every scene in ONE dispatch: shard_map
    over the scene axis with a lax.scan inside each shard — amortizes the
    ~30ms host RTT exactly like the single-scene chained step
    (gsjax/train/step.py make_train_step_chained).

    step(states, opt_states, cam_idxs (S, n_steps), keys (S, 2)) ->
        (states, opt_states, last-step metrics + "loss_mean", scene axis)
    """
    bg_color = jnp.full(3, 1.0 if cfg.white_background else 0.0, jnp.float32)
    images = to_device_chunked(images)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P("scene"), P("scene"), P("scene"), P("scene"), P("scene"),
            P("scene"),
        ),
        out_specs=(P("scene"), P("scene"), P("scene")),
        check_vma=False,
    )
    def body(states, opt_states, cams_all, cam_idxs, keys, images_shard):
        state = jax.tree.map(lambda x: x[0], states)
        opt_state = jax.tree.map(lambda x: x[0], opt_states)
        cams = jax.tree.map(lambda x: x[0], cams_all)
        key = keys[0]

        def inner(carry, x):
            st, opt = carry
            i, cam_idx = x
            k = jax.random.fold_in(key, i)
            st, opt, metrics = _train_step_body(
                tx, cams, images_shard[0], cfg, bg_color, st, opt, cam_idx, k
            )
            return (st, opt), metrics

        (state, opt_state), ms = jax.lax.scan(
            inner,
            (state, opt_state),
            (jnp.arange(n_steps, dtype=jnp.int32), cam_idxs[0]),
        )
        metrics = jax.tree.map(lambda a: a[-1], ms)
        metrics["loss_mean"] = jnp.mean(ms["loss"])
        metrics["num_dropped_pairs"] = jnp.max(ms["num_dropped_pairs"])
        metrics["num_mt_capped_pairs"] = jnp.max(ms["num_mt_capped_pairs"])
        metrics["num_budget_dropped"] = jnp.max(
            ms["num_dropped_pairs"] - ms["num_mt_capped_pairs"]
        )
        expand = lambda t: jax.tree.map(lambda x: x[None], t)
        return expand(state), expand(opt_state), expand(metrics)

    # cameras/images go in as ARGUMENTS: multi-process global arrays may
    # not be closed over (they span non-addressable devices)
    jbody = jax.jit(body)

    def step(states, opt_states, cam_idxs, keys):
        return jbody(states, opt_states, cameras, cam_idxs, keys, images)

    return step


def make_multi_scene_densify_step(opt_params, cfg: TrainConfig, mesh: Mesh):
    """Densify/prune and opacity-reset across the scene axis: the same
    fixed-capacity masked ops as the single-scene path
    (gsjax/train/step.py make_densify_step), one shard per scene."""
    import optax  # noqa: F401  (optimizer state pytrees)

    from gsjax.models.densify import DensifyConfig, densify_and_prune, reset_opacity
    from gsjax.train.optim import adam_moments, with_adam_moments

    dcfg = DensifyConfig(
        grad_threshold=opt_params.densify_grad_threshold,
        percent_dense=opt_params.percent_dense,
    )

    def _one(fn):
        def wrapped(states, opt_states, *rest):
            state = jax.tree.map(lambda x: x[0], states)
            opt_state = jax.tree.map(lambda x: x[0], opt_states)
            out = fn(state, opt_state, *[r[0] for r in rest])
            return jax.tree.map(lambda x: x[None], out)

        return wrapped

    def _densify_one(state, opt_state, key):
        mu, nu = adam_moments(opt_state)
        state, mu, nu, stats = densify_and_prune(
            state, mu, nu, key, cfg.extent, dcfg, use_screen_size=False
        )
        return state, with_adam_moments(opt_state, mu, nu), stats

    def _densify_one_ss(state, opt_state, key):
        mu, nu = adam_moments(opt_state)
        state, mu, nu, stats = densify_and_prune(
            state, mu, nu, key, cfg.extent, dcfg, use_screen_size=True
        )
        return state, with_adam_moments(opt_state, mu, nu), stats

    def _reset_one(state, opt_state):
        mu, nu = adam_moments(opt_state)
        state, mu, nu = reset_opacity(state, mu, nu, dcfg)
        return state, with_adam_moments(opt_state, mu, nu)

    sm = functools.partial(shard_map, mesh=mesh, check_vma=False)

    densify = jax.jit(sm(
        _one(_densify_one),
        in_specs=(P("scene"), P("scene"), P("scene")),
        out_specs=(P("scene"), P("scene"), P("scene")),
    ))
    densify_ss = jax.jit(sm(
        _one(_densify_one_ss),
        in_specs=(P("scene"), P("scene"), P("scene")),
        out_specs=(P("scene"), P("scene"), P("scene")),
    ))
    reset = jax.jit(sm(
        _one(_reset_one),
        in_specs=(P("scene"), P("scene")),
        out_specs=(P("scene"), P("scene")),
    ))

    def densify_step(states, opt_states, keys, use_screen_size: bool):
        fn = densify_ss if use_screen_size else densify
        return fn(states, opt_states, keys)

    return densify_step, reset


def local_scene_ids(mesh: Mesh, n_scenes: int):
    """Scene indices whose shard lives on this process's devices."""
    scene_devs = mesh.devices.reshape(n_scenes, -1)
    pid = jax.process_index()
    return [
        s for s in range(n_scenes)
        if any(d.process_index == pid for d in scene_devs[s])
    ]


def local_scene_state(stacked, scene_id: int, mesh: Mesh, n_scenes: int):
    """Extract one scene's GaussianState from the addressable shards of a
    scene-sharded stacked state (multi-process safe: only the owning
    process may call this for a given scene)."""
    def pick(x):
        if not hasattr(x, "addressable_shards"):
            return x
        for sh in x.addressable_shards:
            lo = sh.index[0].start or 0
            rows = sh.data.shape[0]
            if lo <= scene_id < lo + rows:
                return jnp.asarray(sh.data)[scene_id - lo]
        raise ValueError(f"scene {scene_id} not addressable on this process")

    return jax.tree.map(pick, stacked)
