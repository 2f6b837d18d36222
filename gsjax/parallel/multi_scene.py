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
    images = jnp.asarray(images)

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

    @jax.jit
    def step(states, opt_states, cam_idx, keys):
        return body(states, opt_states, cameras, cam_idx, keys, images)

    return step
