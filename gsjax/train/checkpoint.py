"""Training checkpoints: full state + optimizer + iteration.

The functional analogue of the reference's
``torch.save((gaussians.capture(), iteration))`` / ``restore``
(reference: train.py:130-132, scene/gaussian_model.py:61-93). The whole
(GaussianState, opt_state) pytree is flattened to numpy arrays in one
``.npz`` plus static metadata; restore rebuilds the pytree structure from
the same constructors and refills the leaves, so resume is bit-exact for
every array (the reference's resume is only "semantically continuous",
SURVEY.md §5.4 — gsjax does better).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_checkpoint(path, state, opt_state, iteration: int):
    leaves, treedef = jax.tree_util.tree_flatten((state, opt_state))
    meta = {
        "iteration": int(iteration),
        "capacity": state.capacity,
        "max_sh_degree": state.max_sh_degree,
        "spatial_lr_scale": state.spatial_lr_scale,
        "num_leaves": len(leaves),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        __meta__=json.dumps(meta),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )


def load_checkpoint(path, make_template):
    """``make_template(capacity, max_sh_degree, spatial_lr_scale) ->
    (state, opt_state)`` builds the target structure; leaves are refilled
    from disk. Returns (state, opt_state, iteration)."""
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        leaves = [data[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    template = make_template(
        meta["capacity"], meta["max_sh_degree"], meta["spatial_lr_scale"]
    )
    _, treedef = jax.tree_util.tree_flatten(template)
    state, opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, opt_state, meta["iteration"]


def load_reference_checkpoint(path, make_template, capacity=None):
    """Load a reference torch checkpoint into gsjax training state.

    The reference saves ``torch.save((GaussianModel.capture(), iteration))``
    as ``chkpnt<iter>.pth`` (reference train.py:130-132); ``capture()`` is
    the tuple (active_sh_degree, _xyz, _features_dc, _features_rest,
    _scaling, _rotation, _opacity, max_radii2D, xyz_gradient_accum, denom,
    optimizer.state_dict(), spatial_lr_scale) — scene/gaussian_model.py:61-75.
    Parameters, densification accumulators and Adam moments (matched by the
    reference's param-group names) are re-bucketed into a fixed-capacity
    GaussianState so a reference user can resume mid-training on TPU.

    ``make_template(capacity, max_sh_degree, spatial_lr_scale) ->
    (state, opt_state)``. Returns (state, opt_state, iteration).
    """
    import dataclasses

    import jax.numpy as jnp
    import torch

    capture, iteration = torch.load(
        path, map_location="cpu", weights_only=False
    )
    (
        active_sh, xyz, f_dc, f_rest, scaling, rotation, opacity,
        max_radii2d, grad_accum, denom, opt_sd, spatial_lr_scale,
    ) = capture

    def to_np(t):
        if hasattr(t, "detach"):
            return t.detach().cpu().numpy()
        return np.asarray(t)

    xyz = to_np(xyz)
    n = xyz.shape[0]
    rest = to_np(f_rest).shape[1]
    max_sh = int(round(np.sqrt(rest + 1))) - 1
    cap = capacity or max(64, 1 << int(np.ceil(np.log2(max(n, 1)))))
    if cap < n:
        raise ValueError(f"capacity {cap} < checkpoint points {n}")
    state, opt_state = make_template(cap, max_sh, float(spatial_lr_scale))

    values = {
        "xyz": xyz,
        "features_dc": to_np(f_dc),
        "features_rest": to_np(f_rest),
        "scaling": to_np(scaling),
        "rotation": to_np(rotation),
        "opacity": to_np(opacity),
    }
    params = {
        k: v.at[:n].set(jnp.asarray(values[k], v.dtype))
        for k, v in state.params.items()
    }
    state = dataclasses.replace(
        state,
        params=params,
        active=state.active.at[:n].set(True),
        max_radii2d=state.max_radii2d.at[:n].set(
            jnp.asarray(to_np(max_radii2d).reshape(n), jnp.float32)
        ),
        xyz_grad_accum=state.xyz_grad_accum.at[:n].set(
            jnp.asarray(to_np(grad_accum).reshape(n), jnp.float32)
        ),
        denom=state.denom.at[:n].set(
            jnp.asarray(to_np(denom).reshape(n), jnp.float32)
        ),
        active_sh_degree=jnp.int32(int(active_sh)),
    )

    # Adam moments: reference param groups carry names
    # (scene/gaussian_model.py:149-162); zero moments stay on the padding
    name_map = {
        "xyz": "xyz", "f_dc": "features_dc", "f_rest": "features_rest",
        "opacity": "opacity", "scaling": "scaling", "rotation": "rotation",
    }
    adam = opt_state[0]
    mu, nu = dict(adam.mu), dict(adam.nu)
    count = 0
    for group in opt_sd.get("param_groups", []):
        key = name_map.get(group.get("name"))
        if key is None or not group.get("params"):
            continue
        st = opt_sd.get("state", {}).get(group["params"][0])
        if not st:
            continue
        count = max(count, int(to_np(st["step"])))
        mu[key] = mu[key].at[:n].set(
            jnp.asarray(to_np(st["exp_avg"]), mu[key].dtype)
        )
        nu[key] = nu[key].at[:n].set(
            jnp.asarray(to_np(st["exp_avg_sq"]), nu[key].dtype)
        )
    adam = adam._replace(
        count=jnp.asarray(count, adam.count.dtype), mu=mu, nu=nu
    )
    # The group-LR schedule is driven by its own step counter (the
    # reference drives update_learning_rate from the loop iteration,
    # train.py:69); leaving it at 0 would silently restart the xyz
    # exponential decay from iteration 1 after a cross-framework resume.
    group_lr = opt_state[1]._replace(
        count=jnp.asarray(int(iteration), opt_state[1].count.dtype)
    )
    opt_state = (adam, group_lr) + tuple(opt_state[2:])
    return state, opt_state, int(iteration)
