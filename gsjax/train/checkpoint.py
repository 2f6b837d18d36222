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
