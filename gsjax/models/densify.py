"""Adaptive density control as fixed-shape jitted ops.

Clone / split / prune / opacity-reset with the exact decision rules of the
reference (scene/gaussian_model.py:349-407, train.py:112-123), re-designed
for XLA: instead of concatenating/slicing parameter tensors and rebuilding
the Adam state dict, new Gaussians are scattered into *free slots* of the
fixed-capacity buffers (prefix-sum rank -> free-slot index), pruned/split
originals just flip their ``active`` bit, and Adam moments are zeroed at the
written slots in place — semantically identical to the reference's
"new rows get zero moments" surgery (gaussian_model.py:263-264,315-316).

Everything here is traceable; one compiled program covers every
densification step of a run (a Python-level ``use_screen_size`` flag flips
once at the first opacity reset, giving a second specialization,
train.py:118-119).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsjax.models.gaussians import GaussianState, Params
from gsjax.utils.math import inverse_sigmoid, quat_to_rotmat


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    grad_threshold: float = 2e-4  # reference train.py:118
    min_opacity: float = 0.005  # reference train.py:120
    percent_dense: float = 0.01  # reference arguments/__init__.py
    max_screen_size: float = 20.0  # reference train.py:119
    world_size_factor: float = 0.1  # reference gaussian_model.py:399
    n_split: int = 2  # reference gaussian_model.py:349
    split_shrink: float = 0.8  # new scale = old / (0.8 * n_split)
    opacity_reset_ceiling: float = 0.01  # reference gaussian_model.py:211


class DensifyStats(NamedTuple):
    num_cloned: jax.Array
    num_split: jax.Array
    num_pruned: jax.Array
    num_dropped: jax.Array  # new points lost to capacity
    # prune-cause breakdown (a splat may satisfy several; each counted in
    # every cause it satisfies — used to diagnose churn equilibria, see
    # docs/PERF.md "Densification dynamics")
    num_pruned_opacity: jax.Array
    num_pruned_screen: jax.Array
    num_pruned_world: jax.Array


def add_densification_stats(state: GaussianState, grad_means2d_pix, radii, width, height):
    """Per-iteration bookkeeping (reference train.py:113-117,
    gaussian_model.py:405-407).

    ``grad_means2d_pix`` is the loss gradient w.r.t. pixel-space screen
    positions (the cotangent of ``means2d_offset``); it is rescaled to NDC
    units (x by W/2, y by H/2) to match the units the CUDA backward reports
    and the 2e-4 threshold is tuned for.
    """
    visible = radii > 0
    g_ndc = grad_means2d_pix * jnp.array([width / 2.0, height / 2.0])
    norms = jnp.linalg.norm(g_ndc, axis=-1)
    return dataclasses.replace(
        state,
        max_radii2d=jnp.where(
            visible, jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d,
        ),
        xyz_grad_accum=state.xyz_grad_accum + jnp.where(visible, norms, 0.0),
        denom=state.denom + visible.astype(jnp.float32),
    )


def _free_slot_table(free):
    """slots_by_rank[r] = index of the r-th free slot (C where r >= n_free)."""
    c = free.shape[0]
    rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    return (
        jnp.full(c, c, jnp.int32)
        .at[jnp.where(free, rank, c)]
        .set(jnp.arange(c, dtype=jnp.int32), mode="drop")
    )


def _dest(slots_by_rank, rank, mask):
    c = slots_by_rank.shape[0]
    d = slots_by_rank[jnp.clip(rank, 0, c - 1)]
    return jnp.where(mask & (rank >= 0) & (rank < c), d, c)


def _scatter_rows(arr, dest, values):
    return arr.at[dest].set(values, mode="drop")


def densify_and_prune(
    state: GaussianState,
    mu: Params,
    nu: Params,
    key,
    extent: float,
    cfg: DensifyConfig = DensifyConfig(),
    use_screen_size: bool = False,
):
    """One densification step. Returns (state, mu, nu, stats).

    Decision rules (reference gaussian_model.py:374-401):
      clone:  grad >= thr and max(scale) <= percent_dense * extent — copy;
      split:  grad >= thr and max(scale) >  percent_dense * extent —
              n_split children at xyz + R @ N(0, scale), scale /= 0.8*n,
              original removed;
      prune:  opacity < min_opacity, plus (when ``use_screen_size``)
              screen radius > 20 px or world scale > 0.1 * extent.
    Prune is evaluated for new points too (with screen radius 0), matching
    the reference's prune-after-densify ordering.
    """
    p = state.params
    active = state.active
    c = state.capacity

    grads = jnp.where(state.denom > 0, state.xyz_grad_accum / state.denom, 0.0)
    scales = jnp.exp(p["scaling"])
    max_scale = scales.max(axis=-1)
    opac = jax.nn.sigmoid(p["opacity"][:, 0])

    grad_ok = grads >= cfg.grad_threshold
    small = max_scale <= cfg.percent_dense * extent
    clone_mask = active & grad_ok & small
    split_mask = active & grad_ok & ~small

    def prune_fn(opacity, mscale, radii):
        m = opacity < cfg.min_opacity
        if use_screen_size:
            m = m | (radii > cfg.max_screen_size)
            m = m | (mscale > cfg.world_size_factor * extent)
        return m

    keep = active & ~split_mask & ~prune_fn(opac, max_scale, state.max_radii2d)
    pr_base = active & ~split_mask
    num_pruned = jnp.sum((pr_base & ~keep).astype(jnp.int32))
    num_pr_op = jnp.sum((pr_base & (opac < cfg.min_opacity)).astype(jnp.int32))
    if use_screen_size:
        num_pr_scr = jnp.sum(
            (pr_base & (state.max_radii2d > cfg.max_screen_size)).astype(jnp.int32)
        )
        num_pr_wld = jnp.sum(
            (pr_base & (max_scale > cfg.world_size_factor * extent)).astype(jnp.int32)
        )
    else:
        num_pr_scr = jnp.int32(0)
        num_pr_wld = jnp.int32(0)

    zero_r = jnp.zeros_like(state.max_radii2d)
    clone_keep = clone_mask & ~prune_fn(opac, max_scale, zero_r)
    child_scales = scales / (cfg.split_shrink * cfg.n_split)
    split_keep = split_mask & ~prune_fn(opac, child_scales.max(axis=-1), zero_r)

    free = ~keep
    n_free = jnp.sum(free.astype(jnp.int32))
    slots_by_rank = _free_slot_table(free)

    clone_cum = jnp.cumsum(clone_keep.astype(jnp.int32))
    total_clone = clone_cum[-1]
    split_cum = jnp.cumsum(split_keep.astype(jnp.int32))
    total_split = split_cum[-1]

    dests = [_dest(slots_by_rank, clone_cum - 1, clone_keep)]
    for k in range(cfg.n_split):
        rank = total_clone + k * total_split + (split_cum - 1)
        dests.append(_dest(slots_by_rank, rank, split_keep))

    # child positions: xyz + R @ (eps * scale), one sample per child
    # (reference gaussian_model.py:358-362)
    R = quat_to_rotmat(p["rotation"])
    eps = jax.random.normal(key, (cfg.n_split, c, 3))
    child_xyz = [
        p["xyz"] + jnp.einsum("nij,nj->ni", R, eps[k] * scales)
        for k in range(cfg.n_split)
    ]
    child_scaling = jnp.log(jnp.maximum(child_scales, 1e-30))

    new_params = {}
    for name, leaf in p.items():
        out = _scatter_rows(leaf, dests[0], leaf)  # clones copy everything
        for k in range(cfg.n_split):
            if name == "xyz":
                vals = child_xyz[k]
            elif name == "scaling":
                vals = child_scaling
            else:
                vals = leaf
            out = _scatter_rows(out, dests[k + 1], vals)
        new_params[name] = out

    new_active = keep
    new_mu, new_nu = dict(mu), dict(nu)
    for d in dests:
        new_active = new_active.at[d].set(True, mode="drop")
        for name in new_mu:
            zeros = jnp.zeros_like(new_mu[name])
            new_mu[name] = _scatter_rows(new_mu[name], d, zeros)
            new_nu[name] = _scatter_rows(new_nu[name], d, zeros)

    total_new = total_clone + cfg.n_split * total_split
    stats = DensifyStats(
        num_cloned=total_clone,
        num_split=total_split,
        num_pruned=num_pruned,
        num_dropped=jnp.maximum(0, total_new - n_free),
        num_pruned_opacity=num_pr_op,
        num_pruned_screen=num_pr_scr,
        num_pruned_world=num_pr_wld,
    )
    new_state = dataclasses.replace(
        state,
        params=new_params,
        active=new_active,
        # reference resets all accumulators after densify
        # (gaussian_model.py:345-347) and prunes stats rows; with fixed
        # capacity a full zero covers both.
        max_radii2d=jnp.zeros_like(state.max_radii2d),
        xyz_grad_accum=jnp.zeros_like(state.xyz_grad_accum),
        denom=jnp.zeros_like(state.denom),
    )
    return new_state, new_mu, new_nu, stats


def reset_opacity(state: GaussianState, mu: Params, nu: Params, cfg=DensifyConfig()):
    """Clamp all opacities to <= ceiling and zero their Adam moments
    (reference gaussian_model.py:210-213, 258-271)."""
    op = jax.nn.sigmoid(state.params["opacity"])
    new_op = inverse_sigmoid(jnp.minimum(op, cfg.opacity_reset_ceiling))
    params = dict(state.params)
    params["opacity"] = jnp.where(state.active[:, None], new_op, params["opacity"])
    mu = dict(mu)
    nu = dict(nu)
    mu["opacity"] = jnp.zeros_like(mu["opacity"])
    nu["opacity"] = jnp.zeros_like(nu["opacity"])
    return dataclasses.replace(state, params=params), mu, nu
