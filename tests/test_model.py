"""Model-layer tests: state init, densification invariants, PLY byte layout,
checkpoint roundtrip (SURVEY.md §4 integration tier)."""

import dataclasses
import io
import os

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.models import (
    DensifyConfig,
    GaussianState,
    activated,
    create_from_pcd,
    densify_and_prune,
    knn_mean_sq_dist,
    load_gaussian_ply,
    reset_opacity,
    save_gaussian_ply,
)
from gsjax.models.gaussians import grow_capacity, INIT_OPACITY
from gsjax.utils.math import inverse_sigmoid


def make_state(n=100, capacity=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-2, 2, (n, 3))
    cols = rng.uniform(0, 1, (n, 3))
    return create_from_pcd(pts, cols, spatial_lr_scale=2.0, capacity=capacity)


def zero_moments(state):
    mu = {k: jnp.zeros_like(v) for k, v in state.params.items()}
    nu = {k: jnp.zeros_like(v) for k, v in state.params.items()}
    return mu, nu


def test_knn_matches_bruteforce(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expected = np.sort(d2, axis=1)[:, :3].mean(axis=1)
    np.testing.assert_allclose(knn_mean_sq_dist(pts), expected, rtol=1e-4)


def test_create_from_pcd_reference_init():
    state = make_state()
    n = 100
    assert int(state.num_active) == n
    means, scales, quats, opac, shs = activated(state)
    # opacity init 0.1 (reference gaussian_model.py:139)
    np.testing.assert_allclose(np.asarray(opac[:n]), INIT_OPACITY, atol=1e-6)
    # identity quaternions
    np.testing.assert_allclose(np.asarray(quats[:n, 0]), 1.0, atol=1e-6)
    # isotropic scales
    s = np.asarray(scales[:n])
    np.testing.assert_allclose(s[:, 0], s[:, 1], atol=1e-6)
    # sh degree starts at 0
    assert int(state.active_sh_degree) == 0


def test_densify_clone_small_high_grad():
    state = make_state()
    mu, nu = zero_moments(state)
    # give every active gaussian a high grad; scales are small vs extent=100
    state = dataclasses.replace(
        state,
        xyz_grad_accum=jnp.where(state.active, 1.0, 0.0),
        denom=jnp.where(state.active, 1.0, 0.0),
    )
    new_state, mu, nu, stats = densify_and_prune(
        state, mu, nu, jax.random.PRNGKey(0), extent=1000.0
    )
    assert int(stats.num_cloned) == 100
    assert int(stats.num_split) == 0
    assert int(new_state.num_active) == 200
    # clones are exact copies: each original xyz appears twice
    xyz = np.asarray(new_state.params["xyz"])[np.asarray(new_state.active)]
    orig = np.asarray(state.params["xyz"][:100])
    matches = (np.abs(xyz[None] - orig[:, None]).sum(-1) < 1e-6).sum(1)
    assert (matches == 2).all()
    # accumulators reset
    assert float(new_state.xyz_grad_accum.sum()) == 0.0


def test_densify_split_large_high_grad():
    state = make_state()
    mu = {k: jnp.ones_like(v) for k, v in state.params.items()}
    nu = {k: jnp.ones_like(v) for k, v in state.params.items()}
    state = dataclasses.replace(
        state,
        xyz_grad_accum=jnp.where(state.active, 1.0, 0.0),
        denom=jnp.where(state.active, 1.0, 0.0),
    )
    cfg = DensifyConfig()
    new_state, mu, nu, stats = densify_and_prune(
        state, mu, nu, jax.random.PRNGKey(0), extent=1e-6, cfg=cfg
    )
    # all large (scale > percent_dense * tiny extent) -> split into 2,
    # originals pruned
    assert int(stats.num_split) == 100
    assert int(stats.num_cloned) == 0
    assert int(new_state.num_active) == 200
    scales_new = np.exp(
        np.asarray(new_state.params["scaling"])[np.asarray(new_state.active)]
    )
    scales_old = np.exp(np.asarray(state.params["scaling"][:100]))
    np.testing.assert_allclose(
        np.sort(scales_new.max(1))[::2],
        np.sort(scales_old.max(1) / (0.8 * cfg.n_split)),
        rtol=1e-4,
    )
    # moments zeroed at written slots
    mu_xyz = np.asarray(mu["xyz"])[np.asarray(new_state.active)]
    assert (mu_xyz == 0).all()


def test_densify_prune_low_opacity():
    state = make_state()
    mu, nu = zero_moments(state)
    # make half the opacities tiny
    op = state.params["opacity"].at[:50].set(float(inverse_sigmoid(jnp.float32(1e-3))))
    state = dataclasses.replace(state, params=dict(state.params, opacity=op))
    new_state, *_ , stats = densify_and_prune(
        state, mu, nu, jax.random.PRNGKey(0), extent=1.0
    )
    assert int(stats.num_pruned) == 50
    assert int(new_state.num_active) == 50


def test_densify_screen_size_prune():
    state = make_state()
    mu, nu = zero_moments(state)
    state = dataclasses.replace(
        state, max_radii2d=state.max_radii2d.at[:10].set(30.0)
    )
    new_state, *_, stats = densify_and_prune(
        state, mu, nu, jax.random.PRNGKey(0), extent=1e9, use_screen_size=True
    )
    assert int(stats.num_pruned) == 10
    assert int(new_state.num_active) == 90
    # without the flag nothing is pruned
    new_state2, *_, stats2 = densify_and_prune(
        state, mu, nu, jax.random.PRNGKey(0), extent=1e9, use_screen_size=False
    )
    assert int(stats2.num_pruned) == 0


def test_densify_capacity_overflow_reported():
    state = make_state(n=100, capacity=128)
    mu, nu = zero_moments(state)
    state = dataclasses.replace(
        state,
        xyz_grad_accum=jnp.where(state.active, 1.0, 0.0),
        denom=jnp.where(state.active, 1.0, 0.0),
    )
    new_state, *_, stats = densify_and_prune(
        state, mu, nu, jax.random.PRNGKey(0), extent=1000.0
    )
    # 100 clones requested but only 28 free slots
    assert int(stats.num_dropped) == 72
    assert int(new_state.num_active) == 128


def test_reset_opacity():
    state = make_state()
    mu = {k: jnp.ones_like(v) for k, v in state.params.items()}
    nu = {k: jnp.ones_like(v) for k, v in state.params.items()}
    new_state, mu, nu = reset_opacity(state, mu, nu)
    op = jax.nn.sigmoid(
        np.asarray(new_state.params["opacity"])[np.asarray(new_state.active)]
    )
    assert (op <= 0.01 + 1e-6).all()
    assert (np.asarray(mu["opacity"]) == 0).all()
    assert (np.asarray(nu["opacity"]) == 0).all()
    assert (np.asarray(mu["xyz"]) == 1).all()  # others untouched


def test_grow_capacity_preserves():
    state = make_state(n=100, capacity=128)
    grown = grow_capacity(state, 256)
    assert grown.capacity == 256
    assert int(grown.num_active) == 100
    np.testing.assert_array_equal(
        np.asarray(grown.params["xyz"][:128]), np.asarray(state.params["xyz"])
    )


def test_gaussian_ply_byte_layout(tmp_path):
    """The saved PLY must follow the ecosystem layout exactly
    (reference gaussian_model.py:177-208)."""
    state = make_state(n=10, capacity=16)
    path = os.path.join(tmp_path, "pc.ply")
    save_gaussian_ply(state, path)
    raw = open(path, "rb").read()
    header_end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:header_end].decode("ascii")
    props = [
        line.split()[-1]
        for line in header.splitlines()
        if line.startswith("property")
    ]
    expected = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(45)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    assert props == expected
    assert "binary_little_endian" in header
    assert len(raw) - header_end == 10 * len(expected) * 4  # all float32

    # roundtrip restores everything (raw, pre-activation values)
    state2 = load_gaussian_ply(path, capacity=16)
    assert int(state2.num_active) == 10
    for k in state.params:
        np.testing.assert_allclose(
            np.asarray(state2.params[k][:10]),
            np.asarray(state.params[k][:10]),
            atol=1e-7,
            err_msg=k,
        )
    assert int(state2.active_sh_degree) == 3  # load at max degree


def test_checkpoint_roundtrip(tmp_path):
    from gsjax.configs import OptimizationParams
    from gsjax.train.checkpoint import load_checkpoint, save_checkpoint
    from gsjax.train.optim import make_optimizer
    from gsjax.models.gaussians import create_empty

    state = make_state()
    tx = make_optimizer(OptimizationParams(), state.spatial_lr_scale)
    opt_state = tx.init(state.params)
    path = os.path.join(tmp_path, "ckpt.npz")
    save_checkpoint(path, state, opt_state, 1234)

    def make_template(cap, max_sh, lr_scale):
        s = create_empty(cap, max_sh, lr_scale)
        return s, tx.init(s.params)

    state2, opt_state2, it = load_checkpoint(path, make_template)
    assert it == 1234
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(opt_state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
