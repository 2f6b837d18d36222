"""Distributed tests on a virtual 8-device CPU mesh (SURVEY.md §4):
sharded renders/steps must match single-device allclose."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsjax.configs import OptimizationParams
from gsjax.data.cameras import stack_render_cameras
from gsjax.models import create_from_pcd
from gsjax.ops.rasterize import RasterizeSettings
from gsjax.parallel import (
    make_mesh,
    make_sharded_render,
    make_sharded_train_step,
    shard_gaussian_state,
)
from gsjax.train.optim import make_optimizer
from gsjax.train.step import TrainConfig, make_train_step, render_state

from conftest import make_test_camera

SETTINGS = RasterizeSettings(max_pairs=1 << 16, max_splats_per_tile=512)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    n = 300
    pts = np.stack(
        [rng.uniform(-1.5, 1.5, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)],
        axis=1,
    )
    cols = rng.uniform(0, 1, (n, 3))
    state = create_from_pcd(pts, cols, spatial_lr_scale=2.0, capacity=512)
    cams = [make_test_camera(64, 64, seed=i) for i in range(4)]
    rng2 = np.random.default_rng(1)
    images = rng2.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    return state, cams, images


@pytest.mark.parametrize("mesh_shape", [(1, 2), (1, 4), (2, 4)])
def test_sharded_render_matches_single(scene, mesh_shape):
    state, cams, _ = scene
    cam = cams[1].to_render_camera()
    bg = jnp.zeros(3)
    img1 = np.asarray(render_state(state, cam, bg, SETTINGS)["render"])
    d, g = mesh_shape
    mesh = make_mesh(data=d, gauss=g, devices=jax.devices()[: d * g])
    sstate = shard_gaussian_state(state, mesh)
    img2, _ = make_sharded_render(mesh, SETTINGS, 64, 64)(sstate, cam, bg)
    np.testing.assert_allclose(np.asarray(img2), img1, atol=3e-5)


def test_sharded_train_step_matches_single(scene):
    state, cams, images = scene
    opt = OptimizationParams()
    cfg = TrainConfig(settings=SETTINGS, extent=2.0)
    tx = make_optimizer(opt, state.spatial_lr_scale)

    # single device, camera 2
    step1 = make_train_step(tx, stack_render_cameras(cams), images, cfg)
    s1, o1, m1 = step1(state, tx.init(state.params), jnp.int32(2), jax.random.PRNGKey(9))

    # 4-way gauss sharded, data=1, same camera
    mesh = make_mesh(data=1, gauss=4, devices=jax.devices()[:4])
    sstate = shard_gaussian_state(state, mesh)
    step2 = make_sharded_train_step(tx, mesh, stack_render_cameras(cams), images, cfg)
    s2, o2, m2 = step2(
        sstate, tx.init(sstate.params), jnp.array([2]), jax.random.PRNGKey(9)
    )

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m2["l1"]), float(m1["l1"]), rtol=1e-5)
    for k in s1.params:
        np.testing.assert_allclose(
            np.asarray(s2.params[k]),
            np.asarray(s1.params[k]),
            atol=2e-5,
            rtol=1e-3,
            err_msg=k,
        )
    # densification stats agree
    np.testing.assert_allclose(
        np.asarray(s2.xyz_grad_accum),
        np.asarray(s1.xyz_grad_accum),
        atol=1e-4,
        rtol=1e-3,
    )
    np.testing.assert_array_equal(np.asarray(s2.denom), np.asarray(s1.denom))
    np.testing.assert_array_equal(
        np.asarray(s2.max_radii2d), np.asarray(s1.max_radii2d)
    )


def test_sharded_render_pallas_backend_matches_single(scene):
    """The sharded strip path routed through the Pallas compositor
    (interpret mode on CPU) must match the single-device render — VERDICT
    round-1 weak item 3: the multi-chip path must not be stuck on the slow
    XLA compositor."""
    import dataclasses

    state, cams, _ = scene
    cam = cams[1].to_render_camera()
    bg = jnp.zeros(3)
    img1 = np.asarray(render_state(state, cam, bg, SETTINGS)["render"])
    settings = dataclasses.replace(SETTINGS, backend="pallas", pallas_chunk=32)
    mesh = make_mesh(data=1, gauss=4, devices=jax.devices()[:4])
    sstate = shard_gaussian_state(state, mesh)
    img2, _ = make_sharded_render(mesh, settings, 64, 64)(sstate, cam, bg)
    np.testing.assert_allclose(np.asarray(img2), img1, atol=3e-5)


def test_sharded_train_step_pallas_matches_xla(scene):
    """Gradients through the Pallas strip compositor == the XLA strip
    compositor (same mesh, same camera): the sharded backward replay +
    gauss_inv_perm bookkeeping must agree across backends."""
    import dataclasses

    state, cams, images = scene
    opt = OptimizationParams()
    tx = make_optimizer(opt, state.spatial_lr_scale)
    mesh = make_mesh(data=1, gauss=4, devices=jax.devices()[:4])
    sstate = shard_gaussian_state(state, mesh)
    results = {}
    for backend in ("xla", "pallas"):
        cfg = TrainConfig(
            settings=dataclasses.replace(
                SETTINGS, backend=backend, pallas_chunk=32
            ),
            extent=2.0,
        )
        step = make_sharded_train_step(
            tx, mesh, stack_render_cameras(cams), images, cfg
        )
        s, _, m = step(
            sstate, tx.init(sstate.params), jnp.array([2]), jax.random.PRNGKey(9)
        )
        results[backend] = (s, float(m["loss"]))
    assert results["pallas"][1] == pytest.approx(results["xla"][1], rel=1e-5)
    for k in results["xla"][0].params:
        np.testing.assert_allclose(
            np.asarray(results["pallas"][0].params[k]),
            np.asarray(results["xla"][0].params[k]),
            atol=2e-5, rtol=1e-3, err_msg=k,
        )


def test_sharded_chained_step_matches_sequential(scene):
    """One chained dispatch of n sharded steps == n single sharded steps
    (restores RTT amortization under a mesh — VERDICT round-1 weak 3)."""
    from gsjax.parallel.shard import make_sharded_train_step_chained

    state, cams, images = scene
    opt = OptimizationParams()
    cfg = TrainConfig(settings=SETTINGS, extent=2.0)
    tx = make_optimizer(opt, state.spatial_lr_scale)
    mesh = make_mesh(data=2, gauss=2, devices=jax.devices()[:4])
    sstate = shard_gaussian_state(state, mesh)
    key = jax.random.PRNGKey(3)
    n = 3
    cam_idxs = jnp.asarray([[0, 1], [2, 3], [1, 0]], jnp.int32)

    step1 = make_sharded_train_step(tx, mesh, stack_render_cameras(cams), images, cfg)
    s_seq, o_seq = sstate, tx.init(sstate.params)
    losses = []
    for i in range(n):
        s_seq, o_seq, m = step1(
            s_seq, o_seq, cam_idxs[i], jax.random.fold_in(key, i)
        )
        losses.append(float(m["loss"]))

    chained = make_sharded_train_step_chained(
        tx, mesh, stack_render_cameras(cams), images, cfg, n
    )
    s_ch, o_ch, m_ch = chained(sstate, tx.init(sstate.params), cam_idxs, key)
    np.testing.assert_allclose(
        float(m_ch["loss_mean"]), np.mean(losses), rtol=1e-5
    )
    # atol: Adam turns a single-ulp gradient reassociation difference on a
    # near-zero-grad element into an O(lr)=1e-3 update (m/(sqrt(v)+eps) is
    # sign-like when both moments are tiny), so exact float equality is
    # not achievable across scan-vs-sequential dispatch boundaries.
    for k in s_seq.params:
        np.testing.assert_allclose(
            np.asarray(s_ch.params[k]), np.asarray(s_seq.params[k]),
            atol=2e-3, rtol=1e-3, err_msg=k,
        )


def test_a2a_exchange_render_matches_single(scene):
    """The all-to-all splat exchange (each splat routed only to the strips
    it overlaps, O(N/G) per-chip memory) must reproduce the replicated
    all_gather render exactly when nothing overflows the send budget
    (VERDICT round-1 missing item 3 / SURVEY.md §5.7)."""
    import dataclasses

    state, cams, _ = scene
    cam = cams[1].to_render_camera()
    bg = jnp.zeros(3)
    img1 = np.asarray(render_state(state, cam, bg, SETTINGS)["render"])
    settings = dataclasses.replace(SETTINGS, splat_exchange="a2a")
    for g in (2, 4):
        mesh = make_mesh(data=1, gauss=g, devices=jax.devices()[:g])
        sstate = shard_gaussian_state(state, mesh)
        img2, _ = make_sharded_render(mesh, settings, 64, 64)(sstate, cam, bg)
        np.testing.assert_allclose(
            np.asarray(img2), img1, atol=3e-5, err_msg=f"gauss={g}"
        )


def test_a2a_exchange_train_step_matches_all_gather(scene):
    """Gradients through the a2a exchange (gather -> all_to_all -> blend,
    transposed to reverse-all_to_all -> scatter-add) == the all_gather
    path, and the overflow counter is surfaced in metrics."""
    import dataclasses

    state, cams, images = scene
    opt = OptimizationParams()
    tx = make_optimizer(opt, state.spatial_lr_scale)
    mesh = make_mesh(data=1, gauss=4, devices=jax.devices()[:4])
    sstate = shard_gaussian_state(state, mesh)
    results = {}
    for exch in ("all_gather", "a2a"):
        cfg = TrainConfig(
            settings=dataclasses.replace(SETTINGS, splat_exchange=exch),
            extent=2.0,
        )
        step = make_sharded_train_step(
            tx, mesh, stack_render_cameras(cams), images, cfg
        )
        s, _, m = step(
            sstate, tx.init(sstate.params), jnp.array([2]), jax.random.PRNGKey(9)
        )
        results[exch] = (s, m)
    assert "num_exchange_dropped" in results["a2a"][1]
    assert int(results["a2a"][1]["num_exchange_dropped"]) == 0
    assert float(results["a2a"][1]["loss"]) == pytest.approx(
        float(results["all_gather"][1]["loss"]), rel=1e-5
    )
    for k in results["all_gather"][0].params:
        np.testing.assert_allclose(
            np.asarray(results["a2a"][0].params[k]),
            np.asarray(results["all_gather"][0].params[k]),
            atol=2e-5, rtol=1e-3, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(results["a2a"][0].xyz_grad_accum),
        np.asarray(results["all_gather"][0].xyz_grad_accum),
        atol=1e-4, rtol=1e-3,
    )


def test_a2a_exchange_overflow_is_counted(scene):
    """A send budget too small for the scene must surface in
    num_exchange_dropped instead of failing silently."""
    import dataclasses

    state, cams, images = scene
    opt = OptimizationParams()
    tx = make_optimizer(opt, state.spatial_lr_scale)
    mesh = make_mesh(data=1, gauss=2, devices=jax.devices()[:2])
    sstate = shard_gaussian_state(state, mesh)
    cfg = TrainConfig(
        settings=dataclasses.replace(
            SETTINGS, splat_exchange="a2a", a2a_rows=32
        ),
        extent=2.0,
    )
    step = make_sharded_train_step(
        tx, mesh, stack_render_cameras(cams), images, cfg
    )
    _, _, m = step(
        sstate, tx.init(sstate.params), jnp.array([2]), jax.random.PRNGKey(9)
    )
    # 300 live splats on 2 chips, budget 32/dst: at least one dst overflows
    assert int(m["num_exchange_dropped"]) > 0
    assert np.isfinite(float(m["loss"]))


def test_data_parallel_batch_averages_gradients(scene):
    state, cams, images = scene
    opt = OptimizationParams()
    cfg = TrainConfig(settings=SETTINGS, extent=2.0)
    tx = make_optimizer(opt, state.spatial_lr_scale)
    mesh = make_mesh(data=2, gauss=4)
    sstate = shard_gaussian_state(state, mesh)
    step = make_sharded_train_step(tx, mesh, stack_render_cameras(cams), images, cfg)
    s2, o2, m2 = step(
        sstate, tx.init(sstate.params), jnp.array([0, 3]), jax.random.PRNGKey(0)
    )
    # loss is the mean of the two per-camera losses
    step1 = make_train_step(tx, stack_render_cameras(cams), images, cfg)
    losses = []
    for ci in (0, 3):
        _, _, m1 = step1(state, tx.init(state.params), jnp.int32(ci), jax.random.PRNGKey(0))
        losses.append(float(m1["loss"]))
    np.testing.assert_allclose(float(m2["loss"]), np.mean(losses), rtol=1e-5)
    # a camera-batched step keeps improving when repeated
    s3, o3, m3 = step(s2, o2, jnp.array([1, 2]), jax.random.PRNGKey(1))
    assert np.isfinite(float(m3["loss"]))


def test_multi_scene_parallel_matches_sequential(scene):
    """Scene-axis training (BASELINE config 5): stepping two scenes in one
    shard_map program must equal stepping each scene alone."""
    import dataclasses

    from gsjax.parallel.multi_scene import (
        make_multi_scene_train_step,
        make_scene_mesh,
        stack_scene_states,
        unstack_scene_state,
    )
    from gsjax.train.optim import make_optimizer
    from gsjax.train.step import TrainConfig, make_train_step
    from gsjax.configs import OptimizationParams
    from gsjax.ops.rasterize import RasterizeSettings

    state, cam_list, images = scene
    extent = 2.0
    cams = stack_render_cameras(cam_list)
    # second scene: same cameras, perturbed gaussians + different images
    p2 = dict(state.params)
    p2["xyz"] = p2["xyz"] + 0.05
    state2 = dataclasses.replace(state, params=p2)
    images2 = np.clip(images.astype(np.float32) * 0.7, 0, 255).astype(images.dtype)

    opt = OptimizationParams()
    cfg = TrainConfig(
        settings=RasterizeSettings(max_pairs=1 << 14, max_splats_per_tile=256),
        extent=extent,
    )
    tx = make_optimizer(opt, extent)

    # sequential reference
    seq_states = []
    for st, ims in [(state, images), (state2, images2)]:
        o = tx.init(st.params)
        step = make_train_step(tx, cams, ims, cfg)
        ns, _, m = step(st, o, jnp.int32(1), jax.random.PRNGKey(7))
        seq_states.append((ns, float(m["loss"])))

    # parallel
    mesh = make_scene_mesh(2, devices=jax.devices()[:2])
    states = stack_scene_states([state, state2])
    opt_states = jax.tree.map(
        lambda *xs: jnp.stack(xs), tx.init(state.params), tx.init(state2.params)
    )
    cams2 = jax.tree.map(lambda x: jnp.stack([x, x]), cams)
    ims2 = np.stack([images, images2])
    pstep = make_multi_scene_train_step(tx, cams2, ims2, cfg, mesh)
    keys = jnp.stack([jax.random.PRNGKey(7)] * 2)
    new_states, _, metrics = pstep(
        states, opt_states, jnp.array([1, 1], jnp.int32), keys
    )

    for i in range(2):
        ref_state, ref_loss = seq_states[i]
        np.testing.assert_allclose(
            float(metrics["loss"][i]), ref_loss, rtol=1e-5
        )
        got = unstack_scene_state(new_states, i)
        np.testing.assert_allclose(
            np.asarray(got.params["xyz"]),
            np.asarray(ref_state.params["xyz"]),
            atol=1e-6,
        )


def test_sharded_step_aot_lower_matches_eager(scene):
    """CapacityWarmer AOT path (gsjax/train/loop.py): the sharded step
    factories expose .lower whose compiled 4-arg executable matches the
    eager wrapper — without it every sharded capacity growth stalls on an
    inline recompile."""
    state, cams, images = scene
    opt = OptimizationParams()
    cfg = TrainConfig(settings=SETTINGS, extent=2.0)
    tx = make_optimizer(opt, state.spatial_lr_scale)
    mesh = make_mesh(data=1, gauss=4, devices=jax.devices()[:4])
    sstate = shard_gaussian_state(state, mesh)
    opt_state = tx.init(sstate.params)
    step = make_sharded_train_step(
        tx, mesh, stack_render_cameras(cams), images, cfg
    )

    def abstract(x):
        sh = getattr(x, "sharding", None)
        if sh is not None and not hasattr(sh, "spec"):
            sh = None
        return jax.ShapeDtypeStruct(jnp.shape(x), x.dtype, sharding=sh)

    cam_idx = jnp.array([2], jnp.int32)
    key = jax.random.PRNGKey(9)
    compiled = step.lower(
        jax.tree.map(abstract, sstate),
        jax.tree.map(abstract, opt_state),
        abstract(cam_idx),
        abstract(key),
    ).compile()
    s_a, _, m_a = compiled(sstate, opt_state, cam_idx, key)
    s_e, _, m_e = step(sstate, opt_state, cam_idx, key)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_e["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_a.params["xyz"]), np.asarray(s_e.params["xyz"]), atol=1e-7
    )
