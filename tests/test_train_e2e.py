"""End-to-end integration: fit a synthetic Blender scene
(SURVEY.md §7.2 minimum slice, scaled down for CPU CI)."""

import os

import numpy as np
import pytest

from gsjax.configs import ModelParams, OptimizationParams, PipelineParams


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    from fixtures import make_blender_scene

    path = str(tmp_path_factory.mktemp("scene"))
    gt = make_blender_scene(path, n_train=12, n_test=3, width=64, height=64)
    return path, gt


def test_training_fits_synthetic_scene(blender_scene, tmp_path):
    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.train.loop import training

    src, _ = blender_scene
    model = ModelParams(
        source_path=src, model_path=str(tmp_path / "out"), eval=True
    )
    opt = OptimizationParams(
        iterations=300,
        densification_interval=100,
        densify_from_iter=99,
        densify_until_iter=250,
        opacity_reset_interval=10_000,  # never, in this short run
        position_lr_max_steps=300,
    )
    scene, state = training(
        model,
        opt,
        PipelineParams(),
        testing_iterations=(300,),
        saving_iterations=(300,),
        checkpoint_iterations=(150,),
        quiet=True,
        settings=RasterizeSettings(max_pairs=1 << 16, max_splats_per_tile=512),
        capacity=256,
        seed=0,
    )

    # quality: the fit must substantially beat the init
    import jax.numpy as jnp
    from gsjax.train.loop import evaluate_state
    from gsjax.train.step import TrainConfig, make_render_fn

    cfg = TrainConfig(
        settings=RasterizeSettings(max_pairs=1 << 16, max_splats_per_tile=512)
    )
    report = evaluate_state(
        state, scene, make_render_fn(cfg), jnp.zeros(3), num_train_views=5
    )
    assert report["train"]["psnr"] > 22.0, report
    assert report["test"]["psnr"] > 20.0, report

    # artifacts (reference scene/__init__.py:51-63, train.py:108-132)
    out = model.model_path
    assert os.path.exists(os.path.join(out, "cfg_args"))
    assert os.path.exists(os.path.join(out, "cameras.json"))
    assert os.path.exists(os.path.join(out, "input.ply"))
    assert os.path.exists(
        os.path.join(out, "point_cloud", "iteration_300", "point_cloud.ply")
    )
    assert os.path.exists(os.path.join(out, "chkpnt150.npz"))


def test_checkpoint_resume_continues(blender_scene, tmp_path):
    """Resume from a checkpoint and keep improving (reference train.py:37-39)."""
    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.train.loop import training

    src, _ = blender_scene
    settings = RasterizeSettings(max_pairs=1 << 16, max_splats_per_tile=512)

    model = ModelParams(source_path=src, model_path=str(tmp_path / "a"))
    opt = OptimizationParams(
        iterations=60, densify_from_iter=10_000, opacity_reset_interval=10_000
    )
    training(
        model, opt, PipelineParams(), testing_iterations=(), saving_iterations=(),
        checkpoint_iterations=(60,), quiet=True, settings=settings, capacity=256,
    )

    model2 = ModelParams(source_path=src, model_path=str(tmp_path / "b"))
    opt2 = OptimizationParams(
        iterations=120, densify_from_iter=10_000, opacity_reset_interval=10_000
    )
    scene2, state2 = training(
        model2, opt2, PipelineParams(), testing_iterations=(), saving_iterations=(),
        start_checkpoint=str(tmp_path / "a" / "chkpnt60.npz"),
        quiet=True, settings=settings, capacity=256,
    )
    assert int(state2.num_active) > 0


def test_capacity_warm_precompile_matches_inline():
    """The background-compiled next-bucket step (CapacityWarmer + AOT
    lowering over _grown_abstract shapes) must accept the actually-grown
    state and produce the same result as a fresh jit compile."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from conftest import make_test_camera
    from gsjax.configs import OptimizationParams
    from gsjax.data.cameras import stack_render_cameras
    from gsjax.models import create_from_pcd
    from gsjax.models.gaussians import grow_capacity
    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.train.loop import (
        CapacityWarmer, _grown_abstract, _warmed_densify, grow_opt_state,
    )
    from gsjax.train.optim import make_optimizer
    from gsjax.train.step import TrainConfig, make_densify_step, make_train_step

    rng = np.random.default_rng(0)
    n = 100
    pts = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(4, 7, n)],
        axis=1,
    )
    state = create_from_pcd(
        pts, rng.uniform(0, 1, (n, 3)), spatial_lr_scale=2.0, capacity=128
    )
    cams = stack_render_cameras([make_test_camera(32, 32, seed=1)])
    images = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    cfg = TrainConfig(
        settings=RasterizeSettings(max_pairs=1 << 12, max_splats_per_tile=256),
        extent=2.0,
    )
    tx = make_optimizer(OptimizationParams(), 2.0)
    opt_state = tx.init(state.params)
    key = jax.random.PRNGKey(3)

    old_c, new_c = state.capacity, state.capacity * 2
    warmer = CapacityWarmer()
    state_abs = _grown_abstract(state, old_c, new_c)
    opt_abs = _grown_abstract(opt_state, old_c, new_c)
    key_abs = jax.ShapeDtypeStruct(jnp.shape(key), key.dtype)
    build = lambda: make_train_step(tx, cams, images, cfg)  # noqa: E731
    opt_params = OptimizationParams()
    jobs = {
        "step": (
            build,
            (state_abs, opt_abs, jax.ShapeDtypeStruct((), jnp.int32), key_abs),
            {},
        ),
        "densify_True": (
            lambda: make_densify_step(opt_params, cfg)[0],
            (state_abs, opt_abs, key_abs),
            {"use_screen_size": True},
        ),
        "reset": (
            lambda: make_densify_step(opt_params, cfg)[1],
            (state_abs, opt_abs),
            {},
        ),
    }
    wk = (new_c, "settings", 1)
    warmer.maybe_start(wk, jobs)
    warmer._future.result(timeout=600)  # wait for the background compile
    warmed = warmer.take(wk)
    assert warmed is not None and set(warmed) == set(jobs)

    g_state = grow_capacity(state, new_c)
    g_opt = grow_opt_state(opt_state, old_c, new_c)
    s1, o1, m1 = warmed["step"](g_state, g_opt, jnp.int32(0), key)
    s2, o2, m2 = build()(g_state, g_opt, jnp.int32(0), key)
    np.testing.assert_allclose(
        np.asarray(m1["loss"]), np.asarray(m2["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s1.params["xyz"]), np.asarray(s2.params["xyz"]), atol=1e-6
    )
    assert int(s1.num_active) == int(s2.num_active)

    # warmed densify/reset executables match the inline jit versions
    inline_densify, inline_reset = make_densify_step(opt_params, cfg)
    d_dispatch = _warmed_densify(warmed, inline_densify)
    sd1, od1, st1 = d_dispatch(g_state, g_opt, key, use_screen_size=True)
    sd2, od2, st2 = inline_densify(g_state, g_opt, key, use_screen_size=True)
    assert int(sd1.num_active) == int(sd2.num_active)
    np.testing.assert_allclose(
        np.asarray(sd1.params["xyz"]), np.asarray(sd2.params["xyz"]), atol=1e-6
    )
    # missing variant falls back to inline
    sd3, _, _ = d_dispatch(g_state, g_opt, key, use_screen_size=False)
    sd4, _, _ = inline_densify(g_state, g_opt, key, use_screen_size=False)
    assert int(sd3.num_active) == int(sd4.num_active)
    sr1, _ = warmed["reset"](g_state, g_opt)
    sr2, _ = inline_reset(g_state, g_opt)
    np.testing.assert_allclose(
        np.asarray(sr1.params["opacity"]),
        np.asarray(sr2.params["opacity"]), atol=1e-6,
    )


def test_nonfinite_loss_aborts_with_debug_dump(blender_scene, tmp_path):
    """A NaN in the scene init must abort training with FloatingPointError;
    with pipe.debug a snapshot npz is written first (the JAX analogue of
    the reference rasterizer's crash dump, reference README.md:143-146)."""
    import glob
    import shutil

    import numpy as np
    import pytest

    from gsjax.data.ply import read_point_cloud_ply, write_point_cloud_ply
    from gsjax.train.loop import training

    src, _ = blender_scene
    bad_src = str(tmp_path / "bad_scene")
    shutil.copytree(src, bad_src)
    pts, cols, _ = read_point_cloud_ply(os.path.join(bad_src, "points3d.ply"))
    pts = np.asarray(pts).copy()
    pts[0, 0] = np.nan
    write_point_cloud_ply(os.path.join(bad_src, "points3d.ply"), pts, cols)

    model = ModelParams(
        source_path=bad_src, model_path=str(tmp_path / "out_bad")
    )
    opt = OptimizationParams(iterations=30, densify_from_iter=10_000)
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        training(
            model, opt, PipelineParams(debug=True),
            testing_iterations=(), saving_iterations=(), quiet=True,
            steps_per_dispatch=1,
        )
    assert glob.glob(os.path.join(str(tmp_path / "out_bad"), "snapshot_*.npz"))


def test_load_reference_torch_checkpoint(tmp_path):
    """A reference chkpnt<iter>.pth (torch.save of GaussianModel.capture()
    + iteration; reference train.py:130-132) loads into gsjax state with
    params, accumulators and Adam moments mapped by param-group name."""
    import numpy as np
    import torch

    from gsjax.models.gaussians import create_empty
    from gsjax.train.checkpoint import load_reference_checkpoint
    from gsjax.train.optim import make_optimizer

    rng = np.random.default_rng(5)
    n = 5
    t = lambda *shape: torch.tensor(  # noqa: E731
        rng.normal(size=shape).astype(np.float32)
    )
    tensors = {
        "xyz": t(n, 3), "f_dc": t(n, 1, 3), "f_rest": t(n, 15, 3),
        "scaling": t(n, 3), "rotation": t(n, 4), "opacity": t(n, 1),
    }
    group_order = ["xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation"]
    opt_sd = {
        "state": {
            i: {
                "step": torch.tensor(321.0),
                "exp_avg": torch.zeros_like(tensors[nm]) + 0.25,
                "exp_avg_sq": torch.zeros_like(tensors[nm]) + 0.5,
            }
            for i, nm in enumerate(group_order)
        },
        "param_groups": [
            {"params": [i], "name": nm} for i, nm in enumerate(group_order)
        ],
    }
    capture = (
        2,  # active_sh_degree
        tensors["xyz"], tensors["f_dc"], tensors["f_rest"],
        tensors["scaling"], tensors["rotation"], tensors["opacity"],
        t(n),  # max_radii2D
        t(n, 1),  # xyz_gradient_accum
        t(n, 1),  # denom
        opt_sd,
        3.5,  # spatial_lr_scale
    )
    path = str(tmp_path / "chkpnt777.pth")
    torch.save((capture, 777), path)

    tx = make_optimizer(OptimizationParams(), 3.5)

    def make_template(cap, max_sh, lr_scale):
        s = create_empty(cap, max_sh, lr_scale)
        return s, tx.init(s.params)

    state, opt_state, it = load_reference_checkpoint(path, make_template)
    assert it == 777
    assert state.capacity == 64 and int(state.num_active) == n
    assert state.max_sh_degree == 3 and int(state.active_sh_degree) == 2
    assert state.spatial_lr_scale == 3.5
    np.testing.assert_allclose(
        np.asarray(state.params["xyz"][:n]), tensors["xyz"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(state.params["features_rest"][:n]),
        tensors["f_rest"].numpy(),
    )
    assert not np.asarray(state.active[n:]).any()
    adam = opt_state[0]
    assert int(adam.count) == 321
    np.testing.assert_allclose(np.asarray(adam.mu["scaling"][:n]), 0.25)
    np.testing.assert_allclose(np.asarray(adam.nu["opacity"][:n]), 0.5)
    np.testing.assert_allclose(np.asarray(adam.mu["xyz"][n:]), 0.0)


def test_training_loop_sharded_with_growth(blender_scene, tmp_path):
    """The full training() driver on a virtual 2x2 mesh: sharded steps,
    densification, and a capacity growth (with the background warm path)
    must run end to end and keep improving the loss."""
    from gsjax.train.loop import training

    src, _ = blender_scene
    model = ModelParams(
        source_path=src, model_path=str(tmp_path / "out_sharded")
    )
    opt = OptimizationParams(
        iterations=160,
        densification_interval=50,
        densify_from_iter=49,
        densify_until_iter=150,
        opacity_reset_interval=10_000,
        position_lr_max_steps=160,
    )
    scene, state = training(
        model, opt, PipelineParams(),
        testing_iterations=(160,), saving_iterations=(),
        quiet=True, capacity=64, data_shards=2, gauss_shards=2,
    )
    assert int(state.num_active) > 40  # densification actually ran
    assert state.capacity >= 64


def test_default_rasterize_settings_heuristics():
    """Budget heuristics: budgets are powers of two, scale with capacity,
    and the tile cap stays within [16, 128] and within the tile count."""
    from gsjax.train.loop import default_rasterize_settings

    for w, h, cap in [(800, 800, 1 << 14), (1920, 1080, 1 << 20),
                      (64, 64, 256), (3840, 2160, 1 << 21)]:
        s = default_rasterize_settings(w, h, cap)
        assert s.max_pairs & (s.max_pairs - 1) == 0
        assert s.max_pairs >= min(1 << 24, cap * 4) or s.max_pairs == 1 << 24
        mt = s.max_tiles_per_gauss
        assert mt & (mt - 1) == 0 and mt <= 128
        tiles = -(-w // 16) * -(-h // 16)
        assert mt <= 2 ** int(np.ceil(np.log2(tiles)))
        # settings construct a valid RasterizeSettings (validators run)
        assert s.max_splats_per_tile % s.chunk == 0


def test_training_mixed_resolution_scene(tmp_path):
    """Per-camera image sizes must train (the reference resizes each camera
    independently, utils/camera_utils.py:19-52): cameras bucket by size,
    each bucket gets its own compiled step."""
    from fixtures import make_blender_scene
    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.train.loop import training

    src = str(tmp_path / "scene")
    os.makedirs(src)
    make_blender_scene(
        src, n_train=8, n_test=2, width=64, height=64,
        size_fn=lambda i: (64, 64) if i % 2 == 0 else (48, 32),
    )
    model = ModelParams(
        source_path=src, model_path=str(tmp_path / "out"), eval=True
    )
    opt = OptimizationParams(
        iterations=60,
        densify_from_iter=1_000,  # no densification in this short run
        opacity_reset_interval=10_000,
        position_lr_max_steps=60,
    )
    scene, state = training(
        model,
        opt,
        PipelineParams(),
        testing_iterations=(60,),
        saving_iterations=(),
        checkpoint_iterations=(),
        quiet=True,
        settings=RasterizeSettings(max_pairs=1 << 16, max_splats_per_tile=512),
        capacity=256,
        seed=0,
    )
    import jax.numpy as jnp

    from gsjax.train.loop import evaluate_state
    from gsjax.train.step import TrainConfig, make_render_fn

    cfg = TrainConfig(
        settings=RasterizeSettings(max_pairs=1 << 16, max_splats_per_tile=512)
    )
    report = evaluate_state(
        state, scene, make_render_fn(cfg), jnp.zeros(3), num_train_views=4
    )
    # both resolutions rendered and the fit moved off init
    assert report["train"]["n_views"] == 4
    assert report["train"]["psnr"] > 15.0, report


def test_tier_capping_backs_off(blender_scene, tmp_path, capsys):
    """Tiered binning under-provisions the small tier on purpose; when a
    frame actually loses pairs to the small-tier slot width the trainer
    must surface it (num_tier_capped_pairs) and shrink tier_frac rather
    than grow max_tiles_per_gauss (which cannot recover those pairs)."""
    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.train.loop import training

    src, _ = blender_scene
    model = ModelParams(
        source_path=src, model_path=str(tmp_path / "out"), eval=True
    )
    opt = OptimizationParams(
        iterations=40,
        densify_from_iter=1_000,  # no densification in this short run
        position_lr_max_steps=40,
    )
    # tier_frac=0.875 forces 7/8 of the (large-footprint SfM-init)
    # gaussians into the small tier of mt/4 slots — guaranteed tier caps.
    scene, state = training(
        model,
        opt,
        PipelineParams(),
        testing_iterations=(),
        saving_iterations=(),
        checkpoint_iterations=(),
        quiet=True,
        settings=RasterizeSettings(
            max_pairs=1 << 16, max_splats_per_tile=512,
            max_tiles_per_gauss=16, tier_frac=0.875,
        ),
        capacity=256,
        seed=0,
    )
    out = capsys.readouterr().out
    assert "tier_frac 0.875 ->" in out, out
    # the run recovered (backed off instead of looping) and still fit
    import jax.numpy as jnp

    from gsjax.train.loop import evaluate_state
    from gsjax.train.step import TrainConfig, make_render_fn

    cfg = TrainConfig(
        settings=RasterizeSettings(max_pairs=1 << 16, max_splats_per_tile=512)
    )
    report = evaluate_state(
        state, scene, make_render_fn(cfg), jnp.zeros(3), num_train_views=3
    )
    assert np.isfinite(report["train"]["psnr"]), report


def test_web_viewer_attaches_to_training(blender_scene, tmp_path):
    """A passive web viewer attached to a live training run serves /info
    with the advancing iteration and renders a frame mid-training without
    forcing chain=1 (unlike the SIBR bridge callback)."""
    import json as _json
    import urllib.request

    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.train.loop import training
    from gsjax.viewer.local_viewer import LocalViewer

    src, _ = blender_scene
    model = ModelParams(
        source_path=src, model_path=str(tmp_path / "out"), eval=False
    )
    opt = OptimizationParams(
        iterations=40, densify_from_iter=10_000,
        opacity_reset_interval=10_000, position_lr_max_steps=40,
    )
    holder = {}
    seen = {}

    def passive(iteration, state, render_fn):
        v = holder.get("v")
        if v is None:
            v = LocalViewer(state, np.zeros(3, np.float32), port=0,
                            extra_sizes=((32, 32),))
            v.start()
            holder["v"] = v
        v.state = state
        v.iteration = iteration
        if iteration >= 30 and "info" not in seen:
            base = f"http://127.0.0.1:{v.port}"
            seen["info"] = _json.loads(
                urllib.request.urlopen(f"{base}/info", timeout=60).read()
            )
            st = seen["info"]
            q = (f"ex={st['center'][0]}&ey={st['center'][1] - 3}"
                 f"&ez={st['center'][2]}&tx={st['center'][0]}"
                 f"&ty={st['center'][1]}&tz={st['center'][2]}&w=32&h=32")
            seen["jpg"] = urllib.request.urlopen(
                f"{base}/render?{q}", timeout=300
            ).read()

    try:
        training(
            model, opt, PipelineParams(), testing_iterations=(),
            saving_iterations=(), quiet=True,
            settings=RasterizeSettings(max_pairs=1 << 14,
                                       max_splats_per_tile=256),
            capacity=128, seed=0, passive_callback=passive,
            steps_per_dispatch=10,
        )
    finally:
        if "v" in holder:
            holder["v"].stop()

    assert seen["info"]["iteration"] >= 30
    assert seen["info"]["n_gaussians"] > 0
    assert seen["jpg"][:2] == b"\xff\xd8"  # JPEG magic


def test_step_apply_update_flag_discards_adam_update():
    """apply_update=False must drop the Adam update (params AND moments)
    while still accumulating densification stats — the reference's
    densify-iteration semantics (reference train.py:118-128)."""
    import jax
    import jax.numpy as jnp

    from conftest import make_test_camera
    from gsjax.data.cameras import stack_render_cameras
    from gsjax.models import create_from_pcd
    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.train.optim import make_optimizer
    from gsjax.train.step import TrainConfig, make_train_step

    rng = np.random.default_rng(2)
    n = 80
    pts = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(4, 7, n)],
        axis=1,
    )
    state = create_from_pcd(
        pts, rng.uniform(0, 1, (n, 3)), spatial_lr_scale=2.0, capacity=128
    )
    cams = stack_render_cameras([make_test_camera(32, 32, seed=1)])
    images = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    cfg = TrainConfig(
        settings=RasterizeSettings(max_pairs=1 << 12, max_splats_per_tile=256),
        extent=2.0,
    )
    tx = make_optimizer(OptimizationParams(), 2.0)
    opt_state = tx.init(state.params)
    step = make_train_step(tx, cams, images, cfg)
    key = jax.random.PRNGKey(7)

    s_off, o_off, m_off = step(
        state, opt_state, jnp.int32(0), key, jnp.bool_(False)
    )
    s_on, o_on, m_on = step(
        state, opt_state, jnp.int32(0), key, jnp.bool_(True)
    )

    # flag False: params and optimizer state untouched
    for k in state.params:
        np.testing.assert_array_equal(
            np.asarray(s_off.params[k]), np.asarray(state.params[k]), err_msg=k
        )
    for a, b in zip(jax.tree.leaves(o_off), jax.tree.leaves(opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ... but densification stats accumulated identically to the applied step
    assert float(jnp.sum(s_off.denom)) > 0
    np.testing.assert_array_equal(
        np.asarray(s_off.xyz_grad_accum), np.asarray(s_on.xyz_grad_accum)
    )
    np.testing.assert_array_equal(
        np.asarray(s_off.denom), np.asarray(s_on.denom)
    )

    # flag True: identical to the default 4-arg step
    s_def, o_def, _ = step(state, opt_state, jnp.int32(0), key)
    for k in state.params:
        np.testing.assert_array_equal(
            np.asarray(s_on.params[k]), np.asarray(s_def.params[k]), err_msg=k
        )
    assert float(m_off["loss"]) == float(m_on["loss"])
    # and the update genuinely changed something
    assert not np.array_equal(
        np.asarray(s_on.params["xyz"]), np.asarray(state.params["xyz"])
    )


def test_budget_probe_lowers_unsafe_tier_frac():
    """A large-footprint SfM init must start with a tier_frac the measured
    histogram supports (else iteration 1 tier-caps and forces back-off
    recompiles); a small-footprint scene keeps the default."""
    import jax.numpy as jnp

    from conftest import make_test_camera
    from gsjax.models import create_from_pcd
    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.train.loop import _probe_initial_budgets

    rng = np.random.default_rng(0)
    n = 200
    pts = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(3, 6, n)],
        axis=1,
    )
    state = create_from_pcd(
        pts, rng.uniform(0, 1, (n, 3)), spatial_lr_scale=2.0, capacity=256
    )
    # blow the scales up so every gaussian spans many tiles
    import dataclasses

    p = dict(state.params)
    p["scaling"] = jnp.full_like(p["scaling"], -0.5)
    big = dataclasses.replace(state, params=p)
    cams = [make_test_camera(128, 128, seed=1)]
    settings = RasterizeSettings(
        max_pairs=1 << 14, max_tiles_per_gauss=16, tier_frac=0.875
    )
    probed = _probe_initial_budgets(settings, big, cams, 128, 128)
    assert probed.tier_frac < 0.875

    # tiny footprints: default survives
    p["scaling"] = jnp.full_like(p["scaling"], -5.0)
    small = dataclasses.replace(state, params=p)
    probed2 = _probe_initial_budgets(settings, small, cams, 128, 128)
    assert probed2.tier_frac == 0.875
