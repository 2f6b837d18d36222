"""Renderer tests: tiled pipeline vs naive oracle, forward and gradients.

This is BASELINE.json config 1 (synthetic scene, allclose fwd + bwd) and the
gsjax analogue of the reference's dual-path correctness oracles (SURVEY §4).

All tests share one scene size (N=256 Gaussians, 64x64) and a handful of
jitted programs — CPU compiles of the full pipeline are expensive, steady
state is not.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.ops import RasterizeSettings, render, render_naive
from gsjax.ops.projection import preprocess, num_tiles
from gsjax.ops.binning import build_tile_bins

from conftest import make_test_camera, make_test_gaussians

N = 256
W = H = 64
SETTINGS = RasterizeSettings(max_pairs=1 << 16, max_splats_per_tile=512, chunk=32)
BG = jnp.zeros(3)
WHITE = jnp.ones(3)


def scene(seed=0, cam_seed=None):
    rng = np.random.default_rng(seed)
    cam = make_test_camera(width=W, height=H, seed=cam_seed).to_render_camera()
    gs = tuple(jnp.asarray(g) for g in make_test_gaussians(N, rng))
    return cam, gs


def full_args(gs, mask=None, offset=None):
    means, scales, quats, ops, shs = gs
    if mask is None:
        mask = jnp.ones(N, bool)
    if offset is None:
        offset = jnp.zeros((N, 2))
    return means, scales, quats, ops, shs, mask, offset


@functools.cache
def tiled_fn():
    @jax.jit
    def f(cam, means, scales, quats, ops, shs, mask, offset, bg, scale_modifier):
        return render(
            cam, means, scales, quats, ops, shs, 3, bg, SETTINGS,
            scale_modifier=scale_modifier, active_mask=mask, means2d_offset=offset,
        )

    return f


@functools.cache
def naive_fn():
    @jax.jit
    def f(cam, means, scales, quats, ops, shs, mask, offset, bg, scale_modifier):
        return render_naive(
            cam, means, scales, quats, ops, shs, 3, bg,
            scale_modifier=scale_modifier, active_mask=mask, means2d_offset=offset,
        )

    return f


def _probe_loss(render_fn, **settings_kw):
    def loss(cam, means, scales, quats, ops, shs, mask, offset, probe):
        out = render_fn(
            cam, means, scales, quats, ops, shs, 3, BG, scale_modifier=1.0,
            active_mask=mask, means2d_offset=offset, **settings_kw,
        )
        return jnp.sum(out["render"] * probe)

    return jax.jit(jax.grad(loss, argnums=(1, 2, 3, 4, 5, 7)))


@functools.cache
def tiled_grad():
    return _probe_loss(render, settings=SETTINGS)


@functools.cache
def naive_grad():
    return _probe_loss(render_naive)


def test_tiled_matches_naive_forward():
    for cam_seed, bg in [(None, BG), (3, WHITE)]:
        cam, gs = scene(cam_seed=cam_seed)
        args = full_args(gs)
        out_t = tiled_fn()(cam, *args, bg, 1.0)
        out_n = naive_fn()(cam, *args, bg, 1.0)
        assert int(out_t["num_dropped"]) == 0
        np.testing.assert_allclose(
            np.asarray(out_t["render"]), np.asarray(out_n["render"]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_t["final_T"]), np.asarray(out_n["final_T"]), atol=2e-5
        )
        np.testing.assert_array_equal(
            np.asarray(out_t["radii"]), np.asarray(out_n["radii"])
        )


def test_tiled_matches_naive_gradients():
    cam, gs = scene()
    args = full_args(gs)
    probe = jax.random.normal(jax.random.PRNGKey(0), (H, W, 3))
    g_t = tiled_grad()(cam, *args, probe)
    g_n = naive_grad()(cam, *args, probe)
    names = ["means3d", "scales", "quats", "opacities", "shs", "means2d"]
    for name, a, b in zip(names, g_t, g_n):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        assert np.abs(a).max() > 0, name
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=2e-3, err_msg=name)


def test_background_compositing():
    cam, gs = scene()
    means = gs[0].at[:, 2].set(-5.0)  # all behind camera
    out = tiled_fn()(cam, means, *gs[1:], *full_args(gs)[5:], WHITE, 1.0)
    np.testing.assert_allclose(np.asarray(out["render"]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["final_T"]), 1.0, atol=1e-6)
    assert not np.asarray(out["visibility_filter"]).any()


def test_active_mask_excludes_gaussians():
    cam, gs = scene()
    half = jnp.arange(N) < N // 2
    out_masked = tiled_fn()(cam, *full_args(gs, mask=half), BG, 1.0)
    # same result as moving the masked-out gaussians behind the camera
    means_moved = gs[0].at[N // 2 :, 2].set(-5.0)
    out_moved = tiled_fn()(cam, means_moved, *gs[1:], *full_args(gs)[5:], BG, 1.0)
    np.testing.assert_allclose(
        np.asarray(out_masked["render"]), np.asarray(out_moved["render"]), atol=1e-5
    )
    assert not np.asarray(out_masked["visibility_filter"][N // 2 :]).any()


def test_scale_modifier_shrinks_footprint():
    cam, gs = scene()
    args = full_args(gs)
    r1 = np.asarray(tiled_fn()(cam, *args, BG, 1.0)["radii"])
    r2 = np.asarray(tiled_fn()(cam, *args, BG, 0.2)["radii"])
    assert (r2 <= r1).all() and r2.sum() < r1.sum()


def test_opacity_aware_binning_exact_and_smaller():
    """min(3sigma, r_op) binning rects drop only pairs the compositor
    zeroes (alpha < 1/255): strictly fewer pairs on a low-opacity scene,
    same image/radii/gradients vs plain 3-sigma binning up to float
    reassociation (~1 ulp: shorter pair lists change XLA's reduction
    trees). The reference always bins at 3 sigma (forward.cu [upstream]);
    our kernels share its alpha >= 1/255 skip, which is what makes the
    shrink exact."""
    cam, gs = scene()
    means, scales, quats, _, shs = gs
    # opacities spanning sub-1/255 .. 0.88 so the shrink actually bites
    ops = jax.nn.sigmoid(jnp.linspace(-7.0, 2.0, N))
    args = full_args((means, scales, quats, ops, shs))

    off = dataclasses.replace(SETTINGS, opacity_aware_radius=False)

    @jax.jit
    def both(cam, means, scales, quats, ops, shs, mask, offset):
        kw = dict(active_mask=mask, means2d_offset=offset)
        a = render(cam, means, scales, quats, ops, shs, 3, BG, SETTINGS, **kw)
        b = render(cam, means, scales, quats, ops, shs, 3, BG, off, **kw)
        sp_on = preprocess(means, scales, quats, ops, shs, cam, 3,
                           opacity_aware_radius=True)
        sp_off = preprocess(means, scales, quats, ops, shs, cam, 3,
                            opacity_aware_radius=False)
        return a, b, sp_on.tiles_touched, sp_off.tiles_touched

    a, b, t_on, t_off = both(cam, *args)
    t_on, t_off = np.asarray(t_on), np.asarray(t_off)
    assert (t_on <= t_off).all() and t_on.sum() < t_off.sum()
    # fully sub-threshold gaussians bin to zero tiles
    assert t_on[np.asarray(jax.nn.sigmoid(jnp.linspace(-7.0, 2.0, N))) < 1 / 255].max() == 0
    np.testing.assert_allclose(
        np.asarray(a["render"]), np.asarray(b["render"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a["final_T"]), np.asarray(b["final_T"]), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(a["radii"]), np.asarray(b["radii"]))

    probe = jax.random.normal(jax.random.PRNGKey(1), (H, W, 3))
    g_on = _probe_loss(render, settings=SETTINGS)(cam, *args, probe)
    g_off = _probe_loss(render, settings=off)(cam, *args, probe)
    for name, x, y in zip(
        ["means3d", "scales", "quats", "opacities", "shs", "means2d"], g_on, g_off
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-5, rtol=1e-4, err_msg=name
        )


def test_pair_budget_overflow_reported():
    cam, gs = scene()
    out = render(
        cam, *gs, 3, BG, RasterizeSettings(max_pairs=64, max_splats_per_tile=64)
    )
    assert int(out["num_dropped"]) > 0


def test_tile_bins_structure():
    cam, gs = scene()
    tx, ty = num_tiles(cam.width, cam.height)

    @jax.jit
    def bins_fn(means, scales, quats, ops, shs):
        splats = preprocess(means, scales, quats, ops, shs, cam, 3)
        return splats, build_tile_bins(splats, tx, ty, 1 << 16)

    splats, bins = bins_fn(*gs)
    start = np.asarray(bins.tile_start)
    assert (np.diff(start) >= 0).all()
    assert start[-1] == int(bins.num_pairs)
    depth = np.asarray(splats.depths)[np.asarray(bins.pair_gauss)]
    for t in range(tx * ty):
        seg = depth[start[t] : start[t + 1]]
        assert (np.diff(seg) >= -1e-6).all(), f"tile {t} not depth sorted"
    assert int(bins.num_pairs) == int(np.asarray(splats.tiles_touched).sum())


def test_render_deterministic():
    cam, gs = scene()
    args = full_args(gs)
    img1 = tiled_fn()(cam, *args, BG, 1.0)["render"]
    img2 = tiled_fn()(cam, *[a + 0 for a in args[:5]], *args[5:], BG, 1.0)["render"]
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_pallas_backend_matches_xla_forward():
    """The Pallas TPU compositing kernel (run in interpreter mode on CPU)
    must reproduce the XLA-scan renderer bit-for-bit up to reassociation."""
    pallas_settings = RasterizeSettings(
        max_pairs=1 << 16, backend="pallas", pallas_chunk=128
    )
    for cam_seed, bg in [(None, BG), (3, WHITE)]:
        cam, gs = scene(cam_seed=cam_seed)
        args = full_args(gs)
        out_x = tiled_fn()(cam, *args, bg, 1.0)
        out_p = render(
            cam, *gs, 3, bg, pallas_settings,
            active_mask=args[5], means2d_offset=args[6],
        )
        np.testing.assert_allclose(
            np.asarray(out_p["render"]), np.asarray(out_x["render"]), atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_p["final_T"]), np.asarray(out_x["final_T"]), atol=3e-5
        )


def test_pallas_backend_matches_xla_gradients():
    """Custom-VJP (Pallas backward kernel + deterministic segment reduce)
    vs XLA autodiff through the scan renderer."""
    cam, gs = scene()
    args = full_args(gs)
    pallas_grad = _probe_loss(
        render,
        settings=RasterizeSettings(
            max_pairs=1 << 16, backend="pallas", pallas_chunk=128
        ),
    )
    probe = jnp.asarray(np.random.default_rng(7).normal(size=(H, W, 3)))
    g_p = pallas_grad(cam, *args, probe)
    g_x = tiled_grad()(cam, *args, probe)
    for name, a, b in zip(
        ["means3d", "scales", "quats", "opacities", "shs", "offset"], g_p, g_x
    ):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4, err_msg=name
        )


def test_binning_overflow_cause_separation():
    """num_mt_capped isolates pairs lost to the per-gaussian tile cap from
    pairs lost to the global budget, so the trainer can grow the right
    knob (gsjax/train/loop.py overflow handler)."""
    from gsjax.ops.projection import Splats

    n, mt = 8, 4
    rect_min = jnp.zeros((n, 2), jnp.int32)
    rect_max = jnp.broadcast_to(jnp.asarray([[3, 2]], jnp.int32), (n, 2))
    touched = jnp.full((n,), 6, jnp.int32)  # 6 tiles each; cap mt=4
    splats = Splats(
        means2d=jnp.zeros((n, 2)), depths=jnp.linspace(1, 2, n),
        conics=jnp.zeros((n, 3)), colors=jnp.zeros((n, 3)),
        opacities=jnp.zeros(n), radii=jnp.ones(n, jnp.int32),
        rect_min=rect_min, rect_max=rect_max, tiles_touched=touched,
    )
    # ample budget: every drop is an MT cap
    bins = build_tile_bins(splats, 4, 4, max_pairs=1 << 10,
                           max_tiles_per_gauss=mt)
    assert int(bins.num_mt_capped) == n * 2
    assert int(bins.num_dropped) == n * 2
    # tight budget (16 < 8*4=32 capped pairs): both causes present
    bins = build_tile_bins(splats, 4, 4, max_pairs=16,
                           max_tiles_per_gauss=mt)
    assert int(bins.num_mt_capped) == n * 2
    assert int(bins.num_dropped) == n * 6 - 16
    assert int(bins.num_dropped) - int(bins.num_mt_capped) == n * 4 - 16


def test_mark_visible_frustum():
    """mark_visible: points in front of the camera beyond `near` are
    visible; points behind or closer than `near` are not (the rasterizer's
    external-culling API, SURVEY.md §2.2 N1 markVisible)."""
    from gsjax.ops import mark_visible

    cam = make_test_camera(width=W, height=H, seed=None).to_render_camera()
    # camera at origin looking down +z (identity R, zero T in test fixture)
    pts = jnp.asarray(
        [
            [0.0, 0.0, 5.0],   # in front
            [0.0, 0.0, -5.0],  # behind
            [0.0, 0.0, 0.1],   # closer than near=0.2
            [50.0, 0.0, 5.0],  # far off-axis but in front of near plane
        ]
    )
    vis = np.asarray(mark_visible(pts, cam))
    assert vis.tolist() == [True, False, False, True]


def test_grad_reduce_sort_matches_gather():
    """The payload-through-sort backward reduction must agree with the
    gather-based one. Both sum the same per-pair grads in the same segment
    order, but over different array lengths, so the blocked cumulative sum
    groups partial sums differently — near-exact, not bit-exact."""
    cam, gs = scene()
    args = full_args(gs)
    probe = jnp.asarray(np.random.default_rng(11).normal(size=(H, W, 3)))
    grads = {}
    for mode in ("gather", "sort"):
        fn = _probe_loss(
            render,
            settings=RasterizeSettings(
                max_pairs=1 << 16, backend="pallas", pallas_chunk=128,
                grad_reduce=mode,
            ),
        )
        grads[mode] = fn(cam, *args, probe)
    for name, a, b in zip(
        ["means3d", "scales", "quats", "opacities", "shs", "offset"],
        grads["gather"], grads["sort"],
    ):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-4,
            err_msg=name,
        )


def test_grad_reduce_sort_bf16_packed():
    """grad_dtype='bfloat16' + grad_reduce='sort' takes the packed single-
    sort path: slot keys ride as four exact base-256 bf16 digits and the 9
    grad columns pack pairwise into u32 words for ONE 6-operand sort.
    Per-pair grads are bf16-quantized (~0.4% relative), accumulation stays
    f32 — compare against the f32 path with a correspondingly loose
    tolerance."""
    cam, gs = scene()
    args = full_args(gs)
    probe = jnp.asarray(np.random.default_rng(19).normal(size=(H, W, 3)))
    grads = {}
    for dt in ("float32", "bfloat16"):
        fn = _probe_loss(
            render,
            settings=RasterizeSettings(
                max_pairs=1 << 16, backend="pallas", pallas_chunk=128,
                grad_reduce="sort", grad_dtype=dt,
            ),
        )
        grads[dt] = fn(cam, *args, probe)
    for name, a, b in zip(
        ["means3d", "scales", "quats", "opacities", "shs", "offset"],
        grads["float32"], grads["bfloat16"],
    ):
        assert np.isfinite(np.asarray(b)).all(), name
        scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-2,
            err_msg=name,
        )


def test_pallas_gradients_with_inactive_slots():
    """Padding slots (active_mask False) must not poison gradients in the
    pallas backend (sort-payload reduction included) — the NaN-from-
    zero-padding pitfall class."""
    cam, gs = scene()
    mask = jnp.arange(N) < N // 2
    args = full_args(gs, mask=mask)
    probe = jnp.asarray(np.random.default_rng(13).normal(size=(H, W, 3)))
    g_p = _probe_loss(
        render,
        settings=RasterizeSettings(
            max_pairs=1 << 16, backend="pallas", pallas_chunk=128
        ),
    )(cam, *args, probe)
    g_x = tiled_grad()(cam, *args, probe)
    for name, a, b in zip(
        ["means3d", "scales", "quats", "opacities", "shs", "offset"], g_p, g_x
    ):
        assert np.isfinite(np.asarray(a)).all(), name
        scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4,
            err_msg=name,
        )


import pytest


@pytest.mark.parametrize("grad_dtype", ["float32", "bfloat16"])
def test_sort_reduce_budget_overflow_grads_finite(grad_dtype):
    """grad_reduce='sort' under pair-budget overflow takes the scatter-min
    boundary path; gradients must stay finite and num_dropped reported
    (both the f32 two-sort and the packed-bf16 single-sort encodings)."""
    cam, gs = scene()
    settings = RasterizeSettings(
        max_pairs=1 << 9, max_splats_per_tile=512, backend="pallas",
        pallas_chunk=128, grad_reduce="sort", grad_dtype=grad_dtype,
    )
    out = render(cam, *gs, 3, BG, settings)
    assert int(out["num_dropped"]) > 0
    args = full_args(gs)
    probe = jnp.asarray(np.random.default_rng(17).normal(size=(H, W, 3)))
    g = _probe_loss(render, settings=settings)(cam, *args, probe)
    for name, a in zip(
        ["means3d", "scales", "quats", "opacities", "shs", "offset"], g
    ):
        assert np.isfinite(np.asarray(a)).all(), name


def test_precomputed_paths_match_internal():
    """--compute_cov3D_python / --convert_SHs_python parity: feeding
    externally precomputed covariance / colors must reproduce the internal
    preprocess exactly (the reference's dual-path oracle, SURVEY.md §4)."""
    from gsjax.utils.math import covariance6, safe_normalize
    from gsjax.utils.sh import eval_sh

    cam, gs = scene()
    means, scales, quats, ops, shs = gs
    base = render(cam, *gs, 3, BG, SETTINGS)

    cov3d = covariance6(scales, quats, 1.0)
    out_cov = render(cam, *gs, 3, BG, SETTINGS, cov3d_precomp=cov3d)
    np.testing.assert_array_equal(
        np.asarray(base["render"]), np.asarray(out_cov["render"])
    )

    dirs = safe_normalize(means - cam.camera_center[None, :])
    colors = jnp.maximum(eval_sh(shs, dirs, 3) + 0.5, 0.0)
    out_col = render(cam, *gs, 3, BG, SETTINGS, colors_precomp=colors)
    np.testing.assert_array_equal(
        np.asarray(base["render"]), np.asarray(out_col["render"])
    )


def test_exact_depth_sort_matches_quantized():
    """With depths separated beyond the quantized-key precision, the packed
    uint32 keys must order pairs identically to the exact two-key sort; on a
    random scene (where near-tie depths may legally swap under quantization)
    renders stay allclose."""
    from gsjax.ops.projection import Splats

    # Binning-level: 64x64 image -> 16 tiles -> 27 depth bits (~2^-18 rel
    # precision); spacing depths by 1e-3 around 2.0 is ~2000x the key step.
    n, mt = 256, 16
    rng = np.random.default_rng(3)
    depths = jnp.asarray(1.5 + 1e-3 * rng.permutation(n), jnp.float32)
    rect_min = jnp.asarray(rng.integers(0, 3, size=(n, 2)), jnp.int32)
    extent = jnp.asarray(rng.integers(1, 3, size=(n, 2)), jnp.int32)
    rect_max = jnp.minimum(rect_min + extent, 4)
    touched = (rect_max - rect_min).prod(axis=1)
    zeros = jnp.zeros(n)
    splats = Splats(
        means2d=jnp.zeros((n, 2)), depths=depths, conics=jnp.zeros((n, 3)),
        colors=jnp.zeros((n, 3)), opacities=zeros,
        radii=jnp.ones(n, jnp.int32), rect_min=rect_min, rect_max=rect_max,
        tiles_touched=touched,
    )
    kw = dict(tiles_x=4, tiles_y=4, max_pairs=1 << 16, max_tiles_per_gauss=mt)
    bins_e = build_tile_bins(splats, exact_depth_sort=True, **kw)
    bins_q = build_tile_bins(splats, exact_depth_sort=False, **kw)
    np.testing.assert_array_equal(
        np.asarray(bins_e.pair_slot), np.asarray(bins_q.pair_slot)
    )
    np.testing.assert_array_equal(
        np.asarray(bins_e.tile_start), np.asarray(bins_q.tile_start)
    )

    # Render-level: random depths may tie in the quantized key (slot-order
    # fallback), so bit-exactness is not guaranteed -- only tiny diffs.
    cam, gs = scene()
    exact = RasterizeSettings(
        max_pairs=1 << 16, max_splats_per_tile=512, exact_depth_sort=True
    )
    out_e = render(cam, *gs, 3, BG, exact)
    out_q = tiled_fn()(cam, *full_args(gs), BG, 1.0)
    np.testing.assert_allclose(
        np.asarray(out_e["render"]), np.asarray(out_q["render"]), atol=1e-5
    )


def test_odd_resolution_renders():
    """Resolutions that are not multiples of the 16px tile must render
    without crashing, match the naive oracle, and keep the padding region
    out of the output (verify-skill edge-case list)."""
    w, h = 72, 40  # 4.5 x 2.5 tiles
    rng = np.random.default_rng(2)
    from conftest import make_test_camera, make_test_gaussians

    cam = make_test_camera(width=w, height=h).to_render_camera()
    gs = tuple(jnp.asarray(g) for g in make_test_gaussians(64, rng))
    out = render(
        cam, *gs, 3, BG,
        RasterizeSettings(max_pairs=1 << 14, max_splats_per_tile=256),
    )
    assert out["render"].shape == (h, w, 3)
    assert np.isfinite(np.asarray(out["render"])).all()
    ref = render_naive(cam, *gs, 3, BG)
    np.testing.assert_allclose(
        np.asarray(out["render"]), np.asarray(ref["render"]), atol=5e-3
    )


def test_binning_invariants_random_cases():
    """Property test over random footprints (one compiled shape): every
    non-dropped pair lands in exactly one tile segment, segments are
    depth-sorted, and counts reconcile with the caps."""
    from gsjax.ops.projection import Splats

    n, mt, tx_, ty_ = 128, 8, 4, 4

    @jax.jit
    def bins_of(depths, rect_min, rect_max, touched):
        s = Splats(
            means2d=jnp.zeros((n, 2)), depths=depths,
            conics=jnp.zeros((n, 3)), colors=jnp.zeros((n, 3)),
            opacities=jnp.zeros(n), radii=jnp.ones(n, jnp.int32),
            rect_min=rect_min, rect_max=rect_max, tiles_touched=touched,
        )
        return build_tile_bins(s, tx_, ty_, 1 << 12, max_tiles_per_gauss=mt)

    for seed in range(12):
        rng = np.random.default_rng(seed)
        rect_min = rng.integers(0, 3, size=(n, 2))
        extent = rng.integers(1, 3, size=(n, 2))
        rect_max = np.minimum(rect_min + extent, 4)
        touched = (rect_max - rect_min).prod(axis=1)
        depths = rng.uniform(1.0, 9.0, n).astype(np.float32)
        b = bins_of(jnp.asarray(depths), jnp.asarray(rect_min, jnp.int32),
                    jnp.asarray(rect_max, jnp.int32),
                    jnp.asarray(touched, jnp.int32))
        start = np.asarray(b.tile_start)
        num_pairs = int(b.num_pairs)
        capped = np.minimum(touched, mt)
        assert num_pairs == capped.sum()
        assert int(b.num_mt_capped) == (touched - capped).sum()
        assert start[-1] == num_pairs and (np.diff(start) >= 0).all()
        pg = np.asarray(b.pair_gauss)[:num_pairs]
        pt = np.asarray(b.pair_tile)[:num_pairs]
        # each gaussian appears at most once per tile, within its rect
        for t in range(tx_ * ty_):
            seg = pg[start[t]:start[t + 1]]
            assert len(np.unique(seg)) == len(seg), f"dup gaussian in tile {t}"
            d = depths[seg]
            assert (np.diff(d) >= -1e-5).all(), f"tile {t} not depth sorted"
            x, y = t % tx_, t // tx_
            assert (rect_min[seg, 0] <= x).all() and (x < rect_max[seg, 0]).all()
            assert (rect_min[seg, 1] <= y).all() and (y < rect_max[seg, 1]).all()
        # pair counts per gaussian match the cap
        counts = np.bincount(pg, minlength=n)
        np.testing.assert_array_equal(counts, capped)


def test_tile_truncation_is_surfaced():
    """A tile deeper than max_splats_per_tile must surface its drop count
    on the XLA path (the Pallas kernel never caps — reference CUDA
    allocates per frame and never drops, SURVEY.md §2.2 N1). With a
    sufficient budget the counter is zero and the backends agree."""
    rng = np.random.default_rng(7)
    n = 96
    cam = make_test_camera(width=32, height=32).to_render_camera()
    # all gaussians centered on one tile, too faint to early-terminate
    means = jnp.asarray(
        np.array([0.0, 0.0, 6.0]) + rng.normal(size=(n, 3)) * 0.02,
        jnp.float32,
    )
    scales = jnp.full((n, 3), 0.15, jnp.float32)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1))
    ops = jnp.full((n,), 0.02, jnp.float32)
    shs = jnp.asarray(rng.uniform(0.2, 0.6, size=(n, 16, 3)), jnp.float32)

    def run(mspt, backend):
        s = RasterizeSettings(
            max_pairs=1 << 14, max_splats_per_tile=mspt, chunk=32,
            backend=backend,
        )
        return render(cam, means, scales, quats, ops, shs, 3, BG, s)

    tight = run(32, "xla")
    assert int(tight["num_tile_capped"]) > 0  # the drop is surfaced
    roomy = run(128, "xla")
    assert int(roomy["num_tile_capped"]) == 0
    pallas = run(128, "pallas")
    assert int(pallas["num_tile_capped"]) == 0
    np.testing.assert_allclose(
        np.asarray(roomy["render"]), np.asarray(pallas["render"]), atol=5e-3
    )
    # the truncated render really lost light (that's what the counter flags)
    assert (
        np.asarray(tight["render"]).sum()
        < np.asarray(roomy["render"]).sum() - 1e-3
    )


def test_tiered_binning_matches_untiered():
    """Tiered binning (small-footprint gaussians expanded at mt/4 slots)
    must reproduce the untiered render and gradients exactly when nothing
    tier-caps — the permutation is internal bookkeeping (gauss_inv_perm
    un-permutes the backward reduction's row-ordered sums)."""
    cam, gs = scene()
    args = full_args(gs)
    probe = jnp.asarray(np.random.default_rng(17).normal(size=(H, W, 3)))
    base = RasterizeSettings(max_pairs=1 << 16, max_splats_per_tile=512,
                             chunk=32)
    tiered = dataclasses.replace(base, tier_frac=0.5)
    out_u = render(cam, *gs, 3, BG, base,
                   active_mask=args[5], means2d_offset=args[6])
    out_t = render(cam, *gs, 3, BG, tiered,
                   active_mask=args[5], means2d_offset=args[6])
    assert int(out_t["num_tier_capped"]) == 0
    assert int(out_t["num_dropped"]) == 0
    np.testing.assert_allclose(
        np.asarray(out_t["render"]), np.asarray(out_u["render"]), atol=2e-5
    )
    # gradients through the pallas backend exercise gauss_inv_perm in both
    # reduction modes
    g_ref = naive_grad()(cam, *args, probe)
    for mode in ("gather", "sort"):
        fn = _probe_loss(
            render,
            settings=dataclasses.replace(
                tiered, backend="pallas", pallas_chunk=128, grad_reduce=mode
            ),
        )
        g_t = fn(cam, *args, probe)
        for name, a, b in zip(
            ["means3d", "scales", "quats", "opacities", "shs", "offset"],
            g_t, g_ref,
        ):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4,
                err_msg=f"{mode}:{name}",
            )


def test_tiered_binning_tier_cap_counter():
    """When more than (1 - tier_frac) * n gaussians exceed the small-tier
    slot budget, the overflow is surfaced in num_tier_capped (subset of
    num_mt_capped) so the trainer can back tier_frac off."""
    from gsjax.ops.projection import Splats

    n, mt = 16, 8  # mt_small = 2
    rect_min = jnp.zeros((n, 2), jnp.int32)
    rect_max = jnp.broadcast_to(jnp.asarray([[2, 2]], jnp.int32), (n, 2))
    touched = jnp.full((n,), 4, jnp.int32)  # every gaussian needs 4 > 2
    splats = Splats(
        means2d=jnp.zeros((n, 2)), depths=jnp.linspace(1, 2, n),
        conics=jnp.zeros((n, 3)), colors=jnp.zeros((n, 3)),
        opacities=jnp.zeros(n), radii=jnp.ones(n, jnp.int32),
        rect_min=rect_min, rect_max=rect_max, tiles_touched=touched,
    )
    bins = build_tile_bins(splats, 4, 4, max_pairs=1 << 10,
                           max_tiles_per_gauss=mt, tier_frac=0.5)
    # 8 rows in the small tier lose (4 - 2) pairs each
    assert int(bins.num_tier_capped) == 8 * 2
    assert int(bins.num_mt_capped) == 8 * 2  # no plain mt caps (4 < 8)
    assert int(bins.num_dropped) == 8 * 2
    # pair_gauss holds ORIGINAL indices: every gaussian appears
    pg = np.asarray(bins.pair_gauss)[: int(bins.num_pairs)]
    assert set(pg.tolist()) == set(range(n))
    # inv_perm is a permutation
    inv = np.asarray(bins.gauss_inv_perm)
    assert sorted(inv.tolist()) == list(range(n))


def test_infer_kernel_matches_exact_forward():
    """Pure rendering (the custom-VJP primal) runs the n_contrib-free
    inference kernel; blend and early-termination semantics are identical
    to the training forward, so image AND final_T must match to float
    reassociation. An opaque scene saturates T fast, exercising the
    early-termination paths."""
    cam, gs = scene()
    means, scales, quats, ops, shs = gs
    gs_hi = (means, scales, quats, jnp.minimum(ops * 4.0, 0.995), shs)
    args = full_args(gs_hi)
    s = RasterizeSettings(max_pairs=1 << 16, backend="pallas",
                          pallas_chunk=128)

    def f(offset):
        out = render(
            cam, *gs_hi, 3, BG, s, active_mask=args[5], means2d_offset=offset
        )
        return out["render"], out["final_T"]

    img_i, T_i = f(args[6])  # inference kernel
    (img_e, T_e), _ = jax.vjp(f, args[6])  # training kernel forward
    np.testing.assert_allclose(np.asarray(img_i), np.asarray(img_e), atol=1e-6)
    np.testing.assert_allclose(np.asarray(T_i), np.asarray(T_e), atol=1e-7)


def test_compact_expansion_matches_grid():
    """The budget-sized compact expansion must reproduce the dense-grid
    render and gradients exactly (same pairs, same virtual slot ids), with
    a key sort of max_pairs entries instead of N*mt."""
    cam, gs = scene()
    args = full_args(gs)
    probe = jnp.asarray(np.random.default_rng(23).normal(size=(H, W, 3)))
    base = RasterizeSettings(max_pairs=1 << 16, max_splats_per_tile=512,
                             chunk=32)
    comp = dataclasses.replace(base, expansion="compact")
    out_g = render(cam, *gs, 3, BG, base,
                   active_mask=args[5], means2d_offset=args[6])
    out_c = render(cam, *gs, 3, BG, comp,
                   active_mask=args[5], means2d_offset=args[6])
    assert int(out_c["num_dropped"]) == 0
    assert int(out_c["num_tier_capped"]) == 0
    np.testing.assert_allclose(
        np.asarray(out_c["render"]), np.asarray(out_g["render"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_c["final_T"]), np.asarray(out_g["final_T"]), atol=2e-5
    )
    # gradients through the pallas backend exercise gauss_inv_perm
    g_ref = naive_grad()(cam, *args, probe)
    for mode in ("gather", "sort"):
        fn = _probe_loss(
            render,
            settings=dataclasses.replace(
                comp, backend="pallas", pallas_chunk=128, grad_reduce=mode
            ),
        )
        g_c = fn(cam, *args, probe)
        for name, a, b in zip(
            ["means3d", "scales", "quats", "opacities", "shs", "offset"],
            g_c, g_ref,
        ):
            scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-4,
                err_msg=f"{mode}:{name}",
            )


def test_compact_expansion_wide_gaussian_and_budget():
    """The compact expansion's motivating case: one near-full-frame
    gaussian among tiny ones. The grid would need N*mt slots at mt =
    frame tiles; compact sorts max_pairs entries and matches the
    unbudgeted grid exactly. Also checks budget overflow accounting."""
    from gsjax.ops.projection import Splats

    rng = np.random.default_rng(5)
    n, tiles_x, tiles_y = 64, 8, 8
    num_tiles = tiles_x * tiles_y
    # tiny 1-tile gaussians at random tiles + one covering the full frame
    tx = rng.integers(0, tiles_x, n).astype(np.int32)
    ty = rng.integers(0, tiles_y, n).astype(np.int32)
    rect_min = np.stack([tx, ty], axis=1)
    rect_max = rect_min + 1
    touched = np.ones(n, np.int32)
    rect_min[0] = (0, 0)
    rect_max[0] = (tiles_x, tiles_y)
    touched[0] = num_tiles
    splats = Splats(
        means2d=jnp.zeros((n, 2)), depths=jnp.linspace(1, 2, n),
        conics=jnp.zeros((n, 3)), colors=jnp.zeros((n, 3)),
        opacities=jnp.zeros(n), radii=jnp.ones(n, jnp.int32),
        rect_min=jnp.asarray(rect_min), rect_max=jnp.asarray(rect_max),
        tiles_touched=jnp.asarray(touched),
    )
    mt = 64  # full-frame cap
    ref = build_tile_bins(splats, tiles_x, tiles_y, max_pairs=1 << 12,
                          max_tiles_per_gauss=mt)
    got = build_tile_bins(splats, tiles_x, tiles_y, max_pairs=1 << 12,
                          max_tiles_per_gauss=mt, expansion="compact")
    np_pairs = int(ref.num_pairs)
    assert int(got.num_pairs) == np_pairs == n - 1 + num_tiles
    assert int(got.num_dropped) == 0
    # same (tile, gaussian) multiset in depth order per tile
    for b in (ref, got):
        assert np.all(np.asarray(b.pair_tile)[:np_pairs] < num_tiles)
    rg = np.asarray(ref.pair_gauss)[:np_pairs]
    rt = np.asarray(ref.pair_tile)[:np_pairs]
    cg = np.asarray(got.pair_gauss)[:np_pairs]
    ct = np.asarray(got.pair_tile)[:np_pairs]
    assert sorted(zip(rt.tolist(), rg.tolist())) == sorted(
        zip(ct.tolist(), cg.tolist())
    )
    np.testing.assert_array_equal(
        np.asarray(ref.tile_start), np.asarray(got.tile_start)
    )

    # budget overflow: only the leading budget survives, counted as dropped
    tight = build_tile_bins(splats, tiles_x, tiles_y, max_pairs=32,
                            max_tiles_per_gauss=mt, expansion="compact")
    assert int(tight.num_pairs) == 32
    assert int(tight.num_dropped) == np_pairs - 32
