"""Unit tests: math utilities vs numpy/scipy oracles (SURVEY.md §7.1 stage 1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gsjax.utils.math import (
    build_covariance,
    build_scaling_rotation,
    inverse_sigmoid,
    quat_to_rotmat,
    strip_symmetric,
    unstrip_symmetric,
)
from gsjax.utils.sh import C0, eval_sh, num_sh_coeffs, rgb_to_sh, sh_basis, sh_to_rgb
from gsjax.utils.camera import (
    focal_to_fov,
    fov_to_focal,
    projection_matrix,
    world_to_view,
)
from gsjax.utils.schedules import expon_lr_schedule


def test_quat_to_rotmat_vs_scipy(rng):
    from scipy.spatial.transform import Rotation

    q = rng.normal(size=(50, 4))
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    # scipy uses (x, y, z, w) ordering
    R_ref = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)


def test_rotmat_orthonormal(rng):
    q = rng.normal(size=(20, 4))
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_covariance_psd_and_eigvals(rng):
    s = np.exp(rng.normal(size=(20, 3)))
    q = rng.normal(size=(20, 4))
    cov = np.asarray(build_covariance(jnp.asarray(s), jnp.asarray(q)))
    np.testing.assert_allclose(cov, np.swapaxes(cov, 1, 2), atol=1e-6)
    eig = np.linalg.eigvalsh(cov)
    np.testing.assert_allclose(np.sort(eig, axis=1), np.sort(s**2, axis=1), rtol=1e-4)


def test_strip_unstrip_roundtrip(rng):
    s = np.exp(rng.normal(size=(10, 3)))
    q = rng.normal(size=(10, 4))
    cov = build_covariance(jnp.asarray(s), jnp.asarray(q))
    np.testing.assert_allclose(
        np.asarray(unstrip_symmetric(strip_symmetric(cov))), np.asarray(cov), atol=1e-7
    )


def test_scaling_rotation_composition(rng):
    s = np.exp(rng.normal(size=(5, 3)))
    q = rng.normal(size=(5, 4))
    L = np.asarray(build_scaling_rotation(jnp.asarray(s), jnp.asarray(q)))
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(L, R * s[:, None, :], atol=1e-6)


def test_inverse_sigmoid():
    x = jnp.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        np.asarray(1 / (1 + np.exp(-inverse_sigmoid(x)))), np.asarray(x), atol=1e-6
    )


def test_sh_dc_only_is_constant(rng):
    sh = jnp.zeros((4, 16, 3)).at[:, 0, :].set(1.0)
    dirs = jnp.asarray(rng.normal(size=(4, 3)))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    out = eval_sh(sh, dirs, 0)
    np.testing.assert_allclose(np.asarray(out), C0, atol=1e-6)


def test_sh_degree_masking(rng):
    sh = jnp.asarray(rng.normal(size=(8, 16, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    for deg in range(4):
        k = num_sh_coeffs(deg)
        truncated = sh.at[:, k:, :].set(0.0)
        np.testing.assert_allclose(
            np.asarray(eval_sh(sh, dirs, deg)),
            np.asarray(eval_sh(truncated, dirs, 3)),
            atol=1e-6,
        )


def test_sh_basis_orthonormality(rng):
    # Monte-Carlo: int_{S^2} Y_i Y_j dOmega = delta_ij
    n = 50_000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    B = np.asarray(sh_basis(jnp.asarray(v, dtype=jnp.float32)))
    gram = 4 * np.pi * (B.T @ B) / n
    np.testing.assert_allclose(gram, np.eye(16), atol=0.1)


def test_rgb_sh_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(size=(10, 3)))
    np.testing.assert_allclose(
        np.asarray(sh_to_rgb(rgb_to_sh(rgb))), np.asarray(rgb), atol=1e-6
    )


def test_world_to_view_inverse(rng):
    from scipy.spatial.transform import Rotation

    R = Rotation.random(random_state=0).as_matrix()  # camera-to-world
    t = rng.normal(size=3)
    w2v = world_to_view(R, t)
    # reference convention: upper-left block is R^T, translation t
    np.testing.assert_allclose(w2v[:3, :3], R.T, atol=1e-6)
    np.testing.assert_allclose(w2v[:3, 3], t, atol=1e-6)
    # a point on the optical axis in front of the camera has positive view z
    center = np.linalg.inv(w2v)[:3, 3]
    fwd = R @ np.array([0, 0, 1.0])
    p = np.append(center + 2.5 * fwd, 1.0)
    np.testing.assert_allclose((w2v @ p)[:3], [0, 0, 2.5], atol=1e-5)


def test_projection_matrix_matches_reference_layout():
    znear, zfar = 0.01, 100.0
    fovx, fovy = 0.9, 0.7
    P = projection_matrix(znear, zfar, fovx, fovy)
    assert P[3, 2] == 1.0  # w = view z
    # z mapping: znear -> ~0, zfar -> 1 after perspective divide
    for z, expected in [(zfar, 1.0)]:
        clip = P @ np.array([0, 0, z, 1.0])
        np.testing.assert_allclose(clip[2] / clip[3], expected, atol=1e-5)
    # x at the frustum edge maps to ndc 1
    x_edge = np.tan(fovx / 2) * 5.0
    clip = P @ np.array([x_edge, 0, 5.0, 1.0])
    np.testing.assert_allclose(clip[0] / clip[3], 1.0, atol=1e-5)


def test_fov_focal_roundtrip():
    assert focal_to_fov(fov_to_focal(0.9, 800), 800) == pytest.approx(0.9)


def test_expon_lr_schedule_reference_semantics():
    # endpoints + log-linear midpoint (reference utils/general_utils.py:29-62)
    f = expon_lr_schedule(1.6e-4, 1.6e-6, max_steps=30_000)
    np.testing.assert_allclose(float(f(0)), 1.6e-4, rtol=1e-4)
    np.testing.assert_allclose(float(f(30_000)), 1.6e-6, rtol=1e-4)
    np.testing.assert_allclose(
        float(f(15_000)), np.exp((np.log(1.6e-4) + np.log(1.6e-6)) / 2), rtol=1e-4
    )
    assert float(f(-1)) == 0.0
    # delay ramp
    g = expon_lr_schedule(1e-2, 1e-4, lr_delay_steps=100, lr_delay_mult=0.1)
    np.testing.assert_allclose(float(g(0)), 1e-3, rtol=1e-4)


def test_ssim_separable_matches_full_window_conv():
    """The separable shift-add SSIM must equal the reference's full 11x11
    depthwise convolution formulation (reference utils/loss_utils.py:23-63)."""
    import jax.numpy as jnp
    from jax import lax

    from gsjax.train.loss import ssim, _window

    def dw(imgs, ws=11, sigma=1.5):
        w2d = jnp.asarray(_window(ws, sigma))
        c = imgs.shape[0]
        kernel = jnp.broadcast_to(w2d, (c, 1, ws, ws))
        pad = ws // 2
        return lax.conv_general_dilated(
            imgs[None], kernel, (1, 1), [(pad, pad), (pad, pad)],
            feature_group_count=c, dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0]

    def ssim_conv(a, b):
        x = jnp.moveaxis(a, -1, 0)
        y = jnp.moveaxis(b, -1, 0)
        s = jnp.concatenate([x, y, x * x, y * y, x * y], 0)
        f = dw(s)
        mu1, mu2, exx, eyy, exy = (f[i * 3:(i + 1) * 3] for i in range(5))
        s1, s2, s12 = exx - mu1 * mu1, eyy - mu2 * mu2, exy - mu1 * mu2
        c1, c2 = 1e-4, 9e-4
        return (
            ((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
            / ((mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
        ).mean()

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(0, 1, (67, 93, 3)).astype(np.float32))
    b = jnp.asarray((np.asarray(a) * 0.8 + 0.1).astype(np.float32))
    np.testing.assert_allclose(
        float(ssim(a, b)), float(ssim_conv(a, b)), atol=1e-6
    )


def test_covariance6_matches_matrix_form():
    """The scalar-channel covariance must equal strip(L @ L^T) exactly."""
    import jax.numpy as jnp

    from gsjax.utils.math import build_covariance, covariance6, strip_symmetric

    rng = np.random.default_rng(3)
    scale = jnp.asarray(np.exp(rng.normal(-1, 0.5, (500, 3))))
    quat = jnp.asarray(rng.normal(size=(500, 4)))
    for mod in (1.0, 0.7):
        want = strip_symmetric(build_covariance(scale, quat, mod))
        got = covariance6(scale, quat, mod)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
