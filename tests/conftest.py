"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

(SURVEY.md §4: JAX lets any mesh be tested on CPU via
``--xla_force_host_platform_device_count`` — the fake-backend multi-node
story the reference lacks.)
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# a sitecustomize may have pre-imported jax with JAX_PLATFORMS pinned to the
# TPU plugin; the config update wins over the frozen env var
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: CPU compiles of the full pipeline take ~40s;
# cache them across test runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gsjax.data.cameras import Camera  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_test_camera(width=64, height=64, fov=0.8, seed=None):
    """A camera at the origin looking down +z (COLMAP view convention),
    optionally perturbed."""
    R = np.eye(3)
    T = np.zeros(3)
    if seed is not None:
        g = np.random.default_rng(seed)
        angle = g.normal(0, 0.1, 3)
        cx, cy, cz = np.cos(angle)
        sx, sy, sz = np.sin(angle)
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        R = Rx @ Ry @ Rz
        T = g.normal(0, 0.2, 3)
    return Camera(
        uid=0,
        image_name="test",
        R=R,
        T=T,
        fov_x=fov,
        fov_y=fov * height / width,
        width=width,
        height=height,
    )


def make_test_gaussians(n, rng, spread=2.0, z_range=(4.0, 10.0)):
    """Random post-activation Gaussian attributes in front of the camera."""
    means = np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread, spread, n),
            rng.uniform(*z_range, n),
        ],
        axis=1,
    ).astype(np.float32)
    scales = np.exp(rng.normal(-2.2, 0.4, (n, 3))).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opacities = rng.uniform(0.2, 0.95, n).astype(np.float32)
    shs = (rng.normal(0, 0.3, (n, 16, 3)) * 0.5).astype(np.float32)
    shs[:, 0, :] = rng.uniform(-1.0, 1.5, (n, 3))
    return means, scales, quats, opacities, shs
