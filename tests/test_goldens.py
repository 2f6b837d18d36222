"""Committed golden-fixture regression anchors (VERDICT r2 #5).

``evidence/goldens/*.npz`` pins renders + all six gradient groups from the
naive oracle at fixed seeds (produced once by ``scripts/make_goldens.py``
on CPU at HIGHEST precision and committed). These tests anchor every
backend against the *committed* files — unlike the live oracle
cross-checks, a semantic drift that moves oracle and tile pipeline
together still fails here. The reference's analogue is its dual
python/CUDA paths (reference: gaussian_renderer/__init__.py:62-80); the
goldens are the fixture files it never shipped.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsjax.data.cameras import Camera
from gsjax.ops import RasterizeSettings, render, render_naive

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "evidence", "goldens",
)
GOLDENS = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))

TILED = RasterizeSettings(max_pairs=1 << 17, max_splats_per_tile=1024,
                          chunk=32, backend="xla")
PALLAS = RasterizeSettings(max_pairs=1 << 17, max_splats_per_tile=1024,
                           chunk=32, backend="pallas", pallas_chunk=128)


def _load(path):
    z = np.load(path)
    cam = Camera(
        uid=0, image_name="golden", R=np.eye(3), T=np.zeros(3),
        fov_x=float(z["fov_x"]),
        fov_y=float(z["fov_x"]) * int(z["height"]) / int(z["width"]),
        width=int(z["width"]), height=int(z["height"]),
    )
    args = tuple(
        jnp.asarray(z[k])
        for k in ("means3d", "scales", "quats", "opacities", "shs")
    )
    return z, cam.to_render_camera(), args


def _grads(render_fn, rcam, args, bg, wimg, settings=None):
    n = args[0].shape[0]

    def loss_fn(a):
        kw = {} if settings is None else {"settings": settings}
        out = render_fn(
            rcam, *a[:5], 3, bg, means2d_offset=a[5], **kw
        )
        return jnp.sum(out["render"] * wimg)

    m2d0 = jnp.zeros((n, 2), jnp.float32)
    return jax.jit(jax.grad(loss_fn))(args + (m2d0,))


GRAD_KEYS = ("g_means3d", "g_scales", "g_quats", "g_opacities", "g_shs",
             "g_means2d")


def _check_grads(grads, z, atol_scale):
    for g, key in zip(grads, GRAD_KEYS):
        ref = z[key]
        tol = atol_scale * max(float(np.abs(ref).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(g), ref, atol=tol, rtol=5e-3, err_msg=key
        )


@pytest.mark.parametrize("path", GOLDENS, ids=os.path.basename)
def test_naive_oracle_matches_committed_golden(path):
    """The oracle itself must reproduce the committed snapshot — catches
    accidental semantic edits to the shared preprocess/blending math."""
    z, rcam, args = _load(path)
    bg, wimg = jnp.asarray(z["bg"]), jnp.asarray(z["wimg"])
    out = jax.jit(
        lambda *a: render_naive(rcam, *a, 3, bg)
    )(*args)
    np.testing.assert_allclose(
        np.asarray(out["render"]), z["render"], atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["final_T"]), z["final_T"], atol=2e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(out["radii"]), z["radii"])
    grads = _grads(render_naive, rcam, args, bg, wimg)
    _check_grads(grads, z, atol_scale=1e-4)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("path", GOLDENS, ids=os.path.basename)
def test_tiled_pipeline_matches_committed_golden(path, backend):
    """The full budgeted tile pipeline (binning + compositing + custom VJP)
    against the committed oracle snapshot, both backends."""
    z, rcam, args = _load(path)
    bg, wimg = jnp.asarray(z["bg"]), jnp.asarray(z["wimg"])
    settings = TILED if backend == "xla" else PALLAS
    out = jax.jit(
        lambda *a: render(rcam, *a, 3, bg, settings)
    )(*args)
    assert int(out["num_dropped"]) == 0
    np.testing.assert_allclose(
        np.asarray(out["render"]), z["render"], atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["final_T"]), z["final_T"], atol=1e-3, rtol=1e-3
    )
    grads = _grads(render, rcam, args, bg, wimg, settings=settings)
    _check_grads(grads, z, atol_scale=2e-3)


def test_goldens_exist():
    assert len(GOLDENS) >= 2, (
        "golden fixtures missing — run scripts/make_goldens.py and commit "
        "evidence/goldens/*.npz"
    )
