#!/usr/bin/env python
"""Generate pinned-seed golden render + gradient snapshots (VERDICT r2 #5).

The reference validates its CUDA rasterizer against pure-torch dual paths
(reference: gaussian_renderer/__init__.py:62-80) and, in BASELINE.md terms,
our renderer should `allclose` the CUDA one. No CUDA-capable environment is
available to this builder (the diff-gaussian-rasterization submodule is
unpopulated, and the image has no GPU), so true cross-implementation
goldens cannot be produced here — what CAN be pinned is our own oracle:
this script runs the naive all-pairs renderer (`render_naive`) at fixed
seeds on CPU in float32/HIGHEST precision and snapshots the image,
final transmittance, radii, and all six gradient groups
(means3d / scales / rotations / opacities / SHs / screen-space means2d).
`tests/test_goldens.py` then anchors BOTH backends (XLA scan and Pallas
interpret) against the committed npz, so any semantic drift in the
pipeline — culling, EWA math, blending, VJP — fails loudly even if the
internal cross-checks drift together.

Regenerated round 5: colors/opacities are now f16-quantized inside
``preprocess`` (gsjax/ops/projection.py::quantize_f16 — enables the
8-column packed pair table; <= 2.4e-4 relative, two orders below 8-bit
output quantization), which legitimately moves every golden by ~1e-4.

Usage: python scripts/make_goldens.py   (writes evidence/goldens/*.npz)
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

# a sitecustomize may have pre-imported jax pinned to the TPU plugin; the
# config update wins over the frozen env var (same dance as tests/conftest)
import jax as _jax

_jax.config.update("jax_platforms", "cpu")


def golden_case(seed, n, width, height, log_scale, fov_x=0.9):
    """One pinned case: scene + camera + loss grads via the naive oracle."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    from gsjax.data.cameras import Camera
    from gsjax.ops.rasterize import render_naive

    rng = np.random.default_rng(seed)
    means = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)],
        axis=1,
    ).astype(np.float32)
    scales = np.exp(rng.normal(log_scale, 0.5, (n, 3))).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = (1.0 / (1.0 + np.exp(-rng.normal(0, 1, (n, 1))))).astype(np.float32)
    shs = (rng.normal(0, 0.3, (n, 16, 3)) * 0.5).astype(np.float32)
    shs[:, 0] += 0.5
    bg = np.array([0.13, 0.07, 0.21], np.float32)

    cam = Camera(
        uid=0, image_name=f"golden{seed}", R=np.eye(3), T=np.zeros(3),
        fov_x=fov_x, fov_y=fov_x * height / width, width=width, height=height,
    )
    rcam = cam.to_render_camera()

    # a fixed random projection makes the loss sensitive to every pixel in
    # a non-uniform way (mean() alone hides many bugs behind symmetry)
    wimg = rng.normal(0, 1, (height, width, 3)).astype(np.float32)

    def run(means, scales, quats, opac, shs, m2d):
        out = render_naive(
            rcam, means, scales, quats, opac, shs, 3, jnp.asarray(bg),
            means2d_offset=m2d,
        )
        return out

    def loss_fn(args):
        out = run(*args)
        return jnp.sum(out["render"] * wimg)

    m2d0 = jnp.zeros((n, 2), jnp.float32)
    args = tuple(map(jnp.asarray, (means, scales, quats, opac, shs))) + (m2d0,)
    out = jax.jit(run)(*args)
    grads = jax.jit(jax.grad(loss_fn))(args)

    return {
        "seed": np.int32(seed),
        "means3d": means, "scales": scales, "quats": quats,
        "opacities": opac, "shs": shs, "bg": bg, "wimg": wimg,
        "fov_x": np.float32(fov_x),
        "width": np.int32(width), "height": np.int32(height),
        # camera matrices in the reference's transposed (row-vector / glm)
        # convention, so an external verifier needs NO gsjax imports to
        # build GaussianRasterizationSettings (reference
        # gaussian_renderer/__init__.py:36-49)
        "viewmatrix": np.asarray(rcam.world_view, np.float32),
        "projmatrix": np.asarray(rcam.full_proj, np.float32),
        "campos": np.asarray(rcam.camera_center, np.float32),
        "tan_fovx": np.float32(rcam.tan_fov_x),
        "tan_fovy": np.float32(rcam.tan_fov_y),
        "sh_degree": np.int32(3),
        # tolerances an external (CUDA) verification should apply: float
        # reassociation across implementations, same budget as the live
        # pallas/xla cross-check in bench.py
        "tol_img": np.float32(5e-3),
        "tol_grad_rel": np.float32(5e-3),
        "render": np.asarray(out["render"]),
        "final_T": np.asarray(out["final_T"]),
        "radii": np.asarray(out["radii"]),
        "g_means3d": np.asarray(grads[0]),
        "g_scales": np.asarray(grads[1]),
        "g_quats": np.asarray(grads[2]),
        "g_opacities": np.asarray(grads[3]),
        "g_shs": np.asarray(grads[4]),
        "g_means2d": np.asarray(grads[5]),
    }


CASES = [
    # (name, seed, n, width, height, log_scale)
    ("small_blobs", 11, 160, 64, 64, -1.6),  # big overlapping splats
    ("trained_like", 12, 600, 96, 64, -3.2),  # small footprints, more gaussians
]


def verify_external(out_dir):
    """Feed the committed golden inputs through the UPSTREAM CUDA
    rasterizer (graphdeco-inria/diff-gaussian-rasterization) and compare
    against the committed expectations — the one-command procedure that
    closes the cross-implementation gap the day a CUDA box exists
    (VERDICT r3 missing #5 / next-round #9).

    Run on a CUDA machine with the upstream wheel installed:
        pip install git+https://github.com/graphdeco-inria/diff-gaussian-rasterization
        python scripts/make_goldens.py --verify-external

    Needs ONLY numpy + torch + the wheel (no gsjax imports): every input,
    camera matrix, expected output, and tolerance is inside each npz.
    """
    import glob

    import torch
    from diff_gaussian_rasterization import (
        GaussianRasterizationSettings, GaussianRasterizer,
    )

    dev = torch.device("cuda")
    failures = []
    for path in sorted(glob.glob(os.path.join(out_dir, "*.npz"))):
        z = np.load(path)
        t = lambda a, g=False: torch.tensor(  # noqa: E731
            np.asarray(a), device=dev, dtype=torch.float32, requires_grad=g
        )
        means3d = t(z["means3d"], g=True)
        scales = t(z["scales"], g=True)
        quats = t(z["quats"], g=True)
        opac = t(z["opacities"], g=True)
        shs = t(z["shs"], g=True)
        means2d = torch.zeros_like(means3d, requires_grad=True)
        means2d.retain_grad()
        settings = GaussianRasterizationSettings(
            image_height=int(z["height"]), image_width=int(z["width"]),
            tanfovx=float(z["tan_fovx"]), tanfovy=float(z["tan_fovy"]),
            bg=t(z["bg"]), scale_modifier=1.0,
            viewmatrix=t(z["viewmatrix"]), projmatrix=t(z["projmatrix"]),
            sh_degree=int(z["sh_degree"]), campos=t(z["campos"]),
            prefiltered=False, debug=False,
        )
        rast = GaussianRasterizer(raster_settings=settings)
        img, radii = rast(
            means3D=means3d, means2D=means2d, shs=shs, opacities=opac,
            scales=scales, rotations=quats,
        )
        # golden render is (H, W, 3); CUDA returns (3, H, W)
        img_hwc = img.permute(1, 2, 0)
        wimg = t(z["wimg"])
        loss = (img_hwc * wimg).sum()
        loss.backward()

        name = os.path.basename(path)
        tol_img = float(z["tol_img"])
        tol_rel = float(z["tol_grad_rel"])
        d_img = (img_hwc.detach().cpu().numpy() - z["render"]).__abs__().max()
        ok = d_img <= tol_img
        print(f"{name}: image max|diff| {d_img:.2e} "
              f"({'OK' if ok else 'FAIL'} vs {tol_img})")
        if not ok:
            failures.append(f"{name}:image")
        for key, g in (
            ("g_means3d", means3d.grad), ("g_scales", scales.grad),
            ("g_quats", quats.grad), ("g_opacities", opac.grad),
            ("g_shs", shs.grad),
            # reference surfaces screen-space mean grads via the zero
            # tensor's retained grad, [:, :2] (scene/gaussian_model.py:406)
            ("g_means2d", means2d.grad[:, :2] if means2d.grad is not None
             else None),
        ):
            if g is None:
                print(f"{name}: {key} missing grad — FAIL")
                failures.append(f"{name}:{key}")
                continue
            got = g.detach().cpu().numpy()
            want = z[key]
            scale = max(float(np.abs(want).max()), 1.0)
            d = float(np.abs(got - want).max())
            ok = d <= tol_rel * scale
            print(f"{name}: {key} max|diff| {d:.2e} "
                  f"({'OK' if ok else 'FAIL'} vs {tol_rel}*{scale:.2e})")
            if not ok:
                failures.append(f"{name}:{key}")
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all goldens verified against the CUDA rasterizer")
    return 0


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--verify-external", action="store_true",
                    help="verify committed goldens against the upstream "
                         "CUDA rasterizer (requires a CUDA box with the "
                         "diff-gaussian-rasterization wheel)")
    args = ap.parse_args()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "evidence", "goldens",
    )
    if args.verify_external:
        return verify_external(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    try:
        git = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True
        ).stdout.strip()
    except OSError:
        git = "unknown"
    for name, seed, n, w, h, ls in CASES:
        d = golden_case(seed, n, w, h, ls)
        d["git"] = np.bytes_(git.encode())
        path = os.path.join(out_dir, f"{name}.npz")
        np.savez_compressed(path, **d)
        print(f"wrote {path}: render {d['render'].shape}, "
              f"|g_means3d| {np.abs(d['g_means3d']).max():.4f}")


if __name__ == "__main__":
    sys.exit(main())
