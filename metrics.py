#!/usr/bin/env python
"""Image-quality evaluation over rendered sets — CLI-compatible with the
reference ``metrics.py`` (reference: metrics.py:36-103).

Walks ``<model>/test/<method>/{renders,gt}``, computes SSIM / PSNR (and
LPIPS-vgg when its gated weights are present — see gsjax/eval/lpips.py),
writes ``results.json`` and ``per_view.json``.

Example:
    python metrics.py -m output/lego
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def read_images(renders_dir, gt_dir):
    """reference metrics.py:24-34."""
    from PIL import Image

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        r = np.asarray(Image.open(os.path.join(renders_dir, fname)).convert("RGB"))
        g = np.asarray(Image.open(os.path.join(gt_dir, fname)).convert("RGB"))
        renders.append(r.astype(np.float32) / 255.0)
        gts.append(g.astype(np.float32) / 255.0)
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths):
    """reference metrics.py:36-93."""
    import jax
    import jax.numpy as jnp

    from gsjax.eval import lpips as lpips_mod
    from gsjax.eval.metrics import psnr
    from gsjax.train.loss import ssim

    lpips_params = None
    if lpips_mod.available():
        lpips_params = lpips_mod.load_weights()
    else:
        print(
            "LPIPS weights unavailable (no egress in this environment); "
            "reporting SSIM/PSNR only. See gsjax/eval/lpips.py."
        )

    ssim_j = jax.jit(ssim)
    psnr_j = jax.jit(psnr)

    full_results = {}
    for model_path in model_paths:
        print(f"Scene: {model_path}")
        try:
            full_dict, per_view = {}, {}
            test_dir = os.path.join(model_path, "test")
            for method in sorted(os.listdir(test_dir)):
                print(f"Method: {method}")
                mdir = os.path.join(test_dir, method)
                renders, gts, names = read_images(
                    os.path.join(mdir, "renders"), os.path.join(mdir, "gt")
                )
                if not names:
                    print("  (no rendered views — skipping)")
                    continue
                ssims, psnrs, lpipss = [], [], []
                for r, g in zip(renders, gts):
                    r_j, g_j = jnp.asarray(r), jnp.asarray(g)
                    ssims.append(float(ssim_j(r_j, g_j)))
                    psnrs.append(float(psnr_j(r_j, g_j)))
                    if lpips_params is not None:
                        lpipss.append(
                            float(lpips_mod.lpips(r_j, g_j, lpips_params))
                        )
                print(f"  SSIM : {np.mean(ssims):.7f}")
                print(f"  PSNR : {np.mean(psnrs):.7f}")
                if lpipss:
                    print(f"  LPIPS: {np.mean(lpipss):.7f}")
                full_dict[method] = {
                    "SSIM": float(np.mean(ssims)),
                    "PSNR": float(np.mean(psnrs)),
                }
                per_view[method] = {
                    "SSIM": dict(zip(names, map(float, ssims))),
                    "PSNR": dict(zip(names, map(float, psnrs))),
                }
                if lpipss:
                    full_dict[method]["LPIPS"] = float(np.mean(lpipss))
                    per_view[method]["LPIPS"] = dict(
                        zip(names, map(float, lpipss))
                    )
            with open(os.path.join(model_path, "results.json"), "w") as f:
                json.dump(full_dict, f, indent=2)
            with open(os.path.join(model_path, "per_view.json"), "w") as f:
                json.dump(per_view, f, indent=2)
            full_results[model_path] = full_dict
        except Exception as e:  # noqa: BLE001 — reference behavior: report, continue
            print(f"Unable to compute metrics for model {model_path}: {e}")
    return full_results


def main(argv=None):
    parser = argparse.ArgumentParser(description="gsjax metrics")
    parser.add_argument(
        "--model_paths", "-m", required=True, nargs="+", type=str
    )
    args = parser.parse_args(argv)

    from gsjax.parallel.multihost import maybe_initialize

    maybe_initialize()  # honors GSJAX_PLATFORM (CPU runs / tests)
    evaluate(args.model_paths)


if __name__ == "__main__":
    main()
