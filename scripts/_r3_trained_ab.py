#!/usr/bin/env python
"""Same-worker phase A/B of pair-expansion strategies on a TRAINED scene.

The trained-scene render bench is the pathological binning case (a few
wide gaussians force mt into the thousands). This probe loads the
committed evidence model and times preprocess/binning/composite for
expansion=grid (tiered) vs compact on the same worker, appending one
json line per config to evidence/perf/r3_trained_ab.jsonl.

Usage: nohup python scripts/_r3_trained_ab.py > /tmp/trained_ab.log 2>&1 &
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", default="output/eval_r3/synth_garden")
    ap.add_argument("--iteration", type=int, default=30000)
    ap.add_argument("--out", default="evidence/perf/r3_trained_ab.jsonl")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from gsjax.configs import ModelParams, load_cfg_args
    from gsjax.train.loop import probe_rasterize_settings
    from gsjax.train.scene import Scene
    from gsjax.utils.profiling import phase_timings

    model = ModelParams(source_path="", model_path=args.model_path, eval=True)
    saved = load_cfg_args(args.model_path)
    if saved is not None:
        model = dataclasses.replace(
            model,
            source_path=saved.get("source_path", model.source_path),
            white_background=saved.get(
                "white_background", model.white_background
            ),
            sh_degree=saved.get("sh_degree", model.sh_degree),
        )
    scene = Scene(model, load_iteration=args.iteration, shuffle=False)
    state = scene.gaussians
    cams = scene.get_test_cameras() or scene.get_train_cameras()

    # 1080p intrinsics like render_bench --at_1080p
    cam = cams[0]
    fov_y = 2 * np.arctan(np.tan(cam.fov_x / 2) * 1080 / 1920)
    cam = dataclasses.replace(cam, width=1920, height=1080,
                              fov_y=float(fov_y))

    base = probe_rasterize_settings(state, [cam], 1920, 1080)
    base = dataclasses.replace(base, backend="pallas")
    print("probed:", base.max_tiles_per_gauss, base.max_pairs,
          base.tier_frac, base.expansion, flush=True)

    configs = [
        ("grid_tier0.875", dataclasses.replace(
            base, expansion="grid", tier_frac=0.875)),
        ("grid_tier0", dataclasses.replace(
            base, expansion="grid", tier_frac=0.0)),
        ("compact", dataclasses.replace(base, expansion="compact")),
    ]
    from gsjax.models.gaussians import activated_params

    means3d, scales, quats, opacities, shs = activated_params(state.params)
    rcam = cam.to_render_camera()
    rows = []
    for name, s in configs:
        t = phase_timings(
            means3d, scales, quats, opacities, shs, rcam, s,
            active_mask=state.active,
        )
        row = {"config": name, "mt": s.max_tiles_per_gauss,
               "max_pairs": s.max_pairs,
               **{k: round(v, 2) for k, v in t.items()}}
        print(json.dumps(row), flush=True)
        rows.append(row)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
