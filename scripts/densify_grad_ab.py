#!/usr/bin/env python
"""A/B the densify-iteration gradient semantics (VERDICT r2 #6).

The reference silently discards the gradient step on densification
iterations (its optimizer surgery leaves ``.grad=None``, reference
train.py:118-128); gsjax applies it by default. This experiment trains the
same synthetic scene twice — ``--densify_iter_grad apply`` vs ``discard``
— and records test-split PSNR at the end of each run into
``evidence/quality/densify_grad_ab.json``.

Usage (TPU host, repo root; ~10-15 min per arm at the defaults):
    nohup python scripts/densify_grad_ab.py > /tmp/densify_ab.log 2>&1 &
Options: --iterations 7000 --scene data/synth_ab --width 512 --height 512
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_scene(path, width, height, n_views, n_gauss, n_sparse):
    if os.path.isdir(os.path.join(path, "sparse", "0")):
        return
    print(f"generating synthetic scene at {path}", flush=True)
    subprocess.run(
        [
            sys.executable, "scripts/make_synthetic_scene.py", path,
            "--n_views", str(n_views), "--width", str(width),
            "--height", str(height), "--n_gauss", str(n_gauss),
            "--n_sparse", str(n_sparse),
        ],
        check=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="data/synth_ab")
    ap.add_argument("--iterations", type=int, default=7000)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--n_views", type=int, default=60)
    ap.add_argument("--n_gauss", type=int, default=120_000)
    ap.add_argument("--n_sparse", type=int, default=15_000)
    ap.add_argument("--out", default="evidence/quality/densify_grad_ab.json")
    args = ap.parse_args()

    ensure_scene(args.scene, args.width, args.height, args.n_views,
                 args.n_gauss, args.n_sparse)

    import jax
    import jax.numpy as jnp

    from gsjax.configs import ModelParams, OptimizationParams, PipelineParams
    from gsjax.train.loop import evaluate_state, training
    from gsjax.train.step import TrainConfig, make_render_fn

    results = {}
    for mode in ("apply", "discard"):
        model = ModelParams(
            source_path=args.scene,
            model_path=os.path.join("output", f"densify_ab_{mode}"),
            eval=True,
        )
        opt = OptimizationParams(
            iterations=args.iterations,
            position_lr_max_steps=args.iterations,
        )
        t0 = time.time()
        scene, state = training(
            model, opt, PipelineParams(),
            testing_iterations=(args.iterations,),
            saving_iterations=(),
            quiet=True,
            seed=0,
            densify_iter_grad=mode,
        )
        wall = time.time() - t0
        # final eval through the standard report path (same renderer the
        # in-training hook uses)
        from gsjax.train.loop import default_rasterize_settings

        width, height = scene.get_train_cameras()[0].width, \
            scene.get_train_cameras()[0].height
        cfg = TrainConfig(
            settings=default_rasterize_settings(width, height, state.capacity),
            extent=float(scene.cameras_extent),
        )
        render_fn = make_render_fn(cfg)
        bg = jnp.zeros(3)
        report = evaluate_state(state, scene, render_fn, bg)
        results[mode] = {
            "report": report,
            "final_gaussians": int(state.num_active),
            "wall_s": round(wall, 1),
        }
        print(f"{mode}: {json.dumps(report)} ({wall:.0f}s)", flush=True)

    out = {
        "experiment": "densify-iteration gradient apply vs discard",
        "reference_semantics": "discard (reference train.py:118-128)",
        "iterations": args.iterations,
        "scene": args.scene,
        "results": results,
        "device": str(jax.devices()[0]),
        "git": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip(),
        "cmd": " ".join(sys.argv),
        "t": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
