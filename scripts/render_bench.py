#!/usr/bin/env python
"""Trained-scene rendering throughput — the honest analogue of the
reference's headline claim ("≥30 fps at 1080p on a modern GPU" for
*rendering trained scenes*, reference README.md:14).

Loads a trained model directory (the same layout render.py consumes),
jits the pure-render path (custom-VJP primal = the inference Pallas
kernel) over the scene's test cameras, and reports frames/s — at the
scene's native resolution and, optionally, rescaled to 1080p.

Usage:
    python scripts/render_bench.py -m output/synth_garden \
        [--iteration 30000] [--at_1080p] [--views 8]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--tier_frac", type=float, default=None,
                    help="override the probed tiered-binning fraction")
    ap.add_argument("--expansion", choices=("grid", "compact"), default=None,
                    help="override the probed pair-expansion strategy")
    ap.add_argument("--views", type=int, default=8,
                    help="number of test views to cycle through")
    ap.add_argument("--out", default=None,
                    help="also write the JSON report atomically to this "
                         "path on success (crash-safe, stdout-noise-free)")
    ap.add_argument("--at_1080p", action="store_true",
                    help="rescale camera intrinsics to 1920x1080")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gsjax.configs import ModelParams
    from gsjax.data.cameras import stack_render_cameras
    from gsjax.train.loop import probe_rasterize_settings
    from gsjax.train.scene import Scene
    from gsjax.train.step import TrainConfig, make_render_fn
    from gsjax.utils.profiling import measure_rtt, timed

    model = ModelParams(
        source_path="", model_path=args.model_path, eval=True
    )
    # cfg_args in the model dir restores the real source_path
    from gsjax.configs import load_cfg_args

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
    cams = cams[: args.views]

    w, h = cams[0].width, cams[0].height
    if args.at_1080p:
        # keep fov_x, recompute fov_y for the 16:9 aspect — same horizontal
        # view rendered through real 1080p intrinsics (anisotropic pixels
        # would distort the splat-per-pixel workload and the fps claim)
        for i, c in enumerate(cams):
            fov_y = 2 * np.arctan(np.tan(c.fov_x / 2) * 1080 / 1920)
            cams[i] = dataclasses.replace(c, width=1920, height=1080,
                                          fov_y=float(fov_y))
        w, h = 1920, 1080

    # budget-probe against the loaded model: static defaults silently drop
    # the widest trained gaussians' tiles, inflating fps while darkening
    # renders — the fps claim must come from a drop-free configuration
    settings = probe_rasterize_settings(state, cams, w, h)
    settings = dataclasses.replace(settings, backend="pallas")
    if args.tier_frac is not None:
        settings = dataclasses.replace(settings, tier_frac=args.tier_frac)
    if args.expansion is not None:
        settings = dataclasses.replace(settings, expansion=args.expansion)
    render_fn = make_render_fn(TrainConfig(settings=settings), with_stats=True)
    bg = jnp.full(3, 1.0 if model.white_background else 0.0, jnp.float32)
    rcams = stack_render_cameras(cams)

    n_views = len(cams)

    # state/rcams ride as jit ARGUMENTS: a closure capture would embed
    # them as HLO literals and the remote-compile payload 413s at trained
    # scale (1.14M gaussians ~ 270MB of params; same class as the GT-stack
    # fix in train.py)
    @jax.jit
    def frame(st, rc, view_i, eps):
        from gsjax.data.cameras import index_render_camera

        cam = index_render_camera(rc, view_i)
        p = dict(st.params)
        p["xyz"] = p["xyz"] + eps
        s = dataclasses.replace(st, params=p)
        img, dropped = render_fn(s, cam, bg)
        # checksum + drop counter in one fetch: the timed loop must verify
        # the drop-free claim on EVERY rendered view, not assert it from
        # the probe's 4-view sample (ADVICE r3 medium #2)
        return jnp.stack(
            [jnp.sum(img[::64, ::64]), dropped.astype(jnp.float32)]
        )

    rtt = measure_rtt()
    # warm every view's shape once (same shape -> one compile)
    np.asarray(frame(state, rcams, jnp.int32(0), jnp.float32(0.0)))
    samples = []
    total_dropped = 0
    for rep in range(3):
        t0 = time.time()
        for i in range(n_views):
            out = np.asarray(
                frame(state, rcams, jnp.int32(i),
                      jnp.float32((rep * n_views + i + 1) * 1e-12))
            )
            total_dropped += int(out[1])
        samples.append((time.time() - t0 - rtt * n_views) / n_views)
    t_frame = max(min(samples), 1e-6)
    n_act = int(np.asarray(state.num_active))
    if total_dropped > 0:
        print(
            f"WARNING: {total_dropped} pairs dropped across the timed "
            "views — the fps number is NOT from a drop-free configuration",
            file=sys.stderr,
        )
    report = {
        "metric": "trained-scene render frames/s",
        "value": round(1.0 / t_frame, 3),
        "unit": "frames/s",
        "vs_baseline": round(1.0 / t_frame / 30.0, 4),
        "extra": {
            "resolution": f"{w}x{h}",
            "n_gaussians": n_act,
            "n_views": n_views,
            "iteration": scene.loaded_iter,
            "tier_frac": settings.tier_frac,
            "expansion": settings.expansion,
            "max_tiles_per_gauss": settings.max_tiles_per_gauss,
            "max_pairs": settings.max_pairs,
            "rtt_ms": round(rtt * 1000, 1),
            "device": str(jax.devices()[0]),
            "num_dropped": total_dropped,
        },
    }
    print(json.dumps(report))
    if args.out:
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f)
        json.load(open(tmp))  # parse-before-commit guard
        os.replace(tmp, args.out)
    return 1 if total_dropped > 0 else 0


if __name__ == "__main__":
    sys.exit(main())
