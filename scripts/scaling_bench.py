#!/usr/bin/env python
"""Multi-chip scaling-efficiency measurement (BASELINE.md: >= 85%
multi-host efficiency).

Measures sharded train-step throughput at increasing ``gauss`` mesh sizes
and reports efficiency vs linear scaling from 1 chip. On a real pod run
with the default backend; on a dev box a virtual CPU mesh checks the
mechanics only (flag --cpu N).

    python scripts/scaling_bench.py                 # real chips
    python scripts/scaling_bench.py --cpu 8         # virtual CPU mesh
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0, help="virtual CPU devices")
    ap.add_argument("--gaussians", type=int, default=1_000_000)
    ap.add_argument("--capacity", type=int, default=1 << 20)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument(
        "--exchange", default="all_gather",
        choices=("all_gather", "a2a"),
        help="splat exchange strategy (a2a = tile-owner all_to_all, "
             "O(N/G) per-chip memory)",
    )
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _toy_scene
    from gsjax.configs import OptimizationParams
    from gsjax.data.cameras import stack_render_cameras
    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.parallel import (
        make_mesh,
        make_sharded_train_step,
        shard_gaussian_state,
    )
    from gsjax.train.optim import make_optimizer
    from gsjax.train.step import TrainConfig

    n_dev = len(jax.devices())
    if args.cpu:
        args.gaussians = min(args.gaussians, 20_000)
        args.capacity = min(args.capacity, 1 << 15)
        args.width, args.height = 256, 192

    state, cam = _toy_scene(
        n=args.gaussians, capacity=args.capacity,
        width=args.width, height=args.height, log_scale=-5.2,
    )
    cams = stack_render_cameras([cam])
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (1, args.height, args.width, 3)).astype(np.float32)
    opt = OptimizationParams()
    tx = make_optimizer(opt, 3.0)

    results = {}
    g = 1
    while g <= n_dev:
        mesh = make_mesh(data=1, gauss=g, devices=jax.devices()[:g])
        sstate = shard_gaussian_state(state, mesh)
        opt_state = tx.init(sstate.params)
        cfg = TrainConfig(
            settings=RasterizeSettings(
                max_pairs=1 << (22 if not args.cpu else 14),
                splat_exchange=args.exchange,
            ),
            extent=3.0,
        )
        step = make_sharded_train_step(tx, mesh, cams, images, cfg)
        key = jax.random.PRNGKey(0)
        idx = jnp.zeros(1, jnp.int32)
        s, o, m = step(sstate, opt_state, idx, key)
        float(m["loss"])  # compile + sync
        t0 = time.time()
        for i in range(args.steps):
            s, o, m = step(s, o, idx, jax.random.fold_in(key, i))
        float(m["loss"])
        dt = (time.time() - t0) / args.steps
        results[g] = 1.0 / dt
        g *= 2

    base = results[1]
    report = {
        "exchange": args.exchange,
        "iters_per_s": {str(k): round(v, 3) for k, v in results.items()},
        "efficiency": {
            str(k): round(v / (base * k), 4) for k, v in results.items()
        },
        "devices": n_dev,
    }
    import jax

    if jax.default_backend() == "cpu":
        # an oversubscribed host-CPU mesh shares one set of cores — the
        # efficiency numbers only validate the mechanics, not scaling
        report["note"] = "virtual CPU mesh: efficiency not meaningful"
    print(json.dumps(report))


if __name__ == "__main__":
    main()
