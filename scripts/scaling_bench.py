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


def _spawn_processes(args):
    """Parent: launch N coordinated copies of this script and stream the
    coordinator process's report."""
    import socket
    import subprocess

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    import subprocess as sp

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    k = max(args.cpu, 1)
    common = [
        "--gaussians", str(args.gaussians), "--capacity", str(args.capacity),
        "--width", str(args.width), "--height", str(args.height),
        "--steps", str(args.steps), "--exchange", args.exchange,
    ]

    # 1) single-process baseline: same global device count, no process
    # boundary (collectives stay in-process)
    env1 = dict(os.environ, JAX_PLATFORMS="cpu")
    env1.pop("GSJAX_PROCESS_ID", None)
    base_out = sp.check_output(
        [sys.executable, os.path.abspath(__file__),
         "--cpu", str(args.processes * k)] + common,
        env=env1, cwd=repo, stderr=sp.DEVNULL,
    )
    base = json.loads(base_out.splitlines()[-1])

    # 2) the same mesh split across N OS processes: cross-process
    # collectives ride gRPC — a DCN-boundary simulation
    procs = []
    out0 = None
    for pid in range(args.processes):
        env = dict(os.environ)
        env.update(
            GSJAX_PLATFORM="cpu",
            GSJAX_COORDINATOR=f"127.0.0.1:{port}",
            GSJAX_NUM_PROCESSES=str(args.processes),
            GSJAX_PROCESS_ID=str(pid),
            XLA_FLAGS=f"--xla_force_host_platform_device_count={k}",
            JAX_PLATFORMS="cpu",
        )
        procs.append(sp.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--cpu", str(k)] + common,
            env=env,
            stdout=sp.PIPE if pid == 0 else sp.DEVNULL,
            stderr=sp.DEVNULL,
            cwd=repo,
        ))
    out0 = procs[0].communicate()[0]
    rc = [p.wait() for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes {rc}")
    multi = json.loads(out0.splitlines()[-1])

    g = str(args.processes * k)
    b_its = base["iters_per_s"][g]
    m_its = multi["iters_per_s"][g]
    print(json.dumps({
        "devices": args.processes * k,
        "processes": args.processes,
        "iters_per_s_single_process": b_its,
        "iters_per_s_multi_process": m_its,
        "process_boundary_efficiency": round(m_its / b_its, 4),
        "exchange": args.exchange,
        "note": "CPU DCN-sim: both meshes share one machine's cores; the "
                "ratio isolates the cross-process collective overhead, not "
                "absolute scaling",
    }))
    return 0


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
    ap.add_argument(
        "--processes", type=int, default=0,
        help="spawn N coordinated OS processes (jax.distributed local "
             "cluster, --cpu devices each): cross-process collectives run "
             "over gRPC — a DCN-boundary simulation. Reports it/s with the "
             "process boundary vs. the same-size single-process mesh.",
    )
    args = ap.parse_args(argv)

    is_worker = os.environ.get("GSJAX_PROCESS_ID") is not None
    if args.processes > 1 and not is_worker:
        return _spawn_processes(args)

    import jax

    if is_worker:
        from gsjax.parallel.multihost import maybe_initialize

        maybe_initialize()  # env-driven; GSJAX_PLATFORM pins cpu
    elif args.cpu:
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

    multiproc = jax.process_count() > 1

    def place(tree, mesh):
        """Shard a host pytree row-wise over ``gauss`` (leaves with a
        capacity-sized leading dim), replicating the rest. Works across
        processes: each passes the full host value and
        make_array_from_process_local_data slices its shards."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        cap = args.capacity

        def put(x):
            x = np.asarray(x)
            spec = P("gauss") if x.ndim >= 1 and x.shape[0] == cap else P()
            sh = NamedSharding(mesh, spec)
            if not multiproc:
                return jax.device_put(x, sh)
            return jax.make_array_from_process_local_data(sh, x, x.shape)

        return jax.tree.map(put, tree)

    results = {}
    # a sub-mesh excludes some processes' devices, which multi-controller
    # execution cannot express — multiprocess runs measure the full mesh
    g = n_dev if multiproc else 1
    while g <= n_dev:
        mesh = make_mesh(data=1, gauss=g, devices=jax.devices()[:g])
        if multiproc:
            sstate = place(state, mesh)
            opt_state = place(
                jax.tree.map(np.asarray, tx.init(state.params)), mesh
            )
        else:
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

    report = {
        "exchange": args.exchange,
        "iters_per_s": {str(k): round(v, 3) for k, v in results.items()},
        "devices": n_dev,
        "processes": jax.process_count(),
    }
    if 1 in results:
        base = results[1]
        report["efficiency"] = {
            str(k): round(v / (base * k), 4) for k, v in results.items()
        }
    if jax.default_backend() == "cpu":
        # an oversubscribed host-CPU mesh shares one set of cores — the
        # efficiency numbers only validate the mechanics, not scaling
        report["note"] = "virtual CPU mesh: efficiency not meaningful"
    if jax.process_index() == 0:
        print(json.dumps(report))


if __name__ == "__main__":
    main()
