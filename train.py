#!/usr/bin/env python
"""Training entry point — CLI-compatible with the reference ``train.py``
(reference: train.py:193-222).

Example:
    python train.py -s /data/nerf_synthetic/lego --eval
"""

from __future__ import annotations

import argparse
import sys

from gsjax.configs import (
    ModelParams,
    OptimizationParams,
    PipelineParams,
    add_group,
    extract,
)


def main(argv=None):
    parser = argparse.ArgumentParser(description="gsjax training")
    add_group(parser, ModelParams, "Model Parameters")
    add_group(parser, OptimizationParams, "Optimization Parameters")
    add_group(parser, PipelineParams, "Pipeline Parameters")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument(
        "--test_iterations", nargs="+", type=int, default=[7_000, 30_000]
    )
    parser.add_argument(
        "--save_iterations", nargs="+", type=int, default=[7_000, 30_000]
    )
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--capacity", type=int, default=None,
                        help="initial gaussian buffer capacity (grows 2x as needed)")
    parser.add_argument("--disable_viewer", action="store_true")
    parser.add_argument("--web_viewer", type=int, default=None, metavar="PORT",
                        help="serve a live local web viewer of the training "
                             "run on this port (0 = ephemeral)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="write a jax.profiler device trace of the first "
                             "100 iterations to DIR")
    parser.add_argument(
        "--densify_iter_grad", choices=("apply", "discard"), default="apply",
        help="densify-iteration gradient semantics: 'discard' matches the "
        "reference exactly (its optimizer surgery drops that step's "
        "update, reference train.py:118-128); 'apply' (default) applies "
        "every step",
    )
    parser.add_argument("--wall_budget", type=float, default=0.0,
                        help="stop gracefully after this many seconds "
                             "(checkpoint + PLY snapshot, resumable via "
                             "--start_checkpoint); 0 = no budget. Safer "
                             "than `timeout`: killing a TPU client "
                             "mid-dispatch wedges the remote worker")
    parser.add_argument("--steps_per_dispatch", type=int, default=25)
    parser.add_argument("--data_shards", type=int, default=1,
                        help="mesh axis: cameras per step (data parallel)")
    parser.add_argument("--gauss_shards", type=int, default=1,
                        help="mesh axis: gaussian/tile-strip sharding")
    parser.add_argument("--multihost", action="store_true",
                        help="jax.distributed.initialize() with TPU-pod "
                             "auto-detection (one process per host)")
    parser.add_argument("--dist_coordinator", type=str, default=None,
                        metavar="HOST:PORT",
                        help="explicit jax.distributed coordinator (with "
                             "--dist_num_processes/--dist_process_id)")
    parser.add_argument("--dist_num_processes", type=int, default=None)
    parser.add_argument("--dist_process_id", type=int, default=None)
    args = parser.parse_args(argv)
    args.save_iterations.append(args.iterations)

    from gsjax.parallel.multihost import is_main_process, maybe_initialize

    distributed = maybe_initialize(
        coordinator=args.dist_coordinator,
        num_processes=args.dist_num_processes,
        process_id=args.dist_process_id,
        multihost=args.multihost,
    )

    import jax

    if distributed:
        print(
            f"[dist] process {jax.process_index()}/{jax.process_count()}: "
            f"{jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
        if not is_main_process():
            args.quiet = True
            args.disable_viewer = True

    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    from gsjax.utils.system import safe_state

    safe_state(args.quiet, args.seed)  # reference train.py:214

    model = extract(ModelParams, args)
    opt = extract(OptimizationParams, args)
    pipe = extract(PipelineParams, args)

    print(f"Optimizing {model.model_path or '(auto model dir)'}")

    gui_callback = None
    if not args.disable_viewer:
        try:
            from gsjax.viewer.network_gui import ViewerBridge

            bridge = ViewerBridge(args.ip, args.port, model.source_path,
                                  max_iterations=args.iterations)
            gui_callback = bridge.poll
        except OSError as e:
            print(f"viewer bridge disabled: {e}")

    passive_callback = None
    if args.web_viewer is not None:
        # live local web viewer of the training run (headless-friendly
        # SIBR-remote analogue); lazily started once state exists
        holder = {}

        def passive_callback(iteration, state, render_fn):
            v = holder.get("v")
            if v is None:
                import numpy as _np

                from gsjax.viewer.local_viewer import LocalViewer

                v = LocalViewer(
                    state,
                    _np.full(3, 1.0 if model.white_background else 0.0,
                             _np.float32),
                    port=args.web_viewer,
                )
                port = v.start()
                print(f"web viewer: http://127.0.0.1:{port}/", flush=True)
                holder["v"] = v
            v.state = state
            v.iteration = iteration

    from gsjax.train.loop import training

    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        from gsjax.utils.profiling import trace

        profile_ctx = trace(args.profile)

    with profile_ctx:
        training(
            model,
            opt,
            pipe,
            testing_iterations=args.test_iterations,
            saving_iterations=args.save_iterations,
            checkpoint_iterations=args.checkpoint_iterations,
            start_checkpoint=args.start_checkpoint,
            quiet=args.quiet,
            capacity=args.capacity,
            gui_callback=gui_callback,
            passive_callback=passive_callback,
            seed=args.seed,
            steps_per_dispatch=args.steps_per_dispatch,
            data_shards=args.data_shards,
            gauss_shards=args.gauss_shards,
            debug_from=args.debug_from,
            densify_iter_grad=args.densify_iter_grad,
            wall_budget=args.wall_budget,
        )
    print("\nTraining complete.")


if __name__ == "__main__":
    main(sys.argv[1:])
