#!/usr/bin/env python
"""Multi-scene parallel training driver (BASELINE.json config 5).

The reference trains benchmark scenes serially via ``os.system`` calls
(reference: full_eval.py:39-52). Here independent scenes become the
outermost mesh axis: one compiled program steps every scene at once, each
on its own device group, with zero cross-scene collectives. On a pod, run
one process per host (``--dist_coordinator`` / ``GSJAX_*`` env vars or
``--multihost``); each process loads and saves only the scenes whose
devices it owns.

Example (4 scenes on >=4 devices):
    python train_multiscene.py -s sceneA sceneB sceneC sceneD \
        -m out/A out/B out/C out/D --iterations 30000
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description="gsjax multi-scene training")
    parser.add_argument("-s", "--source_paths", nargs="+", required=True)
    parser.add_argument("-m", "--model_paths", nargs="+", default=None)
    parser.add_argument("--iterations", type=int, default=30_000)
    parser.add_argument("--capacity", type=int, default=None)
    parser.add_argument("--white_background", "-w", action="store_true")
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--images", type=str, default="images")
    parser.add_argument("--resolution", "-r", type=int, default=-1)
    parser.add_argument("--sh_degree", type=int, default=3)
    parser.add_argument(
        "--save_iterations", nargs="+", type=int, default=[7_000, 30_000]
    )
    parser.add_argument("--steps_per_dispatch", type=int, default=25)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--multihost", action="store_true")
    parser.add_argument("--dist_coordinator", type=str, default=None)
    parser.add_argument("--dist_num_processes", type=int, default=None)
    parser.add_argument("--dist_process_id", type=int, default=None)
    args = parser.parse_args(argv)
    args.save_iterations = sorted(set(args.save_iterations) | {args.iterations})

    from gsjax.parallel.multihost import is_main_process, maybe_initialize

    maybe_initialize(
        coordinator=args.dist_coordinator,
        num_processes=args.dist_num_processes,
        process_id=args.dist_process_id,
        multihost=args.multihost,
    )

    import dataclasses
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from gsjax.configs import ModelParams, OptimizationParams
    from gsjax.data.cameras import stack_render_cameras
    from gsjax.parallel.multi_scene import (
        local_scene_ids,
        local_scene_state,
        make_multi_scene_densify_step,
        make_multi_scene_train_step_chained,
        make_scene_mesh,
    )
    from gsjax.parallel.multihost import host_local_to_global
    from gsjax.train.loop import default_rasterize_settings
    from gsjax.train.optim import make_optimizer
    from gsjax.train.scene import Scene
    from gsjax.train.step import TrainConfig, stack_images

    log = print if (is_main_process() and not args.quiet) else (lambda *a, **k: None)

    sources = args.source_paths
    n_scenes = len(sources)
    model_paths = args.model_paths or [
        os.path.join("./output", os.path.basename(s.rstrip("/")))
        for s in sources
    ]
    if len(model_paths) != n_scenes:
        parser.error("need one model path per source path")

    mesh = make_scene_mesh(n_scenes)
    my_scenes = local_scene_ids(mesh, n_scenes)
    log(f"[multi-scene] {n_scenes} scenes on {jax.device_count()} devices; "
        f"process {jax.process_index()} owns scenes {my_scenes}")

    opt = OptimizationParams(iterations=args.iterations)
    random.seed(args.seed)
    np.random.seed(args.seed)

    # --- load the scenes this process owns (others never touch the disk) ---
    scenes: dict = {}
    cam_counts = np.zeros(n_scenes, np.int64)
    shapes = {}
    capacity = args.capacity
    for sid in my_scenes:
        model = ModelParams(
            source_path=sources[sid], model_path=model_paths[sid],
            images=args.images, resolution=args.resolution,
            white_background=args.white_background, eval=args.eval,
            sh_degree=args.sh_degree,
        )
        os.makedirs(model.model_path, exist_ok=True)
        sc = Scene(model, capacity=capacity)
        cams = sc.get_train_cameras()
        sizes = {(c.width, c.height) for c in cams}
        if len(sizes) != 1:
            raise ValueError(
                f"scene {sources[sid]} has mixed resolutions {sizes}; "
                "multi-scene training needs one size per scene "
                "(use train.py for mixed-resolution scenes)"
            )
        shapes[sid] = next(iter(sizes))
        scenes[sid] = (sc, cams)
        cam_counts[sid] = len(cams)
        capacity = sc.gaussians.capacity  # all scenes share capacity

    # --- agree on global static shapes across processes ---
    if jax.process_count() > 1:
        from jax.experimental.multihost_utils import process_allgather

        cam_counts = np.max(process_allgather(cam_counts), axis=0)
        all_shapes = process_allgather(
            np.asarray(
                [list(shapes.get(s, (0, 0))) for s in range(n_scenes)],
                np.int64,
            )
        ).max(axis=0)
        caps = process_allgather(np.int64(capacity))
        capacity = int(np.max(caps))
    else:
        all_shapes = np.asarray(
            [list(shapes[s]) for s in range(n_scenes)], np.int64
        )
    m_pad = int(cam_counts.max())  # pad every scene to the max camera count
    widths = set(map(tuple, all_shapes.tolist()))
    if len(widths) != 1:
        raise ValueError(f"scenes disagree on resolution: {widths}")
    width, height = next(iter(widths))

    settings = default_rasterize_settings(width, height, capacity)
    extents = {sid: float(sc.cameras_extent) for sid, (sc, _) in scenes.items()}
    # TrainConfig.extent is static inside the compiled step; use the max
    # (it scales densify thresholds — conservative for smaller scenes)
    ext_arr = np.asarray(
        [extents.get(s, 0.0) for s in range(n_scenes)], np.float64
    )
    if jax.process_count() > 1:
        from jax.experimental.multihost_utils import process_allgather

        ext_arr = process_allgather(ext_arr).max(axis=0)
    cfg = TrainConfig(
        settings=settings,
        lambda_dssim=opt.lambda_dssim,
        white_background=args.white_background,
        random_background=opt.random_background,
        extent=float(ext_arr.max()),
    )

    # --- stack local scene rows, then assemble the global arrays ---
    def pad_cams(cams):
        reps = [cams[i % len(cams)] for i in range(m_pad)]
        return reps

    local_states, local_cams, local_images = [], [], []
    for sid in sorted(my_scenes):
        sc, cams = scenes[sid]
        cams = pad_cams(cams)
        local_states.append(sc.gaussians)
        local_cams.append(stack_render_cameras(cams))
        local_images.append(stack_images(cams))
    if not my_scenes:  # a process with no scenes still joins collectives
        local_states, local_cams, local_images = [], [], []

    stack = lambda trees: jax.tree.map(lambda *xs: np.stack(xs), *trees)
    tx = make_optimizer(opt, float(local_states[0].spatial_lr_scale)
                        if local_states else 1.0)

    states_l = stack([jax.tree.map(np.asarray, s) for s in local_states])
    opts_l = stack([jax.tree.map(np.asarray, tx.init(s.params))
                    for s in local_states])
    cams_l = stack(local_cams)
    imgs_l = np.stack(local_images)

    spec = P("scene")
    states = host_local_to_global(mesh, spec, states_l)
    opt_states = host_local_to_global(mesh, spec, opts_l)
    cameras = host_local_to_global(mesh, spec, cams_l)
    images = host_local_to_global(mesh, spec, imgs_l)

    n_chain = max(1, args.steps_per_dispatch)
    step = make_multi_scene_train_step_chained(
        tx, cameras, images, cfg, mesh, n_chain
    )
    densify_step, reset_step = make_multi_scene_densify_step(opt, cfg, mesh)

    # camera sampling: every process draws the same global (S, n) indices
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)

    def sample_idx(n):
        # per-scene independent draws from that scene's true camera count
        cols = [
            rng.integers(0, cam_counts[s], size=n) for s in range(n_scenes)
        ]
        return jnp.asarray(np.stack(cols), jnp.int32)  # (S, n)

    # event boundaries: densify / reset / save — chain between them
    events = sorted(
        e
        for e in (
            {args.iterations}
            | set(args.save_iterations)
            | set(range(
                opt.densify_from_iter, opt.densify_until_iter,
                opt.densification_interval,
            ))
            | set(range(
                opt.opacity_reset_interval, args.iterations,
                opt.opacity_reset_interval,
            ))
        )
        if e <= args.iterations
    )

    t0 = time.time()
    it = 0
    # partial chunks recur (event spacing rarely divides n_chain) — cache
    # the built step per chunk length or every boundary recompiles
    small_steps = {}
    for ev in events:
        while it < ev:
            n = min(n_chain, ev - it)
            if n != n_chain:
                if n not in small_steps:
                    small_steps[n] = make_multi_scene_train_step_chained(
                        tx, cameras, images, cfg, mesh, n
                    )
                states, opt_states, metrics = small_steps[n](
                    states, opt_states, sample_idx(n),
                    jnp.stack([jax.random.fold_in(key, it)] * n_scenes),
                )
            else:
                states, opt_states, metrics = step(
                    states, opt_states, sample_idx(n),
                    jnp.stack([jax.random.fold_in(key, it)] * n_scenes),
                )
            it += n
        from gsjax.parallel.multihost import global_to_host_local

        losses = global_to_host_local(metrics["loss_mean"])
        rate = it / max(time.time() - t0, 1e-9)
        log(f"[{it:>6}] loss/scene={np.array2string(losses, precision=4)} "
            f"({rate:.1f} it/s/scene)")

        in_densify = (
            opt.densify_from_iter < it < opt.densify_until_iter
            and it % opt.densification_interval == 0
        )
        if in_densify:
            keys = jnp.stack(
                [jax.random.fold_in(jax.random.fold_in(key, it), s)
                 for s in range(n_scenes)]
            )
            use_ss = it > opt.opacity_reset_interval
            states, opt_states, _ = densify_step(
                states, opt_states, keys, use_ss
            )
        if it % opt.opacity_reset_interval == 0 and it < args.iterations:
            states, opt_states = reset_step(states, opt_states)
        if it in args.save_iterations:
            for sid in my_scenes:
                sc, _ = scenes[sid]
                st = local_scene_state(states, sid, mesh, n_scenes)
                sc.save(it, st)
                log(f"  saved scene {sid} at iteration {it} "
                    f"({int(st.num_active)} gaussians)")

    log(f"multi-scene training complete: {args.iterations} iterations x "
        f"{n_scenes} scenes in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1:])
