#!/usr/bin/env python
"""Benchmark: 1080p forward frames/s on one chip (+ fwd+bwd, train step).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/30}

Baseline: the reference claims ">= 30 fps at 1080p on a modern GPU"
(reference README.md:14; see BASELINE.md). vs_baseline = fps / 30.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _toy_scene
    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.train.step import render_state

    n_gauss = 200_000
    width, height = 1920, 1080
    state, cam = _toy_scene(n=n_gauss, capacity=1 << 18, width=width, height=height)
    rcam = cam.to_render_camera()
    bg = jnp.zeros(3)
    settings = RasterizeSettings(
        max_pairs=1 << 22, max_splats_per_tile=1024, chunk=32
    )

    @jax.jit
    def fwd(state):
        return render_state(state, rcam, bg, settings)["render"]

    @jax.jit
    def fwd_bwd(state):
        def loss_fn(params):
            import dataclasses

            s = dataclasses.replace(state, params=params)
            img = render_state(s, rcam, bg, settings)["render"]
            return jnp.mean(img * img)

        return jax.grad(loss_fn)(state.params)

    # warm up (compile)
    jax.block_until_ready(fwd(state))
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        out = fwd(state)
    jax.block_until_ready(out)
    fps_fwd = reps / (time.time() - t0)

    jax.block_until_ready(fwd_bwd(state))
    t0 = time.time()
    for _ in range(reps):
        g = fwd_bwd(state)
    jax.block_until_ready(g)
    fps_fwd_bwd = reps / (time.time() - t0)

    result = {
        "metric": "1080p frames/s/chip (fwd)",
        "value": round(fps_fwd, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps_fwd / 30.0, 4),
        "extra": {
            "fwd_bwd_frames_per_s": round(fps_fwd_bwd, 3),
            "n_gaussians": n_gauss,
            "resolution": f"{width}x{height}",
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
