#!/usr/bin/env python
"""Round-4 perf A/B session — single process (amortizes the ~60s
per-process tunnel overhead; each jitted variant still pays its own
remote compile).

Stages (select with --stages, comma-separated):
  gather   microbench: pack-gather rate vs source width/dtype
  expand   fwd binning+pack: grid(tier .875) vs compact at the 1M bench
  probe    fwd fps vs max_pairs (budget-probe-sized vs 1<<22)
  chunk    infer kernel chunk=128 vs 256

Appends one JSON line per measurement to evidence/perf/r4_ab.jsonl.
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

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "evidence", "perf", "r4_ab.jsonl",
)


def log(rec):
    rec["t"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="gather,expand,probe")
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _toy_scene
    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.train.step import render_state
    from gsjax.utils.profiling import measure_rtt, timed

    rtt = measure_rtt()
    log({"stage": "start", "rtt_ms": round(rtt * 1e3, 1),
         "device": str(jax.devices()[0])})

    state, cam = _toy_scene(
        n=1_000_000, capacity=1 << 20, width=1920, height=1080,
        log_scale=-5.2,
    )
    rcam = cam.to_render_camera()
    bg = jnp.zeros(3)

    if "gather" in stages:
        # the pack gather: (P,) indices into an (N, W) table. Measure
        # rows/s vs row width and dtype — is the gather row-fetch-bound
        # (rows/s constant) or byte-bound (narrower rows faster)?
        key = jax.random.PRNGKey(0)
        n, p = 1_000_000, 1 << 22
        idx = jax.random.randint(key, (p,), 0, n, jnp.int32)
        for w, dt, tag in (
            (16, jnp.float32, "16xf32"),
            (9, jnp.float32, "9xf32"),
            (8, jnp.float32, "8xf32"),
            (16, jnp.bfloat16, "16xbf16"),
            (4, jnp.float32, "4xf32"),
            (32, jnp.float32, "32xf32"),
        ):
            tbl = jnp.ones((n, w), dt)

            def g(eps, _tbl=tbl, _idx=idx):
                t = _tbl.at[0, 0].add(eps.astype(_tbl.dtype))
                out = t[_idx]
                return jnp.sum(out[::1024].astype(jnp.float32))

            t = timed(jax.jit(g), rtt=rtt)
            log({"stage": "gather", "cfg": tag, "rows": p,
                 "ms": round(t * 1e3, 2),
                 "mrows_s": round(p / t / 1e6, 1)})

    if "expand" in stages:
        # full forward fps: tiered grid (r3 default) vs compact at the
        # uniform-footprint bench scene, both at max_pairs 1<<22
        for tag, s in (
            ("grid_t875", RasterizeSettings(
                max_pairs=1 << 22, backend="pallas", tier_frac=0.875,
                expansion="grid")),
            ("compact", RasterizeSettings(
                max_pairs=1 << 22, backend="pallas", tier_frac=0.0,
                expansion="compact")),
        ):
            def fwd(eps, _s=s):
                pp = dict(state.params)
                pp["xyz"] = pp["xyz"] + eps
                st = dataclasses.replace(state, params=pp)
                img = render_state(st, rcam, bg, _s)["render"]
                return jnp.sum(img[::64, ::64])

            t = timed(jax.jit(fwd), rtt=rtt)
            log({"stage": "expand", "cfg": tag,
                 "ms": round(t * 1e3, 1), "fps": round(1 / t, 2)})

    if "probe" in stages:
        # max_pairs sizing: the real pair count here is ~3.33M; 1<<22 =
        # 4.19M (26% padding). How much do the per-pair stages save with
        # a snug budget?
        for mp in (1 << 22, 3_538_944):  # 3.33M * 1.06 , 64k-aligned
            s = RasterizeSettings(
                max_pairs=mp, backend="pallas", tier_frac=0.875,
                expansion="grid")

            def fwd(eps, _s=s):
                pp = dict(state.params)
                pp["xyz"] = pp["xyz"] + eps
                st = dataclasses.replace(state, params=pp)
                img = render_state(st, rcam, bg, _s)["render"]
                return jnp.sum(img[::64, ::64])

            t = timed(jax.jit(fwd), rtt=rtt)
            log({"stage": "probe", "cfg": f"mp{mp}",
                 "ms": round(t * 1e3, 1), "fps": round(1 / t, 2)})

    log({"stage": "done"})


if __name__ == "__main__":
    main()
