"""Round-3 one-process A/B matrix on the bench scene (VERDICT r2 #1/#3).

Measures, in a single TPU process (compiles amortized, worker state
constant across configs):

  fwd phases   x {tier_frac 0 / 0.875} x {opacity_aware_radius on/off}
  fwd+bwd      x {tier_frac 0 / 0.875} x {grad_dtype f32 / bf16}

and appends one JSON object per config to evidence/perf/r3_ab.jsonl with
cmd/git/device provenance. Run from the repo root on the TPU host:

    nohup python scripts/_r3_session.py > /tmp/r3_session.log 2>&1 &

(Lesson from round 2: never kill a TPU client mid-compile — the remote
worker wedges for ~an hour. Let it finish.)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _toy_scene
from gsjax.models.gaussians import activated
from gsjax.ops.binning import build_tile_bins
from gsjax.ops.projection import num_tiles, preprocess
from gsjax.ops.rasterize import RasterizeSettings, render
from gsjax.utils.profiling import measure_rtt, timed

OUT = os.path.join("evidence", "perf", "r3_ab.jsonl")


def emit(rec):
    rec = dict(rec)
    rec["device"] = str(jax.devices()[0])
    rec["git"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    rec["t"] = time.strftime("%Y-%m-%d %H:%M:%S")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    state, cam = _toy_scene(
        n=1_000_000, capacity=1 << 20, width=1920, height=1080,
        log_scale=-5.2,
    )
    rcam = cam.to_render_camera()
    means3d, scales, quats, opac, shs = activated(state)
    mask = state.active
    bg = jnp.zeros(3)
    tiles_x, tiles_y = num_tiles(rcam.width, rcam.height)

    rtt = measure_rtt()
    emit({"cfg": "rtt", "rtt_ms": rtt * 1e3})

    # --- binning phase: tier x opacity-aware-radius ---------------------
    for tf in (0.0, 0.875):
        for oar in (True, False):
            def upto_bins(eps, tf=tf, oar=oar):
                s = preprocess(
                    means3d + eps, scales, quats, opac, shs, rcam, 3,
                    active_mask=mask, opacity_aware_radius=oar,
                )
                b = build_tile_bins(
                    s, tiles_x, tiles_y, 1 << 22,
                    max_tiles_per_gauss=16, tier_frac=tf,
                )
                return (
                    jnp.sum(b.pair_gauss[::1024])
                    + jnp.sum(b.tile_start[::64])
                    + b.num_pairs + b.num_dropped
                )

            t = timed(jax.jit(upto_bins), rtt=rtt)
            emit({
                "cfg": "upto_bins", "tier_frac": tf,
                "opacity_aware_radius": oar, "ms": t * 1e3,
            })

    # --- pack-only: isolates the attr-gather from the kernel -----------
    def upto_pack(eps):
        from gsjax.ops.pallas_composite import pack_pair_attrs

        s = preprocess(
            means3d + eps, scales, quats, opac, shs, rcam, 3,
            active_mask=mask,
        )
        b = build_tile_bins(
            s, tiles_x, tiles_y, 1 << 22, max_tiles_per_gauss=16,
        )
        pa = pack_pair_attrs(
            b.pair_gauss, s.means2d, s.conics, s.colors, s.opacities,
            128, pair_slot=b.pair_slot,
        )
        return jnp.sum(pa[::64, 0, ::32])

    t = timed(jax.jit(upto_pack), rtt=rtt)
    emit({"cfg": "upto_pack", "ms": t * 1e3})

    # --- full forward: tier 0 vs 0.875 ---------------------------------
    for tf in (0.0, 0.875):
        settings = RasterizeSettings(
            max_pairs=1 << 22, backend="pallas", tier_frac=tf,
        )

        def fwd(eps, settings=settings):
            out = render(
                rcam, means3d + eps, scales, quats, opac, shs, 3, bg,
                settings, active_mask=mask,
            )
            return jnp.sum(out["render"][::64, ::64]) + out["num_dropped"]

        t = timed(jax.jit(fwd), rtt=rtt)
        emit({"cfg": "fwd", "tier_frac": tf, "ms": t * 1e3,
              "fps": 1.0 / t})

    # --- fwd+bwd: tier x grad_dtype ------------------------------------
    for tf in (0.0, 0.875):
        for gd in ("float32", "bfloat16"):
            settings = RasterizeSettings(
                max_pairs=1 << 22, max_splats_per_tile=1024, chunk=32,
                backend="pallas", tier_frac=tf, grad_dtype=gd,
            )

            def fwd_bwd(eps, settings=settings):
                def loss(m):
                    out = render(
                        rcam, m, scales, quats, opac, shs, 3, bg,
                        settings, active_mask=mask,
                    )
                    return jnp.mean(out["render"] ** 2)

                return jax.grad(loss)(means3d + eps)[0, 0]

            t = timed(jax.jit(fwd_bwd), rtt=rtt)
            emit({"cfg": "fwd_bwd", "tier_frac": tf, "grad_dtype": gd,
                  "ms": t * 1e3, "fps": 1.0 / t})

    emit({"cfg": "done"})


if __name__ == "__main__":
    main()
