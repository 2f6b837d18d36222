"""Kernel matmul precision A/B (round 3).

The round-2 commit that pinned every kernel dot to Precision.HIGHEST
(6-pass bf16x6 on the MXU) claimed "no fps change", but the r01->r02
bench regression says the 3 triangular prefix-sum matmuls per chunk
(x26k chunks) stopped hiding under the VPU work. This probe measures
fwd / fwd+bwd at HIGHEST vs HIGH (3-pass bf16x3, ~2^-16 relative) vs
DEFAULT (1-pass bf16, known-wrong 2e-3 final_T error, included as the
speed ceiling), with an on-device XLA-compositor cross-check per config.

Run: nohup python scripts/_r3_prec_probe.py > /tmp/prec_probe.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _toy_scene
from gsjax.models.gaussians import activated
from gsjax.ops import pallas_composite
from gsjax.ops.rasterize import RasterizeSettings, render
from gsjax.utils.profiling import measure_rtt, timed

OUT = os.path.join("evidence", "perf", "r3_prec.jsonl")


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
    rtt = measure_rtt()

    # numerics reference: the XLA compositor at f32 on a small slice
    sm_state, sm_cam = _toy_scene(
        n=20_000, capacity=1 << 15, width=512, height=512, log_scale=-4.0
    )
    sm_rcam = sm_cam.to_render_camera()
    sm = activated(sm_state)
    xla_s = RasterizeSettings(
        max_pairs=1 << 19, max_splats_per_tile=2048, chunk=32, backend="xla"
    )
    ref = jax.jit(
        lambda: render(sm_rcam, *sm, 3, bg, xla_s,
                       active_mask=sm_state.active)
    )()
    ref_img = np.asarray(ref["render"])
    ref_T = np.asarray(ref["final_T"])

    # _TRI_SPLIT variants (Mosaic rejects Precision.HIGH, so the 3-pass
    # mode is a hand k-term bf16 operand split — see pallas_composite).
    # split0 = round-2 HIGHEST pin (anchor: fwd 120.0ms / fwd_bwd 262.6ms
    # measured in this same scene before the helper landed); split1 = the
    # known-wrong single-pass DEFAULT, included as the speed ceiling.
    for prec_name, tri_split in (
        ("split3", 3),
        ("split2", 2),
        ("split1_ceiling", 1),
    ):
        pallas_composite._TRI_SPLIT = tri_split

        pl_s = RasterizeSettings(
            max_pairs=1 << 19, max_splats_per_tile=2048, chunk=32,
            backend="pallas",
        )
        out = jax.jit(
            lambda pl_s=pl_s: render(sm_rcam, *sm, 3, bg, pl_s,
                                     active_mask=sm_state.active)
        )()
        img_diff = float(np.abs(np.asarray(out["render"]) - ref_img).max())
        t_diff = float(np.abs(np.asarray(out["final_T"]) - ref_T).max())

        settings = RasterizeSettings(
            max_pairs=1 << 22, backend="pallas", tier_frac=0.875,
        )

        def fwd(eps, settings=settings):
            o = render(rcam, means3d + eps, scales, quats, opac, shs, 3,
                       bg, settings, active_mask=mask)
            return jnp.sum(o["render"][::64, ::64])

        bsettings = RasterizeSettings(
            max_pairs=1 << 22, max_splats_per_tile=1024, chunk=32,
            backend="pallas", tier_frac=0.875, grad_dtype="bfloat16",
        )

        def fwd_bwd(eps, bsettings=bsettings):
            def loss(m):
                o = render(rcam, m, scales, quats, opac, shs, 3, bg,
                           bsettings, active_mask=mask)
                return jnp.mean(o["render"] ** 2)

            return jax.grad(loss)(means3d + eps)[0, 0]

        t_f = timed(jax.jit(fwd), rtt=rtt)
        t_fb = timed(jax.jit(fwd_bwd), rtt=rtt)
        emit({
            "cfg": "prec", "precision": prec_name,
            "fwd_ms": t_f * 1e3, "fwd_fps": 1.0 / t_f,
            "fwd_bwd_ms": t_fb * 1e3, "fwd_bwd_fps": 1.0 / t_fb,
            "xcheck_img_diff": img_diff, "xcheck_T_diff": t_diff,
        })

    pallas_composite._TRI_SPLIT = 3
    emit({"cfg": "done"})


if __name__ == "__main__":
    main()
