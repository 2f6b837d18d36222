"""Round-2 dev probe: phase timings + knob sweeps on the bench scene.

Usage: python scripts/_r2_probe.py [chunk ...]
Run from the repo root on the TPU; prints one line per config.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from __graft_entry__ import _toy_scene
from gsjax.models.gaussians import activated
from gsjax.ops.rasterize import RasterizeSettings
from gsjax.utils.profiling import measure_rtt, phase_timings, timed


def main():
    chunks = [int(a) for a in sys.argv[1:]] or [128, 256]
    state, cam = _toy_scene(
        n=1_000_000, capacity=1 << 20, width=1920, height=1080,
        log_scale=-5.2,
    )
    rcam = cam.to_render_camera()
    means3d, scales, quats, opac, shs = activated(state)
    mask = state.active

    for c in chunks:
        for tf in (0.0, 0.5, 0.75, 0.875):
            settings = RasterizeSettings(
                max_pairs=1 << 22, backend="pallas", pallas_chunk=c,
                tier_frac=tf,
            )
            t = phase_timings(
                means3d, scales, quats, opac, shs, rcam, settings,
                active_mask=mask,
            )
            print(f"chunk={c} tier={tf}: " + " ".join(
                f"{k}={v:.1f}" for k, v in t.items()
            ), flush=True)


if __name__ == "__main__":
    main()
