#!/usr/bin/env python
"""Benchmark: 1080p forward frames/s on one chip (+ fwd+bwd, train it/s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/30}

Baseline: the reference claims ">= 30 fps at 1080p on a modern GPU"
(reference README.md:14; see BASELINE.md). vs_baseline = fps / 30.

Wall-budget design (VERDICT r3 missing #1: the r03 bench timed out under
the driver — rc=124, no number published). Every stage is guarded by a
wall-clock budget (BENCH_WALL_BUDGET seconds, default 660): compiles
through the remote-compile tunnel cost 20s-5min each, so the stage list
is ordered headline-first and the bench emits whatever it has measured
when the budget runs out (skipped stages are marked in `extra`). A
SIGTERM handler emits the partial result if the driver kills us anyway.
Compile count is collapsed to 5 graphs (was ~12 in r03):
  fwd@1M, xcheck pallas (fwd+infer+grads in ONE jit), xcheck xla,
  fwd_bwd@1M, chained train step (n_chain=2).
The roofline/phase probes (5 more compiles) are opt-in via --roofline;
evidence/ captures them out-of-band.

Timing note: the device tunnel dispatches asynchronously and
``block_until_ready`` does not reliably block, so each timed sample chains
an input perturbation through the full computation and fetches a scalar
that depends on the output — the wall time then covers real device work.
A measured ~30ms host round-trip is subtracted.
"""

import dataclasses
import json
import os
import signal
import sys
import time

T0 = time.time()
# persistent compile cache: free when it works through the remote-compile
# plugin (a pre-warmed cache makes the driver run near-instant), harmless
# when it does not
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np

BUDGET = float(os.environ.get("BENCH_WALL_BUDGET", "900"))
# measured stage walls (r4, cold process): startup+scene ~60s, fwd graph
# compile ~450s (the Mosaic+XLA long pole; later graphs reuse in-process
# kernel compiles), xcheck ~70s, fwd_bwd ~80s, chained train ~150-250s —
# total ~850s. The driver timeout is comfortably above (r02 passed at
# ~20-25 min); 900s keeps a safety margin while fitting every stage.


def _mark(msg):
    print(f"[bench +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)

# the result dict is module-level so the SIGTERM handler can emit it
RESULT = {
    "metric": "1080p frames/s/chip (fwd)",
    "value": None,
    "unit": "frames/s",
    "vs_baseline": None,
    "extra": {},
}
_EMITTED = [False]


def emit():
    if not _EMITTED[0]:
        _EMITTED[0] = True
        RESULT["extra"]["wall_s"] = round(time.time() - T0, 1)
        print(json.dumps(RESULT), flush=True)


def _on_term(signum, frame):
    RESULT["extra"]["terminated"] = True
    emit()
    os._exit(0)


def time_left():
    return T0 + BUDGET - time.time()


def _timed(fn, reps=5):
    """Best of `reps` single-dispatch timings; also returns the sample
    list so the published number carries its own run-to-run spread
    (VERDICT r4 weak #1: the driver's 10.56 fps vs the self-reported
    12.99 had no committed variance bound — now every headline records
    min/median/max of >= 5 samples, and the spread distinguishes worker/
    rtt variance from real regressions)."""
    import jax.numpy as jnp

    float(fn(jnp.float32(0.0)))  # compile + warm
    t0 = time.time()
    float(fn(jnp.float32(1e-12)))
    rtt_plus = time.time() - t0  # includes one run; RTT estimated below
    samples = [rtt_plus]
    for i in range(2, reps + 2):
        t0 = time.time()
        float(fn(jnp.float32(i * 1e-12)))
        samples.append(time.time() - t0)
    return min(samples), sorted(samples)


def _backend_cross_check(state, rcam, bg):
    """Render + differentiate one small frame with BOTH compositor
    backends on the live device and assert they agree — interpret-mode CPU
    tests cannot catch a real-chip Mosaic miscompile, so the bench refuses
    to publish a number from an unverified kernel (VERDICT round-1 weak
    item 5).

    ONE jitted graph per backend (VERDICT r3 next-round item 1): the graph
    computes value+grads via the differentiable path AND the pure-render
    path (= the inference kernel for pallas), so two compiles cover the
    fwd kernel, the inference kernel, the backward kernel + sort
    reduction, and the XLA-compositor oracle for all of them.
    """
    import jax
    import jax.numpy as jnp

    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.train.step import render_state

    outs = {}
    for backend in ("pallas", "xla"):
        s = RasterizeSettings(
            max_pairs=1 << 19, max_splats_per_tile=2048, chunk=32,
            backend=backend,
        )

        @jax.jit
        def graph(params, _s=s):
            st = dataclasses.replace(state, params=params)

            def loss_fn(p):
                stt = dataclasses.replace(state, params=p)
                out = render_state(stt, rcam, bg, _s)
                return jnp.mean(out["render"] ** 2), (
                    out["render"], out["final_T"]
                )

            (_, (img, fT)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            # pure-render path: custom-VJP primal = the inference kernel
            img_inf = render_state(st, rcam, bg, _s)["render"]
            return img, fT, img_inf, grads

        img, fT, img_inf, grads = graph(state.params)
        outs[backend] = (
            np.asarray(img), np.asarray(fT), np.asarray(img_inf),
            {k: np.asarray(v) for k, v in grads.items()},
        )

    d_img = np.abs(outs["pallas"][0] - outs["xla"][0])
    d_t = np.abs(outs["pallas"][1] - outs["xla"][1])
    img_diff = float(d_img.max())
    t_diff = float(d_t.max())
    inf_diff = float(np.abs(outs["pallas"][2] - outs["pallas"][0]).max())
    # Tolerances are two-tier (round-5 measurement): the BULK of pixels
    # must agree to reassociation scale (p99.9 <= 5e-4), while a sparse
    # handful may differ by up to ~ALPHA_MIN — a pair whose alpha sits
    # within the backends' exp()-ulp disagreement of the 1/255 cutoff is
    # included by one implementation and not the other, shifting that
    # tile's blend by <= one minimum contribution (measured: 33 of 262k
    # pixels, max 2.9e-3 img / 3.9e-3 T). The reference's CUDA-vs-python
    # dual paths have the same epsilon sensitivity at this threshold.
    img_p999 = float(np.quantile(d_img, 0.999))
    t_p999 = float(np.quantile(d_t, 0.999))
    assert img_diff <= 6e-3 and t_diff <= 6e-3, (
        f"pallas/xla disagree on-device: img {img_diff:.2e}, T {t_diff:.2e}"
    )
    assert img_p999 <= 5e-4 and t_p999 <= 5e-4, (
        f"pallas/xla bulk disagreement (not a sparse threshold flip): "
        f"p99.9 img {img_p999:.2e}, T {t_p999:.2e}"
    )
    assert inf_diff <= 1e-5, (
        f"inference kernel deviates from fwd kernel on-device: {inf_diff:.2e}"
    )
    for k in outs["pallas"][3]:
        gp, gx = outs["pallas"][3][k], outs["xla"][3][k]
        gd = float(np.abs(gp - gx).max())
        scale = float(np.abs(gx).max()) or 1.0
        assert gd <= 5e-3 * max(scale, 1.0), (
            f"pallas/xla grads disagree on-device: {k} {gd:.2e} "
            f"(scale {scale:.2e})"
        )
    return max(img_diff, inf_diff)


def main():
    import argparse

    signal.signal(signal.SIGTERM, _on_term)

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
    # A/B knob for the pair-expansion strategy. Round-4 measurements
    # (evidence/perf/r4_ab.jsonl, snug stage) flipped the default to
    # "compact" + a snug pair budget: compact's key sort is max_pairs
    # entries regardless of footprints, so the probe-sized budget shrinks
    # it directly — 102.5ms (grid t.875 @1<<22) -> 92.3ms. The budget
    # mirrors what probe_rasterize_settings picks on real scenes: the
    # scene's ~3.33M real pairs x 1.06, 64k-aligned.
    ap.add_argument("--expansion", default="compact",
                    choices=("grid", "compact"))
    ap.add_argument("--max_pairs", type=int, default=3_538_944)
    # phase/roofline probes cost ~5 extra remote compiles; evidence/
    # captures them out-of-band, the driver run must not pay for them
    ap.add_argument("--roofline", action="store_true")
    ap.add_argument("--skip_xcheck", action="store_true")
    ap.add_argument("--n_chain", type=int, default=2)
    args = ap.parse_args()

    ex = RESULT["extra"]
    ex.update(
        n_gaussians=1_000_000, resolution="1920x1080",
        tier_frac=args.tier_frac, grad_dtype=args.grad_dtype,
        expansion=args.expansion, device=str(jax.devices()[0]),
        fwd_bwd_frames_per_s=None, train_iters_per_s=None,
        backend_xcheck_max_diff=None,
    )

    _mark(f"device up: {jax.devices()[0]}")
    n_gauss = 1_000_000
    width, height = 1920, 1080
    # trained-scene-like footprints: a few pixels radius, 1-6 tiles each
    state, cam = _toy_scene(
        n=n_gauss, capacity=1 << 20, width=width, height=height,
        log_scale=-5.2,
    )
    rcam = cam.to_render_camera()
    bg = jnp.zeros(3)
    fwd_settings = RasterizeSettings(
        max_pairs=args.max_pairs, backend="pallas",
        tier_frac=args.tier_frac, expansion=args.expansion,
    )
    bwd_settings = RasterizeSettings(
        max_pairs=args.max_pairs, max_splats_per_tile=1024, chunk=32,
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
    ex["rtt_ms"] = round(rtt * 1000, 1)

    # ---- stage 1: the headline forward fps ----
    @jax.jit
    def fwd(eps):
        p = dict(state.params)
        p["xyz"] = p["xyz"] + eps
        s = dataclasses.replace(state, params=p)
        img = render_state(s, rcam, bg, fwd_settings)["render"]
        return jnp.sum(img[::64, ::64])

    _mark("fwd: compiling")
    t_min, t_samples = _timed(fwd)
    t_fwd = max(t_min - rtt, 1e-4)
    RESULT["value"] = round(1.0 / t_fwd, 3)
    RESULT["vs_baseline"] = round(1.0 / t_fwd / 30.0, 4)
    ex["fwd_samples_ms"] = [round(s * 1e3, 1) for s in t_samples]
    med = t_samples[len(t_samples) // 2]
    ex["fwd_fps_min_med"] = [
        round(1.0 / max(t_samples[-1] - rtt, 1e-4), 2),
        round(1.0 / max(med - rtt, 1e-4), 2),
    ]
    _mark(f"fwd: {1.0 / t_fwd:.2f} fps (median {ex['fwd_fps_min_med'][1]})")

    # ---- stage 2: on-device backend cross-check (2 small compiles) ----
    if args.skip_xcheck:
        ex["backend_xcheck_max_diff"] = "skipped (--skip_xcheck)"
    elif time_left() < 150:
        ex["backend_xcheck_max_diff"] = "skipped (wall budget)"
    else:
        xstate, xcam = _toy_scene(
            n=20_000, capacity=1 << 15, width=512, height=512,
            log_scale=-4.0,
        )
        ex["backend_xcheck_max_diff"] = round(
            _backend_cross_check(xstate, xcam.to_render_camera(), bg), 6
        )
        _mark("xcheck: ok")

    # ---- stage 3: forward+backward fps ----
    if time_left() < 180:
        emit()
        return 0

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

    t_min, t_samples = _timed(fwd_bwd)
    t_fwd_bwd = max(t_min - rtt, 1e-4)
    ex["fwd_bwd_frames_per_s"] = round(1.0 / t_fwd_bwd, 3)
    ex["fwd_bwd_samples_ms"] = [round(s * 1e3, 1) for s in t_samples]
    _mark(f"fwd_bwd: {1.0 / t_fwd_bwd:.2f} fps")

    # ---- stage 4: full train-step throughput ----
    # render + L1/SSIM loss + backward + Adam + densify stats, n_chain
    # steps chained into one dispatch
    if time_left() < 240:
        emit()
        return 0

    from gsjax.configs import OptimizationParams
    from gsjax.data.cameras import stack_render_cameras
    from gsjax.train.optim import make_optimizer
    from gsjax.train.step import TrainConfig, make_train_step_chained

    n_chain = args.n_chain
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
    ex["train_iters_per_s"] = round(1.0 / t_train, 3)
    ex["train_samples_ms"] = [round(s * 1e3, 1) for s in sorted(samples)]
    _mark(f"train: {1.0 / t_train:.2f} it/s")

    # ---- stage 5 (opt-in): recorded roofline evidence ----
    # (BASELINE.md "fwd+bwd >= 70% of roofline"; ~5 extra remote compiles)
    if args.roofline and time_left() > 240:
        from gsjax.models.gaussians import activated
        from gsjax.utils.profiling import roofline_report

        means3d, scales, quats, opac, shs = activated(state)
        roof = roofline_report(
            means3d, scales, quats, opac, shs, rcam, bwd_settings,
            active_mask=state.active,
        )
        ex["roofline_frac"] = round(
            max(roof["compute_roofline_frac"], roof["hbm_roofline_frac"]), 4
        )
        ex["roofline"] = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in roof.items()
        }

    # measured-attainable roofline reference (free): per-phase measured vs
    # attainable from the committed microbench session — lax.sort ceiling,
    # pack-gather rate, composite DMA-skeleton floor + per-pass slope. The
    # honest denominators; see docs/PERF.md "Honest roofline (round 4)".
    ref_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "evidence", "perf", "roofline_r5.json",
    )
    if os.path.exists(ref_path):
        try:
            with open(ref_path) as f:
                ex["roofline_ref"] = json.load(f)
        except Exception:
            pass

    emit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
