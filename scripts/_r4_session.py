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

    if "snug" in stages:
        # the combined candidate default: compact expansion + snug budget
        # (compact's key sort is max_pairs entries, so the snug budget
        # shrinks it directly — grid's N*mt_mix sort doesn't care)
        for tag, s in (
            ("compact_snug", RasterizeSettings(
                max_pairs=3_538_944, backend="pallas", tier_frac=0.0,
                expansion="compact")),
            ("grid_snug", RasterizeSettings(
                max_pairs=3_538_944, backend="pallas", tier_frac=0.875,
                expansion="grid")),
        ):
            def fwd(eps, _s=s):
                pp = dict(state.params)
                pp["xyz"] = pp["xyz"] + eps
                st = dataclasses.replace(state, params=pp)
                img = render_state(st, rcam, bg, _s)["render"]
                return jnp.sum(img[::64, ::64])

            t = timed(jax.jit(fwd), rtt=rtt)
            log({"stage": "snug", "cfg": tag,
                 "ms": round(t * 1e3, 1), "fps": round(1 / t, 2)})

            def fwdbwd(eps, _s=s):
                pp = dict(state.params)
                pp["xyz"] = pp["xyz"] + eps
                st = dataclasses.replace(state, params=pp)

                def loss(p2):
                    st2 = dataclasses.replace(st, params=p2)
                    img = render_state(st2, rcam, bg, _s)["render"]
                    return jnp.sum(img * img)

                g = jax.grad(loss)(pp)
                return sum(jnp.sum(v[::257]) for v in g.values())

            t = timed(jax.jit(fwdbwd), rtt=rtt)
            log({"stage": "snug", "cfg": tag + "_fwdbwd",
                 "ms": round(t * 1e3, 1), "fps": round(1 / t, 2)})

    if "phases" in stages:
        # Per-phase split of the default forward at the 1080p bench scene
        # (compact + snug, the committed bench config): three cumulative
        # prefixes — preprocess; +binning; full render — so differences
        # give per-phase times under the same jit/fusion regime. These are
        # the measured numerators of the honest roofline (VERDICT r3 item
        # 5); the denominators come from the sort/vpu stages below.
        from gsjax.ops.binning import build_tile_bins
        from gsjax.ops.projection import num_tiles, preprocess
        from gsjax.train.step import activated

        s = RasterizeSettings(max_pairs=3_538_944, backend="pallas",
                              tier_frac=0.0, expansion="compact")
        tiles_x, tiles_y = num_tiles(1920, 1080)

        def pre_only(eps):
            pp = dict(state.params)
            pp["xyz"] = pp["xyz"] + eps
            st = dataclasses.replace(state, params=pp)
            m3, sc, qu, op, shs = activated(st)
            sp = preprocess(m3, sc, qu, op, shs, rcam,
                            st.active_sh_degree, active_mask=st.active,
                            opacity_aware_radius=s.opacity_aware_radius)
            return (jnp.sum(sp.means2d[::64]) + jnp.sum(sp.conics[::64])
                    + jnp.sum(sp.colors[::64]) + jnp.sum(sp.radii[::64]))

        def pre_bins(eps):
            pp = dict(state.params)
            pp["xyz"] = pp["xyz"] + eps
            st = dataclasses.replace(state, params=pp)
            m3, sc, qu, op, shs = activated(st)
            sp = preprocess(m3, sc, qu, op, shs, rcam,
                            st.active_sh_degree, active_mask=st.active,
                            opacity_aware_radius=s.opacity_aware_radius)
            b = build_tile_bins(sp, tiles_x, tiles_y, s.max_pairs,
                                max_tiles_per_gauss=s.max_tiles_per_gauss,
                                tier_frac=s.tier_frac,
                                expansion=s.expansion)
            return (jnp.sum(b.pair_gauss[::4096]) + jnp.sum(b.tile_start)
                    + jnp.sum(sp.radii[::64]))

        def full(eps):
            pp = dict(state.params)
            pp["xyz"] = pp["xyz"] + eps
            st = dataclasses.replace(state, params=pp)
            img = render_state(st, rcam, bg, s)["render"]
            return jnp.sum(img[::64, ::64])

        ms = {}
        for tag, fn in (("pre", pre_only), ("pre+bin", pre_bins),
                        ("full", full)):
            t = timed(jax.jit(fn), rtt=rtt)
            ms[tag] = t * 1e3
            log({"stage": "phases", "cfg": tag, "ms": round(t * 1e3, 2)})
        log({"stage": "phases", "cfg": "split",
             "pre_ms": round(ms["pre"], 2),
             "bin_ms": round(ms["pre+bin"] - ms["pre"], 2),
             "composite_ms": round(ms["full"] - ms["pre+bin"], 2)})

    if "exitk" in stages:
        # saturation early-exit cadence: the per-chunk all-done reduction
        # costs a cross-sublane reduce + vector->scalar sync; tiles average
        # ~3 chunks at the bench scene so exit rarely fires. Images are
        # identical at any cadence (masked contributions are zero) — pure
        # time A/B. Env is read at TRACE time; fresh closures retrace.
        for k in ("1", "4", "0"):
            os.environ["GSJAX_EXIT_CHECK_EVERY"] = k
            s = RasterizeSettings(max_pairs=3_538_944, backend="pallas",
                                  tier_frac=0.0, expansion="compact")

            def fwd(eps, _s=s, _k=k):  # _k: distinct closure per config
                pp = dict(state.params)
                pp["xyz"] = pp["xyz"] + eps
                st = dataclasses.replace(state, params=pp)
                img = render_state(st, rcam, bg, _s)["render"]
                return jnp.sum(img[::64, ::64])

            t = timed(jax.jit(fwd), rtt=rtt)
            log({"stage": "exitk", "cfg": f"every{k}",
                 "ms": round(t * 1e3, 1), "fps": round(1 / t, 2)})
        os.environ["GSJAX_EXIT_CHECK_EVERY"] = "1"

    if "sort" in stages:
        # lax.sort throughput ceilings at the bench shapes — the honest
        # denominator for the binning phase of the roofline (VERDICT r3
        # next-round item 5): binning can't beat the sort primitive it is
        # built on.
        key = jax.random.PRNGKey(1)
        for n_rows, n_pay, tag in (
            (3_538_944, 2, "3.5Mx3ops"),
            (3_538_944, 5, "3.5Mx6ops"),
            (1_000_000, 5, "1Mx6ops"),
        ):
            k = jax.random.randint(key, (n_rows,), 0, 1 << 30, jnp.int32)
            pays = [jnp.arange(n_rows, dtype=jnp.int32)] * n_pay

            def srt(eps, _k=k, _p=pays):
                kk = _k + eps.astype(jnp.int32)
                out = jax.lax.sort((kk, *_p), num_keys=1, is_stable=False)
                return jnp.sum(out[0][::4096]) + jnp.sum(out[1][::4096])

            t = timed(jax.jit(srt), rtt=rtt)
            log({"stage": "sort", "cfg": tag, "rows": n_rows,
                 "ms": round(t * 1e3, 2),
                 "mrows_s": round(n_rows / t / 1e6, 1)})

    if "vpu" in stages:
        # speed-of-light for the compositing kernels: same grid + DMA
        # skeleton (one program per tile, double-buffered chunk DMAs over
        # the pair table), K full-width (PIX, chunk) elementwise passes of
        # real math per chunk. Sweeping K gives ns/pass (slope) and the
        # loop/DMA skeleton floor (intercept) — the honest attainable-time
        # model for a kernel that needs N passes.
        import functools

        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from gsjax.ops.binning import build_tile_bins
        from gsjax.ops.pallas_composite import ATTR_W, PIX
        from gsjax.ops.projection import num_tiles, preprocess
        from gsjax.ops.rasterize import RasterizeSettings as RS

        s = RS(max_pairs=3_538_944, backend="pallas", expansion="compact")
        tiles_x, tiles_y = num_tiles(1920, 1080)

        @jax.jit
        def make_inputs(eps):
            sp = preprocess(
                state.params["xyz"] + eps,
                jnp.exp(state.params["scaling"]),
                state.params["rotation"],
                jax.nn.sigmoid(state.params["opacity"][:, 0]),
                jnp.zeros((state.capacity, 16, 3), jnp.float32),
                rcam, 0, active_mask=state.active,
            )
            b = build_tile_bins(sp, tiles_x, tiles_y, s.max_pairs,
                                max_tiles_per_gauss=s.max_tiles_per_gauss,
                                expansion="compact")
            p = b.pair_gauss.shape[0]
            pad = (-p) % 128 + 128
            tbl = jnp.zeros(((p + pad) // 128, ATTR_W, 128), jnp.float32)
            return b.tile_start, tbl

        tile_start, tbl = jax.block_until_ready(make_inputs(jnp.float32(0)))

        def sol_kernel(tile_start_ref, tbl_hbm, out_ref, buf, sems, *, k_ops):
            t = pl.program_id(0)
            start = tile_start_ref[t]
            end = tile_start_ref[t + 1]
            win = (start // 128) * 128
            nch = pl.cdiv(end - win, 128)

            def dma(slot, ci):
                return pltpu.make_async_copy(
                    tbl_hbm.at[win // 128 + ci], buf.at[slot], sems.at[slot]
                )

            @pl.when(nch > 0)
            def _():
                dma(0, 0).start()

            def body(ci, carry):
                @pl.when(ci + 1 < nch)
                def _():
                    dma((ci + 1) % 2, ci + 1).start()

                dma(ci % 2, ci).wait()
                row = buf[ci % 2, 0:1, :]
                x = carry + row  # (PIX, 128) broadcast
                for j in range(k_ops):
                    # distinct constants per op so nothing folds
                    x = x * 1.0000001 + (0.3 + j * 1e-7)
                return x

            acc = jax.lax.fori_loop(
                0, nch, body, jnp.zeros((PIX, 128), jnp.float32)
            )
            out_ref[0] = jnp.sum(acc, axis=1, keepdims=True).T

        for k_ops in (4, 40):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(tiles_x * tiles_y,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
                out_specs=pl.BlockSpec(
                    (1, 1, PIX), lambda t, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, ATTR_W, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )

            def run(eps, ts, tb, _k=k_ops, _gs=grid_spec):
                # eps rides the (tiny) tile_start operand for the timing
                # data dependence; a full-table perturbation would cost
                # ~0.5ms of HBM traffic per sample
                ts = jnp.concatenate([
                    ts[:1] + (eps * 1e-9).astype(jnp.int32), ts[1:]
                ])
                out = pl.pallas_call(
                    functools.partial(sol_kernel, k_ops=_k),
                    grid_spec=_gs,
                    out_shape=jax.ShapeDtypeStruct(
                        (tiles_x * tiles_y, 1, PIX), jnp.float32),
                    interpret=False,
                )(ts, tb)
                return jnp.sum(out[::64])

            runj = jax.jit(run)
            try:
                t = timed(lambda eps: runj(eps, tile_start, tbl), rtt=rtt)
            except Exception as e:  # noqa: BLE001 — log and keep measuring
                log({"stage": "vpu", "cfg": f"k{k_ops}",
                     "error": str(e)[:200]})
                continue
            log({"stage": "vpu", "cfg": f"k{k_ops}",
                 "ms": round(t * 1e3, 2)})

    if "chunk" in stages:
        # pallas_chunk 128 vs 256: halves the per-chunk loop/DMA skeleton
        # (~0.4us x 26k iterations measured round 1) IF the doubled lane
        # width doesn't spill vregs (the 2-chunk unroll did)
        for pc in (128, 256):
            s = RasterizeSettings(
                max_pairs=3_538_944, backend="pallas", tier_frac=0.875,
                expansion="grid", pallas_chunk=pc)

            def fwd(eps, _s=s):
                pp = dict(state.params)
                pp["xyz"] = pp["xyz"] + eps
                st = dataclasses.replace(state, params=pp)
                img = render_state(st, rcam, bg, _s)["render"]
                return jnp.sum(img[::64, ::64])

            try:
                t = timed(jax.jit(fwd), rtt=rtt)
            except Exception as e:  # noqa: BLE001 — log and keep measuring
                log({"stage": "chunk", "cfg": f"pc{pc}", "error": str(e)[:200]})
                continue
            log({"stage": "chunk", "cfg": f"pc{pc}",
                 "ms": round(t * 1e3, 1), "fps": round(1 / t, 2)})

    log({"stage": "done"})


if __name__ == "__main__":
    main()
