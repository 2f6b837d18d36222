#!/usr/bin/env python
"""Round-5 perf A/B session — single process (amortizes the ~60s
per-process tunnel overhead; each jitted variant still pays its own
remote compile).

Stages (select with --stages, comma-separated):
  fwd       forward fps at the bench operating point (compact + snug) —
            the 8-column-attr-table headline vs r4's 92.3 ms
  fwdbwd    fwd+bwd fps at the bench config (bf16 grads, sort reduction)
  exitk     saturation-exit cadence A/B on the new kernel (VERDICT r4
            weak #3: built round 4, never measured)
  phases    forward per-phase split (pre / +binning / full) — refreshed
            roofline numerators for the 8-col pipeline
  bwdsplit  backward decomposition: bwd kernel vs reduction via the
            _kernel_only seam, + reduction-component microbenches
            (6-op sort ceiling, blocked cumsum, boundary gather) —
            VERDICT r4 missing #2 (the backward roofline)

Appends one JSON line per measurement to evidence/perf/r5_ab.jsonl.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "evidence", "perf", "r5_ab.jsonl",
)

MP = 3_538_944  # snug budget: the scene's ~3.33M real pairs x 1.06


def log(rec):
    rec["t"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="fwd,exitk,fwdbwd")
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
         "device": str(jax.devices()[0]), "session": "r5"})

    state, cam = _toy_scene(
        n=1_000_000, capacity=1 << 20, width=1920, height=1080,
        log_scale=-5.2,
    )
    rcam = cam.to_render_camera()
    bg = jnp.zeros(3)
    s_fwd = RasterizeSettings(max_pairs=MP, backend="pallas",
                              expansion="compact")
    s_bwd = RasterizeSettings(max_pairs=MP, backend="pallas",
                              expansion="compact", grad_dtype="bfloat16",
                              grad_reduce="sort")

    def fwd_fn(s):
        def fwd(eps, _s=s):
            pp = dict(state.params)
            pp["xyz"] = pp["xyz"] + eps
            st = dataclasses.replace(state, params=pp)
            img = render_state(st, rcam, bg, _s)["render"]
            return jnp.sum(img[::64, ::64])
        return fwd

    if "fwd" in stages:
        t = timed(jax.jit(fwd_fn(s_fwd)), rtt=rtt)
        log({"stage": "fwd", "cfg": "attr8_compact_snug",
             "ms": round(t * 1e3, 1), "fps": round(1 / t, 2)})

    if "exitk" in stages:
        # env read at TRACE time; fresh closures per value retrace
        for k in ("1", "2", "4", "0"):
            os.environ["GSJAX_EXIT_CHECK_EVERY"] = k

            def fwd(eps, _k=k):
                pp = dict(state.params)
                pp["xyz"] = pp["xyz"] + eps
                st = dataclasses.replace(state, params=pp)
                img = render_state(st, rcam, bg, s_fwd)["render"]
                return jnp.sum(img[::64, ::64])

            t = timed(jax.jit(fwd), rtt=rtt)
            log({"stage": "exitk", "cfg": f"every{k}",
                 "ms": round(t * 1e3, 1), "fps": round(1 / t, 2)})
        os.environ["GSJAX_EXIT_CHECK_EVERY"] = "1"

    if "fwdbwd" in stages:
        def fwdbwd(eps):
            pp = dict(state.params)
            pp["xyz"] = pp["xyz"] + eps
            st = dataclasses.replace(state, params=pp)

            def loss(p2):
                st2 = dataclasses.replace(st, params=p2)
                img = render_state(st2, rcam, bg, s_bwd)["render"]
                return jnp.sum(img * img)

            g = jax.grad(loss)(pp)
            return sum(jnp.sum(v[::257]) for v in g.values())

        t = timed(jax.jit(fwdbwd), rtt=rtt)
        log({"stage": "fwdbwd", "cfg": "attr8_bf16_sort",
             "ms": round(t * 1e3, 1), "fps": round(1 / t, 2)})

    if "phases" in stages:
        from gsjax.ops.binning import build_tile_bins
        from gsjax.ops.projection import num_tiles, preprocess
        from gsjax.train.step import activated

        tiles_x, tiles_y = num_tiles(1920, 1080)

        def pre_only(eps):
            pp = dict(state.params)
            pp["xyz"] = pp["xyz"] + eps
            st = dataclasses.replace(state, params=pp)
            m3, sc, qu, op, shs = activated(st)
            sp = preprocess(m3, sc, qu, op, shs, rcam,
                            st.active_sh_degree, active_mask=st.active)
            # sum over FULL arrays (ADVICE r4 #4: the strided r4 probe
            # under-measured the prefix — a [::64] sample let XLA skip
            # most of the compute's consumers; full sums force it all)
            return (jnp.sum(sp.means2d) + jnp.sum(sp.conics)
                    + jnp.sum(sp.colors) + jnp.sum(sp.radii))

        def pre_bins(eps):
            pp = dict(state.params)
            pp["xyz"] = pp["xyz"] + eps
            st = dataclasses.replace(state, params=pp)
            m3, sc, qu, op, shs = activated(st)
            sp = preprocess(m3, sc, qu, op, shs, rcam,
                            st.active_sh_degree, active_mask=st.active)
            b = build_tile_bins(sp, tiles_x, tiles_y, MP,
                                max_tiles_per_gauss=16,
                                expansion="compact")
            return (jnp.sum(b.pair_gauss) + jnp.sum(b.tile_start)
                    + jnp.sum(sp.radii))

        ms = {}
        for tag, fn in (("pre", pre_only), ("pre+bin", pre_bins),
                        ("full", fwd_fn(s_fwd))):
            t = timed(jax.jit(fn), rtt=rtt)
            ms[tag] = t * 1e3
            log({"stage": "phases", "cfg": tag, "ms": round(t * 1e3, 2)})
        log({"stage": "phases", "cfg": "split",
             "pre_ms": round(ms["pre"], 2),
             "bin_ms": round(ms["pre+bin"] - ms["pre"], 2),
             "composite_ms": round(ms["full"] - ms["pre+bin"], 2)})

    if "bwdsplit" in stages:
        import functools

        from gsjax.ops.binning import build_tile_bins
        from gsjax.ops.pallas_composite import (
            composite_pallas_grads, composite_tiles_pallas, pack_pair_attrs,
        )
        from gsjax.ops.projection import num_tiles, preprocess
        from gsjax.train.step import activated

        tiles_x, tiles_y = num_tiles(1920, 1080)

        @jax.jit
        def make_res(eps):
            pp = dict(state.params)
            pp["xyz"] = pp["xyz"] + eps
            st = dataclasses.replace(state, params=pp)
            m3, sc, qu, op, shs = activated(st)
            sp = preprocess(m3, sc, qu, op, shs, rcam,
                            st.active_sh_degree, active_mask=st.active)
            b = build_tile_bins(sp, tiles_x, tiles_y, MP,
                                max_tiles_per_gauss=16,
                                expansion="compact")
            pa = pack_pair_attrs(b.pair_gauss, sp.means2d, sp.conics,
                                 sp.colors, sp.opacities,
                                 pair_slot=b.pair_slot)
            tc, tT, ncon = composite_tiles_pallas(
                pa, b.tile_start, tiles_x, tiles_y)
            return pa, b.tile_start, tT, ncon, b.pair_slot, b.gauss_count

        res = jax.block_until_ready(make_res(jnp.float32(0.0)))
        pa, tile_start, tT, ncon, pair_slot, gauss_count = res
        num_t = tiles_x * tiles_y
        dtc_base = jnp.ones((num_t, 256, 3), jnp.float32)
        dtT = jnp.zeros((num_t, 256), jnp.float32)
        mt = 16

        def run_bwd(eps, _pa, _ts, _tT, _nc, _ps, _gc, kernel_only):
            out = composite_pallas_grads(
                _pa, _ts, dtc_base + eps, dtT, _tT, _nc, _ps, _gc,
                mt, tiles_x, tiles_y,
                grad_dtype=jnp.bfloat16, grad_reduce="sort",
                _kernel_only=kernel_only,
            )
            if kernel_only:
                return jnp.sum(out[::64].astype(jnp.float32))
            return sum(jnp.sum(g) for g in out)

        ms = {}
        for tag, ko in (("bwd_kernel_only", True), ("bwd_full", False)):
            fn = jax.jit(functools.partial(run_bwd, kernel_only=ko))
            t = timed(
                lambda eps, _f=fn: _f(eps, pa, tile_start, tT, ncon,
                                      pair_slot, gauss_count),
                rtt=rtt,
            )
            ms[tag] = t * 1e3
            log({"stage": "bwdsplit", "cfg": tag, "ms": round(t * 1e3, 2)})
        log({"stage": "bwdsplit", "cfg": "reduction_delta",
             "ms": round(ms["bwd_full"] - ms["bwd_kernel_only"], 2)})

        # --- reduction-component microbenches at the real shapes ---
        chunk = 128
        p_pad = (-(-MP // chunk)) * chunk + chunk * num_t + chunk
        key = jax.random.PRNGKey(2)

        # (a) the 6-operand u32 sort ceiling at p_pad rows
        k6 = jax.random.randint(key, (p_pad,), 0, 1 << 30, jnp.int32)
        pays = [jnp.arange(p_pad, dtype=jnp.int32)] * 5

        def srt(eps, _k=k6, _p=pays):
            kk = _k + eps.astype(jnp.int32)
            out = jax.lax.sort((kk, *_p), num_keys=1, is_stable=False)
            return jnp.sum(out[0][::4096]) + jnp.sum(out[1][::4096])

        t = timed(jax.jit(srt), rtt=rtt)
        log({"stage": "bwdsplit", "cfg": "sort6_ppad", "rows": p_pad,
             "ms": round(t * 1e3, 2),
             "mrows_s": round(p_pad / t / 1e6, 1)})

        # (b) blocked cumsum over (p_pad, 8) f32 + (p_pad,) f32
        from gsjax.ops.pallas_composite import (
            _blocked_cumsum_1d, _blocked_cumsum_rows,
        )
        g8 = jax.random.normal(key, (p_pad, 8), jnp.float32)
        g1 = jax.random.normal(key, (p_pad,), jnp.float32)

        def csum(eps, _g8=g8, _g1=g1):
            c8 = _blocked_cumsum_rows(_g8 + eps)
            c1 = _blocked_cumsum_1d(_g1 + eps)
            return jnp.sum(c8[::4096]) + jnp.sum(c1[::4096])

        t = timed(jax.jit(csum), rtt=rtt)
        log({"stage": "bwdsplit", "cfg": "cumsum_ppad8",
             "ms": round(t * 1e3, 2)})

        # (c) the (N+1)-row monotone boundary gather from (p_pad+1, 8)
        n1 = 1_000_001
        tbl8 = jax.random.normal(key, (p_pad + 1, 8), jnp.float32)
        tbl1 = jax.random.normal(key, (p_pad + 1,), jnp.float32)
        loc = jnp.sort(
            jax.random.randint(key, (n1,), 0, p_pad, jnp.int32))

        def bg_probe(eps, _t8=tbl8, _t1=tbl1, _loc=loc):
            t8 = _t8 + eps
            cl8 = t8[_loc]
            cl1 = (_t1 + eps)[_loc]
            return jnp.sum(cl8[::64]) + jnp.sum(cl1[::64])

        t = timed(jax.jit(bg_probe), rtt=rtt)
        log({"stage": "bwdsplit", "cfg": "boundary_gather", "rows": n1,
             "ms": round(t * 1e3, 2),
             "mrows_s": round(n1 / t / 1e6, 1)})

    if "vpux" in stages:
        # Attribution probes for the forward kernel's measured-vs-SoL gap
        # (38 vs 24 ms): (a) the true cost of a transcendental pass vs a
        # mul-add pass on the production grid/DMA skeleton, (b) fori vs
        # while loop skeleton. Same harness as the r4 `vpu` stage.
        import functools

        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from gsjax.ops.binning import build_tile_bins
        from gsjax.ops.pallas_composite import ATTR_W, PIX
        from gsjax.ops.projection import num_tiles, preprocess

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
            b = build_tile_bins(sp, tiles_x, tiles_y, MP,
                                max_tiles_per_gauss=16, expansion="compact")
            p = b.pair_gauss.shape[0]
            pad = (-p) % 128 + 128
            tbl = jnp.zeros(((p + pad) // 128, ATTR_W, 128), jnp.float32)
            return b.tile_start, tbl

        tile_start, tbl = jax.block_until_ready(make_inputs(jnp.float32(0)))

        def sol_kernel(tile_start_ref, tbl_hbm, out_ref, buf, sems, *,
                       k_ops, k_exp, use_while):
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

            def body_math(ci, x):
                @pl.when(ci + 1 < nch)
                def _():
                    dma((ci + 1) % 2, ci + 1).start()

                dma(ci % 2, ci).wait()
                row = buf[ci % 2, 0:1, :]
                x = x + row
                for j in range(k_ops):
                    x = x * 1.0000001 + (0.3 + j * 1e-7)
                for j in range(k_exp):
                    x = jnp.exp(-1e-6 * x - (0.1 + j * 1e-7))
                return x

            init = jnp.zeros((PIX, 128), jnp.float32)
            if use_while:
                def cond(s):
                    ci, _ = s
                    return ci < nch

                def wbody(s):
                    ci, x = s
                    return ci + 1, body_math(ci, x)

                _, acc = jax.lax.while_loop(cond, wbody, (jnp.int32(0), init))
            else:
                acc = jax.lax.fori_loop(0, nch, body_math, init)
            out_ref[0] = jnp.sum(acc, axis=1, keepdims=True).T

        for tag, k_ops, k_exp, use_while in (
            ("f20e0", 20, 0, False),
            ("f20e5", 20, 5, False),
            ("f20e10", 20, 10, False),
            ("w20e0", 20, 0, True),
        ):
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

            def run(eps, ts, tb, _k=(k_ops, k_exp, use_while), _gs=grid_spec):
                ts = jnp.concatenate([
                    ts[:1] + (eps * 1e-9).astype(jnp.int32), ts[1:]
                ])
                out = pl.pallas_call(
                    functools.partial(sol_kernel, k_ops=_k[0], k_exp=_k[1],
                                      use_while=_k[2]),
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
                log({"stage": "vpux", "cfg": tag, "error": str(e)[:200]})
                continue
            log({"stage": "vpux", "cfg": tag, "ms": round(t * 1e3, 2)})

    log({"stage": "done"})


if __name__ == "__main__":
    main()
