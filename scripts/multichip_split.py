#!/usr/bin/env python
"""Multi-chip work-split measurement + frame-time projection (VERDICT r4
next-round #7).

Real multi-chip hardware does not exist in this environment, but the
tile-strip design's claim — the pair budget and row-op work split G
ways — is checkable today: run the PRODUCTION sharded preprocess ->
splat-exchange -> strip-binning path (gsjax/parallel/shard.py) on a
G-device virtual CPU mesh at the 1080p/1M bench operating point and
record each chip's concrete work: visible splats, exchanged rows, strip
pair counts, binning sort sizes, drops. Then project the G-chip frame
time from the round-5 single-chip phase rates (docs/PERF.md): every
per-pair phase scales with the chip's measured pair count, preprocess
scales with N/G, and the a2a exchange volume is priced at a
conservative ICI bandwidth.

Writes evidence/perf/multichip_split_r5.json.

Usage:
    python scripts/multichip_split.py [--devices 8] [--exchange a2a|all_gather]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "evidence", "perf", "multichip_split_r5.json",
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--exchange", default="a2a",
                    choices=("a2a", "all_gather"))
    ap.add_argument("--out", default=OUT)
    # single-chip phase rates measured on the TPU (evidence/perf/
    # r5_ab.jsonl); override after a new session
    ap.add_argument("--bin_ms_1chip", type=float, default=None,
                    help="single-chip binning ms at the bench point")
    ap.add_argument("--pack_kernel_ms_1chip", type=float, default=None,
                    help="single-chip pack+kernel (composite) ms")
    ap.add_argument("--pre_ms_1chip", type=float, default=2.0)
    ap.add_argument("--strip_budget_mult", type=float, default=1.0,
                    help="headroom multiplier over the even max_pairs/G "
                         "split (the measured ~10%% strip imbalance makes "
                         "the exact even split drop pairs)")
    ap.add_argument("--ici_gbps", type=float, default=90.0,
                    help="assumed per-chip ICI all-to-all bandwidth "
                         "(v5e: 4 links x ~50GB/s, conservative net)")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import functools

    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from __graft_entry__ import _toy_scene
    from gsjax.models.gaussians import activated_params
    from gsjax.ops.binning import build_tile_bins
    from gsjax.ops.projection import num_tiles, preprocess
    from gsjax.ops.rasterize import RasterizeSettings
    from gsjax.parallel.shard import (
        _a2a_rows_auto, _cdiv, _exchange_splats, shard_gaussian_state,
    )

    G = args.devices
    width, height = 1920, 1080
    n_gauss = 1_000_000
    mp_total = 3_538_944  # the bench snug budget
    settings = RasterizeSettings(
        max_pairs=mp_total, expansion="compact",
        splat_exchange=args.exchange,
    )
    tiles_x, tiles_y = num_tiles(width, height)
    strips_y = _cdiv(tiles_y, G)
    mp_strip = max(
        _cdiv(int(settings.max_pairs // G * args.strip_budget_mult), 128)
        * 128, 1024)

    state, cam = _toy_scene(
        n=n_gauss, capacity=1 << 20, width=width, height=height,
        log_scale=-5.2,
    )
    rcam = cam.to_render_camera()
    mesh = Mesh(np.array(jax.devices()).reshape(G), ("gauss",))
    state = shard_gaussian_state(state, mesh)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("gauss"), P("gauss"), P(), P()),
        out_specs=P("gauss"),
        check_vma=False,
    )
    def probe(params, active, sh_degree, camera):
        # mirrors gsjax/parallel/shard.py::_render_strip up to binning
        means3d, scales, quats, opac, shs = activated_params(params)
        splats = preprocess(
            means3d, scales, quats, opac, shs, camera, sh_degree,
            active_mask=active,
            opacity_aware_radius=settings.opacity_aware_radius,
        )
        g = lax.axis_index("gauss")
        n_local = splats.depths.shape[0]
        visible = jnp.sum((splats.tiles_touched > 0).astype(jnp.int32))
        local_pairs_src = jnp.sum(splats.tiles_touched)
        if settings.splat_exchange == "a2a":
            k_rows = _a2a_rows_auto(n_local, G, settings.a2a_rows)
            alls, exch_dropped = _exchange_splats(splats, strips_y, G,
                                                  k_rows, "gauss")
            recv_rows = jnp.sum(alls.tiles_touched > 0)
            buf_rows = jnp.int32(G * k_rows)
        else:
            alls = jax.tree.map(
                lambda x: lax.all_gather(x, "gauss", axis=0, tiled=True),
                splats,
            )
            exch_dropped = jnp.int32(0)
            recv_rows = jnp.sum(alls.tiles_touched > 0)
            buf_rows = jnp.int32(alls.depths.shape[0])
        y0 = g * strips_y
        rmin_y = jnp.clip(alls.rect_min[:, 1] - y0, 0, strips_y)
        rmax_y = jnp.clip(alls.rect_max[:, 1] - y0, 0, strips_y)
        w = alls.rect_max[:, 0] - alls.rect_min[:, 0]
        h = rmax_y - rmin_y
        local_tiles = jnp.where(alls.tiles_touched > 0, w * h, 0)
        local = alls._replace(
            rect_min=jnp.stack([alls.rect_min[:, 0], rmin_y], axis=1),
            rect_max=jnp.stack([alls.rect_max[:, 0], rmax_y], axis=1),
            tiles_touched=local_tiles,
        )
        bins = build_tile_bins(
            local, tiles_x, strips_y, mp_strip,
            max_tiles_per_gauss=settings.max_tiles_per_gauss,
            expansion=settings.expansion,
        )
        strip_pairs = bins.tile_start[tiles_x * strips_y]
        return jnp.stack([
            visible, local_pairs_src, recv_rows, buf_rows,
            strip_pairs, bins.num_dropped, exch_dropped,
        ])[None].astype(jnp.int32)

    rows = np.asarray(jax.jit(probe)(
        state.params, state.active, state.active_sh_degree, rcam
    ))
    per_chip = [
        dict(zip(("visible_splats", "src_pairs", "recv_rows", "recv_buf_rows",
                  "strip_pairs", "bin_dropped", "exchange_dropped"),
                 map(int, r)))
        for r in rows
    ]
    pairs = [c["strip_pairs"] for c in per_chip]
    max_pairs_chip = max(pairs)
    total_pairs = sum(pairs)

    # exchange volume: 10 f32 + 4 i32 + 1 i32 = 60B per routed row
    bytes_per_row = 60
    send_rows = [c["recv_rows"] for c in per_chip]  # symmetric a2a
    max_exch_bytes = max(send_rows) * bytes_per_row

    report = {
        "operating_point": {
            "scene": "bench toy 1M gaussians, 1920x1080",
            "devices": G, "strips_y": strips_y,
            "max_pairs_total": mp_total, "max_pairs_per_strip": mp_strip,
            "exchange": settings.splat_exchange,
        },
        "per_chip": per_chip,
        "balance": {
            "total_strip_pairs": int(total_pairs),
            "max_over_mean_pairs": round(
                max_pairs_chip / (total_pairs / G), 3),
        },
    }

    if args.bin_ms_1chip and args.pack_kernel_ms_1chip:
        # projection: per-pair phases scale with the busiest chip's pair
        # share; preprocess with N/G; exchange priced at ICI bandwidth.
        # Single-chip reference pair count at the same operating point:
        ref_pairs = 3_330_000
        share = max_pairs_chip / ref_pairs
        proj = {}
        for phase, ms in (("bin", args.bin_ms_1chip),
                          ("pack+kernel", args.pack_kernel_ms_1chip)):
            proj[phase + "_ms"] = round(ms * share, 2)
        proj["pre_ms"] = round(args.pre_ms_1chip / G, 2)
        proj["exchange_ms"] = round(
            max_exch_bytes / (args.ici_gbps * 1e9) * 1e3, 2)
        proj["frame_ms"] = round(sum(proj.values()), 1)
        proj["fps"] = round(1e3 / proj["frame_ms"], 1)
        proj["assumptions"] = (
            f"per-pair phases scale with the busiest chip's share "
            f"({max_pairs_chip}/{ref_pairs} of the 1-chip operating "
            f"point); exchange at {args.ici_gbps} GB/s ICI; compositing "
            "kernel floor not re-amortized (conservative)"
        )
        report["projection"] = proj

    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=1)
    json.load(open(tmp))
    os.replace(tmp, args.out)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
