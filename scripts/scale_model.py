#!/usr/bin/env python
"""Scale a trained model to >=N gaussians with its statistics preserved.

VERDICT r3 item 3 asks for rendering/viewer evidence at >=1M gaussians of
*trained* (high-footprint-variance) statistics, and allows "load a
scaled-up state" when a full 30k training run cannot reach that count
under the session wall cap. This produces that state honestly: every
clone keeps its parent's scaling (footprint histogram), rotation and SH;
positions are jittered inside the parent's own ellipsoid (local-frame
noise rotated by the parent quaternion) so spatial/tile-overlap structure
matches a denser reconstruction of the same surfaces; opacity is split
alpha-correctly (a' = 1-(1-a)^(1/K)) so K stacked clones composite to the
parent's alpha and the rendered images stay comparable.

The output is a normal model directory (point_cloud/iteration_<it>/
point_cloud.ply + cfg_args) consumable by render.py, render_bench.py and
the viewer. Purely host-side numpy — safe to run while the TPU is busy.

    python scripts/scale_model.py -m output/eval_r4/garden1m \
        --target 1100000 [--iteration -1] [--seed 0]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gsjax.data.ply import read_ply, write_ply


def quat_rotate(q, v):
    """Rotate vectors v (n,3) by unit quaternions q (n,4) [w,x,y,z]."""
    w, x, y, z = q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4]
    u = np.concatenate([x, y, z], axis=1)
    t = 2.0 * np.cross(u, v)
    return v + w * t + np.cross(u, t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--target", type=int, default=1_100_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jitter", type=float, default=0.35,
                    help="positional noise in units of the parent's own "
                         "per-axis stddev (exp(scaling))")
    args = ap.parse_args()

    its = sorted(
        int(re.search(r"iteration_(\d+)", d).group(1))
        for d in glob.glob(
            os.path.join(args.model_path, "point_cloud", "iteration_*"))
    )
    assert its, f"no point_cloud/iteration_* in {args.model_path}"
    it = its[-1] if args.iteration == -1 else args.iteration
    src = os.path.join(args.model_path, "point_cloud", f"iteration_{it}",
                       "point_cloud.ply")
    v = read_ply(src)["vertex"]
    n = len(v["x"])
    k = max(1, -(-args.target // n))  # ceil
    rng = np.random.default_rng(args.seed)

    rep = {name: np.tile(col, k) for name, col in v.items()}
    m = n * k

    # positions: local-frame ellipsoid noise rotated into world space
    std = np.exp(np.stack([rep[f"scale_{i}"] for i in range(3)], axis=1))
    q = np.stack([rep[f"rot_{i}"] for i in range(4)], axis=1)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    local = rng.standard_normal((m, 3)).astype(np.float32) * std * args.jitter
    world = quat_rotate(q.astype(np.float32), local)
    # the first copy of each parent keeps its exact position
    world[:n] = 0.0
    for i, name in enumerate("xyz"):
        rep[name] = (rep[name] + world[:, i]).astype(np.float32)

    # opacity: alpha-correct K-way split in linear space
    alpha = 1.0 / (1.0 + np.exp(-rep["opacity"]))
    alpha = np.clip(1.0 - (1.0 - alpha) ** (1.0 / k), 1e-6, 1 - 1e-6)
    rep["opacity"] = np.log(alpha / (1.0 - alpha)).astype(np.float32)

    out_dir = args.model_path.rstrip("/") + f"_x{k}"
    pc_dir = os.path.join(out_dir, "point_cloud", f"iteration_{it}")
    os.makedirs(pc_dir, exist_ok=True)
    write_ply(os.path.join(pc_dir, "point_cloud.ply"), rep)
    for aux in ("cfg_args", "cameras.json"):
        p = os.path.join(args.model_path, aux)
        if os.path.exists(p):
            shutil.copy(p, os.path.join(out_dir, aux))
    meta = {"src": src, "n_src": n, "k": k, "n_out": m,
            "jitter": args.jitter, "seed": args.seed,
            "opacity_split": "1-(1-a)^(1/K)"}
    json.dump(meta, open(os.path.join(out_dir, "scale_meta.json"), "w"),
              indent=1)
    print(json.dumps(meta))
    print("wrote", out_dir)


if __name__ == "__main__":
    main()
