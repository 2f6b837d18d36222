#!/usr/bin/env python
"""Residual-drop A/B (VERDICT r3 item 4): quantify the PSNR cost of
steady-state pair drops by re-running the tail of a training run from the
same checkpoint with the normal vs an enlarged pair budget.

The r3 30k evidence run dropped 10-26k pairs/step at steady state with
every overflow-reaction ceiling pinned; the question is whether those
drops cost quality. Both arms resume chkpnt<iter>.npz and train to 30k
with identical seeds; arm B multiplies every probed pair budget via
GSJAX_PAIR_BUDGET_MULT. Renders + metrics then score both.

    python scripts/drop_ab.py -s data/garden1m -m output/eval_r4/garden1m \
        [--from_iter 28000] [--mult 2]

Writes evidence/quality/<scene>/drop_ab.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, env=None):
    print("+", " ".join(cmd), flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    subprocess.run(cmd, check=True, env=e, cwd=REPO)


def tail_metrics(model_dir, from_iter, log_name="train_log.jsonl"):
    """Mean dropped pairs over the A/B window."""
    drops, its = [], []
    path = os.path.join(model_dir, log_name)
    if not os.path.exists(path):
        return {}
    for line in open(path):
        rec = json.loads(line)
        if rec.get("iter", 0) >= from_iter:
            drops.append(rec.get("dropped_pairs", 0))
            its.append(rec.get("it_per_s"))
    if not drops:
        return {}
    return {
        "mean_dropped_pairs": sum(drops) / len(drops),
        "max_dropped_pairs": max(drops),
        "mean_it_per_s": sum(x for x in its if x) / max(
            1, sum(1 for x in its if x)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-s", "--source", required=True)
    ap.add_argument("-m", "--model", required=True,
                    help="trained model dir containing chkpnt<iter>.npz")
    ap.add_argument("--from_iter", type=int, default=28000)
    ap.add_argument("--to_iter", type=int, default=30000,
                    help="train both arms to this iteration (passed as "
                         "--iterations; shortens the A/B window when the "
                         "main run walled out early — both arms see the "
                         "same shifted LR-schedule end, so the budget "
                         "delta is still isolated)")
    ap.add_argument("--mult", type=float, default=2.0)
    ap.add_argument("--mult_baseline", type=float, default=None,
                    help="pair-budget multiplier for the BASELINE arm "
                         "(e.g. 0.55 FORCES steady-state drops when the "
                         "normally-probed budget never saturates — the "
                         "regime the drop-cost question is about)")
    args = ap.parse_args()

    ckpt = os.path.join(args.model, f"chkpnt{args.from_iter}.npz")
    assert os.path.exists(ckpt), f"missing {ckpt}"

    results = {"from_iter": args.from_iter, "to_iter": args.to_iter,
               "mult": args.mult, "mult_baseline": args.mult_baseline,
               "arms": {}}
    base_env = (
        {"GSJAX_PAIR_BUDGET_MULT": str(args.mult_baseline)}
        if args.mult_baseline else {}
    )
    for arm, env in (
        ("baseline", base_env),
        ("big_budget", {"GSJAX_PAIR_BUDGET_MULT": str(args.mult)}),
    ):
        out = args.model + f"_dropab_{arm}"
        shutil.rmtree(out, ignore_errors=True)
        run([
            sys.executable, "train.py", "-s", args.source, "-m", out,
            "--eval", "--start_checkpoint", ckpt,
            "--iterations", str(args.to_iter),
            "--test_iterations", str(args.to_iter),
            "--save_iterations", str(args.to_iter),
            "--quiet", "--disable_viewer",
        ], env=env)
        run([sys.executable, "render.py", "-m", out, "--skip_train",
             "--quiet"])
        run([sys.executable, "metrics.py", "-m", out])
        res = json.load(open(os.path.join(out, "results.json")))
        results["arms"][arm] = {
            "results": res,
            **tail_metrics(out, args.from_iter),
        }

    b = results["arms"]["baseline"]["results"].get(
        f"ours_{args.to_iter}", {})
    g = results["arms"]["big_budget"]["results"].get(
        f"ours_{args.to_iter}", {})
    if b and g:
        results["psnr_cost_of_drops"] = round(
            g.get("PSNR", 0) - b.get("PSNR", 0), 4
        )
    ev_dir = os.path.join(
        REPO, "evidence", "quality", os.path.basename(args.source)
    )
    os.makedirs(ev_dir, exist_ok=True)
    out_path = os.path.join(ev_dir, "drop_ab.json")
    json.dump(results, open(out_path, "w"), indent=1)
    print(json.dumps(results, indent=1))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
