#!/bin/bash
# Round-5 TPU queue, phase 4 (after the reference-default garden_growth2
# run): the AT-SCALE growth demonstrator + final kernel remeasure +
# driver-bench prewarm.
#
# The reference-default threshold (2e-4) reaches a churn equilibrium on
# the synthetic scenes (docs/PERF.md "Densification dynamics") — the
# demonstrator arm uses the reference's own user-settable
# --densify_grad_threshold flag at 1e-4 to push clone/split past the
# prune rate, driving the model through >= 1M ACTIVE gaussians with live
# CapacityWarmer re-buckets and budget/overflow reactions (VERDICT r4
# missing #4's engineering half; the scene-statistics half is the
# documented v1/v2 trajectory study). Labeled a tuned-flag run in the
# evidence.
#
#   nohup bash scripts/r5_run4.sh > /tmp/r5_run4.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_run_pid.txt
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

DEADLINE=${DEADLINE:-$(date -d '21:15' +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }
say() { echo "=== [$(date +%H:%M:%S), $(left)s left] $*"; }

SCENE=data/garden_growth2
OUT=output/eval_r5/growth_1m
EV=evidence/quality/growth_1m
mkdir -p "$EV"

say "0. on-chip xcheck (packed-grads path numerics)"
python scripts/_r5_xcheck.py > /tmp/r5_xcheck4.log 2>&1 \
  && say "xcheck PASS" || say "xcheck FAIL (see /tmp/r5_xcheck4.log)"

say "1. final kernel remeasure (packed reduction + gather split)"
[ "$(left)" -gt 9000 ] && python scripts/_r5_session.py --stages fwdbwd,bwdsplit

say "2. at-scale growth demonstrator (threshold 1e-4, wall-budgeted)"
mkdir -p "$OUT"
( while sleep 120; do
    cp -f "$OUT/train_log.jsonl" "$EV/train_log.jsonl" 2>/dev/null || true
  done ) &
MIRROR=$!
TRAIN_WALL=$(( $(left) - 3300 ))
TRAIN_RC=1
if [ "$TRAIN_WALL" -gt 1800 ] && [ -d "$SCENE/sparse/0" ]; then
  RESUME=""
  CK=$(ls "$OUT"/chkpnt*.npz 2>/dev/null \
       | sed 's/.*chkpnt//;s/\.npz$//' | sort -n | tail -1)
  [ -n "${CK:-}" ] && RESUME="--start_checkpoint $OUT/chkpnt$CK.npz"
  python train.py -s "$SCENE" -m "$OUT" --eval $RESUME \
    --densify_grad_threshold 1e-4 \
    --test_iterations 7000 15000 \
    --save_iterations 5000 7000 10000 15000 \
    --checkpoint_iterations 5000 8000 11000 14000 \
    --wall_budget "$TRAIN_WALL" --quiet --disable_viewer
  TRAIN_RC=$?
fi
kill "$MIRROR" 2>/dev/null
cp -f "$OUT/train_log.jsonl" "$EV/train_log.jsonl" 2>/dev/null || true
cp -f "$OUT/cfg_args" "$EV/cfg_args" 2>/dev/null || true
say "training rc=$TRAIN_RC"

say "3. render bench on the grown model"
if [ "$(left)" -gt 1800 ] && [ -d "$OUT/point_cloud" ]; then
  python render.py -m "$OUT" --skip_train --quiet \
    && python metrics.py -m "$OUT" \
    && cp -f "$OUT/results.json" "$EV/results.json"
  python scripts/render_bench.py -m "$OUT" --at_1080p \
    --out "$EV/render_bench_1080p.json"
fi

python - <<EOF
import json, subprocess, time
meta = {
    "cmd": "bash scripts/r5_run4.sh (train rc=$TRAIN_RC)",
    "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip(),
    "t": time.strftime("%Y-%m-%d %H:%M:%S"),
    "scene": "data/garden_growth2",
    "note": "TUNED-FLAG growth demonstrator: --densify_grad_threshold "
            "1e-4 (reference-exposed CLI flag; default 2e-4 reaches a "
            "churn equilibrium on this scene — docs/PERF.md "
            "'Densification dynamics'). Purpose: exercise organic "
            "growth through >= 1M active gaussians with CapacityWarmer "
            "re-buckets and budget/overflow reactions live.",
}
json.dump(meta, open("$EV/meta.json", "w"), indent=1)
EOF

say "4. driver-bench prewarm (compile cache) if time remains"
[ "$(left)" -gt 1500 ] && BENCH_WALL_BUDGET=$(( $(left) - 300 )) python bench.py || true

say "5. validate evidence"
python scripts/validate_evidence.py
say "r5_run4 done"
