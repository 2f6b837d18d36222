#!/bin/bash
# Round-5 TPU queue, phase 5: the 1M push — resume the growth
# demonstrator with a lower densify threshold (clone rate decays as the
# fit converges; 1e-4 asymptotes ~400-500k on this scene), then
# render/metrics/render-bench on the grown model, then the driver-bench
# prewarm.
#
#   nohup bash scripts/r5_run5.sh > /tmp/r5_run5.log 2>&1 &
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

say "1. resume the demonstrator at threshold 2e-5 (final 1M push) (to 16000)"
( while sleep 120; do
    cp -f "$OUT/train_log.jsonl" "$EV/train_log.jsonl" 2>/dev/null || true
  done ) &
MIRROR=$!
TRAIN_WALL=$(( $(left) - 4200 ))
CK=$(ls "$OUT"/chkpnt*.npz 2>/dev/null \
     | sed 's/.*chkpnt//;s/\.npz$//' | sort -n | tail -1)
TRAIN_RC=1
if [ -n "${CK:-}" ] && [ "$TRAIN_WALL" -gt 1200 ]; then
  python train.py -s "$SCENE" -m "$OUT" --eval \
    --start_checkpoint "$OUT/chkpnt$CK.npz" \
    --densify_grad_threshold 2e-5 --iterations 16000 \
    --test_iterations 15000 \
    --save_iterations 15000 16000 \
    --checkpoint_iterations 11000 13000 15000 \
    --wall_budget "$TRAIN_WALL" --quiet --disable_viewer
  TRAIN_RC=$?
fi
kill "$MIRROR" 2>/dev/null
cp -f "$OUT/train_log.jsonl" "$EV/train_log.jsonl" 2>/dev/null || true
cp -f "$OUT/cfg_args" "$EV/cfg_args" 2>/dev/null || true
say "training rc=$TRAIN_RC"

say "2. render + metrics + 1080p render bench on the grown model"
if [ "$(left)" -gt 2100 ] && [ -d "$OUT/point_cloud" ]; then
  python render.py -m "$OUT" --skip_train --quiet \
    && python metrics.py -m "$OUT" \
    && cp -f "$OUT/results.json" "$EV/results.json" 2>/dev/null
  cp -f "$OUT/per_view.json" "$EV/per_view.json" 2>/dev/null || true
  python scripts/render_bench.py -m "$OUT" --at_1080p \
    --out "$EV/render_bench_1080p.json"
fi

python - <<EOF
import json, subprocess, time
meta = {
    "cmd": "bash scripts/r5_run4-6.sh (resume chain 1e-4 -> 5e-5 -> 2e-5; rc=$TRAIN_RC)",
    "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip(),
    "t": time.strftime("%Y-%m-%d %H:%M:%S"),
    "scene": "data/garden_growth2",
    "note": "TUNED-FLAG growth demonstrator (reference-exposed "
            "--densify_grad_threshold: 1e-4 from init, then 5e-5 and 2e-5 resumed "
            "mid-schedule as the fit converged). Purpose: organic "
            "growth through >= 1M ACTIVE gaussians with live "
            "CapacityWarmer re-buckets, pair-budget overflow reactions "
            "and the full reset/prune machinery — the engineering half "
            "of VERDICT r4 missing #4; the reference-default dynamics "
            "are the garden_growth/garden_growth2 runs and the "
            "docs/PERF.md 'Densification dynamics' analysis.",
}
json.dump(meta, open("$EV/meta.json", "w"), indent=1)
EOF

say "3. driver-bench prewarm (compile cache)"
[ "$(left)" -gt 1500 ] && BENCH_WALL_BUDGET=$(( $(left) - 420 )) python bench.py || true

say "4. validate evidence"
python scripts/validate_evidence.py
say "r5_run6 done"
