#!/bin/bash
# Round-5 TPU queue, phase 3: densify-dynamics diagnostic on the v1
# growth run, then the corrected garden_growth2 scene + training.
#
#   nohup bash scripts/r5_run3.sh > /tmp/r5_run3.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_run_pid.txt
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

DEADLINE=${DEADLINE:-$(date -d '21:30' +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }
say() { echo "=== [$(date +%H:%M:%S), $(left)s left] $*"; }

V1=output/eval_r5/garden_growth
SCENE=data/garden_growth2
OUT=output/eval_r5/garden_growth2
EV=evidence/quality/garden_growth2
mkdir -p "$EV"

say "1. diagnostic: resume v1 from chkpnt7000 for 700 iters with densify logging"
if [ "$(left)" -gt 12000 ] && [ -f "$V1/chkpnt7000.npz" ]; then
  rm -rf "${V1}_diag"; mkdir -p "${V1}_diag"
  python train.py -s data/garden_growth -m "${V1}_diag" --eval \
    --start_checkpoint "$V1/chkpnt7000.npz" --iterations 7700 \
    --test_iterations 99999 --save_iterations 99999 \
    --quiet --disable_viewer --wall_budget 900
  cp -f "${V1}_diag/train_log.jsonl" \
    evidence/quality/garden_growth/densify_diag.jsonl 2>/dev/null || true
fi

say "2. garden_growth2 scene"
if [ ! -d "$SCENE/sparse/0" ] && [ "$(left)" -gt 10800 ]; then
  python scripts/make_synthetic_scene.py "$SCENE" --preset garden_growth2 \
    || exit 1
fi

say "3. train garden_growth2 (graceful wall budget)"
mkdir -p "$OUT"
( while sleep 120; do
    cp -f "$OUT/train_log.jsonl" "$EV/train_log.jsonl" 2>/dev/null || true
  done ) &
MIRROR=$!
TRAIN_WALL=$(( $(left) - 2700 ))
TRAIN_RC=1
if [ "$TRAIN_WALL" -gt 1800 ] && [ -d "$SCENE/sparse/0" ]; then
  RESUME=""
  CK=$(ls "$OUT"/chkpnt*.npz 2>/dev/null \
       | sed 's/.*chkpnt//;s/\.npz$//' | sort -n | tail -1)
  [ -n "${CK:-}" ] && RESUME="--start_checkpoint $OUT/chkpnt$CK.npz"
  python train.py -s "$SCENE" -m "$OUT" --eval $RESUME \
    --test_iterations 7000 15000 30000 \
    --save_iterations 7000 15000 22000 30000 \
    --checkpoint_iterations 7000 12000 16000 20000 24000 28000 \
    --wall_budget "$TRAIN_WALL" --quiet --disable_viewer
  TRAIN_RC=$?
fi
kill "$MIRROR" 2>/dev/null
cp -f "$OUT/train_log.jsonl" "$EV/train_log.jsonl" 2>/dev/null || true
cp -f "$OUT/cfg_args" "$EV/cfg_args" 2>/dev/null || true
say "training rc=$TRAIN_RC"

say "4. render + metrics + render bench at newest snapshot"
if [ "$(left)" -gt 1200 ] && [ -d "$OUT/point_cloud" ]; then
  python render.py -m "$OUT" --quiet && python metrics.py -m "$OUT"
  cp -f "$OUT/results.json" "$EV/results.json" 2>/dev/null || true
  cp -f "$OUT/per_view.json" "$EV/per_view.json" 2>/dev/null || true
  python scripts/render_bench.py -m "$OUT" \
    --out "$EV/render_bench_native.json"
  python scripts/render_bench.py -m "$OUT" --at_1080p \
    --out "$EV/render_bench_1080p.json"
fi

python - <<EOF
import json, subprocess, time
meta = {
    "cmd": "bash scripts/r5_run3.sh (train rc=$TRAIN_RC)",
    "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip(),
    "t": time.strftime("%Y-%m-%d %H:%M:%S"),
    "scene": "data/garden_growth2 (make_synthetic_scene.py --preset "
             "garden_growth2: dome rig + doubled fine grain after the v1 "
             "post-reset churn diagnosis — see the preset comment)",
    "schedule": "30k iterations under a graceful --wall_budget; "
                "checkpoints every ~4k",
}
json.dump(meta, open("$EV/meta.json", "w"), indent=1)
EOF

say "5. validate evidence"
python scripts/validate_evidence.py
say "r5_run3 done"
