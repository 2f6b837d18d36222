#!/bin/bash
# Round-5 TPU queue, phase 2 (after the kernel/precision/slot-layout
# changes landed): remeasure, retry the viewer, train garden_growth.
#
#   nohup bash scripts/r5_run2.sh > /tmp/r5_run2.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_run_pid.txt
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

DEADLINE=${DEADLINE:-$(date -d '21:30' +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }
say() { echo "=== [$(date +%H:%M:%S), $(left)s left] $*"; }

SCENE=data/garden_growth
OUT=output/eval_r5/garden_growth
EV=evidence/quality/garden_growth
mkdir -p "$EV" evidence/perf

say "1. remeasure: fwd,fwdbwd,bwdsplit on the split-DEFAULT kernels"
[ "$(left)" -gt 3600 ] && python scripts/_r5_session.py --stages fwd,fwdbwd,bwdsplit

say "2. viewer_bench on the 1.14M model (row-major slots unblock compact)"
if [ "$(left)" -gt 2700 ] && [ -d output/eval_r4/garden1m_x10 ]; then
  python scripts/viewer_bench.py -m output/eval_r4/garden1m_x10 \
    --frames 24 \
    --out evidence/quality/garden1m/viewer_frametimes_1080p_1m.json \
    || echo "viewer_bench failed (rc=$?)"
fi

say "3. train garden_growth (graceful wall budget)"
mkdir -p "$OUT"
( while sleep 120; do
    cp -f "$OUT/train_log.jsonl" "$EV/train_log.jsonl" 2>/dev/null || true
  done ) &
MIRROR=$!
TRAIN_WALL=$(( $(left) - 3600 ))
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
if [ "$(left)" -gt 1500 ] && [ -d "$OUT/point_cloud" ]; then
  python render.py -m "$OUT" --quiet && python metrics.py -m "$OUT"
  cp -f "$OUT/results.json" "$EV/results.json" 2>/dev/null || true
  cp -f "$OUT/per_view.json" "$EV/per_view.json" 2>/dev/null || true
  python scripts/render_bench.py -m "$OUT" \
    --out "$EV/render_bench_native.json"
  python scripts/render_bench.py -m "$OUT" --at_1080p \
    --out "$EV/render_bench_1080p.json"
fi

say "5. drop_ab on the growth tail (if it dropped)"
CK=$(ls "$OUT"/chkpnt*.npz 2>/dev/null \
     | sed 's/.*chkpnt//;s/\.npz$//' | sort -n | tail -1)
DROPPED=$(python - <<EOF
import json, os
n = 0
p = "$OUT/train_log.jsonl"
if os.path.exists(p):
    for line in open(p):
        r = json.loads(line)
        if r.get("iter", 0) >= int("${CK:-0}" or 0) - 2000 \
           and r.get("dropped_pairs", 0) > 0:
            n += 1
print(n)
EOF
)
if [ "${DROPPED:-0}" -gt 0 ] && [ -n "${CK:-}" ] && [ "$(left)" -gt 2400 ]; then
  PREV=$(ls "$OUT"/chkpnt*.npz | sed 's/.*chkpnt//;s/\.npz$//' \
         | sort -n | tail -2 | head -1)
  python scripts/drop_ab.py -s "$SCENE" -m "$OUT" \
    --from_iter "$PREV" --to_iter "$CK" || echo "drop_ab failed"
else
  say "tail drop records: ${DROPPED:-0} — drop_ab skipped"
fi

python - <<EOF
import json, subprocess, time
meta = {
    "cmd": "bash scripts/r5_run2.sh (train rc=$TRAIN_RC)",
    "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip(),
    "t": time.strftime("%Y-%m-%d %H:%M:%S"),
    "scene": "data/garden_growth (make_synthetic_scene.py --preset "
             "garden_growth: 2.2M GT splats, structured edge-rich texture "
             "+ resolvable noise, 1296x840, 40k sparse init — must GROW "
             "20-30x; VERDICT r4 missing #4)",
    "schedule": "30k iterations under a graceful --wall_budget; "
                "checkpoints every ~4k; render/metrics on newest snapshot",
}
json.dump(meta, open("$EV/meta.json", "w"), indent=1)
EOF

say "6. validate evidence"
python scripts/validate_evidence.py
say "r5_run2 done"
