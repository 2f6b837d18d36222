#!/bin/bash
# Round-4 trained-scene-at-scale evidence pipeline, restart-resilient
# edition (the first r4_evidence.sh launch died to a host restart that
# wiped data/, output/ and /tmp before any results were copied out).
#
# Differences from r4_evidence.sh:
#   * snapshots/checkpoints at 7k/15k/22k/28k/30k so a wall-out still
#     leaves a renderable >=1M-gaussian model
#   * training runs under `timeout $TRAIN_WALL` — the driver's bench.py
#     needs the TPU back before the round ends; render/metrics then use
#     the newest snapshot (render.py --iteration -1)
#   * train_log.jsonl is mirrored into evidence/ every 2 min by a
#     background cp loop, so partial evidence survives another restart
#
# Run from the repo root (TPU host):
#   nohup bash scripts/r4_run.sh > /tmp/r4_run.log 2>&1 &
set -uo pipefail

# record this pipeline's PID so follow-up queues (r4_post2.sh) can wait on
# it instead of contending for the single TPU (ADVICE r4)
echo $$ > /tmp/r4_run_pid.txt

SCENE=data/garden1m
OUT=output/eval_r4/garden1m
EV=evidence/quality/garden1m
TRAIN_WALL=${TRAIN_WALL:-5700}

mkdir -p "$EV"

if [ ! -d "$SCENE/sparse/0" ]; then
  echo "=== generating $SCENE (garden1m preset)"
  python scripts/make_synthetic_scene.py "$SCENE" --preset garden1m || exit 1
fi

echo "=== train 30k (wall cap ${TRAIN_WALL}s)"
mkdir -p "$OUT"
( while sleep 120; do
    cp -f "$OUT/train_log.jsonl" "$EV/train_log.jsonl" 2>/dev/null || true
  done ) &
MIRROR=$!
timeout "$TRAIN_WALL" python train.py -s "$SCENE" -m "$OUT" --eval \
  --test_iterations 7000 15000 22000 30000 \
  --save_iterations 7000 15000 22000 30000 \
  --checkpoint_iterations 15000 22000 28000 --quiet --disable_viewer
TRAIN_RC=$?
kill "$MIRROR" 2>/dev/null
cp -f "$OUT/train_log.jsonl" "$EV/train_log.jsonl" 2>/dev/null || true
cp -f "$OUT/cfg_args" "$EV/cfg_args" 2>/dev/null || true
echo "=== training rc=$TRAIN_RC (124 = wall cap hit; snapshots remain)"

echo "=== render + metrics at newest snapshot"
python render.py -m "$OUT" --quiet && python metrics.py -m "$OUT"
cp -f "$OUT/results.json" "$EV/results.json" 2>/dev/null || true
cp -f "$OUT/per_view.json" "$EV/per_view.json" 2>/dev/null || true

echo "=== trained-scene render bench"
python scripts/render_bench.py -m "$OUT" > "$EV/render_bench_native.json"
python scripts/render_bench.py -m "$OUT" --at_1080p \
  > "$EV/render_bench_1080p.json"

python - <<EOF
import json, subprocess, time
meta = {
    "cmd": "bash scripts/r4_run.sh (TRAIN_WALL=$TRAIN_WALL, rc=$TRAIN_RC)",
    "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip(),
    "t": time.strftime("%Y-%m-%d %H:%M:%S"),
    "scene": "data/garden1m (make_synthetic_scene.py --preset garden1m: "
             "2.2M GT splats, HF noise texture, 1296x840, 250k sparse "
             "init)",
    "schedule": "30k iterations under a ${TRAIN_WALL}s wall cap; "
                "snapshots 7k/15k/22k/30k; render/metrics on the newest "
                "snapshot",
}
json.dump(meta, open("$EV/meta.json", "w"), indent=1)
EOF
echo "=== r4_run done; evidence in $EV"
