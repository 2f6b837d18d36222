#!/bin/bash
# Round-4 post-training TPU queue: waits for the r4_evidence.sh pipeline
# to publish its results, then runs (serially, one TPU client at a time):
#   1. the residual-drop A/B from chkpnt28000 (VERDICT r3 item 4)
#   2. the interactive-viewer frame-time bench at >=1M gaussians (item 8)
#   3. the sort/vpu microbench stages (honest-roofline denominators, item 5)
#
#   nohup bash scripts/r4_post.sh > /tmp/r4_post.log 2>&1 &
set -uo pipefail

OUT=output/eval_r4/garden1m
EV=evidence/quality/garden1m

echo "=== waiting for $EV/results.json (training + eval pipeline)"
while [ ! -f "$EV/results.json" ]; do
  # bail out if the pipeline died (no train.py AND no results)
  if ! pgrep -f "r4_evidence.sh" > /dev/null; then
    echo "!!! r4_evidence.sh no longer running and no results — aborting"
    exit 1
  fi
  sleep 60
done
echo "=== evidence pipeline done"

echo "=== 1. residual-drop A/B"
python scripts/drop_ab.py -s data/garden1m -m "$OUT" --from_iter 28000 \
  --mult 2 || echo "drop_ab FAILED (continuing)"

echo "=== 2. viewer frame-time bench (1080p + native)"
python scripts/viewer_bench.py -m "$OUT" --width 1920 --height 1080 \
  --frames 40 > "$EV/viewer_frametimes_1080p.json" \
  || echo "viewer bench FAILED (continuing)"

echo "=== 3. sort/vpu microbenches (roofline denominators)"
python scripts/_r4_session.py --stages sort,vpu,chunk \
  || echo "session stages FAILED (continuing)"

echo "=== r4_post done"
