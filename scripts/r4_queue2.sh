#!/bin/bash
# Second round-4 TPU queue (runs serially; ONE TPU client at a time):
#   1. per-phase forward split at the bench scene (roofline numerators)
#   2. viewer frame-time bench on the >=1M-gaussian scaled model (uint8 path)
#   3. residual-drop A/B: fresh 1k-iter base run with a checkpoint, then
#      two 1k-iter arms (normal vs 2x pair budget) + render + metrics
#
#   nohup bash scripts/r4_queue2.sh > /tmp/r4_queue2.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

EV=evidence/quality/garden1m
mkdir -p "$EV" evidence/perf

echo "=== 1. per-phase forward split (roofline numerators)"
timeout 1800 python scripts/_r4_session.py --stages phases

echo "=== 2. viewer frame-time bench, 1.14M-gaussian model, uint8 path"
timeout 1800 python scripts/viewer_bench.py -m output/eval_r4/garden1m_x10 \
  --frames 40 > "$EV/viewer_frametimes_1080p_1m.json" \
  && cat "$EV/viewer_frametimes_1080p_1m.json"

echo "=== 3a. drop A/B base run: 1k iters with a checkpoint"
AB=output/eval_r4/ab_base
if [ ! -f "$AB/chkpnt1000.npz" ]; then
  rm -rf "$AB"
  timeout 2700 python train.py -s data/garden1m -m "$AB" --eval \
    --iterations 1000 --checkpoint_iterations 1000 \
    --test_iterations 1000 --save_iterations 1000 --quiet --disable_viewer
fi
ls -la "$AB" | head

echo "=== 3b. drop A/B arms 1000 -> 2000"
timeout 5400 python scripts/drop_ab.py -s data/garden1m -m "$AB" \
  --from_iter 1000 --to_iter 2000 --mult 2

echo "=== r4_queue2 done at $(date)"
