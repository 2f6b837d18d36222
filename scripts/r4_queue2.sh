#!/bin/bash
# Second round-4 TPU queue (runs serially; ONE TPU client at a time):
#   1. per-phase forward split at the bench scene (roofline numerators)
#   2. residual-drop A/B: fresh 1k-iter base run with a checkpoint, then
#      two 1k-iter arms (normal vs 2x pair budget) + render + metrics
#   3. viewer frame-time bench on the >=1M-gaussian scaled model (uint8
#      path) — last: optional if the wall allows
#
#   nohup bash scripts/r4_queue2.sh > /tmp/r4_queue2.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
EV=evidence/quality/garden1m
mkdir -p "$EV" evidence/perf

echo "=== 1. per-phase forward split (roofline numerators) $(date)"
timeout 2400 python scripts/_r4_session.py --stages phases

echo "=== 2a. drop A/B base run: 1k iters with a checkpoint $(date)"
AB=output/eval_r4/ab_base
if [ ! -f "$AB/chkpnt1000.npz" ]; then
  rm -rf "$AB"
  timeout 2700 python train.py -s data/garden1m -m "$AB" --eval \
    --iterations 1000 --checkpoint_iterations 1000 \
    --test_iterations 1000 --save_iterations 1000 --quiet --disable_viewer
fi
ls "$AB" | head

echo "=== 2b. drop A/B arms 1000 -> 2000 $(date)"
timeout 5400 python scripts/drop_ab.py -s data/garden1m -m "$AB" \
  --from_iter 1000 --to_iter 2000 --mult 2

echo "=== 3. viewer frame-time bench, 1.14M-gaussian model, uint8 path $(date)"
timeout 2400 python scripts/viewer_bench.py -m output/eval_r4/garden1m_x10 \
  --frames 24 > "$EV/viewer_frametimes_1080p_1m.json" \
  && cat "$EV/viewer_frametimes_1080p_1m.json"

echo "=== r4_queue2 done at $(date)"
