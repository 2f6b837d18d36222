#!/bin/bash
# One-shot TPU measurement pass for the round-2 perf work, to run (nohup'd)
# as soon as the worker recovers. Each stage appends to /tmp/r2_results.log;
# never kill this mid-run (client kills can wedge the remote worker).
cd /root/repo || exit 1
LOG=/tmp/r2_results.log
echo "=== r2 TPU session $(date -u) ===" >> $LOG

run() {
  echo "--- $* $(date -u +%H:%M:%S)" >> $LOG
  timeout 1800 "$@" >> $LOG 2>&1
  echo "--- exit $? $(date -u +%H:%M:%S)" >> $LOG
}

run python bench.py
run python bench.py --tier_frac 0.875
run python bench.py --tier_frac 0.875 --grad_dtype bfloat16
run python scripts/_r2_probe.py 128
echo "=== r2 bench phase done $(date -u) ===" >> $LOG

# Evidence run: full 30k schedule on the Garden-class synthetic scene,
# then render + metrics + trained-scene fps (VERDICT round-1 item 2).
M=output/synth_garden_30k
echo "--- 30k training $(date -u +%H:%M:%S)" >> $LOG
timeout 14400 python train.py -s data/synth_garden -m $M --eval \
  --iterations 30000 --test_iterations 7000 30000 \
  --save_iterations 7000 30000 --checkpoint_iterations 30000 \
  > /tmp/sg30k_train.log 2>&1
echo "--- train exit $? $(date -u +%H:%M:%S)" >> $LOG
tail -5 /tmp/sg30k_train.log >> $LOG
run python render.py -m $M --skip_train
run python metrics.py -m $M
run python scripts/render_bench.py -m $M
run python scripts/render_bench.py -m $M --at_1080p
echo "=== r2 TPU session done $(date -u) ===" >> $LOG
