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

# Evidence run: the reference's own orchestration (full_eval.py) over the
# Garden-class synthetic scene — 30k train + render@7k/30k + metrics
# (VERDICT round-1 item 2), then trained-scene fps.
M=output/eval_r2
echo "--- full_eval 30k $(date -u +%H:%M:%S)" >> $LOG
timeout 18000 python full_eval.py --scenes data/synth_garden \
  --output_path $M > /tmp/sg30k_train.log 2>&1
echo "--- full_eval exit $? $(date -u +%H:%M:%S)" >> $LOG
tail -8 /tmp/sg30k_train.log >> $LOG
run python scripts/render_bench.py -m $M/synth_garden
run python scripts/render_bench.py -m $M/synth_garden --at_1080p
echo "=== r2 TPU session done $(date -u) ===" >> $LOG
