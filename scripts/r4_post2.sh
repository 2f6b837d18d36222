#!/bin/bash
# Round-4 post-training TPU queue, corrected edition. r4_post.sh waited
# on `pgrep -f r4_evidence.sh` (the pipeline actually running is
# r4_run.sh) and assumed chkpnt28000 (a wall-capped run stops earlier) —
# this version waits on the pipeline's recorded PID and A/Bs from the
# NEWEST checkpoint with a bounded 1k-iteration window. Every step runs
# under `timeout` so the TPU is guaranteed back before the driver's
# round-end bench.
#
#   nohup bash scripts/r4_post2.sh > /tmp/r4_post2.log 2>&1 &
set -uo pipefail

OUT=output/eval_r4/garden1m
EV=evidence/quality/garden1m

PID=$(grep -o '[0-9]*' /tmp/r4_run_pid.txt 2>/dev/null | tail -1)
echo "=== waiting for r4_run.sh (pid ${PID:-none})"
while [ -n "${PID:-}" ] && kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "=== pipeline exited at $(date)"

CK_IT=$(ls "$OUT"/chkpnt*.npz 2>/dev/null \
        | sed 's/.*chkpnt//;s/\.npz$//' | sort -n | tail -1)
if [ -n "${CK_IT:-}" ]; then
  TO=$((CK_IT + 1000))
  echo "=== 1. residual-drop A/B from $CK_IT to $TO (VERDICT r3 item 4)"
  timeout 2700 python scripts/drop_ab.py -s data/garden1m -m "$OUT" \
    --from_iter "$CK_IT" --to_iter "$TO" --mult 2 \
    || echo "drop_ab rc=$? (continuing)"
else
  echo "!!! no chkpnt*.npz in $OUT — skipping drop_ab"
fi

echo "=== 2. viewer frame-time bench at 1080p (item 8)"
timeout 1200 python scripts/viewer_bench.py -m "$OUT" \
  --width 1920 --height 1080 --frames 30 \
  > "$EV/viewer_frametimes_1080p.json" \
  || echo "viewer bench rc=$? (continuing)"

echo "=== 3. sort/vpu/chunk microbenches (roofline denominators, item 5)"
timeout 1800 python scripts/_r4_session.py --stages sort,vpu,chunk \
  || echo "session stages rc=$? (continuing)"

echo "=== r4_post2 done at $(date)"
