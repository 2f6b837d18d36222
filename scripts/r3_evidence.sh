#!/bin/bash
# Round-3 trained-scene quality evidence (VERDICT r2 #2 / #4).
#
# Regenerates the Garden-class synthetic COLMAP scene, trains it on the
# full 30k reference schedule through full_eval.py (the reference's own
# QA loop: /root/reference/full_eval.py:39-75), renders + scores the 7k
# and 30k snapshots, benches trained-scene render fps at native res and
# 1080p, and copies every artifact into the tracked evidence/quality/.
#
# Run from the repo root (TPU host):
#   nohup bash scripts/r3_evidence.sh > /tmp/r3_evidence.log 2>&1 &
set -euo pipefail

SCENE=data/synth_garden
OUT=output/eval_r3
EV=evidence/quality/synth_garden

if [ ! -d "$SCENE/sparse/0" ]; then
  echo "=== generating $SCENE"
  python scripts/make_synthetic_scene.py "$SCENE"
fi

echo "=== full_eval (train 30k + render 7k/30k + metrics)"
python full_eval.py --scenes "$SCENE" --output_path "$OUT"

echo "=== trained-scene render bench"
python scripts/render_bench.py -m "$OUT/synth_garden" \
  > "$OUT/synth_garden/render_bench_native.json"
python scripts/render_bench.py -m "$OUT/synth_garden" --at_1080p \
  > "$OUT/synth_garden/render_bench_1080p.json"

echo "=== collecting evidence"
mkdir -p "$EV"
cp "$OUT/synth_garden/results.json" "$EV/results.json"
cp "$OUT/synth_garden/per_view.json" "$EV/per_view.json"
cp "$OUT/synth_garden/train_log.jsonl" "$EV/train_log.jsonl"
cp "$OUT/synth_garden/cfg_args" "$EV/cfg_args"
grep -v WARNING "$OUT/synth_garden/render_bench_native.json" \
  > "$EV/render_bench_native.json" || true
grep -v WARNING "$OUT/synth_garden/render_bench_1080p.json" \
  > "$EV/render_bench_1080p.json" || true
python - <<'EOF'
import json, subprocess, time
meta = {
    "cmd": "bash scripts/r3_evidence.sh",
    "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip(),
    "t": time.strftime("%Y-%m-%d %H:%M:%S"),
    "scene": "data/synth_garden (scripts/make_synthetic_scene.py defaults)",
    "schedule": "30k iterations, eval snapshots at 7k and 30k",
}
json.dump(meta, open("evidence/quality/synth_garden/meta.json", "w"), indent=1)
EOF
echo "=== done; evidence in $EV"
