#!/bin/bash
# Round-4 trained-scene-at-scale quality evidence (VERDICT r3 missing #2/#3,
# next-round items 3/4/8).
#
# The r3 evidence scene collapsed to 7.3k gaussians (its smooth textures fit
# with a few wide splats — see evidence/quality/synth_garden/train_log.jsonl).
# This round's scene is the `garden1m` preset: 2.2M GT splats carrying
# multi-octave value-noise texture at the MipNeRF360 images_4 operating point
# (1296x840, the resolution Garden actually trains at — reference
# full_eval.py:41-46), so the trained model must KEEP ~GT-density small splats
# to fit the detail. Target: >=1M trained gaussians.
#
# Outputs, copied into evidence/quality/garden1m/:
#   results.json / per_view.json      7k + 30k PSNR/SSIM (+LPIPS if weights)
#   train_log.jsonl                   per-100-iter stats incl. drops/growths
#   render_bench_{native,1080p}.json  trained-scene fps at >=1M gaussians
#   chkpnt28000.npz                   (stays in output/) for the drop A/B
#
# Run from the repo root (TPU host):
#   nohup bash scripts/r4_evidence.sh > /tmp/r4_evidence.log 2>&1 &
set -euo pipefail

SCENE=data/garden1m
OUT=output/eval_r4
EV=evidence/quality/garden1m

if [ ! -d "$SCENE/sparse/0" ]; then
  echo "=== generating $SCENE (garden1m preset)"
  python scripts/make_synthetic_scene.py "$SCENE" --preset garden1m
fi

echo "=== train 30k (checkpoint at 28k for the residual-drop A/B)"
mkdir -p "$OUT"
python train.py -s "$SCENE" -m "$OUT/garden1m" --eval \
  --test_iterations 7000 30000 --save_iterations 7000 30000 \
  --checkpoint_iterations 28000 --quiet

echo "=== render + metrics at 7k/30k"
python render.py -m "$OUT/garden1m" --quiet
python metrics.py -m "$OUT/garden1m"

echo "=== trained-scene render bench"
python scripts/render_bench.py -m "$OUT/garden1m" \
  > "$OUT/garden1m/render_bench_native.json"
python scripts/render_bench.py -m "$OUT/garden1m" --at_1080p \
  > "$OUT/garden1m/render_bench_1080p.json"

echo "=== collecting evidence"
mkdir -p "$EV"
cp "$OUT/garden1m/results.json" "$EV/results.json"
cp "$OUT/garden1m/per_view.json" "$EV/per_view.json"
cp "$OUT/garden1m/train_log.jsonl" "$EV/train_log.jsonl"
cp "$OUT/garden1m/cfg_args" "$EV/cfg_args"
grep -v WARNING "$OUT/garden1m/render_bench_native.json" \
  > "$EV/render_bench_native.json" || true
grep -v WARNING "$OUT/garden1m/render_bench_1080p.json" \
  > "$EV/render_bench_1080p.json" || true
python - <<'EOF'
import json, subprocess, time
meta = {
    "cmd": "bash scripts/r4_evidence.sh",
    "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip(),
    "t": time.strftime("%Y-%m-%d %H:%M:%S"),
    "scene": "data/garden1m (make_synthetic_scene.py --preset garden1m: "
             "2.2M GT splats, HF noise texture, 1296x840, 250k sparse init)",
    "schedule": "30k iterations, eval snapshots at 7k and 30k, "
                "checkpoint at 28k for the drop A/B",
}
json.dump(meta, open("evidence/quality/garden1m/meta.json", "w"), indent=1)
EOF
echo "=== done; evidence in $EV"
