#!/usr/bin/env python
"""Generate the committed STRUCTURE-TEST LPIPS weights artifact.

This host has zero network egress, so the real VGG16 + richzhang linear
heads cannot be fetched (use scripts/fetch_lpips.py on a machine that
can). To still exercise the full-scale load path + forward pass end to
end (metrics.py -> gsjax.eval.lpips), this script writes a fixed-seed,
correctly-shaped npz to ``evidence/lpips_vgg_structure_test.npz``.

LPIPS numbers computed from it are NOT perceptual LPIPS — they are only
useful as a structural smoke signal (0 for identical images, > 0
otherwise, deterministic across runs). evidence/README.md states the gap.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "evidence", "lpips_vgg_structure_test.npz",
)

_VGG16 = [64, 64, "P", 128, 128, "P", 256, 256, 256, "P", 512, 512, 512,
          "P", 512, 512, 512]
_TAPS = (1, 3, 6, 9, 12)


def main():
    rng = np.random.default_rng(0)
    arrs = {}
    in_ch = 3
    ci = 0
    tap_ch = []
    for spec in _VGG16:
        if spec == "P":
            continue
        out_ch = spec
        # He-ish init keeps activations in a sane range through 13 convs
        std = np.sqrt(2.0 / (9 * in_ch))
        arrs[f"conv{ci}_w"] = (
            rng.standard_normal((3, 3, in_ch, out_ch)) * std
        ).astype(np.float16)
        arrs[f"conv{ci}_b"] = np.zeros(out_ch, np.float16)
        if ci in _TAPS:
            tap_ch.append(out_ch)
        in_ch = out_ch
        ci += 1
    for j, c in enumerate(tap_ch):
        # nonneg heads, as in the real checkpoint
        arrs[f"lin{j}"] = rng.uniform(0.0, 0.1, c).astype(np.float16)
    np.savez_compressed(OUT, **arrs)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.1f} MB)")

    # smoke: load through the real path and evaluate once
    os.environ["GSJAX_LPIPS_WEIGHTS"] = OUT
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gsjax.eval.lpips import lpips, load_weights

    params = load_weights()
    a = np.zeros((32, 32, 3), np.float32)
    b = np.full((32, 32, 3), 0.5, np.float32)
    d_same = float(lpips(a, a, params=params))
    d_diff = float(lpips(a, b, params=params))
    print(f"lpips(a, a) = {d_same:.6f}; lpips(a, b) = {d_diff:.6f}")
    assert d_same < 1e-6 and d_diff > 0


if __name__ == "__main__":
    main()
