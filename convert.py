#!/usr/bin/env python
"""Dataset preparation: COLMAP SfM + undistortion + optional resizes —
CLI-compatible with the reference ``convert.py`` (reference: convert.py:31-124).

Requires the external ``colmap`` (and, with --resize, ImageMagick
``magick``/``mogrify``) binaries on PATH; exits with a clear message when
they are missing.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd: str):
    code = os.system(cmd)
    if code != 0:
        print(f"command failed with code {code}: {cmd}")
        sys.exit(code)


def main(argv=None):
    parser = argparse.ArgumentParser("Colmap converter")
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--source_path", "-s", required=True, type=str)
    parser.add_argument("--camera", default="OPENCV", type=str)
    parser.add_argument("--colmap_executable", default="", type=str)
    parser.add_argument("--resize", action="store_true")
    parser.add_argument("--magick_executable", default="", type=str)
    args = parser.parse_args(argv)

    colmap = (
        f'"{args.colmap_executable}"' if args.colmap_executable else "colmap"
    )
    magick = (
        f'"{args.magick_executable}"' if args.magick_executable else "magick"
    )
    use_gpu = 0 if args.no_gpu else 1

    if not args.colmap_executable and shutil.which("colmap") is None:
        print(
            "colmap binary not found on PATH; install COLMAP or pass "
            "--colmap_executable (reference README.md:275-285)"
        )
        sys.exit(1)

    src = args.source_path
    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        # Feature extraction (reference convert.py:35-44)
        run(
            f"{colmap} feature_extractor "
            f"--database_path {src}/distorted/database.db "
            f"--image_path {src}/input "
            f"--ImageReader.single_camera 1 "
            f"--ImageReader.camera_model {args.camera} "
            f"--SiftExtraction.use_gpu {use_gpu}"
        )
        # Feature matching (reference convert.py:47-53)
        run(
            f"{colmap} exhaustive_matcher "
            f"--database_path {src}/distorted/database.db "
            f"--SiftMatching.use_gpu {use_gpu}"
        )
        # Bundle adjustment (reference convert.py:58-66)
        run(
            f"{colmap} mapper "
            f"--database_path {src}/distorted/database.db "
            f"--image_path {src}/input "
            f"--output_path {src}/distorted/sparse "
            f"--Mapper.ba_global_function_tolerance=0.000001"
        )

    # Undistort into PINHOLE images (reference convert.py:70-78)
    run(
        f"{colmap} image_undistorter "
        f"--image_path {src}/input "
        f"--input_path {src}/distorted/sparse/0 "
        f"--output_path {src} "
        f"--output_type COLMAP"
    )

    # move sparse/* -> sparse/0/ (reference convert.py:80-88)
    files = os.listdir(os.path.join(src, "sparse"))
    os.makedirs(os.path.join(src, "sparse", "0"), exist_ok=True)
    for f in files:
        if f == "0":
            continue
        shutil.move(
            os.path.join(src, "sparse", f), os.path.join(src, "sparse", "0", f)
        )

    if args.resize:
        # 50% / 25% / 12.5% copies (reference convert.py:90-122)
        if not args.magick_executable and shutil.which("magick") is None:
            print("magick binary not found on PATH; skipping --resize")
            sys.exit(1)
        print("Copying and resizing...")
        for name, pct in (("images_2", 50), ("images_4", 25), ("images_8", 12.5)):
            dst = os.path.join(src, name)
            os.makedirs(dst, exist_ok=True)
            for f in os.listdir(os.path.join(src, "images")):
                shutil.copy2(os.path.join(src, "images", f), dst)
                run(f"{magick} mogrify -resize {pct}% {os.path.join(dst, f)}")

    print("Done.")


if __name__ == "__main__":
    main()
