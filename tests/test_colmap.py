"""COLMAP scene reading: text + binary parsers, eval split, scene norm.

The reference reads COLMAP through struct-level parsers
(scene/colmap_loader.py) and readColmapSceneInfo
(scene/dataset_readers.py:132-177); this synthesizes a tiny scene on disk
and checks the same semantics end-to-end including image loading.
"""

import os

import numpy as np
import pytest

from gsjax.data import colmap
from gsjax.data.dataset_readers import read_colmap_scene


def _write_scene(root, n_views=9, binary=False):
    from PIL import Image

    sparse = os.path.join(root, "sparse", "0")
    imgdir = os.path.join(root, "images")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(imgdir, exist_ok=True)
    rng = np.random.default_rng(0)

    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48, np.array([70.0, 70.0, 32.0, 24.0]))}
    images = {}
    for i in range(1, n_views + 1):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        t = rng.normal(size=3)
        images[i] = colmap.ColmapImage(i, q, t, 1, f"img_{i:03d}.png")
        arr = (rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(imgdir, f"img_{i:03d}.png"))

    pts = rng.normal(size=(40, 3))
    rgb = rng.integers(0, 255, (40, 3)).astype(np.uint8)

    if binary:
        colmap.write_cameras_binary(cams, os.path.join(sparse, "cameras.bin"))
        colmap.write_images_binary(images, os.path.join(sparse, "images.bin"))
        colmap.write_points3d_binary(pts, rgb, os.path.join(sparse, "points3D.bin"))
    else:
        with open(os.path.join(sparse, "cameras.txt"), "w") as f:
            f.write("# cameras\n1 PINHOLE 64 48 70.0 70.0 32.0 24.0\n")
        with open(os.path.join(sparse, "images.txt"), "w") as f:
            f.write("# images\n")
            for i, im in images.items():
                q, t = im.qvec, im.tvec
                f.write(
                    f"{i} {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} 1 {im.name}\n\n"
                )
        with open(os.path.join(sparse, "points3D.txt"), "w") as f:
            f.write("# points\n")
            for k, (p, c) in enumerate(zip(pts, rgb)):
                f.write(f"{k} {p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]} 0.5 1 2\n")
    return pts, rgb


@pytest.mark.parametrize("binary", [False, True], ids=["text", "binary"])
def test_read_colmap_scene(tmp_path, binary):
    root = str(tmp_path)
    writers = {"write_cameras_binary", "write_images_binary", "write_points3d_binary"}
    if binary and not writers <= set(dir(colmap)):
        pytest.skip("binary writers not available")
    pts, rgb = _write_scene(root, binary=binary)

    info = read_colmap_scene(root, eval_split=True)
    # every-8th held out (reference dataset_readers.py:148-153)
    assert len(info.test_cameras) == 2 and len(info.train_cameras) == 7
    names = [c.image_name for c in info.test_cameras]
    assert names == ["img_001", "img_009"]
    assert info.radius > 0
    # images decoded at native resolution
    cam = info.train_cameras[0]
    assert cam.image.shape == (48, 64, 3)
    assert 0.0 <= cam.image.min() and cam.image.max() <= 1.0
    # point cloud converted to ply and readable
    np.testing.assert_allclose(info.point_cloud.points, pts, atol=1e-4)
    # R is stored transposed (reference dataset_readers.py:82)
    R = info.train_cameras[0].R
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
