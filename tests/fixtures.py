"""Synthetic scene fixtures: a tiny Blender-format dataset on disk whose GT
images come from the gsjax oracle renderer on a known Gaussian set."""

import json
import os

import numpy as np
import jax.numpy as jnp

from gsjax.data.cameras import Camera
from gsjax.data.ply import write_point_cloud_ply
from gsjax.ops.rasterize import render_naive
from gsjax.utils.sh import rgb_to_sh


def ring_c2w_opengl(radius, azimuth, elevation=0.35):
    """Camera-to-world (OpenGL: Y up, Z back) on a ring looking at origin."""
    p = np.array(
        [
            radius * np.cos(azimuth) * np.cos(elevation),
            radius * np.sin(azimuth) * np.cos(elevation),
            radius * np.sin(elevation),
        ]
    )
    fwd = -p / np.linalg.norm(p)  # toward origin
    z = -fwd  # OpenGL camera looks along -z
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, p
    return c2w


def gt_gaussians(n=48, seed=7):
    """A cloud of opaque colored blobs near the origin (post-activation)."""
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(-1.6, 0.3, (n, 3))).astype(np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.6, 0.95, n).astype(np.float32)
    colors = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = np.asarray(rgb_to_sh(colors))
    return means, scales, quats, opac, shs, colors


def camera_from_c2w(c2w_gl, fov_x, width, height, uid, name):
    c2w = c2w_gl.copy()
    c2w[:3, 1:3] *= -1  # OpenGL -> COLMAP
    w2c = np.linalg.inv(c2w)
    fov_y = 2 * np.arctan(np.tan(fov_x / 2) * height / width)
    return Camera(
        uid=uid, image_name=name, R=w2c[:3, :3].T, T=w2c[:3, 3],
        fov_x=fov_x, fov_y=fov_y, width=width, height=height,
    )


def make_blender_scene(
    path, n_train=12, n_test=3, width=64, height=64, fov_x=0.9,
    white_bg=False, size_fn=None,
):
    """Write a complete Blender-format scene; returns the GT gaussians.

    ``size_fn(i) -> (width, height)`` overrides the per-view image size
    (for mixed-resolution scenes, like heterogeneous COLMAP captures)."""
    from PIL import Image

    gt = gt_gaussians()
    means, scales, quats, opac, shs, colors = gt
    bg = np.full(3, 1.0 if white_bg else 0.0, np.float32)

    def write_split(split, count, offset):
        frames = []
        os.makedirs(os.path.join(path, split), exist_ok=True)
        for i in range(count):
            w, h = size_fn(i) if size_fn is not None else (width, height)
            az = 2 * np.pi * (i + offset) / (n_train + n_test)
            c2w = ring_c2w_opengl(4.0, az)
            cam = camera_from_c2w(c2w, fov_x, w, h, i, f"{split}_{i}")
            out = render_naive(
                cam.to_render_camera(),
                jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
                jnp.asarray(opac), jnp.asarray(shs), 3, jnp.asarray(bg),
            )
            img = np.clip(np.asarray(out["render"]), 0, 1)
            fname = f"./{split}/r_{i}"
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(path, f"{fname[2:]}.png")
            )
            frames.append(
                {"file_path": fname, "transform_matrix": c2w.tolist()}
            )
        with open(os.path.join(path, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fov_x, "frames": frames}, f)

    write_split("train", n_train, 0)
    write_split("test", n_test, n_train)
    # init point cloud at the GT means (converges fast)
    write_point_cloud_ply(
        os.path.join(path, "points3d.ply"), means, colors
    )
    return gt
