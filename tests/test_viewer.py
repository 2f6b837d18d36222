"""Viewer bridge protocol test with a scripted fake SIBR client.

Exercises the full TCP wire protocol (reference:
gaussian_renderer/network_gui.py:24-86) end-to-end: 4-byte LE
length-prefixed JSON request in, raw HWC uint8 RGB + length-prefixed
source path out — the test fixture the reference never had (SURVEY.md §4).
"""

import json
import socket
import threading
import time

import numpy as np
import jax.numpy as jnp

from conftest import make_test_camera, make_test_gaussians
from gsjax.ops.rasterize import RasterizeSettings, render
from gsjax.viewer.network_gui import ViewerBridge

W = H = 64
SETTINGS = RasterizeSettings(max_pairs=1 << 14, max_splats_per_tile=256)


def _client_message(cam, width, height, train=True, keep_alive=False):
    """Build the wire message a SIBR remote viewer would send for ``cam``,
    by inverting the bridge's convention transform."""
    rcam = cam.to_render_camera()
    wv = np.asarray(rcam.world_view).T.copy()  # column-vector -> row-vector
    wv[:, 1] *= -1
    wv[:, 2] *= -1
    fp = np.asarray(rcam.full_proj).T.copy()
    fp[:, 1] *= -1
    return {
        "resolution_x": width,
        "resolution_y": height,
        "train": train,
        "fov_y": cam.fov_y,
        "fov_x": cam.fov_x,
        "z_near": 0.01,
        "z_far": 100.0,
        "shs_python": False,
        "rot_scale_python": False,
        "keep_alive": keep_alive,
        "scaling_modifier": 1.0,
        "view_matrix": wv.flatten().tolist(),
        "view_projection_matrix": fp.flatten().tolist(),
    }


def test_viewer_bridge_serves_fake_sibr_client():
    rng = np.random.default_rng(0)
    cam = make_test_camera(width=W, height=H)
    gs = tuple(jnp.asarray(g) for g in make_test_gaussians(200, rng))

    def render_fn(state, rcam, bg):
        return render(rcam, *gs, 3, jnp.asarray(bg), SETTINGS)["render"]

    bridge = ViewerBridge(port=0, source_path="/data/test_scene")
    port = bridge.listener.getsockname()[1]

    received = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        payload = json.dumps(_client_message(cam, W, H)).encode("utf-8")
        s.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        while len(img) < W * H * 3:
            img += s.recv(W * H * 3 - len(img))
        n = int.from_bytes(s.recv(4), "little")
        path = s.recv(n).decode("ascii")
        received["img"] = np.frombuffer(img, np.uint8).reshape(H, W, 3)
        received["path"] = path
        s.close()

    t = threading.Thread(target=client)
    t.start()
    # the training loop polls once per iteration; loop until connected+served
    for _ in range(200):
        bridge.poll(iteration=1, state=None, render_fn=render_fn)
        if not t.is_alive():
            break
        time.sleep(0.05)
    t.join(timeout=10)
    bridge.close()

    assert received["path"] == "/data/test_scene"
    direct = render_fn(None, cam.to_render_camera(), np.zeros(3, np.float32))
    expect = (np.clip(np.asarray(direct), 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(received["img"], expect)


def test_viewer_bridge_empty_resolution_is_noop_frame():
    bridge = ViewerBridge(port=0, source_path="x")
    port = bridge.listener.getsockname()[1]
    out = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        msg = _client_message(make_test_camera(), 0, 0)
        payload = json.dumps(msg).encode("utf-8")
        s.sendall(len(payload).to_bytes(4, "little") + payload)
        n = int.from_bytes(s.recv(4), "little")  # no image bytes expected
        out["path"] = s.recv(n).decode("ascii")
        s.close()

    t = threading.Thread(target=client)
    t.start()
    for _ in range(200):
        bridge.poll(iteration=1, state=None, render_fn=None)
        if not t.is_alive():
            break
        time.sleep(0.05)
    t.join(timeout=10)
    bridge.close()
    assert out["path"] == "x"
