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


def _client_message(cam, width, height, train=True, keep_alive=False,
                    scaling_modifier=1.0, shs_python=False,
                    rot_scale_python=False):
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
        "shs_python": shs_python,
        "rot_scale_python": rot_scale_python,
        "keep_alive": keep_alive,
        "scaling_modifier": scaling_modifier,
        "view_matrix": wv.flatten().tolist(),
        "view_projection_matrix": fp.flatten().tolist(),
    }


def _make_render_fn(gs):
    """Matches the signature of gsjax.train.step.make_render_fn's product
    (what the training loop hands the bridge)."""

    def render_fn(state, rcam, bg, scale_modifier=1.0, *,
                  shs_python=False, cov3d_python=False):
        return render(
            rcam, *gs, 3, jnp.asarray(bg), SETTINGS,
            scale_modifier=scale_modifier,
        )["render"]

    return render_fn


def test_viewer_bridge_serves_fake_sibr_client():
    rng = np.random.default_rng(0)
    cam = make_test_camera(width=W, height=H)
    gs = tuple(jnp.asarray(g) for g in make_test_gaussians(200, rng))

    render_fn = _make_render_fn(gs)

    bridge = ViewerBridge(port=0, source_path="/data/test_scene")
    port = bridge.listener.getsockname()[1]

    received = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=60)
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
    # round-half-up, matching the unified on-device/host quantization
    # (gsjax/train/step.py as_uint8 / network_gui fallback — ADVICE r4)
    expect = np.clip(
        np.asarray(direct) * 255.0 + 0.5, 0, 255
    ).astype(np.uint8)
    np.testing.assert_array_equal(received["img"], expect)


def test_viewer_scaling_modifier_applies_to_live_render():
    """The wire message's scaling_modifier must reach the render (reference
    train.py:57-60); a 0.3x-scaled render differs from the 1.0 render and
    matches a direct render at 0.3."""
    rng = np.random.default_rng(1)
    cam = make_test_camera(width=W, height=H)
    gs = tuple(jnp.asarray(g) for g in make_test_gaussians(200, rng))
    render_fn = _make_render_fn(gs)

    bridge = ViewerBridge(port=0, source_path="s")
    port = bridge.listener.getsockname()[1]
    received = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=60)
        msg = _client_message(cam, W, H, scaling_modifier=0.3,
                              shs_python=True, rot_scale_python=True)
        payload = json.dumps(msg).encode("utf-8")
        s.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        while len(img) < W * H * 3:
            img += s.recv(W * H * 3 - len(img))
        n = int.from_bytes(s.recv(4), "little")
        s.recv(n)
        received["img"] = np.frombuffer(img, np.uint8).reshape(H, W, 3)
        s.close()

    t = threading.Thread(target=client)
    t.start()
    for _ in range(200):
        bridge.poll(iteration=1, state=None, render_fn=render_fn)
        if not t.is_alive():
            break
        time.sleep(0.05)
    t.join(timeout=10)
    bridge.close()

    def as_bytes(img):
        # round-half-up (same convention as the bridge's fallback)
        return np.clip(
            np.asarray(img) * 255.0 + 0.5, 0, 255
        ).astype(np.uint8)

    scaled = as_bytes(render_fn(None, cam.to_render_camera(),
                                np.zeros(3, np.float32), 0.3))
    unscaled = as_bytes(render_fn(None, cam.to_render_camera(),
                                  np.zeros(3, np.float32)))
    np.testing.assert_array_equal(received["img"], scaled)
    assert np.abs(scaled.astype(int) - unscaled.astype(int)).max() > 5


def test_viewer_bridge_empty_resolution_is_noop_frame():
    bridge = ViewerBridge(port=0, source_path="x")
    port = bridge.listener.getsockname()[1]
    out = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=60)
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


def test_make_render_fn_toggles_and_modifier():
    """gsjax.train.step.make_render_fn honors scale_modifier and the
    shs/cov3d python-path toggles (the reference's live pipe mutation,
    train.py:57-60): toggled paths agree with the fused path, and a
    modified scale changes the image."""
    import jax.numpy as jnp

    from gsjax.models.gaussians import create_from_pcd
    from gsjax.train.step import TrainConfig, make_render_fn

    rng = np.random.default_rng(2)
    n = 100
    pts = rng.normal(size=(n, 3)) * 1.5 + np.array([0, 0, 7.0])
    cols = rng.uniform(size=(n, 3))
    state = create_from_pcd(pts, cols, spatial_lr_scale=1.0, capacity=128)
    cam = make_test_camera(width=W, height=H).to_render_camera()
    bg = jnp.zeros(3)

    fn = make_render_fn(TrainConfig(settings=SETTINGS))
    base = np.asarray(fn(state, cam, bg))
    shs = np.asarray(fn(state, cam, bg, shs_python=True))
    cov = np.asarray(fn(state, cam, bg, cov3d_python=True))
    both = np.asarray(fn(state, cam, bg, 1.0, shs_python=True,
                         cov3d_python=True))
    np.testing.assert_allclose(shs, base, atol=1e-5)
    np.testing.assert_allclose(cov, base, atol=1e-5)
    np.testing.assert_allclose(both, base, atol=1e-5)
    scaled = np.asarray(fn(state, cam, bg, 0.3))
    scaled_cov = np.asarray(fn(state, cam, bg, 0.3, cov3d_python=True))
    np.testing.assert_allclose(scaled_cov, scaled, atol=1e-5)
    assert np.abs(scaled - base).max() > 0.02


def test_lookat_matches_fixture_ring_camera():
    """gsjax.data.cameras.lookat_camera reproduces the dataset fixtures'
    orbit cameras exactly (same OpenGL->COLMAP path), so viewer poses
    land on training poses."""
    import sys

    from fixtures import camera_from_c2w, ring_c2w_opengl
    from gsjax.data.cameras import lookat_camera

    c2w = ring_c2w_opengl(7.0, 1.1, 0.4)
    ref = camera_from_c2w(c2w, 1.1, 96, 64, 0, "ref")
    eye = c2w[:3, 3]
    got = lookat_camera(eye, (0, 0, 0), (0, 0, 1), 1.1, 96, 64)
    np.testing.assert_allclose(got.world_view, ref.world_view, atol=1e-6)
    np.testing.assert_allclose(got.full_proj, ref.full_proj, atol=1e-5)


def test_local_viewer_serves_pages_and_frames():
    """The local web viewer (SIBR_gaussianViewer analogue, SURVEY.md §2.2
    N3): /, /info, /render round-trip over real HTTP; the JPEG frame
    matches a direct render of the same lookat camera; disallowed
    resolutions are rejected (each size is a compile)."""
    import io
    import urllib.request

    from PIL import Image

    from gsjax.models.gaussians import create_from_pcd
    from gsjax.data.cameras import lookat_camera
    from gsjax.viewer.local_viewer import LocalViewer

    rng = np.random.default_rng(5)
    n = 120
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 1.0, size=(n, 3)).astype(np.float32)
    state = create_from_pcd(pts, cols, spatial_lr_scale=1.0, capacity=128)

    viewer = LocalViewer(
        state, np.zeros(3, np.float32), port=0, extra_sizes=((64, 48),)
    )
    port = viewer.start()
    base = f"http://127.0.0.1:{port}"
    try:
        html = urllib.request.urlopen(f"{base}/", timeout=30).read()
        assert b"gsjax" in html
        info = json.loads(
            urllib.request.urlopen(f"{base}/info", timeout=30).read()
        )
        assert info["n_gaussians"] == n
        assert len(info["center"]) == 3 and info["extent"] > 0

        eye = np.asarray(info["center"]) + np.array(
            [0.0, -3.5 * info["extent"], 1.0]
        )
        c = info["center"]
        q = (f"ex={eye[0]}&ey={eye[1]}&ez={eye[2]}"
             f"&tx={c[0]}&ty={c[1]}&tz={c[2]}&w=64&h=48&scale=1.0")
        jpg = urllib.request.urlopen(f"{base}/render?{q}", timeout=120).read()
        img = np.asarray(Image.open(io.BytesIO(jpg)), np.float32) / 255.0
        assert img.shape == (48, 64, 3)
        assert img.max() > 0.05  # something rendered

        cam = lookat_camera(eye, c, (0, 0, 1), 1.1, 64, 48)
        direct = np.asarray(
            viewer._fn_for(64, 48)(
                state, cam.to_render_camera(),
                jnp.zeros(3), np.float32(1.0),
            )
        )
        # viewer fns quantize to uint8 on device (device->host transfer cut)
        assert direct.dtype == np.uint8
        assert np.abs(direct / 255.0 - img).mean() < 0.03  # JPEG loss

        # scaling_modifier changes the frame
        jpg2 = urllib.request.urlopen(
            f"{base}/render?{q.replace('scale=1.0', 'scale=0.3')}",
            timeout=120,
        ).read()
        assert jpg2 != jpg

        # unknown resolution is rejected, not compiled
        import urllib.error

        try:
            urllib.request.urlopen(f"{base}/render?w=123&h=77", timeout=30)
            raise AssertionError("expected 403")
        except urllib.error.HTTPError as e:
            assert e.code == 403
    finally:
        viewer.stop()
