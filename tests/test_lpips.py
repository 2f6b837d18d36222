"""LPIPS architecture tests with synthetic weights (the real VGG weights
are gated — no egress; gsjax/eval/lpips.py)."""

import numpy as np
import pytest


def synth_params(rng):
    import jax.numpy as jnp

    from gsjax.eval.lpips import _VGG16, _TAPS

    params = {}
    cin = 3
    ci = 0
    for spec in _VGG16:
        if spec == "P":
            continue
        params[f"conv{ci}_w"] = jnp.asarray(
            rng.normal(0, 0.05, (3, 3, cin, spec)).astype(np.float32)
        )
        params[f"conv{ci}_b"] = jnp.zeros(spec, jnp.float32)
        cin = spec
        ci += 1
    taps_channels = {1: 64, 3: 128, 6: 256, 9: 512, 12: 512}
    for j, t in enumerate(_TAPS):
        params[f"lin{j}"] = jnp.asarray(
            np.abs(rng.normal(0, 0.1, taps_channels[t])).astype(np.float32)
        )
    return params


def test_lpips_zero_for_identical_and_positive_otherwise():
    import jax.numpy as jnp

    from gsjax.eval.lpips import lpips

    rng = np.random.default_rng(0)
    params = synth_params(rng)
    a = jnp.asarray(rng.uniform(0, 1, (48, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (48, 64, 3)).astype(np.float32))
    assert float(lpips(a, a, params)) == pytest.approx(0.0, abs=1e-6)
    assert float(lpips(a, b, params)) > 0.0


def test_lpips_gated_without_weights(tmp_path, monkeypatch):
    from gsjax.eval import lpips as L

    monkeypatch.setenv("GSJAX_LPIPS_WEIGHTS", str(tmp_path / "missing.npz"))
    assert not L.available()
    with pytest.raises(FileNotFoundError):
        L.load_weights()


def test_convert_torch_state_layout(tmp_path, monkeypatch):
    """The torch-checkpoint converter produces the npz layout lpips() loads."""
    import numpy as np

    from gsjax.eval import lpips as L

    rng = np.random.default_rng(1)
    conv_layers = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    vgg = {}
    cin = 3
    for li, co in zip(conv_layers, chans):
        vgg[f"{li}.weight"] = rng.normal(size=(co, cin, 3, 3)).astype(np.float32)
        vgg[f"{li}.bias"] = np.zeros(co, np.float32)
        cin = co
    lin = {
        f"lin{j}.model.1.weight": rng.normal(size=(1, c, 1, 1)).astype(np.float32)
        for j, c in enumerate([64, 128, 256, 512, 512])
    }
    out = str(tmp_path / "w.npz")
    monkeypatch.setenv("GSJAX_LPIPS_WEIGHTS", out)
    L.convert_torch_state(vgg, lin, out)
    params = L.load_weights(out)
    import jax.numpy as jnp

    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    assert float(L.lpips(img, img * 0.5, params)) != 0.0
