"""LPIPS perceptual metric in pure JAX.

Re-implements the reference's vendored ``lpipsPyTorch`` (reference:
lpipsPyTorch/modules/lpips.py:8-36, networks.py:66-96): a frozen VGG16
feature extractor, unit-normalized activations at the 5 ReLU stages, fixed
1x1 linear heads, and spatial averaging.

The reference downloads backbone + head weights from torch.hub at runtime
(lpipsPyTorch/modules/utils.py:11-30). This environment has no network
egress and no torchvision, so weights are **gated**: they load from an
``.npz`` found via (in order)

1. the ``weights`` argument,
2. ``$GSJAX_LPIPS_WEIGHTS``,
3. ``~/.cache/gsjax/lpips_vgg.npz``

and :func:`lpips` raises a clear error when absent. The npz layout is
``conv{i}_w`` (HWIO) / ``conv{i}_b`` for the 13 VGG16 convs and ``lin{j}``
(C_j,) for the 5 heads; :func:`convert_torch_state` builds it from the
upstream torch state dicts when they are available locally.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import lax

# VGG16 conv channel plan; features are tapped after the ReLU preceding
# each pool (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
_VGG16 = [64, 64, "P", 128, 128, "P", 256, 256, 256, "P", 512, 512, 512, "P",
          512, 512, 512]
_TAPS = (1, 3, 6, 9, 12)  # conv indices (0-based) whose relu output is tapped

# z-score constants (reference lpipsPyTorch networks.py BaseNet buffers).
# NOTE: the reference applies these straight to the [0, 1] tensors that
# metrics.py:31-32 builds with tf.to_tensor — it never rescales to
# [-1, 1] — so matching its published numbers requires the same.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def default_weight_path() -> str:
    return os.environ.get(
        "GSJAX_LPIPS_WEIGHTS",
        os.path.expanduser("~/.cache/gsjax/lpips_vgg.npz"),
    )


def load_weights(path: Optional[str] = None) -> dict:
    path = path or default_weight_path()
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"LPIPS weights not found at {path}. This environment cannot "
            "download them (no egress); place the converted VGG16+linear "
            "npz there, set $GSJAX_LPIPS_WEIGHTS, or use "
            "gsjax.eval.lpips.convert_torch_state() on the upstream torch "
            "checkpoints."
        )
    with np.load(path) as z:
        # cast on load: the committed structure-test artifact stores f16
        # to halve its git footprint; compute always runs f32
        return {k: jnp.asarray(z[k], dtype=jnp.float32) for k in z.files}


def available(path: Optional[str] = None) -> bool:
    return os.path.exists(path or default_weight_path())


def _vgg_features(x, params):
    """x: (N, H, W, 3) in [-1, 1]. Returns the 5 tapped feature maps."""
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats = []
    ci = 0
    for spec in _VGG16:
        if spec == "P":
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        w = params[f"conv{ci}_w"]
        b = params[f"conv{ci}_b"]
        x = lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        x = jnp.maximum(x, 0.0)
        if ci in _TAPS:
            feats.append(x)
        ci += 1
    return feats


def _unit_normalize(x, eps=1e-10):
    # x / (||x|| + eps), matching reference utils.py normalize_activation
    # (NOT x / sqrt(ss + eps))
    return x / (jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + eps)


def lpips(img0, img1, params: Optional[dict] = None, weights_path=None):
    """LPIPS distance between (H, W, 3) or (N, H, W, 3) images in [0, 1].

    Matches reference lpipsPyTorch/__init__.py:6-21 with net_type='vgg'.
    """
    if params is None:
        params = load_weights(weights_path)
    if img0.ndim == 3:
        img0 = img0[None]
        img1 = img1[None]
    # [0, 1] inputs go straight to the z-score, exactly as the reference
    # evaluates (metrics.py:31-32 -> networks.py z_score)
    f0 = _vgg_features(img0.astype(jnp.float32), params)
    f1 = _vgg_features(img1.astype(jnp.float32), params)
    total = 0.0
    for j, (a, b) in enumerate(zip(f0, f1)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2  # (N, H, W, C)
        lin = params[f"lin{j}"]  # (C,) nonneg 1x1 head
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total if total.shape[0] > 1 else total[0]


def convert_torch_state(vgg_features_state: dict, lin_state: dict,
                        out_path: Optional[str] = None) -> str:
    """Build the npz from upstream torch state dicts.

    ``vgg_features_state``: torchvision ``vgg16().features.state_dict()``
    (keys like ``0.weight`` OIHW); ``lin_state``: richzhang LPIPS linear
    checkpoint (keys like ``lin0.model.1.weight`` (C,1,1,1) or the
    lpipsPyTorch variant). Returns the written path.
    """
    out_path = out_path or default_weight_path()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    arrs = {}
    conv_layer_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for ci, li in enumerate(conv_layer_idx):
        w = np.asarray(vgg_features_state[f"{li}.weight"])  # OIHW
        arrs[f"conv{ci}_w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        arrs[f"conv{ci}_b"] = np.asarray(vgg_features_state[f"{li}.bias"])
    for j in range(5):
        for k in (f"lin{j}.model.1.weight", f"lin.{j}.model.1.weight",
                  f"{j}.model.1.weight"):
            if k in lin_state:
                arrs[f"lin{j}"] = np.asarray(lin_state[k]).reshape(-1)
                break
        else:
            raise KeyError(f"no linear head for stage {j} in lin_state")
    np.savez(out_path, **arrs)
    return out_path
