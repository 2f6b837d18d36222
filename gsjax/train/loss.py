"""Photometric losses: L1 and windowed SSIM.

Exact constants of the reference (utils/loss_utils.py:17-63): 11x11 Gaussian
window, sigma = 1.5, C1 = 0.01^2, C2 = 0.03^2, uniform (zero) padding at the
borders — required for metric parity. Images are (H, W, 3) in [0, 1]; SSIM
runs as a single depthwise ``lax.conv`` over a stacked 9-channel tensor so
the six reference convolutions fuse into one.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax


def l1_loss(pred, gt):
    return jnp.abs(pred - gt).mean()


def l2_loss(pred, gt):
    return ((pred - gt) ** 2).mean()


@functools.lru_cache(maxsize=None)
def _window(window_size: int, sigma: float):
    # numpy (not jnp): a cached traced array would leak across jit contexts
    import numpy as np

    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _window_1d(window_size: int, sigma: float):
    import numpy as np

    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return tuple(float(v) for v in (g / g.sum()))


def _blur_axis(x, axis, taps):
    """Separable 1D Gaussian along ``axis`` as unrolled shift-multiply-adds —
    an 11-tap depthwise conv with 1-channel groups starves the MXU, while
    this stays dense VPU work."""
    k = len(taps)
    pad = k // 2
    widths = [(0, 0)] * x.ndim
    widths[axis] = (pad, pad)
    xp = jnp.pad(x, widths)
    out = None
    for i, w in enumerate(taps):
        sl = lax.slice_in_dim(xp, i, i + x.shape[axis], axis=axis)
        out = sl * w if out is None else out + sl * w
    return out


def _depthwise_filter(imgs, window_size, sigma):
    """imgs: (C, H, W) -> Gaussian-filtered (C, H, W), zero ('same') padding.

    The reference uses a full 11x11 window (utils/loss_utils.py:23-33); the
    Gaussian is separable, so two 1D passes are exact."""
    taps = _window_1d(window_size, sigma)
    return _blur_axis(_blur_axis(imgs, 1, taps), 2, taps)


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM over the image; inputs (H, W, 3) in [0, 1]."""
    x = jnp.moveaxis(img1, -1, 0)  # (3, H, W)
    y = jnp.moveaxis(img2, -1, 0)
    stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=0)  # (15, H, W)
    f = _depthwise_filter(stacked, window_size, sigma)
    mu1, mu2, exx, eyy, exy = (f[i * 3 : (i + 1) * 3] for i in range(5))
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = exx - mu1_sq
    sigma2_sq = eyy - mu2_sq
    sigma12 = exy - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def photometric_loss(pred, gt, lambda_dssim: float = 0.2):
    """0.8 * L1 + 0.2 * (1 - SSIM) (reference train.py:90-93)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, gt) + lambda_dssim * (
        1.0 - ssim(pred, gt)
    )
