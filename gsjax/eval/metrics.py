"""PSNR / MSE (reference: utils/image_utils.py:14-19).

SSIM lives in gsjax.train.loss (shared with the training loss); LPIPS in
gsjax.eval.lpips.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(img1, img2):
    return ((img1 - img2) ** 2).mean()


def psnr(img1, img2):
    """Peak signal-to-noise ratio for [0,1] images (any shape)."""
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse(img1, img2)))
