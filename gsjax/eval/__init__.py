"""Image-quality metrics: PSNR / SSIM / LPIPS."""

from gsjax.eval.metrics import mse, psnr

__all__ = ["mse", "psnr"]
