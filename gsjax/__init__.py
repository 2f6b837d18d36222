"""gsjax — TPU-native 3D Gaussian Splatting framework (JAX/Pallas).

A from-scratch re-design of the capabilities of the reference PyTorch/CUDA
implementation (INRIA ``gaussian-splatting``; see /root/reference and
SURVEY.md): differentiable tile-based rasterization as XLA/Pallas TPU
programs, a full training loop with adaptive density control, COLMAP/Blender
data loading, ecosystem-compatible PLY export, metrics, checkpointing, and
multi-chip sharding via ``jax.sharding.Mesh`` + ``shard_map``.

Package layout
--------------
``gsjax.utils``     math (SH, quaternions, covariances, cameras, schedules)
``gsjax.data``      COLMAP/Blender readers, PLY io, camera containers
``gsjax.ops``       the renderer: projection, tile binning, compositing
``gsjax.models``    fixed-capacity Gaussian state + density control
``gsjax.train``     losses, train step, training driver, checkpointing
``gsjax.parallel``  device-mesh sharding of the renderer & trainer
``gsjax.eval``      PSNR / SSIM / LPIPS
``gsjax.viewer``    SIBR remote-viewer TCP bridge
"""

__version__ = "0.1.0"

# On TPU, JAX's DEFAULT matmul precision truncates f32 operands to bfloat16
# (~0.4% relative error). This framework's FLOPs live in the Pallas
# rasterizer (which pins its own precision); the remaining matmuls —
# world-view point transforms, SH color einsum, 3x3 covariance products,
# SSIM convolutions — are tiny but numerically load-bearing (measured
# on-chip: bf16 truncation moved final_T by 2e-3 and pixels by 5e-3).
# Full f32 everywhere costs nothing measurable here, so make it the
# package default — but only when the embedding application has not
# already chosen a precision itself (and allow an env opt-out), so
# importing gsjax never clobbers a deliberate host-app setting.
import os as _os

import jax as _jax

if (
    _os.environ.get("GSJAX_NO_PRECISION_OVERRIDE", "0").strip().lower()
    not in ("1", "true", "yes", "on")
    and _jax.config.jax_default_matmul_precision is None
):
    _jax.config.update("jax_default_matmul_precision", "float32")
