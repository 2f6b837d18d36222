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
