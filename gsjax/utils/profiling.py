"""Profiling harness: phase timings + device traces.

The reference's only instrumentation is a pair of CUDA events around the
train step (reference: train.py:44-45,67,95). This module provides the
roofline-oriented tooling SURVEY.md §5.1 calls for:

- :func:`trace`: a context manager around ``jax.profiler.trace`` writing a
  TensorBoard-loadable device trace.
- :func:`phase_timings`: wall times of each renderer phase (preprocess /
  binning / pack+kernel compositing / full forward / forward+backward).

Timing through the async device tunnel is subtle: dispatch returns before
execution and ``block_until_ready`` may not block, so every sample chains an
input perturbation through the computation and fetches a dependent scalar;
the measured host round-trip is subtracted.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace context (TensorBoard / xprof format)."""
    with jax.profiler.trace(log_dir):
        yield


def measure_rtt() -> float:
    """Seconds per trivial dispatch+fetch — the fixed host round trip."""

    @jax.jit
    def nothing(eps):
        return jnp.float32(1.0) + eps

    float(nothing(jnp.float32(0.0)))
    samples = []
    for i in range(3):
        t0 = time.time()
        float(nothing(jnp.float32(i * 1e-12)))
        samples.append(time.time() - t0)
    return min(samples)


def timed(fn: Callable, reps: int = 3, rtt: float | None = None) -> float:
    """Seconds per call of ``fn(eps) -> scalar``; compiles on first call.

    ``fn`` must thread ``eps`` through the computation so each sample does
    real device work (see module docstring).
    """
    if rtt is None:
        rtt = measure_rtt()
    float(fn(jnp.float32(0.0)))
    samples = []
    for i in range(1, reps + 1):
        t0 = time.time()
        float(fn(jnp.float32(i * 1e-12)))
        samples.append(time.time() - t0)
    return max(min(samples) - rtt, 1e-6)


def phase_timings(
    means3d, scales, quats, opacities, shs, camera, settings, bg=None,
    active_mask=None,
) -> Dict[str, float]:
    """Per-phase wall times (ms) for one frame. Phases are cumulative
    pipelines (each includes the previous ones); the deltas are reported."""
    from gsjax.ops.binning import build_tile_bins
    from gsjax.ops.projection import num_tiles, preprocess
    from gsjax.ops.rasterize import render

    if bg is None:
        bg = jnp.zeros(3)
    tiles_x, tiles_y = num_tiles(camera.width, camera.height)
    rtt = measure_rtt()

    def upto_pre(eps):
        s = preprocess(
            means3d + eps, scales, quats, opacities, shs, camera, 3,
            active_mask=active_mask,
        )
        return jnp.sum(s.means2d[::64]) + jnp.sum(s.radii[::64])

    def upto_bins(eps):
        s = preprocess(
            means3d + eps, scales, quats, opacities, shs, camera, 3,
            active_mask=active_mask,
        )
        b = build_tile_bins(
            s, tiles_x, tiles_y, settings.max_pairs,
            max_tiles_per_gauss=settings.max_tiles_per_gauss,
            tier_frac=settings.tier_frac,
            expansion=settings.expansion,
        )
        return jnp.sum(b.pair_gauss[::1024]) + jnp.sum(b.tile_start[::64])

    def full(eps):
        out = render(
            camera, means3d + eps, scales, quats, opacities, shs, 3, bg,
            settings, active_mask=active_mask,
        )
        return jnp.sum(out["render"][::64, ::64])

    def full_grad(eps):
        def loss(m):
            out = render(
                camera, m, scales, quats, opacities, shs, 3, bg, settings,
                active_mask=active_mask,
            )
            return jnp.mean(out["render"] ** 2)

        return jax.grad(loss)(means3d + eps)[0, 0]

    t_pre = timed(jax.jit(upto_pre), rtt=rtt)
    t_bins = timed(jax.jit(upto_bins), rtt=rtt)
    t_full = timed(jax.jit(full), rtt=rtt)
    t_grad = timed(jax.jit(full_grad), rtt=rtt)
    return {
        "preprocess_ms": t_pre * 1e3,
        "binning_ms": (t_bins - t_pre) * 1e3,
        "composite_ms": (t_full - t_bins) * 1e3,
        "forward_ms": t_full * 1e3,
        "forward_backward_ms": t_grad * 1e3,
        "rtt_ms": rtt * 1e3,
    }


def roofline_report(
    means3d, scales, quats, opacities, shs, camera, settings,
    active_mask=None, peak_vpu_gflops: float = 7_000.0,
    peak_hbm_gbps: float = 819.0,
):
    """Rough roofline estimate for the compositing kernel (BASELINE.md:
    "rasterizer fwd+bwd >= 70% of roofline per chip").

    Counts the actual pair-pixel work from the frame's binning statistics
    and compares achieved throughput against VPU-compute and HBM-bandwidth
    ceilings (v5e defaults).
    """
    import numpy as np

    from gsjax.ops.binning import build_tile_bins
    from gsjax.ops.projection import num_tiles, preprocess

    tiles_x, tiles_y = num_tiles(camera.width, camera.height)

    @jax.jit
    def frame_stats():
        splats = preprocess(
            means3d, scales, quats, opacities, shs, camera, 3,
            active_mask=active_mask,
        )
        bins = build_tile_bins(
            splats, tiles_x, tiles_y, settings.max_pairs,
            max_tiles_per_gauss=settings.max_tiles_per_gauss,
        )
        return bins.tile_start, bins.num_pairs

    tile_start, num_pairs = jax.device_get(frame_stats())
    counts = np.diff(np.asarray(tile_start))
    chunk = settings.pallas_chunk
    # every started chunk processes a full (256, chunk) block
    chunks = np.ceil(counts / chunk).sum()
    pair_pixels = chunks * chunk * 256
    flops_per_pp = 40  # alpha, log-space prefix terms, color accumulation
    phases = phase_timings(
        means3d, scales, quats, opacities, shs, camera, settings,
        active_mask=active_mask,
    )
    t_comp = phases["composite_ms"] / 1e3
    flops = pair_pixels * flops_per_pp
    hbm_bytes = float(num_pairs) * 64 * 2  # pack write + kernel read
    achieved = flops / max(t_comp, 1e-9) / 1e9
    return {
        **phases,
        "pairs": int(num_pairs),
        "pair_pixels": float(pair_pixels),
        "compute_gflops_achieved": achieved,
        "compute_roofline_frac": achieved / peak_vpu_gflops,
        "hbm_gbps_achieved": hbm_bytes / max(t_comp, 1e-9) / 1e9,
        "hbm_roofline_frac": hbm_bytes / max(t_comp, 1e-9) / 1e9 / peak_hbm_gbps,
    }
