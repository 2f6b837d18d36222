#!/usr/bin/env python
"""Probe: does the JAX persistent compilation cache work across processes
through the axon remote-compile plugin?  (round-1 measurement was
inconclusive; VERDICT r3 item 1 asks for a clean re-test.)

Run twice:  python scripts/_r4_cache_probe.py
First run compiles fresh and reports wall; second should be ~instant if
the cache is honored.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp


def main():
    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)

    # A graph complex enough that compile time is measurable (a few
    # seconds at least), but not a full bench graph.
    @jax.jit
    def f(x):
        k = jnp.sin(x) @ jnp.cos(x.T)
        for _ in range(8):
            k = jnp.tanh(k @ k.T) + x[: k.shape[0], : k.shape[1]]
        return jnp.sum(jax.lax.sort(k.ravel()))

    x = jnp.ones((512, 512), jnp.float32)
    t0 = time.time()
    v = float(f(x))
    t_compile = time.time() - t0
    print(f"first-call (compile+run) wall: {t_compile:.2f}s  value={v:.4f}")
    entries = os.listdir(os.environ["JAX_COMPILATION_CACHE_DIR"]) if os.path.isdir(
        os.environ["JAX_COMPILATION_CACHE_DIR"]) else []
    print(f"cache dir entries: {len(entries)}")


if __name__ == "__main__":
    main()
