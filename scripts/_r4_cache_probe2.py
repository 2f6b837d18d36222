#!/usr/bin/env python
"""Decompose the cached-compile residual cost: per-process or per-graph?

Loads three small distinct graphs (one sort-free, one with the probe-1
graph, one new-but-trivial) and times each first call separately.
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
    print("device:", jax.devices()[0], file=sys.stderr)

    # graph A: trivial, never compiled before in cache-probe runs with
    # this exact shape/structure (may still be cached from other sessions)
    @jax.jit
    def a(x):
        return jnp.sum(jnp.tanh(x) * 3.0 + 1.0)

    t0 = time.time()
    float(a(jnp.ones((128, 128))))
    print(f"A trivial elementwise: {time.time() - t0:.2f}s")

    # graph B: the probe-1 graph (known cached)
    @jax.jit
    def f(x):
        k = jnp.sin(x) @ jnp.cos(x.T)
        for _ in range(8):
            k = jnp.tanh(k @ k.T) + x[: k.shape[0], : k.shape[1]]
        return jnp.sum(jax.lax.sort(k.ravel()))

    x = jnp.ones((512, 512), jnp.float32)
    t0 = time.time()
    float(f(x))
    print(f"B probe-1 graph (cached): {time.time() - t0:.2f}s")

    # graph C: moderate fresh graph, sort-free (how slow is an UNCACHED
    # compile without lax.sort?)
    @jax.jit
    def c(x):
        k = x
        for _ in range(4):
            k = jnp.tanh(k @ k.T) * 0.999 + x
        return jnp.sum(k)

    t0 = time.time()
    float(c(x))
    print(f"C fresh sort-free matmul chain: {time.time() - t0:.2f}s")

    # graph D: fresh graph WITH a lax.sort (is sort the compile hog?)
    @jax.jit
    def d(x):
        return jnp.sum(jax.lax.sort(jnp.tanh(x).ravel() * 1.0001))

    t0 = time.time()
    float(d(x))
    print(f"D fresh sort-only: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
