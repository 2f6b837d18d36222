"""Microbench: alternatives for the backward per-pair -> per-gaussian
reduction's row permutation (the ~100ms item in docs/PERF.md).

All data is generated on-device (the tunnel chokes on hundreds-of-MB host
transfers and the remote-compile endpoint rejects big constant payloads).

Run from /root/repo on the tunneled chip: python scripts/_reduce_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from gsjax.utils.profiling import measure_rtt

P = 1 << 22  # 4M pairs (1080p budget scale)
PAD = P + (1 << 20)  # padded kernel-output rows
W = 16


@jax.jit
def make_data():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    table = jax.random.normal(ks[0], (PAD, W), jnp.float32)
    perm = jax.random.permutation(ks[1], PAD)[:P].astype(jnp.int32)
    slot_key = jax.random.randint(ks[2], (P,), 0, 1 << 24, jnp.int32)
    pos = jax.random.permutation(ks[3], P).astype(jnp.int32)
    return table, perm, slot_key, pos


print("making data...", flush=True)
table, perm, slot_key, pos = jax.block_until_ready(make_data())
print("data made", float(table[0, 0]), flush=True)
table_t = jnp.transpose(table)
print("transposed", float(table_t[0, 0]), flush=True)
mono = jnp.sort(perm)
print("mono ready", int(mono[0]), flush=True)

rtt = measure_rtt()
print(f"rtt {rtt*1e3:.1f} ms", flush=True)


def bench(name, fn, *args):
    jf = jax.jit(fn)
    float(jf(jnp.float32(0.0), *args))  # compile
    samples = []
    for i in range(1, 4):
        t0 = time.time()
        float(jf(jnp.float32(i * 1e-12), *args))
        samples.append(time.time() - t0)
    t = max(min(samples) - rtt, 1e-6)
    print(f"{name:42s} {t*1e3:8.1f} ms", flush=True)
    return t


bench("sort2 (key,pos)", lambda eps, k, p: jnp.sum(
    jax.lax.sort((k + eps.astype(jnp.int32), p), num_keys=1,
                 is_stable=True)[1][::4096].astype(jnp.float32)) + eps,
    slot_key, pos)

bench("random row gather (P,16)", lambda eps, t, p: jnp.sum(
    t.at[0, 0].add(eps)[p][::4096]), table, perm)

bench("monotone row gather (P,16)", lambda eps, t, p: jnp.sum(
    t.at[0, 0].add(eps)[p][::4096]), table, mono)


def sort17(eps, k, t):
    cols = tuple(t[:P, i] for i in range(W))
    out = jax.lax.sort((k + eps.astype(jnp.int32),) + cols,
                       num_keys=1, is_stable=True)
    return sum(jnp.sum(c[::4096]) for c in out[1:]) + eps


bench("sort17 (key + 16 f32 payload)", sort17, slot_key, table)


def sort5_packed(eps, k, t):
    """Carry the 16 f32 as 8 u32 operands of packed bf16 pairs (grad rows
    tolerate bf16 payload precision only if we accumulate f32 later; this
    measures movement cost only)."""
    tb = t[:P].astype(jnp.bfloat16)  # (P, 16)
    packed = jax.lax.bitcast_convert_type(
        tb.reshape(P, 8, 2), jnp.uint32
    )  # (P, 8)
    ops = tuple(packed[:, i] for i in range(8))
    out = jax.lax.sort((k + eps.astype(jnp.int32),) + ops, num_keys=1,
                       is_stable=True)
    s = sum(jnp.sum(o[::4096].astype(jnp.float32)) for o in out[1:])
    return s + eps


bench("sort9 (key + 8 u32 bf16-packed)", sort5_packed, slot_key, table)

bench("transposed gather (16,PAD) take axis1", lambda eps, t, p: jnp.sum(
    jnp.take(t.at[0, 0].add(eps), p, axis=1)[:, ::4096]), table_t, perm)

table16 = table.astype(jnp.bfloat16)
bench("random row gather bf16", lambda eps, t, p: jnp.sum(
    t.at[0, 0].add(eps.astype(jnp.bfloat16))[p][::4096].astype(jnp.float32)),
    table16, perm)


def gather128(eps, t, p):
    return jnp.sum(t.at[0, 0].add(eps)[p][::512])


table128 = table[: PAD // 8 * 8].reshape(PAD // 8, 128)
perm8 = perm[: P // 8] % (PAD // 8)
bench("random row gather (P/8,128)", gather128, table128, perm8)
