import time
import numpy as np, jax, jax.numpy as jnp

P = 1 << 22
P_pad = P + (1<<20)
rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0, 2**31-1, P, dtype=np.int32))
cols = [jnp.asarray(rng.normal(size=P).astype(np.float32)) for _ in range(16)]
rows_nat = jnp.asarray(rng.normal(size=(P_pad, 16)).astype(np.float32))
perm = jnp.asarray(rng.integers(0, P_pad, P, dtype=np.int32))

def t(f, *a):
    jf = jax.jit(f)
    float(jf(jnp.int32(0), *a))
    t0=time.time(); float(jf(jnp.int32(1), *a)); return (time.time()-t0)*1000-33

def sort17(c, key, *cols):
    out = jax.lax.sort((key + c,) + cols, num_keys=1, is_stable=True)
    return sum(o[0] for o in out[1:]) + out[0][0].astype(jnp.float32)

def gather(c, rows, perm):
    g = rows[jnp.minimum(perm + c, rows.shape[0]-1)]
    return jnp.sum(g[::4096])

print("17-operand sort ms", round(t(sort17, key, *cols)))
print("row gather ms     ", round(t(gather, rows_nat, perm)))

perm_mono = jnp.asarray(np.sort(rng.choice(P_pad, P, replace=False)).astype(np.int32))
def gather_mono(c, rows, perm):
    g = rows[jnp.minimum(perm + c, rows.shape[0]-1)]
    return jnp.sum(g[::4096])
print("monotone row gather ms", round(t(gather_mono, rows_nat, perm_mono)))

target_idx = jnp.asarray(np.sort(rng.choice(P_pad, P, replace=False)).astype(np.int32))
vals = jnp.asarray(rng.integers(0, 2**30, P, dtype=np.int32))
def scatter_i32(c, tgt, v):
    out = jnp.full(P_pad, 2**31 - 1, jnp.int32).at[tgt].set(v + c)
    return out[0] + out[-1]
print("i32 scatter P->P_pad ms", round(t(scatter_i32, target_idx, vals)))
