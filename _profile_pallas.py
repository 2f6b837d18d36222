import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from __graft_entry__ import _toy_scene
from gsjax.ops.rasterize import RasterizeSettings
from gsjax.ops.projection import preprocess, num_tiles
from gsjax.ops.binning import build_tile_bins
from gsjax.ops.pallas_composite import build_padded_pairs, pack_pair_attrs, composite_tiles_pallas
from gsjax.models.gaussians import activated

state, cam = _toy_scene(n=200_000, capacity=1<<18, width=1920, height=1080)
rcam = cam.to_render_camera()
settings = RasterizeSettings(max_pairs=1<<22, backend="pallas")
tiles_x, tiles_y = num_tiles(1920, 1080)
nt = tiles_x * tiles_y
means3d, scales, quats, ops_, shs = activated(state)

def stage(upto):
    def f(eps):
        s = preprocess(means3d + eps, scales, quats, ops_, shs, rcam, 3, active_mask=state.active)
        b = build_tile_bins(s, tiles_x, tiles_y, settings.max_pairs)
        if upto == "bins":
            return jnp.sum(b.pair_gauss[::1024]) + jnp.sum(b.tile_start[::64])
        ps, gp, valid = build_padded_pairs(b.pair_gauss, b.tile_start, nt, settings.max_pairs, 128)
        if upto == "pad":
            return jnp.sum(gp[::1024]) + jnp.sum(ps[::64])
        pa = pack_pair_attrs(gp, valid, s.means2d, s.conics, s.colors, s.opacities)
        if upto == "pack":
            return jnp.sum(pa[:, ::1024])
        tc, tT, nc = composite_tiles_pallas(pa, ps, tiles_x, tiles_y, 128)
        return jnp.sum(tc[::64, 0]) + jnp.sum(tT[::64, 0])
    return f

RTT = 30.0
def t1(f):
    jf = jax.jit(f)
    float(jf(jnp.float32(0.0)))
    ts = []
    for i in range(1, 4):
        t0 = time.time(); float(jf(jnp.float32(i*1e-9))); ts.append((time.time()-t0)*1000 - RTT)
    return min(ts)

prev = 0.0
for st in ["bins", "pad", "pack", "kernel"]:
    v = t1(stage(st))
    print(f"{st:7s} cum {v:7.1f} ms  delta {v-prev:7.1f}")
    prev = v
