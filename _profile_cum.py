import time
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _toy_scene
from gsjax.ops.rasterize import RasterizeSettings
from gsjax.ops.projection import preprocess, num_tiles
from gsjax.ops.binning import build_tile_bins
from gsjax.ops.composite import composite_tiles, assemble_image
from gsjax.models.gaussians import activated

state, cam = _toy_scene(n=200_000, capacity=1<<18, width=1920, height=1080)
rcam = cam.to_render_camera()
settings = RasterizeSettings(max_pairs=1<<22, max_splats_per_tile=1024, chunk=32)
tiles_x, tiles_y = num_tiles(1920, 1080)
means3d, scales, quats, ops_, shs = activated(state)

def stage_pre(eps):
    s = preprocess(means3d + eps, scales, quats, ops_, shs, rcam, 3, active_mask=state.active)
    return s
def upto_pre(eps):
    s = stage_pre(eps)
    return jnp.sum(s.means2d) + jnp.sum(s.radii)
def upto_bins(eps):
    s = stage_pre(eps)
    b = build_tile_bins(s, tiles_x, tiles_y, settings.max_pairs)
    return jnp.sum(b.pair_gauss[::1024]) + jnp.sum(b.tile_start[::64])
def upto_comp(eps):
    s = stage_pre(eps)
    b = build_tile_bins(s, tiles_x, tiles_y, settings.max_pairs)
    tc, tT = composite_tiles(b.pair_gauss, b.tile_start, s.means2d, s.conics,
        s.colors, s.opacities, tiles_x, tiles_y,
        settings.max_splats_per_tile, settings.chunk)
    return jnp.sum(tc[:, 0, 0]) + jnp.sum(tT[:, 0])

RTT = 30.0
def t1(f):
    jf = jax.jit(f)
    float(jf(jnp.float32(0.0)))  # compile
    times = []
    for i in range(1, 4):
        t0 = time.time(); float(jf(jnp.float32(i * 1e-9))); times.append((time.time()-t0)*1000 - RTT)
    return min(times)

a = t1(upto_pre); print("pre        ms", round(a,1))
b = t1(upto_bins); print("pre+bins   ms", round(b,1), "-> bins", round(b-a,1))
c = t1(upto_comp); print("pre+bins+comp ms", round(c,1), "-> comp", round(c-b,1))

import dataclasses
settings_p = dataclasses.replace(settings, backend="pallas")
from gsjax.ops.rasterize import render as _render
def upto_pallas(eps):
    out = _render(rcam, means3d + eps, scales, quats, ops_, shs, 3, jnp.zeros(3),
                  settings_p, active_mask=state.active)
    return jnp.sum(out["render"][::64, ::64]) + jnp.sum(out["final_T"][::64, ::64])
d = t1(upto_pallas); print("full pallas fwd ms", round(d,1))
