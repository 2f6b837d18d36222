#!/usr/bin/env python
"""On-chip pallas-vs-XLA cross-check (image/T/grads, bf16 + f32 grad
paths) — run before long TPU sessions so a kernel regression fails in
minutes, not at the driver bench. Exit 0 on PASS."""
import dataclasses, time, sys
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from __graft_entry__ import _toy_scene
from gsjax.ops.rasterize import RasterizeSettings
from gsjax.train.step import render_state
print("device:", jax.devices()[0], flush=True)
state, cam = _toy_scene(n=20_000, capacity=1<<15, width=512, height=512, log_scale=-4.0)
rcam = cam.to_render_camera(); bg = jnp.zeros(3)
outs = {}
for backend, gd in (("pallas","bfloat16"), ("pallas_f32","float32"), ("xla","float32")):
    be = "pallas" if backend.startswith("pallas") else "xla"
    s = RasterizeSettings(max_pairs=1<<19, max_splats_per_tile=2048, chunk=32, backend=be, grad_dtype=gd)
    @jax.jit
    def graph(params, _s=s):
        def loss_fn(p):
            stt = dataclasses.replace(state, params=p)
            out = render_state(stt, rcam, bg, _s)
            return jnp.mean(out["render"]**2), (out["render"], out["final_T"])
        (_, (img, fT)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        img_inf = render_state(dataclasses.replace(state, params=params), rcam, bg, _s)["render"]
        return img, fT, img_inf, grads
    t0=time.time()
    img, fT, img_inf, grads = jax.block_until_ready(graph(state.params))
    outs[backend] = (np.asarray(img), np.asarray(fT), np.asarray(img_inf), {k: np.asarray(v) for k,v in grads.items()})
    print(backend, "ran in %.1fs" % (time.time()-t0), flush=True)
ok = True
for pb in ("pallas", "pallas_f32"):
    d_img = np.abs(outs[pb][0]-outs["xla"][0])
    d_t = np.abs(outs[pb][1]-outs["xla"][1])
    img_diff = d_img.max(); t_diff = d_t.max()
    inf_diff = np.abs(outs[pb][2]-outs[pb][0]).max()
    # two-tier tolerance (see bench.py _backend_cross_check): sparse
    # alpha-threshold contributor flips may reach ~ALPHA_MIN; the bulk
    # must stay at reassociation scale
    img_p999 = np.quantile(d_img, 0.999); t_p999 = np.quantile(d_t, 0.999)
    print("%s: img %.2e (p999 %.2e) T %.2e (p999 %.2e) inf %.2e" % (
        pb, img_diff, img_p999, t_diff, t_p999, inf_diff), flush=True)
    ok &= img_diff <= 6e-3 and t_diff <= 6e-3 and inf_diff <= 1e-5
    ok &= img_p999 <= 5e-4 and t_p999 <= 5e-4
    for k in outs[pb][3]:
        gp, gx = outs[pb][3][k], outs["xla"][3][k]
        gd_ = np.abs(gp-gx).max(); scale = max(np.abs(gx).max(), 1.0)
        tol = 5e-3*scale if pb=="pallas" else 1e-3*scale
        stat = "OK" if gd_ <= tol else "FAIL"
        ok &= gd_ <= tol
        print("  grad %-10s %.2e (scale %.1e) %s" % (k, gd_, scale, stat), flush=True)
print("XCHECK", "PASS" if ok else "FAIL", flush=True)
sys.exit(0 if ok else 1)
