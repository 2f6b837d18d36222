"""The training driver: orchestration around the jitted train step.

Mirrors the reference's ``training()`` control flow (reference:
train.py:31-132): shuffled-stack camera sampling, SH-degree ramp every 1000
iterations, densify/prune every ``densification_interval`` in
[densify_from_iter, densify_until_iter), opacity resets, eval/save hooks,
checkpointing — plus the pieces the reference cannot have: fixed-capacity
buffers with automatic 2x re-bucketing when densification fills them, and an
optional viewer-bridge callback polled once per iteration.
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import json
import os
import random
import time
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.configs import ModelParams, OptimizationParams, PipelineParams, save_cfg_args
from gsjax.data.cameras import stack_render_cameras
from gsjax.eval.metrics import psnr
from gsjax.models.gaussians import (
    GaussianState,
    create_empty,
    grow_capacity,
)
from gsjax.ops.rasterize import RasterizeSettings
from gsjax.train.checkpoint import load_checkpoint, save_checkpoint
from gsjax.train.loss import l1_loss
from gsjax.train.optim import make_optimizer
from gsjax.train.scene import Scene
from gsjax.train.step import (
    TrainConfig,
    make_densify_step,
    make_render_fn,
    make_train_step,
    make_train_step_chained,
    stack_images,
)

GROW_WATERMARK = 0.9  # grow capacity when active fraction exceeds this


def _pad_leaf(a, new_c):
    a = np.asarray(a)
    if a.ndim == 0 or a.shape[0] == 0:
        return a
    pad = [(0, new_c - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


def grow_opt_state(opt_state, old_capacity: int, new_capacity: int):
    """Zero-pad every per-Gaussian leaf (Adam mu/nu) to the new capacity."""

    def pad(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] == old_capacity:
            return _pad_leaf(x, new_capacity)
        return x

    return jax.tree.map(pad, opt_state)


def _grown_abstract(tree, old_capacity: int, new_capacity: int):
    """ShapeDtypeStructs for ``tree`` with every per-Gaussian leading dim
    re-bucketed to ``new_capacity`` (for AOT-lowering the next bucket).
    Sharded leaves keep their NamedSharding — the partition spec applies
    unchanged to the grown dim (2x growth keeps divisibility)."""

    def conv(x):
        shape = tuple(jnp.shape(x))
        if len(shape) >= 1 and shape[0] == old_capacity:
            shape = (new_capacity,) + shape[1:]
        dtype = getattr(x, "dtype", None) or jnp.result_type(x)
        sharding = getattr(x, "sharding", None)
        if sharding is not None and not hasattr(sharding, "spec"):
            sharding = None  # single-device default sharding: let jit pick
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

    return jax.tree.map(conv, tree)


def _with_fallback(compiled, builder):
    """Call the AOT-compiled step; on an argument-aval mismatch (shape or
    weak-type drift vs the abstract lowering) fall back to an inline jit
    compile once and keep using that."""
    holder = {"fn": compiled, "is_compiled": True}

    def call(*args):
        try:
            return holder["fn"](*args)
        # only argument-aval mismatches (TypeError/ValueError from AOT arg
        # checking) trigger the fallback; a genuine runtime failure (device
        # error, NaN guard) must propagate, not silently re-run the step
        except (TypeError, ValueError) as e:
            if holder["is_compiled"]:
                print(
                    f"[warm] precompiled step rejected args "
                    f"({type(e).__name__}: {e}); recompiling inline",
                    flush=True,
                )
                holder["fn"] = builder()
                holder["is_compiled"] = False
                return holder["fn"](*args)
            raise

    return call


def _warmed_densify(warmed, inline_fn):
    """Dispatch densify calls to the AOT-precompiled executable for the
    matching ``use_screen_size`` variant (the static arg is baked into each
    executable), falling back to the inline jit for missing variants or
    aval drift."""
    wrapped = {}
    for us in (False, True):
        compiled = warmed.get(f"densify_{us}")
        if compiled is not None:
            wrapped[us] = _with_fallback(
                compiled,
                lambda us=us: (
                    lambda s, o, k: inline_fn(s, o, k, use_screen_size=us)
                ),
            )

    def call(state, opt_state, key, use_screen_size):
        fn = wrapped.get(bool(use_screen_size))
        if fn is None:
            return inline_fn(
                state, opt_state, key, use_screen_size=use_screen_size
            )
        return fn(state, opt_state, key)

    return call


class CapacityWarmer:
    """Compiles the next capacity bucket's hot functions in a background
    thread, so densification growth swaps in ready executables instead of
    stalling training on recompiles (the reference has no analogue — its
    CUDA kernels are shape-polymorphic; XLA specializes on shapes).

    ``maybe_start(key, jobs)`` takes ``jobs`` as a dict
    ``name -> (build_fn, args, kwargs)`` where ``build_fn()`` returns a
    jitted function and ``args``/``kwargs`` are its abstract
    (ShapeDtypeStruct) call signature. ``take`` at growth time returns
    ``{name: compiled}`` (names whose compile failed are absent), or None
    if not ready / key changed — the caller then compiles inline as
    before. Failures are swallowed — warming is best-effort."""

    def __init__(self):
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self._key = None
        self._future = None

    @staticmethod
    def _job(jobs):
        out = {}
        for name, (build_fn, args, kwargs) in jobs.items():
            try:
                fn = build_fn()
                out[name] = fn.lower(*args, **kwargs).compile()
            except Exception as e:  # pragma: no cover - best effort
                print(f"[warm] precompile of {name} failed "
                      f"({type(e).__name__}: {e})", flush=True)
        return out

    def maybe_start(self, key, jobs):
        if self._key == key:
            return
        self._key = key
        self._future = self._pool.submit(self._job, jobs)

    def take(self, key):
        if self._key != key or self._future is None or not self._future.done():
            return None
        try:
            return self._future.result()
        except Exception as e:  # best-effort: fall back to inline compile
            print(f"[warm] precompile failed ({type(e).__name__}: {e})",
                  flush=True)
            return None
        finally:
            self._key = None
            self._future = None


def default_rasterize_settings(
    width: int, height: int, capacity: int
) -> RasterizeSettings:
    """Heuristic static budgets scaled to the scene/render size."""
    tiles = -(-width // 16) * -(-height // 16)
    # start tight — every per-pair cost (sort, pack, gradient reduction)
    # scales with this static budget; the training loop doubles it (one
    # recompile) whenever a frame actually drops pairs
    max_pairs = min(1 << 24, max(1 << 18, 2 ** int(np.ceil(np.log2(capacity * 4)))))
    mspt = 2048 if tiles > 1024 else 1024
    # early scenes hold few, large gaussians (SfM init) — give them a wide
    # per-gaussian tile cap; at scale footprints shrink (densification
    # splits + the scale prune) and a narrow cap keeps the dense pair grid
    # small. capacity growth re-jits, so this tracks training phase.
    mt = int(min(128, max(16, 2 ** int(np.ceil(np.log2(max(max_pairs // max(capacity, 1), 1)))))))
    mt = min(mt, 2 ** int(np.ceil(np.log2(tiles))))
    return RasterizeSettings(
        max_pairs=max_pairs, max_splats_per_tile=mspt, chunk=32,
        max_tiles_per_gauss=mt,
        # measured winners (evidence/perf/r3_ab.jsonl, 1080p/1M bench
        # scene): tiered binning halves the key sort (60.6 -> 31.8 ms) and
        # the packed-bf16 single-sort backward reduction takes fwd+bwd
        # 292 -> 264 ms. The trainer halves tier_frac automatically on any
        # tier-cap event (see the overflow reaction below).
        tier_frac=0.875, grad_dtype="bfloat16",
    )


def _probe_initial_budgets(settings, state, train_cams, width, height,
                           inference=False):
    """Measure the SfM-initialized scene's actual footprints on a few
    cameras and size the per-gaussian tile cap (and pair budget) before the
    first train-step compile.

    The static-budget heuristics can start a doubling below what the scene
    needs at iteration 1 (initial SfM gaussians are few and LARGE); each
    adaptive doubling is a full recompile — minutes on CPU, tens of seconds
    through the TPU remote-compile tunnel — so one cheap preprocess probe
    per scene is far cheaper than 1-3 growth recompiles at startup."""
    import jax

    from gsjax.models.gaussians import activated
    from gsjax.ops.projection import num_tiles, preprocess

    tiles_x, tiles_y = num_tiles(width, height)

    # small-tier cap candidates for the tier_frac safety check below —
    # extended to the full mt range so a big-footprint scene (mt_small up
    # to 8192) still gets a validated tier_frac instead of silently
    # keeping the default unchecked (ADVICE r3 low #1)
    tier_ks = (2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)

    @jax.jit
    def probe(state, camera):
        means3d, scales, quats, opac, shs = activated(state)
        sp = preprocess(
            means3d, scales, quats, opac, shs, camera,
            state.active_sh_degree, active_mask=state.active,
            opacity_aware_radius=settings.opacity_aware_radius,
        )
        counts = sp.tiles_touched
        frac_le = jnp.stack(
            [jnp.mean((counts <= k).astype(jnp.float32)) for k in tier_ks]
        )
        return jnp.max(counts), jnp.sum(counts), frac_le

    probe_cams = train_cams[:: max(1, len(train_cams) // 4)][:4]
    mt_need, pairs_need = 0, 0
    frac_le_min = np.ones(len(tier_ks))
    for c in probe_cams:
        rc = c.to_render_camera()
        if (rc.width, rc.height) != (width, height):
            continue
        m, p, fr = probe(state, rc)
        mt_need = max(mt_need, int(m))
        pairs_need = max(pairs_need, int(p))
        frac_le_min = np.minimum(frac_le_min, np.asarray(fr))
    if mt_need == 0:
        return settings
    mt = int(
        min(
            2 ** int(np.ceil(np.log2(max(mt_need, 1)))),
            2 ** int(np.ceil(np.log2(tiles_x * tiles_y))),
        )
    )
    # densification adds (small) gaussians, so never shrink the pair budget
    # below the heuristic; grow it if the probe already exceeds it
    max_pairs = settings.max_pairs
    while max_pairs < pairs_need * 2 and max_pairs < 1 << 24:
        max_pairs *= 2
    if inference:
        # no densification at render time: footprints are fixed and the
        # probe saw the real view-dependent max, so 1.5x headroom suffices
        # — every per-pair stage (expansion sort, pack gather, kernel
        # windows) scales with max_pairs (64k-aligned for kernel blocks).
        # A scene whose probed need exceeds the training-probe 1<<24 growth
        # ceiling may grow to the trainer's 1<<26 reaction bound — the
        # trainer reacts to overflow at runtime, inference never does, so
        # under-budgeting here silently drops pairs on every frame
        # (ADVICE r3 low #2).
        need = max(1 << 18, -(-int(pairs_need * 1.5) // 65536) * 65536)
        if need > 1 << 26:
            raise ValueError(
                f"inference pair budget: probe needs {pairs_need} pairs "
                f"({need} with headroom), above the 1<<26 bound — the "
                "scene cannot render drop-free at this resolution"
            )
        max_pairs = need
    # A/B knob (VERDICT r3 item 4 — quantify the PSNR cost of residual
    # steady-state drops): scale the probed pair budget, e.g.
    # GSJAX_PAIR_BUDGET_MULT=2 re-runs the tail of a training run with a
    # doubled budget from the same checkpoint
    mult = float(os.environ.get("GSJAX_PAIR_BUDGET_MULT", "1") or 1)
    if mult != 1.0:
        max_pairs = min(
            1 << 26, -(-int(max_pairs * mult) // 65536) * 65536
        )
    # tier_frac safety: the small tier holds the tier_frac*N smallest
    # footprints at mt/4 slots each. An SfM init with mostly-large
    # footprints would tier-cap on iteration 1 and trigger 1-2 back-off
    # recompiles (minutes through the remote-compile tunnel), so start
    # tier_frac at the measured fraction of gaussians fitting the small
    # tier (3% margin, min over probe cameras; count-0 padding rows are
    # always safe and correctly counted — tier assignment spans all rows).
    mt_final = max(mt, settings.max_tiles_per_gauss)
    tier_frac = settings.tier_frac
    if tier_frac > 0:
        mt_small = max(2, mt_final // 4)
        if mt_small <= tier_ks[-1]:
            ki = min(i for i, k in enumerate(tier_ks) if k >= mt_small)
            safe = max(0.0, float(frac_le_min[ki]) - 0.03)
            tier_frac = min(tier_frac, np.floor(safe * 16) / 16)
            if tier_frac < 0.25:  # too small a tier saves no sort time
                tier_frac = 0.0
        else:
            # beyond the probed histogram (only possible above ~4K
            # frames): unvalidated tiering could silently tier-cap at
            # inference, where no back-off reaction exists — disable it
            tier_frac = 0.0
    # expansion strategy: the dense grid pays ~capacity * mt_mix sort
    # slots; when footprint variance forces a big mt (one wide gaussian
    # caps everyone's stride) that explodes far past the real pair count —
    # switch to the budget-sized compact expansion, whose sort is
    # max_pairs entries regardless of mt (gsjax/ops/binning.py).
    expansion = settings.expansion
    cap = state.capacity
    ca = min(int(cap * tier_frac) // 8 * 8, cap)
    grid_slots = ca * max(2, mt_final // 4) + (cap - ca) * mt_final
    if grid_slots > 4 * max_pairs:
        # row-major compact slot ids (binning.py round 5) removed the old
        # capacity*mt < 2^31 eligibility bound — exactly the regime
        # (trained model, one frame-spanning gaussian forcing mt ~2048 at
        # >=1M capacity) where the viewer's probe used to be stuck with
        # an impossible grid
        expansion = "compact"
    if (mt > settings.max_tiles_per_gauss or max_pairs > settings.max_pairs
            or tier_frac != settings.tier_frac
            or expansion != settings.expansion):
        print(
            f"budget probe: max tiles/gauss {mt_need} (cap "
            f"{settings.max_tiles_per_gauss} -> {mt}), pairs {pairs_need} "
            f"(budget {settings.max_pairs} -> {max_pairs}), tier_frac "
            f"{settings.tier_frac} -> {tier_frac}, expansion {expansion}"
        )
    return dataclasses.replace(
        settings,
        max_tiles_per_gauss=mt_final,
        max_pairs=max_pairs,
        tier_frac=float(tier_frac),
        expansion=expansion,
    )


def probe_rasterize_settings(state, cams, width, height, base=None):
    """Inference-time budget sizing: heuristics + on-model footprint probe.

    render.py and the viewers render TRAINED models whose largest
    gaussians can span hundreds of tiles; the static default tile cap
    (mt=16) silently drops their far tiles (observed on the 800² evidence
    scene: ~40% of pairs lost, renders 19 dB below the model's true
    quality). One preprocess probe sizes mt / max_pairs / tier_frac to
    the actual model before the first compile — the same probe the
    trainer runs at startup."""
    s = base or default_rasterize_settings(width, height, state.capacity)
    return _probe_initial_budgets(s, state, cams, width, height,
                                  inference=True)


@dataclasses.dataclass
class TrainerLogs:
    """jsonl always; TensorBoard when available (the reference guards the
    import the same way, train.py:25-29)."""

    jsonl_path: Optional[str] = None
    tb_dir: Optional[str] = None
    _tb: object = None

    def __post_init__(self):
        if self.tb_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(self.tb_dir)
            except Exception:
                print("Tensorboard not available: not logging progress")

    def write(self, record: dict):
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self._tb is not None and "iter" in record:
            it = record["iter"]
            for k, v in record.items():
                if isinstance(v, (int, float)) and k != "iter":
                    self._tb.add_scalar(f"train/{k}", v, it)
                elif isinstance(v, dict):
                    for split, m in v.items():
                        if isinstance(m, dict):
                            for mk, mv in m.items():
                                if isinstance(mv, (int, float)):
                                    self._tb.add_scalar(
                                        f"{split}/{mk}", mv, it
                                    )

    def write_eval_media(self, iteration, images, opacities):
        """Rendered views (first 5), the opacity histogram and the point
        count at test iterations (reference training_report,
        train.py:163-190). TB only; no-op without it."""
        if self._tb is None:
            return
        for name, img in images[:5]:
            self._tb.add_image(
                f"renders/{name}", np.asarray(img), iteration,
                dataformats="HWC",
            )
        self._tb.add_histogram("scene/opacity", np.asarray(opacities),
                               iteration)
        self._tb.add_scalar("scene/total_points", len(opacities), iteration)

    def close(self):
        if self._tb is not None:
            self._tb.close()


def training(
    model: ModelParams,
    opt: OptimizationParams,
    pipe: PipelineParams,
    testing_iterations: Sequence[int] = (7_000, 30_000),
    saving_iterations: Sequence[int] = (7_000, 30_000),
    checkpoint_iterations: Sequence[int] = (),
    start_checkpoint: Optional[str] = None,
    quiet: bool = False,
    settings: Optional[RasterizeSettings] = None,
    capacity: Optional[int] = None,
    gui_callback: Optional[Callable] = None,
    passive_callback: Optional[Callable] = None,
    seed: int = 0,
    steps_per_dispatch: int = 25,
    data_shards: int = 1,
    gauss_shards: int = 1,
    debug_from: int = -1,
    densify_iter_grad: str = "apply",
    wall_budget: float = 0.0,
):
    """Train a scene end-to-end. Returns (scene, final GaussianState).

    ``wall_budget`` > 0: stop GRACEFULLY once that many seconds have
    elapsed — save a checkpoint (``chkpnt<iter>.npz``) and a PLY snapshot,
    then return. Replaces the round-4 ``timeout`` kill: SIGKILLing a
    client mid-dispatch/compile wedges the remote TPU worker for
    ~45-60 min (docs/verify skill gotchas), and a killed run left no
    resume point. Resume with ``--start_checkpoint``.

    ``densify_iter_grad``: "apply" (default) applies every gradient step;
    "discard" reproduces the reference's densify-iteration behavior of
    dropping that step's Adam update (reference train.py:118-128 — its
    tensor surgery leaves ``.grad=None`` so ``optimizer.step()`` is a
    no-op there). A/B evidence: evidence/quality/densify_grad_ab.json.
    """
    if densify_iter_grad not in ("apply", "discard"):
        raise ValueError(f"unknown densify_iter_grad {densify_iter_grad!r}")
    discard_densify_grad = densify_iter_grad == "discard"
    if discard_densify_grad and data_shards * gauss_shards > 1:
        raise ValueError(
            "densify_iter_grad='discard' is single-chip only (the sharded "
            "step does not thread the apply_update flag)"
        )
    random.seed(seed)
    np.random.seed(seed)

    if not model.model_path:
        unique = os.getenv("OAR_JOB_ID", str(int(time.time())))[-10:]
        model.model_path = os.path.join("./output", unique)
    os.makedirs(model.model_path, exist_ok=True)
    save_cfg_args(model.model_path, model)
    logs = TrainerLogs(
        os.path.join(model.model_path, "train_log.jsonl"),
        tb_dir=model.model_path,
    )

    scene = Scene(model, capacity=capacity)
    state = scene.gaussians
    extent = float(scene.cameras_extent)

    train_cams = scene.get_train_cameras()
    # Mixed per-camera resolutions (the reference resizes each camera
    # independently, camera_utils.py:19-52) bucket by size: the largest
    # bucket keeps the chained fast path; other buckets get their own
    # compiled step, built lazily on first use.
    size_buckets: dict = {}
    for i, c in enumerate(train_cams):
        size_buckets.setdefault((c.width, c.height), []).append(i)
    bucket_sizes = sorted(
        size_buckets, key=lambda s: (-len(size_buckets[s]), s)
    )
    bucket_of = {}  # global camera index -> (bucket id, local index)
    bucket_cams = []
    for b, size in enumerate(bucket_sizes):
        idxs = size_buckets[size]
        bucket_cams.append([train_cams[i] for i in idxs])
        for j, i in enumerate(idxs):
            bucket_of[i] = (b, j)
    multi_res = len(bucket_sizes) > 1
    width, height = bucket_sizes[0]

    if settings is None:
        settings = default_rasterize_settings(width, height, state.capacity)
        settings = _probe_initial_budgets(
            settings, state, train_cams, width, height
        )
    cfg = TrainConfig(
        settings=settings,
        lambda_dssim=opt.lambda_dssim,
        white_background=model.white_background,
        random_background=opt.random_background,
        extent=extent,
        compute_cov3d_python=pipe.compute_cov3D_python,
        convert_shs_python=pipe.convert_SHs_python,
    )

    cam_batch = stack_render_cameras(bucket_cams[0])
    images = stack_images(bucket_cams[0])

    tx = make_optimizer(opt, state.spatial_lr_scale)
    opt_state = tx.init(state.params)
    first_iter = 0
    if start_checkpoint:
        def make_template(cap, max_sh, lr_scale):
            s = create_empty(cap, max_sh, lr_scale)
            return s, tx.init(s.params)

        if start_checkpoint.endswith((".pth", ".pt")):
            # a reference torch checkpoint (train.py:130-132)
            from gsjax.train.checkpoint import load_reference_checkpoint

            state, opt_state, first_iter = load_reference_checkpoint(
                start_checkpoint, make_template
            )
        else:
            state, opt_state, first_iter = load_checkpoint(
                start_checkpoint, make_template
            )
        print(f"Restored checkpoint at iteration {first_iter}")

    mesh = None
    if data_shards * gauss_shards > 1 and multi_res:
        raise ValueError(
            "sharded training requires a single training resolution; "
            "pass --resolution to resize"
        )
    if data_shards * gauss_shards > 1:
        from gsjax.parallel import (
            make_mesh,
            make_sharded_train_step,
            shard_gaussian_state,
        )

        mesh = make_mesh(data=data_shards, gauss=gauss_shards)
        state = shard_gaussian_state(state, mesh)
        opt_state = tx.init(state.params)  # moments inherit the sharding
        print(f"Sharded training on mesh {dict(mesh.shape)}")

    def build_step():
        if mesh is not None:
            return make_sharded_train_step(tx, mesh, cam_batch, images, cfg)
        return make_train_step(tx, cam_batch, images, cfg)

    step = build_step()
    n_chain = max(1, int(steps_per_dispatch))
    if multi_res:
        n_chain = 1  # chaining assumes one camera-batch shape
    def build_chained(cfg_now):
        if mesh is not None:
            from gsjax.parallel.shard import make_sharded_train_step_chained

            return make_sharded_train_step_chained(
                tx, mesh, cam_batch, images, cfg_now, n_chain
            )
        return make_train_step_chained(tx, cam_batch, images, cfg_now, n_chain)

    chained = build_chained(cfg) if n_chain > 1 else None
    # lazily-compiled steps for the non-primary resolution buckets; cleared
    # whenever settings or capacity change (the primary rebuild sites)
    extra_bucket_steps: dict = {}

    def bucket_step(b: int):
        fn = extra_bucket_steps.get(b)
        if fn is None:
            fn = make_train_step(
                tx,
                stack_render_cameras(bucket_cams[b]),
                stack_images(bucket_cams[b]),
                cfg,
            )
            extra_bucket_steps[b] = fn
        return fn
    densify_step, reset_step = make_densify_step(opt, cfg)
    render_fn = make_render_fn(cfg)
    bg = jnp.full(3, 1.0 if model.white_background else 0.0, jnp.float32)

    # Background-compile the next capacity bucket's hot step once the
    # active count nears the growth watermark, so the growth itself swaps
    # in a ready executable instead of stalling on a recompile.
    warmer = CapacityWarmer()
    WARM_FRACTION = 0.5  # lead time: ~a capacity-doubling of densification

    def capacity_warm_key(new_c: int):
        return (new_c, dataclasses.astuple(settings), n_chain)

    def start_capacity_warm(new_c: int):
        cfg_now = cfg
        if mesh is not None and chained is not None:
            from gsjax.parallel.shard import make_sharded_train_step_chained

            build = lambda: make_sharded_train_step_chained(  # noqa: E731
                tx, mesh, cam_batch, images, cfg_now, n_chain
            )
            cam_abs = jax.ShapeDtypeStruct((n_chain, data_shards), jnp.int32)
        elif mesh is not None:
            from gsjax.parallel import make_sharded_train_step

            build = lambda: make_sharded_train_step(  # noqa: E731
                tx, mesh, cam_batch, images, cfg_now
            )
            cam_abs = jax.ShapeDtypeStruct((data_shards,), jnp.int32)
        elif chained is not None:
            build = lambda: make_train_step_chained(  # noqa: E731
                tx, cam_batch, images, cfg_now, n_chain
            )
            cam_abs = jax.ShapeDtypeStruct((n_chain,), jnp.int32)
        else:
            build = lambda: make_train_step(  # noqa: E731
                tx, cam_batch, images, cfg_now
            )
            cam_abs = jax.ShapeDtypeStruct((), jnp.int32)
        key_abs = jax.ShapeDtypeStruct(jnp.shape(key), key.dtype)
        state_abs = _grown_abstract(state, state.capacity, new_c)
        opt_abs = _grown_abstract(opt_state, state.capacity, new_c)
        step_args = (state_abs, opt_abs, cam_abs, key_abs)
        if discard_densify_grad and chained is None and mesh is None:
            # the single-step path carries the traced apply_update flag in
            # discard mode — warm the matching 5-arg signature
            step_args = step_args + (jax.ShapeDtypeStruct((), jnp.bool_),)
        jobs = {"step": (build, step_args, {})}
        # densify/reset run every densification_interval — their first call
        # at the new capacity is otherwise an inline (tunnel) recompile.
        # Both use_screen_size variants: the flag flips at
        # opacity_reset_interval, which a warm started just before it would
        # otherwise guess wrong.
        if mesh is None:  # sharded densify re-shards inline; not AOT-warmed
            for us in (False, True):
                jobs[f"densify_{us}"] = (
                    lambda: make_densify_step(opt, cfg_now)[0],
                    (state_abs, opt_abs, key_abs),
                    {"use_screen_size": us},
                )
            jobs["reset"] = (
                lambda: make_densify_step(opt, cfg_now)[1],
                (state_abs, opt_abs),
                {},
            )
        warmer.maybe_start(capacity_warm_key(new_c), jobs)

    # Iterations at which post-step work happens (densify/reset/eval/save/
    # checkpoint); a chained dispatch may END on one but not cross one.
    def is_densify_iter(i: int) -> bool:
        return (
            i < opt.densify_until_iter
            and i > opt.densify_from_iter
            and i % opt.densification_interval == 0
        )

    def is_event(i: int) -> bool:
        if i in testing_iterations or i in saving_iterations:
            return True
        if i in checkpoint_iterations or i == opt.iterations:
            return True
        if i < opt.densify_until_iter:
            if is_densify_iter(i):
                return True
            if i % opt.opacity_reset_interval == 0:
                return True
            if model.white_background and i == opt.densify_from_iter:
                return True
        return False

    def chain_len(i: int) -> int:
        """How many steps starting at iteration i can run in one dispatch."""
        if discard_densify_grad and is_densify_iter(i):
            return 1  # must run via the single step carrying apply_update
        k = 1
        while k < n_chain:
            nxt = i + k
            if nxt % 1000 == 0:  # SH ramp happens before the step at nxt
                break
            if discard_densify_grad and is_densify_iter(nxt):
                break  # next iteration needs the single-step path
            if is_event(nxt - 1):  # post-step work after iteration nxt - 1
                break
            k += 1
        return k

    def pop_camera() -> int:
        if not viewpoint_stack:
            viewpoint_stack.extend(range(len(train_cams)))
        return viewpoint_stack.pop(random.randint(0, len(viewpoint_stack) - 1))

    key = jax.random.PRNGKey(seed)
    viewpoint_stack: List[int] = []
    ema_loss = 0.0
    t_start = time.time()
    it_times = []
    _last_progress = [time.time()]  # slow runs print at least every ~30s

    iteration = first_iter
    while iteration < opt.iterations:
        iteration += 1

        if gui_callback is not None:
            gui_callback(iteration, state, render_fn)
        if passive_callback is not None:
            # passive observers (the local web viewer) see the freshest
            # state but, unlike the SIBR bridge, don't force chain=1
            passive_callback(iteration, state, render_fn)

        # --debug_from: from this iteration on, trap non-finite values at
        # their producing op (reference flips the rasterizer's debug dumps
        # on at the same point, train.py:102-103)
        if debug_from >= 0 and iteration - 1 == debug_from:
            jax.config.update("jax_debug_nans", True)
            print(f"[ITER {iteration}] debug mode on (jax_debug_nans)",
                  flush=True)

        # SH-degree ramp (reference train.py:72-73)
        if iteration % 1000 == 0:
            state = dataclasses.replace(
                state,
                active_sh_degree=jnp.minimum(
                    state.active_sh_degree + 1, state.max_sh_degree
                ),
            )

        k_len = chain_len(iteration) if gui_callback is None else 1
        key, k = jax.random.split(key)
        t0 = time.time()
        if chained is not None and k_len == n_chain:
            if mesh is not None:
                cam_idxs = jnp.asarray(
                    [[pop_camera() for _ in range(data_shards)]
                     for _ in range(n_chain)],
                    jnp.int32,
                )
            else:
                cam_idxs = jnp.asarray(
                    [bucket_of[pop_camera()][1] for _ in range(n_chain)],
                    jnp.int32,
                )
            state, opt_state, metrics = chained(state, opt_state, cam_idxs, k)
            loss = float(metrics["loss_mean"])
            n_stepped = n_chain
        else:
            if mesh is not None:
                cam_idx = jnp.asarray(
                    [pop_camera() for _ in range(data_shards)], jnp.int32
                )
                state, opt_state, metrics = step(state, opt_state, cam_idx, k)
            else:
                b, local = bucket_of[pop_camera()]
                cam_idx = jnp.int32(local)
                fn = step if b == 0 else bucket_step(b)
                if discard_densify_grad:
                    # reference-exact: densify iterations render + collect
                    # stats but drop the Adam update (train.py:118-128)
                    apply = jnp.bool_(not is_densify_iter(iteration))
                    state, opt_state, metrics = fn(
                        state, opt_state, cam_idx, k, apply
                    )
                else:
                    state, opt_state, metrics = fn(
                        state, opt_state, cam_idx, k
                    )
            loss = float(metrics["loss"])
            n_stepped = 1
        dt = time.time() - t0
        it_times.extend([dt / n_stepped] * n_stepped)
        iteration += n_stepped - 1

        # kick the next-bucket background compile as soon as occupancy
        # crosses the watermark — lead time before the growth (at 0.9) is
        # what lets the compile finish off the critical path
        if int(metrics["num_active"]) > WARM_FRACTION * state.capacity:
            start_capacity_warm(state.capacity * 2)

        if not np.isfinite(loss):
            # crash forensics (the reference's rasterizer debug dump,
            # reference README.md:143-146): with --debug, snapshot the full
            # training state for offline repro before aborting
            if pipe.debug:
                dump = os.path.join(
                    model.model_path or ".", f"snapshot_{iteration}.npz"
                )
                np.savez(
                    dump,
                    iteration=iteration,
                    cam_idx=np.asarray(cam_idx if n_stepped == 1 else cam_idxs),
                    active=np.asarray(state.active),
                    **{f"param_{kk}": np.asarray(v)
                       for kk, v in state.params.items()},
                )
                print(f"[ITER {iteration}] non-finite loss; dumped {dump}",
                      flush=True)
            raise FloatingPointError(
                f"non-finite loss {loss} at iteration {iteration}"
                + ("" if pipe.debug else " (re-run with --debug for a dump)")
            )

        ema_loss = 0.4 * loss + 0.6 * ema_loss

        # pair overflow: grow the exhausted budget and recompile (the
        # reference never drops — its CUDA rasterizer allocates the key
        # buffer per frame). Two distinct causes, each with its own knob:
        # the global pair budget, and the per-gaussian tile cap (whose
        # drops a bigger max_pairs alone can never clear).
        mt_capped = int(metrics.get("num_mt_capped_pairs", 0))
        if "num_budget_dropped" in metrics:  # chained: per-step difference
            budget_dropped = int(metrics["num_budget_dropped"])
        else:
            budget_dropped = int(metrics["num_dropped_pairs"]) - mt_capped
        tile_capped = int(metrics.get("num_tile_capped", 0))
        # tier-capped pairs are a subset of mt-capped ones whose loss is the
        # small-tier slot width, not max_tiles_per_gauss — growing mt can't
        # recover them; shrinking tier_frac (fewer gaussians forced into the
        # small tier) does.
        tier_capped = int(metrics.get("num_tier_capped_pairs", 0))
        # chained runs pre-difference mt - tier per inner step (see
        # make_train_step_chained): two maxima from different steps can
        # cancel and mask a genuine mt overflow
        mt_only = int(
            metrics.get("num_mt_only_capped", mt_capped - tier_capped)
        )
        grow_budget = budget_dropped > 0 and settings.max_pairs < (1 << 26)
        # the per-gaussian tile cap may grow to the point where either (a)
        # one gaussian can cover the whole frame (no cap can drop pairs),
        # or (b) the dense expansion grid would exceed a memory/sort bound
        # (~64M slots — at bench scale, capacity 2^20 / tier 0.875, that is
        # mt=128; a small scene can afford full-frame mt). A fixed mt=128
        # ceiling silently dropped ~6% of pairs/frame on the 800² evidence
        # scene, whose trained state keeps ~10% of gaussians wider than 16
        # tiles (max ~600).
        tiles_total = -(-width // 16) * -(-height // 16)
        mt_frame_cap = 2 ** int(np.ceil(np.log2(max(tiles_total, 2))))

        def _expansion_slots(mt):
            tf = settings.tier_frac
            ca = min(int(state.capacity * tf) // 8 * 8, state.capacity)
            return ca * max(2, mt // 4) + (state.capacity - ca) * mt

        def _mt_cap_compact():
            # compact expansion sorts max_pairs entries whatever mt is,
            # and its row-major slot ids (< max_pairs, round 5) removed
            # the old capacity*mt < 2^31 virtual-slot bound — mt may grow
            # to the full-frame cap outright
            return mt_frame_cap

        new_expansion = settings.expansion
        if settings.expansion == "compact":
            mt_cap = _mt_cap_compact()
        else:
            mt_cap = 16
            while (mt_cap < mt_frame_cap
                   and _expansion_slots(mt_cap * 2) <= (1 << 26)):
                mt_cap *= 2
            if (mt_only > 0 and settings.max_tiles_per_gauss >= mt_cap
                    and _mt_cap_compact() > mt_cap):
                # the grid hit its slot-memory bound with pairs still
                # capped — the compact expansion affords a bigger mt at
                # max_pairs sort cost
                new_expansion = "compact"
                mt_cap = _mt_cap_compact()
        grow_mt = mt_only > 0 and settings.max_tiles_per_gauss < mt_cap
        # a2a splat-exchange send-budget overflow: splats silently vanish
        # from the owning strip otherwise — double the per-destination rows
        exch_dropped = int(metrics.get("num_exchange_dropped", 0))
        grow_a2a = exch_dropped > 0 and settings.splat_exchange == "a2a"
        back_off_tier = tier_capped > 0 and settings.tier_frac > 0
        # the XLA compositor's fixed scan depth truncated a live tile (the
        # Pallas kernel never caps; this fires on CPU/sharded runs only)
        grow_mspt = tile_capped > 0 and settings.max_splats_per_tile < (1 << 16)
        if (grow_budget or grow_mt or grow_mspt or back_off_tier
                or grow_a2a or new_expansion != settings.expansion):
            new_budget = settings.max_pairs * (2 if grow_budget else 1)
            new_mt = settings.max_tiles_per_gauss * (2 if grow_mt else 1)
            new_mspt = settings.max_splats_per_tile * (2 if grow_mspt else 1)
            new_tier = settings.tier_frac
            if back_off_tier:
                new_tier = settings.tier_frac / 2
                if new_tier < 0.25:  # too small a tier saves no sort time
                    new_tier = 0.0
            new_a2a = settings.a2a_rows
            if grow_a2a:
                from gsjax.parallel.shard import _a2a_rows_auto

                new_a2a = 2 * _a2a_rows_auto(
                    state.capacity // max(gauss_shards, 1),
                    max(gauss_shards, 1), settings.a2a_rows,
                )
            print(
                f"[ITER {iteration}] pair overflow "
                f"(budget dropped {budget_dropped}, tile-capped {mt_capped}, "
                f"tier-capped {tier_capped}, tile-truncated {tile_capped}, "
                f"exchange-dropped {exch_dropped}): "
                f"max_pairs {settings.max_pairs} -> {new_budget}, "
                f"tile cap {settings.max_tiles_per_gauss} -> {new_mt}, "
                f"splats/tile {settings.max_splats_per_tile} -> {new_mspt}, "
                f"tier_frac {settings.tier_frac} -> {new_tier}, "
                f"a2a rows {settings.a2a_rows} -> {new_a2a}, "
                f"expansion {new_expansion}",
                flush=True,
            )
            # --quiet swallows stdout (reference safe_state semantics), so
            # budget reactions also land in the jsonl for post-hoc forensics
            logs.write({
                "iter": iteration, "event": "pair_overflow",
                "budget_dropped": budget_dropped, "mt_capped": mt_capped,
                "tier_capped": tier_capped, "tile_truncated": tile_capped,
                "exchange_dropped": exch_dropped,
                "max_pairs": new_budget, "max_tiles_per_gauss": new_mt,
                "max_splats_per_tile": new_mspt, "tier_frac": new_tier,
                "a2a_rows": new_a2a, "expansion": new_expansion,
            })
            settings = dataclasses.replace(
                settings, max_pairs=new_budget, max_tiles_per_gauss=new_mt,
                max_splats_per_tile=new_mspt, tier_frac=new_tier,
                a2a_rows=new_a2a, expansion=new_expansion,
            )
            cfg = dataclasses.replace(cfg, settings=settings)
            step = None
            step = build_step()
            extra_bucket_steps.clear()
            if chained is not None:
                chained = build_chained(cfg)
            densify_step, reset_step = make_densify_step(opt, cfg)
            render_fn = make_render_fn(cfg)
        elif (budget_dropped > 0 or mt_only > 0 or tier_capped > 0
              or tile_capped > 0) and iteration % 100 == 0:
            # residual drops with NO reaction available: every relevant
            # growth knob is pinned at its ceiling (VERDICT r3 weak #3 —
            # the 30k evidence run dropped 10-26k pairs/step at steady
            # state with nothing in the log saying WHICH bound saturated).
            # Rate-limited to the regular logging cadence.
            pinned = []
            if budget_dropped > 0 and settings.max_pairs >= (1 << 26):
                pinned.append("max_pairs@1<<26")
            if mt_only > 0 and settings.max_tiles_per_gauss >= mt_cap:
                pinned.append(
                    f"max_tiles_per_gauss@{settings.max_tiles_per_gauss}"
                    f"(cap {mt_cap}, expansion {settings.expansion})"
                )
            if tier_capped > 0 and settings.tier_frac == 0:
                pinned.append("tier_frac@0")
            if tile_capped > 0 and settings.max_splats_per_tile >= (1 << 16):
                pinned.append("max_splats_per_tile@1<<16")
            logs.write({
                "iter": iteration, "event": "pair_overflow_pinned",
                "budget_dropped": budget_dropped, "mt_capped": mt_capped,
                "tier_capped": tier_capped, "tile_truncated": tile_capped,
                "ceiling_pinned": pinned,
            })
            if not quiet:
                print(
                    f"[ITER {iteration}] residual pair drops "
                    f"(budget {budget_dropped}, mt {mt_only}, tier "
                    f"{tier_capped}) with ceilings pinned: "
                    f"{', '.join(pinned) or 'unknown'}",
                    flush=True,
                )

        if iteration % 100 == 0 or (
            not quiet and time.time() - _last_progress[0] > 30
        ):
            n_act = int(metrics["num_active"])
            k = min(len(it_times), 100)
            rate = k / max(sum(it_times[-k:]), 1e-9)
            _last_progress[0] = time.time()
            if not quiet:
                print(
                    f"[ITER {iteration}] loss {ema_loss:.5f} | gaussians {n_act} | "
                    f"{rate:.2f} it/s",
                    flush=True,
                )
            logs.write(
                {
                    "iter": iteration,
                    "loss": loss,
                    "ema_loss": ema_loss,
                    "num_active": n_act,
                    "dropped_pairs": int(metrics["num_dropped_pairs"]),
                    "it_per_s": rate,
                }
            )

        if iteration in testing_iterations:
            media = []
            report = evaluate_state(
                state, scene, render_fn, bg, num_train_views=5, media=media
            )
            print(f"[ITER {iteration}] eval: {report}", flush=True)
            logs.write({"iter": iteration, "eval": report})
            active = np.asarray(state.active)
            opacities = 1.0 / (
                1.0 + np.exp(-np.asarray(state.params["opacity"])[active, 0])
            )
            logs.write_eval_media(iteration, media, opacities)

        if iteration in saving_iterations:
            print(f"[ITER {iteration}] Saving Gaussians", flush=True)
            scene.save(iteration, state)

        # Densification (reference train.py:112-123)
        if iteration < opt.densify_until_iter:
            if (
                iteration > opt.densify_from_iter
                and iteration % opt.densification_interval == 0
            ):
                key, k = jax.random.split(key)
                use_screen = iteration > opt.opacity_reset_interval
                state, opt_state, dstats = densify_step(
                    state, opt_state, k, use_screen_size=use_screen
                )
                n_act = int(state.num_active)
                logs.write({
                    "iter": iteration, "event": "densify",
                    "cloned": int(dstats.num_cloned),
                    "split": int(dstats.num_split),
                    "pruned": int(dstats.num_pruned),
                    "pruned_opacity": int(dstats.num_pruned_opacity),
                    "pruned_screen": int(dstats.num_pruned_screen),
                    "pruned_world": int(dstats.num_pruned_world),
                    "add_dropped": int(dstats.num_dropped),
                    "num_active": n_act,
                })
                if int(dstats.num_dropped) > 0 or n_act > GROW_WATERMARK * state.capacity:
                    t_grow = time.time()
                    old_c, new_c = state.capacity, state.capacity * 2
                    # (the r3-r4 capacity*mt < 2^31 re-clamp is gone: the
                    # compact expansion's row-major slot ids are bounded
                    # by max_pairs, not capacity*mt — binning.py round 5)
                    warmed = warmer.take(capacity_warm_key(new_c)) or {}
                    wstep = warmed.get("step")
                    print(
                        f"[ITER {iteration}] growing capacity {old_c} -> {new_c}"
                        + (f" (precompiled: {sorted(warmed)})" if warmed else ""),
                        flush=True,
                    )
                    state = grow_capacity(state, new_c)
                    opt_state = grow_opt_state(opt_state, old_c, new_c)
                    if mesh is not None:
                        state = shard_gaussian_state(state, mesh)
                    step = None  # drop stale closure before recompile
                    step = build_step()
                    extra_bucket_steps.clear()
                    if chained is not None:
                        if wstep is not None:
                            cfg_now = cfg
                            chained = _with_fallback(
                                wstep,
                                lambda: build_chained(cfg_now),
                            )
                        else:
                            chained = build_chained(cfg)
                    elif wstep is not None:
                        step = _with_fallback(wstep, build_step)
                    densify_step, reset_step = make_densify_step(opt, cfg)
                    if any(k.startswith("densify_") for k in warmed):
                        densify_step = _warmed_densify(warmed, densify_step)
                    if "reset" in warmed:
                        inline_reset = reset_step
                        reset_step = _with_fallback(
                            warmed["reset"], lambda: inline_reset
                        )
                    # soak evidence: the growth pause (state surgery +
                    # executable swap; warmed growths skip the recompile)
                    print(
                        f"[ITER {iteration}] growth pause "
                        f"{time.time() - t_grow:.2f}s", flush=True,
                    )
                    logs.write({
                        "iter": iteration, "event": "capacity_growth",
                        "capacity": new_c,
                        "precompiled": sorted(warmed),
                        "pause_s": round(time.time() - t_grow, 2),
                    })

            if iteration % opt.opacity_reset_interval == 0 or (
                model.white_background and iteration == opt.densify_from_iter
            ):
                state, opt_state = reset_step(state, opt_state)

        if iteration in checkpoint_iterations:
            print(f"[ITER {iteration}] Saving Checkpoint", flush=True)
            save_checkpoint(
                os.path.join(model.model_path, f"chkpnt{iteration}.npz"),
                state,
                opt_state,
                iteration,
            )

        stop_file = os.path.join(model.model_path, "STOP")
        stop_req = os.path.exists(stop_file)
        if stop_req:
            os.remove(stop_file)
        if (wall_budget > 0 and time.time() - t_start > wall_budget) \
                or stop_req:
            print(
                f"[ITER {iteration}] "
                + ("STOP file" if stop_req else
                   f"wall budget ({wall_budget:.0f}s)")
                + " — saving checkpoint + snapshot and stopping",
                flush=True,
            )
            save_checkpoint(
                os.path.join(model.model_path, f"chkpnt{iteration}.npz"),
                state, opt_state, iteration,
            )
            scene.gaussians = state
            scene.save(iteration)
            logs.write({"iter": iteration, "event": "wall_budget_stop",
                        "budget_s": wall_budget})
            break

    wall = time.time() - t_start
    logs.close()
    if not quiet:
        print(f"Training complete in {wall:.1f}s", flush=True)
    scene.gaussians = state
    return scene, state


def evaluate_state(
    state, scene, render_fn, bg, num_train_views=5, media=None
):
    """Test-split + first-k-train-view L1/PSNR
    (reference training_report, train.py:156-191). When ``media`` is a
    list, up to 5 (name, HWC image) pairs are appended for TB logging."""
    report = {}
    configs = [
        ("test", scene.get_test_cameras()),
        ("train", scene.get_train_cameras()[:num_train_views]),
    ]
    for name, cams in configs:
        if not cams:
            continue
        l1s, psnrs = [], []
        for i, cam in enumerate(cams):
            img = render_fn(state, cam.to_render_camera(), bg)
            img = jnp.clip(img, 0.0, 1.0)
            gt = jnp.clip(jnp.asarray(cam.image), 0.0, 1.0)
            l1s.append(float(l1_loss(img, gt)))
            psnrs.append(float(psnr(img, gt)))
            if media is not None and i < 5 and len(media) < 5:
                media.append((f"{name}_{cam.image_name}", np.asarray(img)))
        report[name] = {
            "l1": float(np.mean(l1s)),
            "psnr": float(np.mean(psnrs)),
            "n_views": len(cams),
        }
    return report
