"""Benchmark: 6-view 424x800 17-frame generation, per-denoise-step latency on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value = 6-view composite frames per second per chip for the full 30-step batched-CFG
rectified-flow denoise (BASELINE.json north-star metric; VAE decode excluded).

Measurement notes:
- Steps are CHAINED inside one jitted fori_loop and synced by a device->host read of
  the result; timing individual dispatches is unreliable through the axon TPU relay
  (async dispatch returns before execution).
- FLOPs are analytic (attention + matmul terms of the DiT): XLA cost_analysis counts
  each nn.scan layer body once, undercounting the 28-deep stack ~10x.

vs_baseline: the reference publishes memory and train-iteration times, not inference
latency (BASELINE.md). We compare against an estimated H20 per-chip figure: the same
model FLOPs at 148 TFLOP/s bf16 dense with 40% MFU — an optimistic stand-in for the
CUDA reference on its own hardware. >1.0 means faster than that estimate.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

H20_BF16_FLOPS = 148e12
H20_ASSUMED_MFU = 0.40
V5E_PEAK_FLOPS = 197e12
NUM_STEPS = 30
NUM_FRAMES, HEIGHT, WIDTH = 17, 424, 800
CHAINED_STEPS = 4  # timed steps fused in one executable


def estimate_step_flops(cfg, B, T, S, L_cond, T_img) -> float:
    """Analytic forward FLOPs for one batched-CFG model call (matmul terms only).

    B = b * NC * 2(cfg); T/S latent grid after patchify; L_cond condition tokens.
    """
    C = cfg.hidden_size
    N = B * T * S  # total tokens
    f = 0.0
    # per spatial/temporal base block: qkv 3C^2 + proj C^2 + mlp 8C^2 (MACs)
    per_block_proj = 12 * C * C
    # attention: 2 * seqlen * C MACs per token
    attn_s = 2 * S * C
    attn_t = 2 * T * C
    # cross-attn: q C^2 + proj C^2 per token; kv 2C^2 per cond token; attn 2*L*C
    cross = 2 * C * C + 2 * L_cond * C
    # cross-view: qkv+proj over 2 neighbors (q duplicated) + attn 2S*C each
    n_nbr = len(cfg.mv_order_map[0])
    cross_view = n_nbr * (4 * C * C + 2 * S * C)
    depth = cfg.depth
    ctrl = cfg.control_depth
    total_macs = 0.0
    # base spatial blocks: proj + attn_s + cross + cross_view
    total_macs += depth * N * (per_block_proj + attn_s + cross + cross_view)
    # base temporal blocks: proj + attn_t + cross (no cross-view)
    total_macs += depth * N * (per_block_proj + attn_t + cross)
    # control spatial blocks (skip cross-view by default)
    total_macs += ctrl * N * (per_block_proj + attn_s + cross)
    # kv projections for cond tokens
    total_macs += (2 * depth + ctrl) * B * T * L_cond * 2 * C * C
    # patchify/final/map embedders (small)
    total_macs += N * 4 * C * C
    return 2.0 * total_macs  # MAC -> FLOP


def build_train_step(num_frames=17, height=224, width=400, tiny=False,
                     remat=None):
    """Build + compile the single-chip fwd+bwd train step used by
    train_step_metric (also imported by tools/perf_lab.py trainprofile).
    Returns (step, params, batch, remat_used, plan_mem_gb)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _fast_init, _flagship_config
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import MagicDriveSTDiT3
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch
    from magicdrive_v2_tpu.schedulers.rf import RFLOW

    cfg = _flagship_config(tiny=tiny, dtype=jnp.float32 if tiny else jnp.bfloat16)
    # "dots" remat bills ~3.1x fwd FLOPs instead of full remat's 4x (docs/
    # PERF.md r4 MFU analysis) — but r5 MEASURED its single-chip walls: 18.67
    # GB at 224x400x9f (queue log .r5), so the 17f anchor cannot fit dots on a
    # 16 GB chip, and attempting it risks crashing the relay compile helper
    # right before the full-remat fallback (the r4/r5 lost-datapoint mode).
    # Default to full remat; MDV2_BENCH_TRY_DOTS=1 re-enables the attempt.
    # `remat` pins the policy explicitly (no env, no fallback) — used by the
    # dots-vs-full A/B phase at a shape where dots executes (train_dots_ab).
    try_dots = remat == "dots" if remat is not None else \
        os.environ.get("MDV2_BENCH_TRY_DOTS") == "1"
    cfg = dataclasses.replace(cfg, grad_checkpoint=True,
                              remat_policy=remat or
                              ("dots" if try_dots else "full"))
    model = MagicDriveSTDiT3(cfg)
    batch = synthetic_batch(cfg, num_frames=num_frames, height=height, width=width,
                            l_txt=60, b=1,
                            map_size=(8, 80, 80) if tiny else (8, 400, 400))
    batch.pop("height"), batch.pop("width")
    batch.pop("timestep")
    params = _fast_init(model, {**batch, "timestep": jnp.full((1,), 500.0),
                                "height": float(height), "width": float(width)})
    if not tiny:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            params)
    batch["mask"] = jnp.ones((1, batch["x"].shape[2]), jnp.float32)
    batch = jax.device_put(batch)

    scheduler = RFLOW(num_timesteps=1000, use_timestep_transform=True,
                      cog_style_trans=True)

    def fwd_bwd(params, batch, rng):
        cond = {k: batch[k] for k in ("y", "maps", "bbox", "cams", "rel_pos",
                                      "fps")}
        hw = dict(height=jnp.full((1,), float(height)),
                  width=jnp.full((1,), float(width)),
                  num_frames=jnp.full((1,), float(num_frames)))

        def loss_fn(p):
            def model_fn(x_t, t, x_mask):
                return model.apply(p, x_t, t, **cond, height=float(height),
                                   width=float(width), x_mask=x_mask)
            out = scheduler.training_losses(model_fn, rng, batch["x"],
                                            mask=batch["mask"], **hw)
            return out["loss"].mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, optax.global_norm(grads)

    remat_used = cfg.remat_policy if (try_dots or remat) else \
        "full(dots-skipped: measured 18.67G wall at 224p9f, r5)"

    def mk():  # fwd_bwd closes over `model`, re-traced per attempt
        return jax.jit(fwd_bwd).lower(params, batch,
                                      jax.random.PRNGKey(0)).compile()

    if remat is not None:
        # pinned policy: compile as-is, no fallback (A/B measurement phase)
        step = _compile_with_retry(mk, retries=1, sleep_s=45.0)
        return step, params, batch, remat_used, _plan_mem_gb(step)

    if not try_dots:
        # retries=3/45s: a helper crash wedges the relay for ~a minute
        # (r5 queue log: the instant fallback recompile after a dots crash
        # failed too; 60 s later the same program compiled)
        step = _compile_with_retry(mk, retries=3, sleep_s=45.0)
        return step, params, batch, remat_used, _plan_mem_gb(step)

    try:
        # retries=0: when the relay crashes on the dots program (r4/r5 failure
        # mode), fall straight through to full remat instead of burning a
        # second ~10 min compile on a plan that r4 measured far over-HBM
        step = _compile_with_retry(mk, retries=0)
    except Exception as e:
        # fall back to full remat on a memory wall OR a persistent relay
        # compile failure (dots produces a much larger buffer plan; the r4
        # first run crashed the relay's compile helper on exactly this program)
        wall = _mem_wall_gb(e)
        if wall is None and not _is_transient_compile_error(e):
            raise
        model = MagicDriveSTDiT3(dataclasses.replace(cfg, remat_policy="full"))
        # record WHY dots was skipped so the emitted datapoint distinguishes a
        # measured memory wall from relay flakiness (r4 advisor finding)
        remat_used = (f"full(dots-mem-wall:{wall}G)" if wall is not None
                      else "full(dots-relay-failed)")
        step = _compile_with_retry(mk, retries=3, sleep_s=45.0)
    return step, params, batch, remat_used, _plan_mem_gb(step)


def train_step_metric():
    """Single-chip training-iteration throughput, FLOPs-normalized against the
    reference's 424x800x17f anchor.

    Reference anchor (BASELINE.md rows 21-28): 32-34 s/it at bs=6 per dp-group
    on 32 GPUs with sp=4 (48 samples/iter). That bucket does NOT fit one 16 GB
    v5e chip unsharded (the reference spreads it over four 96 GB H20s; the XLA
    memory plan wants ~28 GB), so the single-chip bench runs the 6x224x400x17f
    bucket and compares model-FLOPs/s/chip: ours = train_flops(224p)/t_it,
    reference = 48 * train_flops(424p sample) / (33 s * 32 chips), train FLOPs
    = 3x forward (both sides train with grad checkpointing, so the remat
    multiplier cancels). Diffusion fwd+bwd+grad-norm only: the flagship has
    2.04B params, so optimizer/EMA state (11.5 GB even in bf16) cannot live on
    one 16 GB chip — the reference equally shards it via ZeRO-2 across 32 GPUs
    (and offloads the Adam update to CPU with HybridAdam); in our recipe FSDP
    shards it across dp (__graft_entry__.dryrun_multichip runs the FULL
    loss+AdamW+EMA step sharded). The excluded update is one elementwise pass
    over the states (~30 ms analytic, <2% of the step). The reference's s/it
    also carries VAE/text encode + data loading, flattering their number.
    """
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config

    num_frames, height, width = 17, 224, 400
    cfg = _flagship_config(tiny=False, dtype=jnp.bfloat16)
    step, params, batch, remat_used, plan_mem = build_train_step(
        num_frames, height, width)
    loss, gn = step(params, batch, jax.random.PRNGKey(0))  # first run
    _ = float(loss)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        loss, gn = step(params, batch, jax.random.PRNGKey(i + 1))
        _ = float(loss)
        times.append(time.perf_counter() - t0)
    t_it = float(np.median(times))
    l_cond = 2 + 60 + 10
    # ours: 6-view no-CFG forward at 224p; x3 for fwd+bwd
    T224, S224 = 5, (224 // 16) * (400 // 16)
    our_flops = 3.0 * estimate_step_flops(cfg, 6, T224, S224, l_cond, num_frames)
    # reference per-iteration flops at its 424p bucket, per chip
    T424, S424 = 5, (424 // 16 + 1) * (800 // 16)
    ref_sample_flops = 3.0 * estimate_step_flops(cfg, 6, T424, S424, l_cond, 17)
    ref_flops_chip = 48 * ref_sample_flops / (33.0 * 32)
    our_flops_chip = our_flops / t_it
    out = dict(train_step_s=round(t_it, 3),
               train_plan_mem_gb=plan_mem,
               train_tflops_per_s_chip=round(our_flops_chip / 1e12, 1),
               train_vs_baseline=round(our_flops_chip / ref_flops_chip, 4),
               train_shape=f"6x{height}x{width}x{num_frames}f bs=1 "
                           f"remat={remat_used} fwd+bwd (optimizer sharded "
                           "in real recipe)")
    mem = _peak_mem_gb()
    if mem is not None:
        out["train_peak_mem_gb"] = mem
    return out


def train_dots_ab_metric():
    """dots-vs-full remat A/B at 6x160x288x9f — the largest flagship-depth
    shape where the dots plan executes on one 16 GB chip (r5 wall ladder:
    dots hits 12.96 GB already at 224x400x5f). Measured r5 (this phase on
    the v5e): dots 0.630 s (plan 20.06 GB) vs full 0.666 s (plan 11.39 GB),
    speedup 1.056 — far below the 4/3.1 FLOPs-billing arithmetic
    (~29%), because at this token count (3.2k) the step is dominated by
    HBM-bound elementwise/norm traffic that remat re-runs either way; the
    billing argument only pays off at token counts that exceed single-chip
    HBM under dots. Evidence that `dots` EXECUTES on silicon with finite
    loss/grads, completing the policy's story: single-chip it buys <10% at
    the only shapes that fit, and the compiled sharded plans (docs/
    SCALING.md) show GSPMD replicates its saved buffers across sp — so
    `full` remat is the production policy at every scale."""
    import gc

    import jax

    res = {}
    times = {}
    # full first (11 GB plan, known-fits) so a dots OOM — the 19.6 GB dots
    # plan is borderline on this chip and failed once when a lingering
    # process still held HBM — can't erase the whole A/B
    for policy in ("full", "dots"):
        try:
            step, params, batch, _used, plan = build_train_step(
                num_frames=9, height=160, width=288, remat=policy)
            loss, _gn = step(params, batch, jax.random.PRNGKey(0))
            _ = float(loss)
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                loss, _gn = step(params, batch, jax.random.PRNGKey(i + 1))
                _ = float(loss)
                ts.append(time.perf_counter() - t0)
            times[policy] = float(np.median(ts))
            res[f"train160_{policy}_step_s"] = round(times[policy], 3)
            res[f"train160_{policy}_plan_gb"] = plan
        except Exception as e:
            res[f"train160_{policy}_error"] = f"{type(e).__name__}: {e}"[:200]
        finally:
            # drop the compiled program + device buffers before the next
            # policy compiles its (larger) plan into the same HBM arena
            step = params = batch = loss = _gn = None
            gc.collect()
    if "dots" in times and "full" in times:
        res["train160_dots_speedup"] = round(times["full"] / times["dots"], 3)
    res["train160_shape"] = "6x160x288x9f bs=1 fwd+bwd dots-vs-full A/B"
    return res


def train424_metric():
    """The reference anchor shape on ONE chip: 6x424x800x17f bs=1 fwd+bwd with
    remat + differentiable scan-chunked attention (MDV2_TRAIN_CHUNK_ATTN
    bounds fp32-logit transients in fwd AND bwd — the r2 memory wall was the
    XLA plan's ~28 GB of attention transients). Reference: 32-34 s/it at bs=6
    per dp-group on 32 GPUs sp=4 (BASELINE.md rows 21-28). Memory figure:
    train424_plan_mem_gb (XLA allocation plan) — peak_bytes_in_use is
    process-cumulative and the 848p phase runs earlier, so it is not read
    here."""
    import dataclasses
    import gc

    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _fast_init, _flagship_config
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import MagicDriveSTDiT3
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch
    from magicdrive_v2_tpu.schedulers.rf import RFLOW

    os.environ["MDV2_TRAIN_CHUNK_ATTN"] = "1"
    try:
        num_frames, height, width = 17, 424, 800
        cfg = _flagship_config(tiny=False, dtype=jnp.bfloat16)
        cfg = dataclasses.replace(cfg, grad_checkpoint=True)
        model = MagicDriveSTDiT3(cfg)
        batch = synthetic_batch(cfg, num_frames=num_frames, height=height,
                                width=width, l_txt=60, b=1,
                                map_size=(8, 400, 400))
        batch.pop("height"), batch.pop("width")
        batch.pop("timestep")
        params = _fast_init(model, {**batch, "timestep": jnp.full((1,), 500.0),
                                    "height": float(height),
                                    "width": float(width)})
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            params)
        batch["mask"] = jnp.ones((1, batch["x"].shape[2]), jnp.float32)
        batch = jax.device_put(batch)
        gc.collect()
        scheduler = RFLOW(num_timesteps=1000, use_timestep_transform=True,
                          cog_style_trans=True)

        def compile_step(remat_policy):
            m = MagicDriveSTDiT3(dataclasses.replace(cfg,
                                                     remat_policy=remat_policy))

            def fwd_bwd(params, batch, rng):
                cond = {k: batch[k] for k in ("y", "maps", "bbox", "cams",
                                              "rel_pos", "fps")}
                hw = dict(height=jnp.full((1,), float(height)),
                          width=jnp.full((1,), float(width)),
                          num_frames=jnp.full((1,), float(num_frames)))

                def loss_fn(p):
                    def model_fn(x_t, t, x_mask):
                        return m.apply(p, x_t, t, **cond, height=float(height),
                                       width=float(width), x_mask=x_mask)
                    out = scheduler.training_losses(model_fn, rng, batch["x"],
                                                    mask=batch["mask"], **hw)
                    return out["loss"].mean()

                loss, grads = jax.value_and_grad(loss_fn)(params)
                return loss, optax.global_norm(grads)

            return jax.jit(fwd_bwd).lower(params, batch,
                                          jax.random.PRNGKey(0)).compile()

        res = {}

        def fallthrough(err, key):
            """Record why a policy failed; raise only on a real code bug."""
            wall = _mem_wall_gb(err)
            if wall is None and not _is_transient_compile_error(err):
                raise err
            if wall is not None:
                res[key] = wall
            return wall

        try:
            # cheapest executed-FLOPs schedule first (docs/PERF.md r4 MFU
            # analysis): dots keeps matmul outputs, ~3.1x fwd vs full's 4x
            # (measured r4: the dots plan is 106.4 GB at this shape — it can
            # only fit sharded over sp; kept first for multi-chip parity)
            step = _compile_with_retry(lambda: compile_step("dots"), retries=0)
            mode = "remat=dots"
        except Exception as e0:
            fallthrough(e0, "train424_dots_mem_wall_gb")
            try:
                # retries=3/45s: ride out the ~1 min relay wedge that follows
                # a dots helper crash (r5 queue log)
                step = _compile_with_retry(lambda: compile_step("full"),
                                           retries=3, sleep_s=45.0)
                mode = "remat=full"
            except Exception as e:
                wall = fallthrough(e, "train424_mem_wall_gb")
                # `wall` is the measured single-chip memory wall for the
                # reference's 424p anchor shape under plain full remat (XLA
                # plan vs the 16 GB chip); retry with the per-layer carry
                # residuals offloaded to pinned host memory (the reference
                # spreads this bucket over four 96 GB H20s / --cpu-offload)
                try:
                    step = _compile_with_retry(
                        lambda: compile_step("offload_carry"),
                        retries=3, sleep_s=45.0)
                    mode = "remat=full+host-offload-carry"
                except Exception as e2:
                    wall2 = fallthrough(e2, "train424_offload_mem_wall_gb")
                    if wall2 is not None:
                        # only claim a memory wall when XLA's allocator
                        # actually reported one (r4 advisor medium finding)
                        res["train424_shape"] = (
                            "6x424x800x17f bs=1 fwd+bwd (XLA plan exceeds "
                            "the chip's usable HBM even with carry offload; "
                            "real recipe shards it over sp)")
                    else:
                        res["train424_relay_compile_failed"] = True
                        res["train424_shape"] = (
                            "6x424x800x17f bs=1 fwd+bwd (compile never "
                            "reached XLA's allocator: relay infrastructure "
                            "failure, NOT memory evidence)")
                    _carry_prior_walls(res)
                    return res
        plan_mem = _plan_mem_gb(step)
        loss, _gn = step(params, batch, jax.random.PRNGKey(0))
        _ = float(loss)
        times = []
        for i in range(2):
            t0 = time.perf_counter()
            loss, _gn = step(params, batch, jax.random.PRNGKey(i + 1))
            _ = float(loss)
            times.append(time.perf_counter() - t0)
        res.update(train424_step_s=round(float(np.median(times)), 3),
                   train424_plan_mem_gb=plan_mem,
                   train424_shape=f"6x424x800x17f bs=1 {mode} fwd+bwd "
                                  "scan-chunked-attn")
        _carry_prior_walls(res)
        # no _peak_mem_gb here: peak_bytes_in_use is process-cumulative and the
        # 848p forward phase runs first — the per-phase memory figure for this
        # shape is train424_plan_mem_gb (XLA's allocation plan)
        return res
    finally:
        os.environ.pop("MDV2_TRAIN_CHUNK_ATTN", None)


def fwd848_metric():
    """Single-CFG forward latency + peak memory at 6x848x1600x17f — the
    reference's headline high-resolution shape (BASELINE.md rows 9-16 are its
    peak-memory table). `peak_bytes_in_use` is process-cumulative; this is the
    largest phase of the run (earlier phases: 424p inference + 224p train), so
    the high-water mark read here is attributable to it — fwd848_plan_mem_gb
    is the per-phase exact figure either way."""
    import gc

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fast_init, _flagship_config
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import MagicDriveSTDiT3
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch

    num_frames, height, width = 17, 848, 1600
    cfg = _flagship_config(tiny=False, dtype=jnp.bfloat16)
    model = MagicDriveSTDiT3(cfg)
    batch = synthetic_batch(cfg, num_frames=num_frames, height=height,
                            width=width, l_txt=60, b=1, map_size=(8, 400, 400))
    h, w = batch.pop("height"), batch.pop("width")
    params = _fast_init(model, {**batch, "height": h, "width": w})
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params)
    params = jax.device_put(params)
    batch = jax.device_put(batch)
    gc.collect()

    @jax.jit
    def fwd(params, b):
        return model.apply(params, b["x"], b["timestep"], b["y"], b["maps"],
                           b["bbox"], b["cams"], b["rel_pos"], b["fps"],
                           height=h, width=w)

    fwd_c = _compile_with_retry(lambda: fwd.lower(params, batch).compile())
    out = fwd_c(params, batch)
    _ = np.asarray(out[0, 0, 0, 0, :2])  # sync (first run)
    t0 = time.perf_counter()
    out = fwd_c(params, batch)
    _ = np.asarray(out[0, 0, 0, 0, :2])
    dt = time.perf_counter() - t0
    res = {"fwd848_s": round(dt, 2),
           "fwd848_plan_mem_gb": _plan_mem_gb(fwd_c),
           "fwd848_shape": "6x848x1600x17f single-CFG forward"}
    mem = _peak_mem_gb()
    if mem is not None:
        # reference: 29.66 GB at sp4 / 23.83 GB at sp8 for the full 129f
        # inference (FAQ.md:86-93); this is the single-chip forward peak
        res["fwd848_peak_mem_gb"] = mem
    return res


def fwdfull224_metric():
    """FULL-LENGTH denoise pass at 6x224x400, T_img=233 (the ~20 s /
    232-frame whole-scene headline, snapped to the 8n+1 grid -> T'=59).
    Reference anchor: 21.93 GB peak on H20 at sp=1 (doc/FAQ.md:36-43,
    BASELINE.md row 10).

    Measures the SINGLE-pass forward (b=6 views): the reference's own
    full-length mode is rflow-slice — two single passes per step — and the
    batched-CFG (b=12) program deterministically crashes the relay's
    tpu_compile_helper (~4 min in, reproduced twice r5); the slice leg is
    both the representative program and the one that compiles. r5 measured:
    7.51 s/pass, 12.61 GB plan — full-length fits ONE 16 GB chip.
    MDV2_BENCH_FULL224=0 disables."""
    import gc

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fast_init, _flagship_config
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import MagicDriveSTDiT3
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch

    num_frames, height, width = 233, 224, 400
    cfg = _flagship_config(tiny=False, dtype=jnp.bfloat16)
    model = MagicDriveSTDiT3(cfg)
    batch = synthetic_batch(cfg, num_frames=num_frames, height=height,
                            width=width, l_txt=60, b=1, map_size=(8, 400, 400))
    h, w = batch.pop("height"), batch.pop("width")
    params = _fast_init(model, {**batch, "height": h, "width": w})
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params)
    params = jax.device_put(params)

    b1 = {k: v for k, v in batch.items() if k not in ("x", "timestep")}
    b1 = jax.device_put(b1)
    z1, t1 = batch["x"], batch["timestep"]
    del batch
    gc.collect()

    @jax.jit
    def fwd(params, z, t, b):
        return model.apply(params, z, t, b["y"], b["maps"], b["bbox"],
                           b["cams"], b["rel_pos"], b["fps"], height=h, width=w)

    fwd_c = _compile_with_retry(lambda: fwd.lower(params, z1, t1, b1).compile())
    out = fwd_c(params, z1, t1, b1)
    _ = np.asarray(out[0, 0, 0, 0, :2])  # sync (first run)
    t0 = time.perf_counter()
    out = fwd_c(params, z1, t1, b1)
    _ = np.asarray(out[0, 0, 0, 0, :2])
    dt = time.perf_counter() - t0
    res = {"fwdfull224_slice_s": round(dt, 2),
           "fwdfull224_plan_mem_gb": _plan_mem_gb(fwd_c),
           "fwdfull224_shape": ("6x224x400x233f (T'=59) single-pass forward "
                                "(rflow-slice leg), sp=1")}
    mem = _peak_mem_gb()
    if mem is not None:
        res["fwdfull224_peak_mem_gb"] = mem
    return res


def _peak_mem_gb():
    """Device peak-memory in GB, when the runtime exposes memory_stats
    (the reference's headline numbers are peak memory, BASELINE.md rows 1-20)."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats is None:
            return None
        peak = stats.get("peak_bytes_in_use") or stats.get("bytes_in_use")
        return round(peak / 2**30, 2) if peak else None
    except Exception:
        return None


def _plan_mem_gb(compiled):
    """HBM requirement of a compiled executable from XLA's own allocation plan
    (arguments + temps + non-aliased output). The axon runtime exposes no
    memory_stats, so this is the memory figure reported against BASELINE.md's
    peak tables — it is what buffer assignment reserves, an upper bound the
    runtime peak cannot exceed."""
    try:
        ma = compiled.memory_analysis()
        tot = (ma.argument_size_in_bytes + ma.output_size_in_bytes
               - ma.alias_size_in_bytes + ma.temp_size_in_bytes)
        return round(tot / 2**30, 2)
    except Exception:
        return None


_WALL_KEYS = ("train424_dots_mem_wall_gb", "train424_mem_wall_gb",
              "train424_offload_mem_wall_gb")


def _carry_prior_walls(res: dict) -> None:
    """Fill missing 424p memory-wall keys from the newest prior BENCH artifact
    that measured them, under distinct `*_carried_r{N}` names so carried values
    are never mistaken for this run's measurements. A relay-crash compile
    records no wall (the error text never reaches XLA's allocator), which
    otherwise silently drops evidence PERF.md cites (r4 advisor finding)."""
    import glob
    import re
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json")),
                       reverse=True):
        try:
            with open(path) as f:
                extras = (json.load(f).get("parsed") or {}).get("extras") or {}
        except Exception:
            continue
        m = re.search(r"BENCH_r(\d+)", path)
        rnd = m.group(1) if m else "?"
        for k in _WALL_KEYS:
            if k not in res and not any(s.startswith(k + "_carried")
                                        for s in res) and k in extras:
                res[f"{k}_carried_r{rnd}"] = extras[k]


_OOM_RE = r"hbm requirement ([0-9.]+)G"


def _mem_wall_gb(err) -> float | None:
    """Parse 'Program hbm requirement N.NNG' out of a RESOURCE_EXHAUSTED
    compile error — the measured single-chip memory wall."""
    import re
    m = re.search(_OOM_RE, str(err))
    return float(m.group(1)) if m else None


def _is_transient_compile_error(err) -> bool:
    """Relay-side compile-helper crashes (BENCH_r04 first run: 'remote_compile:
    HTTP 500: tpu_compile_helper subprocess exit code 1') are infrastructure
    failures, not memory walls or code bugs — retryable, and never a reason to
    abort a metric that has a cheaper fallback."""
    s = str(err)
    return ("remote_compile" in s and "HTTP 5" in s) or "tpu_compile_helper" in s


def _compile_with_retry(make, retries=1, sleep_s=15.0):
    """make() -> compiled executable; retry once on transient relay failures.

    A parsed memory wall takes precedence over the transient-string match: a
    RESOURCE_EXHAUSTED whose text also mentions the relay helper is a
    deterministic OOM — retrying recompiles a program guaranteed to OOM again."""
    while True:
        try:
            return make()
        except Exception as e:
            if (retries > 0 and _is_transient_compile_error(e)
                    and _mem_wall_gb(e) is None):
                retries -= 1
                print(f"bench: transient relay compile failure, retrying: "
                      f"{str(e)[:160]}", file=sys.stderr, flush=True)
                time.sleep(sleep_s)
                continue
            raise


def _last_good_bench() -> dict:
    """Newest prior BENCH_r*.json with a real measurement, for the relay-down
    fallback line. Hardcoded r2 numbers as the floor (relay was up that round)."""
    import glob
    import re
    best = {"round": 2, "metric": "6-view frames/sec/chip, 424x800x17f, "
                                  "30-step CFG diffusion",
            "value": 0.1339, "unit": "frames/s/chip", "vs_baseline": 1.2335,
            "extras": {"p50_step_s": 4.2323, "mfu_vs_peak": 0.371,
                       "train_step_s": 2.055, "train_tflops_per_s_chip": 52.5,
                       "train_vs_baseline": 2.4913}}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                rec = json.load(f)
            parsed = rec.get("parsed")
            m = re.search(r"BENCH_r(\d+)", path)
            n = int(m.group(1)) if m else 0
            if (parsed and parsed.get("value") is not None
                    and "error" not in parsed and n > best["round"]):
                best = dict(round=n, **parsed)
        except Exception:
            continue
    return best


def _last_good_train() -> dict | None:
    """Newest prior BENCH_r*.json whose extras actually contain a measured
    train_step_s (r4's artifact has only train_error — its newest train
    measurement is r2's). Returns {round, train_*...} or None."""
    import glob
    import re
    here = os.path.dirname(os.path.abspath(__file__))
    best = {"round": 2, "train_step_s": 2.055,
            "train_tflops_per_s_chip": 52.5, "train_vs_baseline": 2.4913}
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                extras = (json.load(f).get("parsed") or {}).get("extras") or {}
        except Exception:
            continue
        m = re.search(r"BENCH_r(\d+)", path)
        n = int(m.group(1)) if m else 0
        if extras.get("train_step_s") is not None and n > best["round"]:
            best = {"round": n,
                    **{k: v for k, v in extras.items()
                       if k.startswith("train_") and not k.endswith("_error")}}
    return best


def _capability_status() -> dict:
    """One line per asset-gated capability so green artifacts stop silently
    overstating coverage (r4 verdict weak #6): the real-weights tests
    (tests/test_real_weights.py) skip when no pretrained snapshots are
    mounted; record that fact in the bench artifact itself."""
    ckpt_root = os.environ.get("MDV2_CKPT_ROOT", "/data/ckpts")
    import glob
    have_vae = any(os.path.isfile(os.path.join(d, "vae", "config.json"))
                   for p in ("CogVideoX*", "cogvideox*")
                   for d in glob.glob(os.path.join(ckpt_root, p)))
    have_dit = any(glob.glob(os.path.join(ckpt_root, p))
                   for p in ("MagicDrive*/ema.pt", "MagicDrive*/ema.safetensors",
                             "MagicDrive*/model/*.safetensors", "ema.pt"))
    have_t5 = any(os.path.isfile(os.path.join(d, "config.json"))
                  for p in ("t5-v1_1-xxl", "t5*")
                  for d in glob.glob(os.path.join(ckpt_root, p)))
    if have_vae and have_dit and have_t5:
        return {"real_weights": "assets mounted (tests/test_real_weights.py "
                                "exercises them)"}
    missing = [n for n, ok in (("DiT ema.pt", have_dit),
                               ("CogVideoX VAE", have_vae),
                               ("T5 snapshot", have_t5)) if not ok]
    return {"real_weights": "skipped (no assets under " + ckpt_root + ": "
                            + ", ".join(missing) + " absent; see "
                            "tests/test_real_weights.py header for layout)"}


def _probe_tpu_subprocess(timeout_s: float) -> tuple[bool, str]:
    """Attempt TPU backend init in a throwaway subprocess.

    Backend init through the axon relay can (a) raise 'Unable to initialize
    backend' (BENCH_r03 failure mode) or (b) hang — a subprocess bounds both
    without poisoning this process's global jax backend state."""
    import subprocess
    code = ("import jax; d = jax.devices(); "
            "assert d and d[0].platform == 'tpu', d; print('PROBE_OK')")
    try:
        proc = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                              capture_output=True, text=True)
        if proc.returncode == 0 and "PROBE_OK" in proc.stdout:
            return True, ""
        return False, (proc.stderr or proc.stdout)[-300:]
    except subprocess.TimeoutExpired:
        return False, f"device enumeration exceeded {timeout_s:.0f}s"


def _tpu_available_with_retry(budget_s: float = 300.0) -> tuple[bool, str]:
    """Retry backend init over ~5 min (relay outages are often transient
    flaps); return (available, last_error)."""
    deadline = time.monotonic() + budget_s
    last_err = ""
    attempt = 0
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 5:
            return False, last_err
        attempt += 1
        ok, err = _probe_tpu_subprocess(min(110.0, remaining))
        if ok:
            return True, ""
        last_err = err
        print(f"bench: TPU probe attempt {attempt} failed: {err.strip()[-160:]}",
              file=sys.stderr, flush=True)
        if deadline - time.monotonic() > 35:
            time.sleep(30)


def main():
    # Relay-health gate BEFORE any in-process jax backend touch: if the TPU
    # backend cannot initialize within ~5 min of retries, emit ONE structured
    # JSON line the driver can parse instead of dying with a raw traceback
    # (BENCH_r03 regression: rc=1, parsed=null).
    want_tpu = os.environ.get("JAX_PLATFORMS", "") not in ("cpu",)
    if want_tpu:
        ok, err = _tpu_available_with_retry(
            float(os.environ.get("MDV2_BENCH_PROBE_BUDGET_S", "300")))
        if not ok:
            print(json.dumps({
                "error": "tpu-unavailable",
                "detail": err.strip()[-200:],
                "last_good": _last_good_bench(),
            }))
            return

    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: repeat bench runs skip the ~10 min compile
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jaxcache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from __graft_entry__ import _fast_init, _flagship_config
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import MagicDriveSTDiT3
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch

    # device-enumeration watchdog: when the axon relay is down, jax.devices()
    # hangs indefinitely — exit with a diagnostic instead of hanging the
    # driver's whole bench budget (observed: relay unreachable for hours)
    import threading
    got_devices = threading.Event()

    def _watchdog():
        if not got_devices.wait(timeout=900):
            print("bench: TPU relay unreachable (device enumeration exceeded "
                  "15 min); no measurement possible", file=sys.stderr,
                  flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    platform = jax.devices()[0].platform
    got_devices.set()
    on_tpu = platform == "tpu"
    if on_tpu:
        num_frames, height, width = NUM_FRAMES, HEIGHT, WIDTH
        cfg = _flagship_config(tiny=False, dtype=jnp.bfloat16)
    else:  # CI fallback so the metric line always exists
        num_frames, height, width = 9, 64, 80
        cfg = _flagship_config(tiny=True, dtype=jnp.float32)

    model = MagicDriveSTDiT3(cfg)
    l_txt = 60
    batch = synthetic_batch(cfg, num_frames=num_frames, height=height, width=width,
                            l_txt=l_txt, b=1,
                            map_size=(8, 400, 400) if on_tpu else (8, 80, 80))
    h, w = batch.pop("height"), batch.pop("width")
    params = _fast_init(model, {**batch, "height": h, "width": w})
    if on_tpu:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params)

    double = lambda a: jnp.concatenate([a, a], axis=0)
    b2 = {k: jax.tree_util.tree_map(double, v) for k, v in batch.items()
          if k not in ("x", "timestep")}
    params = jax.device_put(params)
    b2 = jax.device_put(b2)

    # precompute step-independent conditioning once, as the sampler does
    z_shape2 = (2 * batch["x"].shape[0],) + tuple(batch["x"].shape[1:])
    cond_cache = jax.jit(lambda p, a: model.apply(
        p, z_shape2, a["y"], a["maps"], a["bbox"], a["cams"], a["rel_pos"],
        method=MagicDriveSTDiT3.encode_conditions))(params, b2)

    def one_step(params, b2, cond_cache, z, t):
        pred = model.apply(params, double(z), double(t), **b2, height=h, width=w,
                           cond_cache=cond_cache)
        cond, uncond = jnp.split(pred, 2, axis=0)
        v = uncond + 2.0 * (cond - uncond)
        return z + v.astype(z.dtype) * (1.0 / NUM_STEPS)

    @jax.jit
    def run_chain(params, b2, cond_cache, z, t):
        def body(i, z):
            return one_step(params, b2, cond_cache, z, t)
        return jax.lax.fori_loop(0, CHAINED_STEPS, body, z)

    z = batch["x"]
    t = batch["timestep"]
    run_chain = _compile_with_retry(
        lambda: run_chain.lower(params, b2, cond_cache, z, t).compile())
    chain_plan_mem = _plan_mem_gb(run_chain)
    out = run_chain(params, b2, cond_cache, z, t)
    _ = np.asarray(out[0, 0, 0, 0, :2])  # full sync through the relay

    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        out = run_chain(params, b2, cond_cache, z, t)
        _ = np.asarray(out[0, 0, 0, 0, :2])
        times.append((time.perf_counter() - t0) / CHAINED_STEPS)
    p50 = float(np.median(times))
    peak_mem = _peak_mem_gb()

    # analytic FLOPs for one CFG step
    lat_t = 1 if num_frames == 1 else (num_frames - 1) // 4 + 1
    lat_h, lat_w = height // 8, width // 8
    T = -(-lat_t // cfg.patch_size[0])
    S = -(-lat_h // cfg.patch_size[1]) * -(-lat_w // cfg.patch_size[2])
    l_box = 10
    L_cond = 2 + l_txt + l_box
    B = cfg.nc * 2
    flops = estimate_step_flops(cfg, B, T, S, L_cond, num_frames)

    fps = num_frames / (NUM_STEPS * p50)
    ref_step = flops / (H20_BF16_FLOPS * H20_ASSUMED_MFU)
    ref_fps = num_frames / (NUM_STEPS * ref_step)
    vs_baseline = fps / ref_fps
    mfu = flops / p50 / (V5E_PEAK_FLOPS if on_tpu else 1e12)

    extras = dict(platform=platform, p50_step_s=round(p50, 4),
                  step_flops=flops, mfu_vs_peak=round(mfu, 3),
                  shape=f"6x{height}x{width}x{num_frames}f",
                  chained_steps=CHAINED_STEPS, **_capability_status())
    if chain_plan_mem is not None:
        # reference anchor: 17.91 GB @ 424x800x17f inference on H20 (BASELINE.md
        # row "Inference peak mem"; theirs is runtime peak WITH cpu-offload,
        # ours the XLA allocation plan for the whole denoise chain)
        extras["plan_mem_gb"] = chain_plan_mem
    if peak_mem is not None:
        extras["peak_mem_gb"] = peak_mem
    if on_tpu and os.environ.get("MDV2_BENCH_TRAIN", "1") != "0":
        try:
            # release the inference bench's device arrays (params + doubled
            # batch + cond cache ~4 GB) before building the training state;
            # both together exceed the 16 GB chip
            del params, b2, cond_cache, z, out
            import gc
            gc.collect()
            extras.update(train_step_metric())
        except Exception as e:  # train bench is best-effort; never lose the metric
            extras["train_error"] = f"{type(e).__name__}: {e}"[:200]
            # carry the newest previously-measured train datapoint forward
            # (clearly marked) so a relay outage cannot erase train evidence
            # entirely — same contract the headline metric has via last_good
            lg = _last_good_train()
            if lg:
                extras["train_last_good"] = lg
    if on_tpu and os.environ.get("MDV2_BENCH_DOTS_AB", "1") != "0":
        # dots-vs-full A/B at the shape where dots executes (cache-resident
        # programs: re-measures in seconds after the r5 compiles)
        try:
            import gc
            gc.collect()
            extras.update(train_dots_ab_metric())
        except Exception as e:
            extras["train160_error"] = f"{type(e).__name__}: {e}"[:200]
    if on_tpu and os.environ.get("MDV2_BENCH_848", "1") != "0":
        try:
            import gc
            gc.collect()
            extras.update(fwd848_metric())
        except Exception as e:
            extras["fwd848_error"] = f"{type(e).__name__}: {e}"[:200]
    if on_tpu and os.environ.get("MDV2_BENCH_TRAIN424", "1") != "0":
        try:
            import gc
            gc.collect()
            extras.update(train424_metric())
        except Exception as e:  # the measured memory wall, if it still OOMs
            extras["train424_error"] = f"{type(e).__name__}: {e}"[:300]
    if on_tpu and os.environ.get("MDV2_BENCH_FULL224", "1") != "0":
        # full-length single-chip datapoint (default ON since r5: the
        # single-pass program is in the persistent compile cache, so repeat
        # runs re-measure in seconds)
        try:
            import gc
            gc.collect()
            extras.update(fwdfull224_metric())
        except Exception as e:
            extras["fwdfull224_error"] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps({
        "metric": f"6-view frames/sec/chip, {height}x{width}x{num_frames}f, "
                  f"{NUM_STEPS}-step CFG diffusion",
        "value": round(fps, 4),
        "unit": "frames/s/chip",
        "vs_baseline": round(float(vs_baseline), 4),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
