"""Per-device XLA memory plan for the SHARDED train step (VERDICT r4 item 6).

Compiles (never runs) the flagship 424x800x17f bs-per-dp-row=1 fwd+bwd train
step under a (dp, sp) mesh on N virtual CPU devices and prints XLA's
buffer-assignment sizes per device. This turns the "sp4 x dp2 divides the
106 GB single-chip dots plan by ~8" arithmetic (docs/PERF.md) into a compiled
plan. CPU-backend caveat: buffer assignment runs after GSPMD partitioning with
the same HLO passes, but CPU layouts can differ from TPU tiling by small
constants — the numbers are a layout-level proxy, labeled as such in
docs/SCALING.md.

Run OUTSIDE the axon sitecustomize so the CPU backend owns the process:

  env PYTHONPATH= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/plan_memory.py --sp 4 --dp 2 --remat dots

Reference anchor: the 6x424x800x17f bucket trains at bs=6 per dp-group over
four 96 GB H20s (sp=4) — configs/magicdrive/train/stage3_higher-b-v3.1 rows.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=424)
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--sp", type=int, default=4)
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--remat", default="full",
                    choices=["full", "dots", "offload_carry"])
    ap.add_argument("--tiny", action="store_true",
                    help="depth-2 narrow smoke (validates the tool quickly)")
    ap.add_argument("--chunk-attn", action="store_true", default=True,
                    help="MDV2_TRAIN_CHUNK_ATTN=1 like the single-chip bench")
    ap.add_argument("--infer", action="store_true",
                    help="forward-only (rflow-slice leg) instead of the train "
                         "step: the single-chip 424p full-length pass measured "
                         "a 22.61 GB XLA wall (r5); this compiles the sp-"
                         "sharded plan that covers it (dp is forced to 1)")
    args = ap.parse_args()
    if args.infer:
        args.dp = 1

    if args.chunk_attn:
        os.environ["MDV2_TRAIN_CHUNK_ATTN"] = "1"

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jaxcache_cpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from __graft_entry__ import _fast_init, _flagship_config
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import MagicDriveSTDiT3
    from magicdrive_v2_tpu.parallel.fsdp import shard_params
    from magicdrive_v2_tpu.parallel.sharding import make_mesh, use_mesh
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch
    from magicdrive_v2_tpu.schedulers.rf import RFLOW

    n_dev = args.dp * args.sp
    devices = jax.devices()[:n_dev]
    assert len(devices) == n_dev, \
        f"need {n_dev} devices, have {len(devices)} (set XLA_FLAGS)"
    mesh = make_mesh(dp=args.dp, sp=args.sp, devices=devices)

    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    cfg = _flagship_config(tiny=args.tiny, dtype=dtype)
    cfg = dataclasses.replace(cfg, grad_checkpoint=True,
                              remat_policy=args.remat,
                              enable_sequence_parallelism=args.sp > 1,
                              force_pad_h_for_sp_size=args.sp
                              if args.sp > 1 else None)
    model = MagicDriveSTDiT3(cfg)
    b = args.dp  # one sample per dp row, the bench's bs=1 contract
    nf, h, w = args.frames, args.height, args.width
    batch = synthetic_batch(cfg, num_frames=nf, height=h, width=w, l_txt=60,
                            b=b, map_size=(8, 80, 80) if args.tiny
                            else (8, 400, 400))
    batch.pop("height"), batch.pop("width")
    tstep = batch.pop("timestep")

    with use_mesh(mesh):
        params = _fast_init(model, {**batch, "timestep": jnp.full((b,), 500.0),
                                    "height": float(h), "width": float(w)})
        batch["mask"] = jnp.ones((b, batch["x"].shape[2]), jnp.float32)
        if not args.tiny:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16)
                if p.dtype == jnp.float32 else p, params)
        params, _ = shard_params(params, mesh)

        def put(a):
            if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] % args.dp == 0:
                return jax.device_put(a, NamedSharding(
                    mesh, P("dp", *([None] * (a.ndim - 1)))))
            return jax.device_put(a, NamedSharding(mesh, P()))

        batch = jax.tree_util.tree_map(put, batch)

        if args.infer:
            # forward-only rflow-slice leg: one model apply per step, b=dp=1
            # (6 views folded into NC); params replicate over sp, activations
            # shard on the S axis via the model's GSPMD hints
            tstep_d = jax.device_put(tstep, NamedSharding(mesh, P()))

            def fwd(params, batch, t):
                return model.apply(params, batch["x"], t, batch["y"],
                                   batch["maps"], batch["bbox"], batch["cams"],
                                   batch["rel_pos"], batch["fps"],
                                   height=float(h), width=float(w))

            t0 = time.time()
            compiled = jax.jit(fwd).lower(params, batch, tstep_d).compile()
            dt = time.time() - t0
            ma = compiled.memory_analysis()
            gb = 2.0 ** 30
            res = dict(
                shape=f"{b}x{cfg.nc}view {h}x{w}x{nf}f fwd-only dp=1 "
                      f"sp={args.sp}",
                backend=jax.default_backend(), compile_s=round(dt, 1),
                per_device_args_gb=round(ma.argument_size_in_bytes / gb, 2),
                per_device_temp_gb=round(ma.temp_size_in_bytes / gb, 2),
                per_device_out_gb=round(ma.output_size_in_bytes / gb, 2),
                per_device_alias_gb=round(ma.alias_size_in_bytes / gb, 2),
                per_device_plan_gb=round(
                    (ma.argument_size_in_bytes + ma.output_size_in_bytes
                     - ma.alias_size_in_bytes + ma.temp_size_in_bytes) / gb, 2))
            print("PLAN " + json.dumps(res), flush=True)
            return

        scheduler = RFLOW(num_timesteps=1000, use_timestep_transform=True,
                          cog_style_trans=True)

        def fwd_bwd(params, batch, rng):
            cond = {k: batch[k] for k in ("y", "maps", "bbox", "cams",
                                          "rel_pos", "fps")}
            hw = dict(height=jnp.full((1,), float(h)),
                      width=jnp.full((1,), float(w)),
                      num_frames=jnp.full((1,), float(nf)))

            def loss_fn(p):
                def model_fn(x_t, t, x_mask):
                    return model.apply(p, x_t, t, **cond, height=float(h),
                                       width=float(w), x_mask=x_mask)
                out = scheduler.training_losses(model_fn, rng, batch["x"],
                                                mask=batch["mask"], **hw)
                return out["loss"].mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            return loss, optax.global_norm(grads)

        t0 = time.time()
        compiled = jax.jit(fwd_bwd).lower(
            params, batch, jax.random.PRNGKey(0)).compile()
        dt = time.time() - t0

    ma = compiled.memory_analysis()
    gb = 2.0 ** 30
    res = dict(shape=f"{b}x{cfg.nc}view {h}x{w}x{nf}f dp={args.dp} sp={args.sp}",
               remat=args.remat, backend=jax.default_backend(),
               compile_s=round(dt, 1),
               per_device_args_gb=round(ma.argument_size_in_bytes / gb, 2),
               per_device_temp_gb=round(ma.temp_size_in_bytes / gb, 2),
               per_device_out_gb=round(ma.output_size_in_bytes / gb, 2),
               per_device_alias_gb=round(ma.alias_size_in_bytes / gb, 2),
               per_device_plan_gb=round(
                   (ma.argument_size_in_bytes + ma.output_size_in_bytes
                    - ma.alias_size_in_bytes + ma.temp_size_in_bytes) / gb, 2))
    print("PLAN " + json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
