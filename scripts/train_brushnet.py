"""BrushNet / SDE-BrushNet training app (reference scripts/train_brushnet.py +
train_sde_brushnet.py, 764 LoC each; SURVEY.md §2.11).

Same runtime as train_magicdrive.py, plus: pedestrian inpaint inputs
(human_imgs/human_masks -> x_inpaint/mask_inpaint), the full-depth brushnet branch,
functional LoRA on the base blocks, and only_train_extra_blocks freezing.

Usage:
  python scripts/train_brushnet.py configs/magicdrive/train/brushnet_smoke.py \
      --synthetic [--sde] [--max-steps N]
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import random as pyrandom
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger("train_brushnet")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="*", default=[])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--sde", action="store_true", help="SDE variant")
    p.add_argument("--max-steps", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    import dataclasses

    from magicdrive_v2_tpu.parallel.distributed import (local_dp_info,
                                                        make_global_batch,
                                                        maybe_initialize,
                                                        startup_barrier)
    maybe_initialize()  # multi-host: join the cluster before device use

    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: relay compiles are 10-25 min

    from magicdrive_v2_tpu.config import Config, merge_dot_options
    from magicdrive_v2_tpu.models.magicdrive.brushnet import (
        BrushNetConfig, MagicDriveSTDiT3BrushNet)
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import build_model_config
    from magicdrive_v2_tpu.parallel.fsdp import shard_params
    from magicdrive_v2_tpu.parallel.sharding import make_mesh, use_mesh
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch
    from magicdrive_v2_tpu.schedulers.rf import RFLOW_BRUSHNET, RFLOW_SDEBRUSHNET
    from magicdrive_v2_tpu.training.lora import (BRUSHNET_EXTRA_TRAINABLE,
                                                 lora_trainable_mask)
    from magicdrive_v2_tpu.training.trainer import (create_train_state,
                                                    make_brushnet_train_step)
    from magicdrive_v2_tpu.utils.ckpt import save_checkpoint
    from magicdrive_v2_tpu.utils.misc import count_params, format_numel_str
    from magicdrive_v2_tpu.utils.train_utils import make_optimizer

    cfg = Config.fromfile(args.config)
    merge_dot_options(cfg, args.cfg_options)
    sde = args.sde or cfg.get("sde_inpaint", False)

    n_dev = len(jax.devices())
    sp = min(cfg.get("sp_size", 1), n_dev)
    dp = n_dev // sp
    mesh = make_mesh(dp=dp, sp=sp)
    nproc = jax.process_count()
    dp_local, dp_offset = local_dp_info(dp, sp)
    logger.info("mesh: dp=%d sp=%d sde=%s (process %d/%d)", dp, sp, sde,
                jax.process_index(), nproc)
    startup_barrier(mesh)

    dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[cfg.get("dtype", "bf16")]
    base_cfg = build_model_config(
        cfg.model, vae_out_channels=cfg.get("vae_out_channels", 16),
        mv_order_map=cfg.get("mv_order_map"), dtype=dtype,
        enable_sequence_parallelism=sp > 1,
        grad_checkpoint=cfg.get("grad_checkpoint", True))
    model_cfg = BrushNetConfig(
        **{**dataclasses.asdict(base_cfg), "sde_inpaint": sde,
           "brushnet_skip_cross_attn": cfg.get("brushnet_skip_cross_attn", True)})
    model = MagicDriveSTDiT3BrushNet(model_cfg)
    sched_cls = RFLOW_SDEBRUSHNET if sde else RFLOW_BRUSHNET
    sched_kwargs = {k: v for k, v in dict(cfg.scheduler).items() if k != "type"}
    scheduler = sched_cls(**sched_kwargs)

    t_img, (height, width) = cfg.get("num_frames", 9), cfg.get("image_size", (64, 80))
    # per-PROCESS rows (multi-host: this process's dp rows of the global batch)
    b = cfg.get("batch_size", 1) * dp_local
    nc = model_cfg.nc
    def make_batch(step):
        # all content derives from (seed + dp_offset, step): each process's
        # rows carry DIFFERENT samples (the global batch must not duplicate
        # rows across hosts) and any step's batch can be re-derived without
        # replaying a stateful stream (same contract as train_magicdrive.py)
        rng_np = np.random.default_rng((cfg.get("seed", 0) + dp_offset, step))
        batch = synthetic_batch(model_cfg, num_frames=t_img, height=height,
                                width=width, l_txt=32, b=b, map_size=(8, 80, 80),
                                seed=int(rng_np.integers(1 << 31)))
        batch.pop("height"), batch.pop("width"), batch.pop("timestep")
        batch["x_inpaint"] = jnp.asarray(rng_np.standard_normal(
            (b, 3 * nc, t_img, height, width)).astype(np.float32))
        batch["mask_inpaint"] = jnp.asarray(rng_np.integers(
            0, 2, (b, nc, t_img, height, width)).astype(np.float32))
        return batch

    import contextlib
    with use_mesh(mesh):
        example = make_batch(0)
        extra = {}
        if sde:
            extra = dict(t_inpaint=jnp.full((b,), 300.0),
                         rngs_key=jax.random.PRNGKey(0))
        # multi-host: host-local init (identical seeds -> identical trees),
        # then shard_params device_puts into the global shardings
        with (use_mesh(None) if nproc > 1 else contextlib.nullcontext()):
            params = model.init(jax.random.PRNGKey(cfg.get("seed", 0)),
                                **example, timestep=jnp.full((b,), 500.0),
                                height=float(height), width=float(width),
                                **extra)
        logger.info("params: %s", format_numel_str(count_params(params)))
        params, _ = shard_params(params, mesh)

        # only_train_extra_blocks (reference magicdrive_stdit3.py:1380-1395)
        mask = lora_trainable_mask(params, BRUSHNET_EXTRA_TRAINABLE)
        tx = make_optimizer(lr=cfg.get("lr", 5e-5),
                            weight_decay=cfg.get("weight_decay", 1e-2),
                            adam_eps=cfg.get("adam_eps", 1e-15),
                            grad_clip=cfg.get("grad_clip", 1.0),
                            warmup_steps=cfg.get("warmup_steps", 0), trainable=mask)
        state = create_train_state(params, tx)
        step_fn = jax.jit(make_brushnet_train_step(
            model, scheduler, tx, height=float(height), width=float(width),
            num_frames=t_img, ema_decay=cfg.get("ema_decay", 0.99), ema_mask=mask,
            sde=sde), donate_argnums=0)

        exp_dir = cfg.get("outputs", "outputs/train_brushnet")
        os.makedirs(exp_dir, exist_ok=True)
        base_key = jax.random.PRNGKey(cfg.get("seed", 0) + 1)
        steps = args.max_steps or cfg.get("synthetic_steps", 10)
        t0 = time.time()
        for step in range(1, steps + 1):
            batch = make_batch(step)
            if nproc > 1:
                batch = make_global_batch(batch, mesh)
            k = jax.random.fold_in(base_key, step)
            state, metrics = step_fn(state, batch, k)
            loss = float(metrics["loss"])
            logger.info(json.dumps({"step": step, "loss": loss,
                                    "elapsed_s": round(time.time() - t0, 1)}))
            assert np.isfinite(loss), f"NaN at step {step}"
        save_checkpoint(exp_dir, steps, params=state.params,
                        ema_params=state.ema_params)
        logger.info("done")


if __name__ == "__main__":
    main()
