"""Training step: rectified-flow loss + AdamW + EMA, one compiled XLA program.

Replaces the reference training runtime (reference scripts/train_magicdrive.py:466-732 +
ColossalAI booster): grads, optimizer update, and EMA fuse into a single jitted
`train_step` per shape bucket; parallelism comes from the (dp, sp) mesh — batch sharded
over dp, FSDP param sharding over dp, sequence sharding over sp via the model's
shard_hint constraints. bf16 compute with fp32 master params; no loss scaling needed.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.magicdrive.stdit3 import MagicDriveSTDiT3
from ..schedulers.rf import RFLOW
from ..utils.train_utils import make_optimizer, trainable_mask, update_ema


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any

    @property
    def int_step(self) -> int:
        return int(self.step)


def combine_frame_mask(mask, frame_valid):
    """Merge the x_mask conditioning mask (b, T') with full-length pad
    validity (b, T_img): pad LATENT frames drop out of the loss (mean_flat
    denominator counts only valid frames) and ride the x_mask t0 path.
    Latent i maps to pixel frame 4i (temporal patch 1, cog 4x down)."""
    if frame_valid is None:
        return mask
    lat_valid = frame_valid[:, ::4]
    if mask is None:
        return lat_valid
    combined = mask * lat_valid
    # a mask drawn on the bucket length can land entirely on pad frames; an
    # all-zero row makes mean_flat 0/0 = NaN — denoise all valid frames
    # instead (the app's valid-anchored get_masks avoids this by
    # construction; this guards other callers)
    has = jnp.sum(combined, axis=1, keepdims=True) > 0
    return jnp.where(has, combined, lat_valid)


def create_train_state(params, tx: optax.GradientTransformation,
                       ema: bool = True) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
    )


def make_train_step(model: MagicDriveSTDiT3, scheduler: RFLOW,
                    tx: optax.GradientTransformation, *, height: float, width: float,
                    num_frames: int, ema_decay: float = 0.99,
                    ema_mask=None, simulate_sp: Optional[int] = None) -> Callable:
    """Build the jittable step for one (height, width, num_frames) bucket.

    batch: x (b, C*NC, T', H', W') latents; y, maps, bbox, cams, rel_pos, fps;
    optional mask (b, T') frame mask, drop_cond_mask, drop_frame_mask.
    simulate_sp: pad H as if running at that sp size (reference simulate_sp_size,
    magicdrive_stdit3.py:1056-1089) — static, so each value is its own program.
    """

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        cond_keys = ("y", "maps", "bbox", "cams", "rel_pos", "fps", "drop_cond_mask",
                     "drop_frame_mask")
        cond = {k: batch[k] for k in cond_keys if k in batch}
        x = batch["x"]
        b = x.shape[0]
        # full-length bucket padding: frame_valid excludes pad frames from
        # temporal mixing and the loss; timestep_transform sees each sample's
        # TRUE length (dynamic (b,) arg — one compile per padded bucket)
        frame_valid = batch.get("frame_valid")
        nf_valid = batch.get("num_frames_valid")
        mask = combine_frame_mask(batch.get("mask"), frame_valid)
        hw = dict(height=jnp.full((b,), float(height)),
                  width=jnp.full((b,), float(width)),
                  num_frames=jnp.full((b,), float(num_frames)) if nf_valid is None
                  else jnp.asarray(nf_valid, jnp.float32))

        def loss_fn(params):
            def model_fn(x_t, t, x_mask):
                return model.apply(params, x_t, t, **cond, height=float(height),
                                   width=float(width), x_mask=x_mask,
                                   simulate_sp=simulate_sp,
                                   frame_valid=frame_valid)

            out = scheduler.training_losses(model_fn, rng, x, mask=mask, **hw)
            return out["loss"].mean(), out["t"]

        (loss, t_used), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if new_ema is not None:
            new_ema = update_ema(new_ema, new_params, ema_decay, ema_mask)
        # grad_norm on the TRAINABLE partition only (what clip_by_global_norm
        # sees); frozen-param grads would dominate and mislead divergence
        # monitoring when freeze_patterns is set (r4 self-review)
        gnorm_grads = grads if ema_mask is None else jax.tree_util.tree_map(
            lambda g, m: g if m else jnp.zeros_like(g), grads, ema_mask)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(gnorm_grads),
            "t_mean": t_used.mean(),
        }
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt, ema_params=new_ema), metrics

    return train_step


def build_training_multibucket(model, scheduler, params, cfg, *,
                               freeze_patterns=()):
    """Optimizer + state + a per-bucket step factory.

    The reference trains ~7 shape buckets in one run (reference
    configs/magicdrive/train/stage3_higher-b-v3.1.py:85-102, consumed in
    scripts/train_magicdrive.py:466-732). Under XLA each (height, width,
    num_frames) bucket is one compiled program with its own static h/w/T baked
    into timestep_transform — so steps are built and cached per bucket key,
    sharing one TrainState/optimizer.

    Returns (state, get_step) where get_step(height, width, num_frames) -> jitted
    step fn for that bucket (cached; donates the incoming state).
    """
    mask = trainable_mask(params, freeze_patterns)
    tx = make_optimizer(
        lr=cfg.get("lr", 8e-5), weight_decay=cfg.get("weight_decay", 1e-2),
        adam_eps=cfg.get("adam_eps", 1e-15), grad_clip=cfg.get("grad_clip", 1.0),
        warmup_steps=cfg.get("warmup_steps", 0),
        milestones=cfg.get("lr_milestones", ()), gamma=cfg.get("lr_gamma", 0.1),
        trainable=mask)
    state = create_train_state(params, tx, ema=cfg.get("ema", True))
    ema_decay = cfg.get("ema_decay", 0.99)
    cache: Dict[tuple, Callable] = {}

    def get_step(height, width, num_frames, simulate_sp=None):
        key = (float(height), float(width), int(num_frames),
               None if simulate_sp is None else int(simulate_sp))
        if key not in cache:
            step = make_train_step(
                model, scheduler, tx, height=key[0], width=key[1],
                num_frames=key[2], ema_decay=ema_decay, ema_mask=mask,
                simulate_sp=key[3])
            cache[key] = jax.jit(step, donate_argnums=0)
        return cache[key]

    get_step.tx = tx
    get_step.trainable = mask
    return state, get_step


def build_training(model, scheduler, params, cfg, *, height, width, num_frames,
                   freeze_patterns=()):
    """Single-bucket convenience wrapper over build_training_multibucket."""
    state, get_step = build_training_multibucket(
        model, scheduler, params, cfg, freeze_patterns=freeze_patterns)
    return state, get_step(height, width, num_frames)


def make_brushnet_train_step(model, scheduler, tx, *, height: float, width: float,
                             num_frames: int, ema_decay: float = 0.99,
                             ema_mask=None, sde: bool = False) -> Callable:
    """Train step for the BrushNet variants (reference scripts/train_brushnet.py /
    train_sde_brushnet.py loss paths; scheduler rectified_flow.py:177-332).

    batch additionally carries x_inpaint (b, 3*NC, T_img, H, W) and mask_inpaint
    (b, NC, T_img, H, W). For SDE, the scheduler samples an independent t_inpaint
    and the model adds structured noise internally (rng threaded via batch["rngs"]).
    """
    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        cond_keys = ("y", "maps", "bbox", "cams", "rel_pos", "fps",
                     "drop_cond_mask", "drop_frame_mask", "x_inpaint",
                     "mask_inpaint")
        cond = {k: batch[k] for k in cond_keys if k in batch}
        x = batch["x"]
        b = x.shape[0]
        frame_valid = batch.get("frame_valid")
        nf_valid = batch.get("num_frames_valid")
        mask = combine_frame_mask(batch.get("mask"), frame_valid)
        hw = dict(height=jnp.full((b,), float(height)),
                  width=jnp.full((b,), float(width)),
                  num_frames=jnp.full((b,), float(num_frames)) if nf_valid is None
                  else jnp.asarray(nf_valid, jnp.float32))
        loss_rng, noise_rng = jax.random.split(rng)

        def loss_fn(params):
            if sde:
                def model_fn(x_t, t, x_mask, t_inpaint):
                    return model.apply(params, x_t, t, **cond, height=float(height),
                                       width=float(width), x_mask=x_mask,
                                       t_inpaint=t_inpaint,
                                       num_timesteps=float(scheduler.num_timesteps),
                                       rngs_key=noise_rng, train=True,
                                       frame_valid=frame_valid)
            else:
                def model_fn(x_t, t, x_mask):
                    return model.apply(params, x_t, t, **cond, height=float(height),
                                       width=float(width), x_mask=x_mask,
                                       frame_valid=frame_valid)
            out = scheduler.training_losses(model_fn, loss_rng, x, mask=mask, **hw)
            return out["loss"].mean(), out["t"]

        (loss, t_used), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if new_ema is not None:
            new_ema = update_ema(new_ema, new_params, ema_decay, ema_mask)
        gnorm_grads = grads if ema_mask is None else jax.tree_util.tree_map(
            lambda g, m: g if m else jnp.zeros_like(g), grads, ema_mask)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(gnorm_grads),
                   "t_mean": t_used.mean()}
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt, ema_params=new_ema), metrics

    return train_step
