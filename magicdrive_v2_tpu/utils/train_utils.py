"""Training utilities: optimizer/EMA state, frame-mask sampling, condition dropout.

TPU-native replacement for the reference's ColossalAI runtime (reference:
magicdrivedit/utils/train_utils.py, acceleration/plugin.py). ZeRO-2 becomes
FSDP-style `NamedSharding` of fp32 params + optax state over the 'dp' mesh axis
(parallel/fsdp.py); bf16 compute needs no loss scaling; EMA is a sharded tree op.
"""
from __future__ import annotations

import math
import random as pyrandom
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

# ---------------------------------------------------------------------------
# trainable-parameter masking (replaces torch requires_grad flags; reference
# magicdrive_stdit3.py:652-776 freeze logic + buffers)
# ---------------------------------------------------------------------------

# torch buffers in the reference -> never trained
BUFFER_PATTERNS = ("base_token", "y_embedding", "class_tokens")


def trainable_mask(params, freeze_patterns: Sequence[str] = ()) -> Any:
    """Bool pytree: False for buffers and any path matching freeze_patterns.
    Patterns match on '/'-joined param paths (substring)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    patterns = tuple(freeze_patterns) + BUFFER_PATTERNS
    mask = {k: not any(p in k for p in patterns) for k in flat}
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in mask.items()})


def multistep_warmup_schedule(lr: float, warmup_steps: int = 0,
                              milestones: Sequence[int] = (),
                              gamma: float = 0.1):
    """MultiStepWithLinearWarmupLR (reference utils/lr_scheduler.py:4-55):
    linear warmup to `lr`, then multiply by `gamma` at each milestone step."""
    milestones = sorted(milestones)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum(1.0, (step + 1) / max(warmup_steps, 1)) if warmup_steps \
            else jnp.asarray(1.0)
        decay = 1.0
        for m in milestones:
            decay = decay * jnp.where(step >= m, gamma, 1.0)
        return lr * warm * decay

    return schedule


def make_optimizer(lr, weight_decay: float = 1e-2, adam_eps: float = 1e-15,
                   grad_clip: float = 1.0, warmup_steps: int = 0,
                   milestones: Sequence[int] = (), gamma: float = 0.1,
                   trainable: Optional[Any] = None) -> optax.GradientTransformation:
    """AdamW + warmup(+multistep) + clip (reference HybridAdam + LinearWarmupLR /
    MultiStepWithLinearWarmupLR, train_magicdrive.py:331-349, lr_scheduler.py)."""
    if not callable(lr) and (warmup_steps or milestones):
        lr = multistep_warmup_schedule(lr, warmup_steps, milestones, gamma)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=0.9, b2=0.999, eps=adam_eps, weight_decay=weight_decay),
    )
    if trainable is not None:
        tx = optax.multi_transform(
            {True: tx, False: optax.set_to_zero()},
            jax.tree_util.tree_map(bool, trainable))
    return tx


def update_ema(ema_params, params, decay: float = 0.9999, mask=None):
    """ema = decay*ema + (1-decay)*param on fp32 master weights (reference update_ema,
    train_utils.py:509-537). mask=False entries copy through unchanged."""
    if mask is None:
        return jax.tree_util.tree_map(
            lambda e, p: e * decay + p.astype(e.dtype) * (1 - decay), ema_params, params)
    return jax.tree_util.tree_map(
        lambda e, p, m: e * decay + p.astype(e.dtype) * (1 - decay) if m else e,
        ema_params, params, mask)


# ---------------------------------------------------------------------------
# MaskGenerator (reference train_utils.py:540-637) — host-side numpy
# ---------------------------------------------------------------------------

VALID_MASK_NAMES = [
    "identity", "quarter_random", "quarter_head", "quarter_tail", "quarter_head_tail",
    "image_random", "image_head", "image_tail", "image_head_tail", "random",
    "intepolate",
]


class MaskGenerator:
    def __init__(self, mask_ratios: Dict[str, float], rng: Optional[pyrandom.Random] = None):
        mask_ratios = dict(mask_ratios)
        assert all(k in VALID_MASK_NAMES for k in mask_ratios)
        assert all(0 <= v <= 1 for v in mask_ratios.values())
        if "identity" not in mask_ratios:
            mask_ratios["identity"] = 1.0 - sum(mask_ratios.values())
        assert math.isclose(sum(mask_ratios.values()), 1.0, abs_tol=1e-6)
        self.mask_ratios = mask_ratios
        self.rng = rng or pyrandom.Random()

    def get_mask(self, num_frames: int) -> np.ndarray:
        r = self.rng
        u = r.random()
        acc, name = 0.0, "identity"
        for k, v in self.mask_ratios.items():
            acc += v
            if u < acc:
                name = k
                break

        cond_max = num_frames // 4
        mask = np.ones(num_frames, dtype=bool)
        if num_frames <= 1 or cond_max <= 1:
            return mask
        if name == "quarter_random":
            size = r.randint(1, cond_max)
            pos = r.randint(0, num_frames - size)
            mask[pos:pos + size] = False
        elif name == "image_random":
            pos = r.randint(0, num_frames - 1)
            mask[pos] = False
        elif name == "quarter_head":
            mask[:r.randint(1, cond_max)] = False
        elif name == "image_head":
            mask[:1] = False
        elif name == "quarter_tail":
            mask[-r.randint(1, cond_max):] = False
        elif name == "image_tail":
            mask[-1:] = False
        elif name == "quarter_head_tail":
            size = r.randint(1, cond_max)
            mask[:size] = False
            mask[-size:] = False
        elif name == "image_head_tail":
            mask[:1] = False
            mask[-1:] = False
        elif name == "intepolate":
            mask[r.randint(0, 1)::2] = False
        elif name == "random":
            ratio = r.uniform(0.1, 0.9)
            mask = np.array([r.random() > ratio for _ in range(num_frames)])
        if not mask.any():
            mask[-1] = True
        return mask

    def get_masks(self, batch_size: int, num_frames: int,
                  valid: Optional[np.ndarray] = None) -> np.ndarray:
        """Per-sample masks. `valid` (b,) anchors each sample's mask to its
        TRUE latent length inside a padded full-length bucket: head/tail
        semantics follow the real clip, and at least one VALID frame always
        stays True (an all-pad denoise set would make the loss 0/0 = NaN)."""
        if valid is None:
            return np.stack([self.get_mask(num_frames) for _ in range(batch_size)])
        masks = np.zeros((batch_size, num_frames), bool)
        for i in range(batch_size):
            t = min(int(valid[i]), num_frames)
            masks[i, :t] = self.get_mask(t)
        return masks


def sample_condition_dropout(rng: pyrandom.Random, b: int, t: int,
                             drop_cond_ratio: float = 0.15,
                             drop_cond_ratio_t: float = 0.4
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-sample condition dropout masks (reference train_magicdrive.py:549-564):
    with p=drop_cond_ratio drop the whole scene's conditions; given a drop, each frame's
    box/rel_pos conditions drop with p=drop_cond_ratio_t."""
    drop_cond = np.ones(b, np.float32)
    drop_frame = np.ones((b, t), np.float32)
    for i in range(b):
        if rng.random() < drop_cond_ratio:
            drop_cond[i] = 0.0
            for j in range(t):
                if rng.random() < drop_cond_ratio_t:
                    drop_frame[i, j] = 0.0
    return drop_cond, drop_frame


# ---------------------------------------------------------------------------
# in-training validation (reference run_validation, train_utils.py:26-468)
# ---------------------------------------------------------------------------


def run_validation(pipe, val_batches, *, num_frames: int, height: int, width: int,
                   out_dir: str, step: int, guidance_scale: float = 2.0,
                   fps: int = 12, params=None):
    """Render fixed validation samples with fixed seeds and save 2x3-grid videos
    (reference train_utils.py:268-468: fixed `validation_index`, fixed generators,
    gathered across DP and saved with GT). `pipe` is a MagicDrivePipeline; pass
    `params` (e.g. EMA) to sample from the training state instead of init weights.
    """
    import os

    import jax

    from .inference_utils import concat_6_views, save_sample

    old_params = pipe.params
    if params is not None:
        pipe.params = params
    paths = []
    try:
        os.makedirs(out_dir, exist_ok=True)
        for vi, batch in enumerate(val_batches):
            rng = jax.random.PRNGKey(1024 + vi)  # reference's fixed seed contract
            vids = pipe.sample(dict(batch), num_frames=num_frames, height=height,
                               width=width, guidance_scale=guidance_scale, rng=rng)
            for bi in range(vids.shape[0]):
                grid = concat_6_views(vids[bi])
                paths.append(save_sample(
                    grid, os.path.join(out_dir, f"step{step}_val{vi}_{bi}"),
                    fps=fps))
    finally:
        pipe.params = old_params
    return paths
