"""Inference helpers: null conditions, 6-view tiling, mask strategies, sample saving.

(reference: magicdrivedit/utils/inference_utils.py)
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np


# Weather/time-of-day prompt editing (reference scripts/inference_magicdrive.py:402-430):
# force_daytime scrubs rain/night vocabulary and pins the city; force_rainy /
# force_night substitute a canonical prompt when the keyword is absent. Each mode
# also supplies a negative prompt that replaces the null-y in CFG.
_DAYTIME_SCRUBS = (
    ("rain", "sunny"), ("water reflections", ""), ("reflections in water", ""),
    (" with umbrellas", ""), (" with umbrella", ""), (" holds umbrella", ""),
    ("night", ""), (" in dark", ""), (" dark", ""), (" difficult lighting", ""),
    ("boston-seaport", "singapore-onenorth"),
    ("singapore-hollandvillage", "singapore-onenorth"),
)
_RAINY_PROMPT = "A driving scene image at boston-seaport. Rain. water reflections."
_NIGHT_PROMPT = ("A driving scene image at singapore-hollandvillage. "
                 "Night, congestion. difficult lighting. very dark.")
_NEG_PROMPTS = {
    "daytime": "Rain, Night, water reflections, umbrella",
    "rainy": "Daytime. night, onenorth, queenstown",
    "night": "Daytime. rain, boston-seaport",
}


def edit_prompt(prompt: str, *, force_daytime: bool = False,
                force_rainy: bool = False, force_night: bool = False):
    """Returns (edited_prompt, neg_prompt | None)."""
    if force_daytime:
        out = "Daytime. " + prompt.lower()
        for a, b in _DAYTIME_SCRUBS:
            out = out.replace(a, b)
        return out, _NEG_PROMPTS["daytime"]
    if force_rainy:
        out = prompt if "rain" in prompt.lower() else _RAINY_PROMPT
        return out, _NEG_PROMPTS["rainy"]
    if force_night:
        out = prompt if "night" in prompt.lower() else _NIGHT_PROMPT
        return out, _NEG_PROMPTS["night"]
    return prompt, None


def _null_cams_like(cams: jnp.ndarray, uncond: jnp.ndarray) -> jnp.ndarray:
    """cams: (BNC, T, 1, r, c); uncond: (r', c) broadcast to every entry."""
    r, c = uncond.shape
    out = jnp.zeros(cams.shape[:3] + (r, c), cams.dtype)
    return out + jnp.asarray(uncond, cams.dtype)[None, None, None]


def resolve_num_frames(cfg, cli_num_frames=None, app_name: str = "app") -> int:
    """Resolve cfg num_frames, honoring num_frames='full' LOUDLY: a full-length
    run needs full_bucket_t (an 8n+1 bucket max-T) or an explicit --num-frames
    — never a silent fallback to 17 (the round-3 class of coercion bugs)."""
    if cli_num_frames:
        return int(cli_num_frames)
    nf = cfg.get("num_frames", 17)
    if nf == "full":
        t = int(cfg.get("full_bucket_t", 0) or 0)
        if t % 8 != 1:
            raise ValueError(
                f"{app_name}: num_frames='full' needs full_bucket_t (an 8n+1 "
                "scene length) in the config or an explicit --num-frames; got "
                f"full_bucket_t={cfg.get('full_bucket_t')!r}")
        return t
    return int(nf)


def add_null_condition(model_args: Dict, uncond_cam, uncond_rel_pos,
                       prepend: bool = False, use_map0: bool = False) -> Dict:
    """Batched-CFG condition doubling (reference inference_utils.py:229-289): appends
    (or prepends) the null half — zeroed bbox (masks=0 -> null features), uncond cam /
    rel_pos parameters, and the *same* maps unless use_map0."""
    unchanged = {"mv_order_map", "t_order_map", "height", "width", "num_frames", "fps",
                 "rngs_key", "num_timesteps"}
    out = {}

    def cat(a, b):
        return jnp.concatenate(([b, a] if prepend else [a, b]), axis=0)

    for k, v in model_args.items():
        if k in unchanged or v is None:
            out[k] = v
        elif k == "bbox":
            out[k] = {kk: cat(vv, jnp.zeros_like(vv)) for kk, vv in v.items()}
        elif k == "cams":
            out[k] = cat(v, _null_cams_like(v, uncond_cam))
        elif k == "rel_pos":
            v = v[..., :-1, :] if v.shape[-2] == 4 else v
            out[k] = cat(v, _null_cams_like(v, uncond_rel_pos))
        elif k == "maps" and use_map0:
            out[k] = cat(v, jnp.zeros_like(v))
        else:
            # both halves are the same tensor, so cond/uncond order is moot
            out[k] = jnp.concatenate([v, v], axis=0)
    return out


def replace_with_null_condition(model_args: Dict, uncond_cam, uncond_rel_pos,
                                uncond_y, keys: Sequence[str],
                                append: bool = False) -> Dict:
    """Two-pass-CFG null replacement (reference inference_utils.py:144-226)."""
    keys = set(keys)
    out = dict(model_args)
    if "y" in keys and "y" in out:
        out["y"] = uncond_y if not append else jnp.concatenate([out["y"], uncond_y], 0)
    if "bbox" in keys and out.get("bbox") is not None:
        out["bbox"] = {k: jnp.zeros_like(v) for k, v in out["bbox"].items()}
    if "cams" in keys and "cams" in out:
        out["cams"] = _null_cams_like(out["cams"], uncond_cam)
    if "rel_pos" in keys and "rel_pos" in out:
        v = out["rel_pos"]
        v = v[..., :-1, :] if v.shape[-2] == 4 else v
        out["rel_pos"] = _null_cams_like(v, uncond_rel_pos)
    if "maps" in keys and "maps" in out:
        out["maps"] = jnp.zeros_like(out["maps"])
    return out


def concat_6_views(imgs: np.ndarray, oneline: bool = False) -> np.ndarray:
    """Tile 6 camera videos into a 2x3 grid (reference concat_6_views_pt,
    inference_utils.py). imgs: (6, C, T, H, W) -> (C, T, 2H, 3W) or one line."""
    assert imgs.shape[0] == 6
    if oneline:
        return np.concatenate(list(imgs), axis=-1)
    top = np.concatenate([imgs[0], imgs[1], imgs[2]], axis=-1)
    bottom = np.concatenate([imgs[3], imgs[4], imgs[5]], axis=-1)
    return np.concatenate([top, bottom], axis=-2)


def parse_mask_strategy(mask_strategy: Optional[str]) -> List[List[int]]:
    """Parse "loop,id,ref_start,target_start,len,edit_ratio" clauses
    (reference inference_utils.py mask-strategy parser)."""
    if not mask_strategy:
        return []
    out = []
    for clause in mask_strategy.split(";"):
        vals = [float(v) for v in clause.split(",")]
        vals = vals + [0] * (6 - len(vals))
        out.append(vals)
    return out


def apply_mask_strategy(mask: np.ndarray, strategies: List[List[float]],
                        loop_i: int = 0) -> np.ndarray:
    """Build the per-latent-frame float mask used for conditioning/extension."""
    for loop_id, _, ref_start, target_start, length, edit_ratio in strategies:
        if int(loop_id) != loop_i:
            continue
        ts, ln = int(target_start), int(length)
        mask[:, ts:ts + ln] = edit_ratio if edit_ratio > 0 else 0.0
    return mask


def to_uint8_video(x: np.ndarray) -> np.ndarray:
    """(C, T, H, W) float in [-1, 1] -> (T, H, W, C) uint8."""
    x = np.clip((x + 1) / 2, 0, 1)
    x = (x * 255).round().astype(np.uint8)
    return np.transpose(x, (1, 2, 3, 0))


def save_sample(x: np.ndarray, save_path: str, fps: int = 12,
                force_image: bool = False) -> str:
    """Save (C, T, H, W) in [-1,1] as mp4 (imageio/ffmpeg) or png(s)
    (reference datasets/utils.py:47-109)."""
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    vid = to_uint8_video(x)
    if vid.shape[0] == 1 or force_image:
        import imageio
        if vid.shape[0] == 1:
            path = save_path + ".png"
            imageio.imwrite(path, vid[0])
            return path
        os.makedirs(save_path, exist_ok=True)
        for i, frame in enumerate(vid):
            imageio.imwrite(os.path.join(save_path, f"{i:04d}.png"), frame)
        return save_path
    path = save_path + ".mp4"
    try:
        import imageio
        with imageio.get_writer(path, fps=fps, codec="libx264",
                                output_params=["-b:v", "4M"]) as w:
            for frame in vid:
                w.append_data(frame)
        return path
    except Exception:
        # no ffmpeg: fall back to per-frame pngs
        os.makedirs(save_path, exist_ok=True)
        import imageio
        for i, frame in enumerate(vid):
            imageio.imwrite(os.path.join(save_path, f"{i:04d}.png"), frame)
        return save_path
