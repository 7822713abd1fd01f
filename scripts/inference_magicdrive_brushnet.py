"""BrushNet inpainting generation (reference scripts/inference_magicdrive_brushnet.py
685 LoC / inference_magicdrive_sde_brushnet.py 690 LoC; SURVEY.md §2.11).

Like inference_magicdrive.py plus pedestrian inpaint inputs: per-view rendered
pedestrian videos + masks (reference :95-127 loads them from the SMPL pipeline's
output; --synthetic generates stand-ins). The SDE variant feeds a fixed
t_inpaint = inpaint_noise_scale * num_timesteps (reference rf/__init__.py:121-423).

Usage:
  python scripts/inference_magicdrive_brushnet.py CONFIG --synthetic [--sde]
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger("inference_brushnet")


def load_pedestrian_inputs(ped_dir: str, num_frames: int, height: int, width: int,
                           nc: int = 6):
    """Load per-view pedestrian renders + masks from the SMPL pipeline's output tree
    (reference inference_magicdrive_brushnet.py:95-127: <dir>/<CAM>/{rgb,mask} pngs
    or mp4)."""
    import imageio
    cams = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
            "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT"]
    imgs = np.zeros((nc, 3, num_frames, height, width), np.float32)
    masks = np.zeros((nc, 1, num_frames, height, width), np.float32)
    for ci, cam in enumerate(cams):
        vid_path = os.path.join(ped_dir, f"{cam}.mp4")
        mask_path = os.path.join(ped_dir, f"{cam}_mask.mp4")
        if not os.path.isfile(vid_path):
            continue
        frames = imageio.mimread(vid_path, memtest=False)[:num_frames]
        mframes = imageio.mimread(mask_path, memtest=False)[:num_frames]
        for ti, (f, m) in enumerate(zip(frames, mframes)):
            imgs[ci, :, ti] = np.transpose(f[:height, :width] / 127.5 - 1, (2, 0, 1))
            masks[ci, 0, ti] = (np.asarray(m)[:height, :width, 0] > 127)
    return imgs, masks


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="*", default=[])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--sde", action="store_true")
    p.add_argument("--ped-dir", default=None,
                   help="pedestrian render dir from pipeline_12hz")
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--num-frames", type=int, default=None)
    p.add_argument("--inpaint-noise-scale", type=float, default=None)
    p.add_argument("--ckpt-path", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()  # persistent XLA cache: relay compiles are 10-25 min

    from magicdrive_v2_tpu.config import Config, merge_dot_options
    from magicdrive_v2_tpu.pipelines.magicdrive import (MagicDrivePipeline,
                                                        synthetic_batch)
    from magicdrive_v2_tpu.utils.ckpt import convert_torch_state_dict, load_torch_file
    from magicdrive_v2_tpu.utils.inference_utils import concat_6_views, save_sample

    cfg = Config.fromfile(args.config)
    merge_dot_options(cfg, args.cfg_options)
    if args.sde and "SDE" not in str(cfg.model.get("type", "")):
        cfg.model["type"] = "MagicDriveSTDiT3-XL/2-SDEBrushNet"
    elif "BrushNet" not in str(cfg.model.get("type", "")):
        cfg.model["type"] = "MagicDriveSTDiT3-XL/2-BrushNet"

    from magicdrive_v2_tpu.utils.inference_utils import resolve_num_frames
    num_frames = resolve_num_frames(cfg, args.num_frames, 'inference_brushnet')
    height, width = cfg.get("image_size", (224, 400))
    out_dir = cfg.get("outputs", "outputs/inference_brushnet")
    os.makedirs(out_dir, exist_ok=True)

    pipe = MagicDrivePipeline.from_config(cfg)
    sde = pipe.model.cfg.sde_inpaint
    ckpt = args.ckpt_path or cfg.get("ckpt_path")
    if ckpt and ckpt != "???":
        if not os.path.exists(ckpt):
            # a configured-but-missing checkpoint must not silently fall
            # back to random init (VERDICT r3 item 8 class)
            raise FileNotFoundError(f"ckpt_path {ckpt!r} does not exist")
        sd = load_torch_file(ckpt)
        pipe.params = jax.tree_util.tree_map(
            jnp.asarray,
            convert_torch_state_dict(sd, pipe.params,
                                     control_depth=pipe.model.cfg.control_depth,
                                     strict=False))
    pipe.prepare_text_embedding()

    nc = pipe.model.cfg.nc
    noise_scale = (args.inpaint_noise_scale
                   if args.inpaint_noise_scale is not None
                   else cfg.scheduler.get("inpaint_noise_scale", 0.2))
    n = args.num_samples or cfg.get("num_sample", 1)

    for ns in range(n):
        batch = synthetic_batch(pipe.model.cfg, num_frames=num_frames, height=height,
                                width=width, l_txt=pipe.text_encoder.model_max_length,
                                seed=ns)
        batch.pop("timestep"), batch.pop("height"), batch.pop("width")
        b = 1
        if args.ped_dir:
            imgs, masks = load_pedestrian_inputs(args.ped_dir, num_frames, height,
                                                 width, nc)
            # model expects channel-major (b, 3*NC, ...) like the latents
            # (brushnet.py reshapes as (b, 3, NC, ...))
            batch["x_inpaint"] = jnp.asarray(
                imgs.transpose(1, 0, 2, 3, 4).reshape(b, 3 * nc, num_frames,
                                                      height, width))
            batch["mask_inpaint"] = jnp.asarray(masks.reshape(b, nc, num_frames,
                                                              height, width))
        else:
            rng_np = np.random.default_rng(ns)
            batch["x_inpaint"] = jnp.asarray(rng_np.standard_normal(
                (b, 3 * nc, num_frames, height, width)).astype(np.float32))
            batch["mask_inpaint"] = jnp.asarray(rng_np.integers(
                0, 2, (b, nc, num_frames, height, width)).astype(np.float32))
        if sde:
            batch["t_inpaint"] = jnp.full(
                (b,), noise_scale * pipe.scheduler.num_timesteps)
            batch["rngs_key"] = jax.random.PRNGKey(1024 + ns)

        rng = jax.random.PRNGKey(1024 + ns)
        vids = pipe.sample(batch, num_frames=num_frames, height=height, width=width,
                           rng=rng)
        for bi in range(vids.shape[0]):
            path = os.path.join(out_dir, f"sample_{ns}_{bi}")
            save_sample(concat_6_views(vids[bi]), path, fps=cfg.get("save_fps", 12))
            logger.info("saved %s", path)


if __name__ == "__main__":
    main()
