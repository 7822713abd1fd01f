"""W-CODA2024 Track2 benchmark generation app (reference scripts/test_magicdrive.py,
552 LoC; SURVEY.md §2.11).

Like inference_magicdrive.py, plus the benchmark submission plumbing:
- back-transform each generated view to the original nuScenes resolution
  (bicubic resize + pad, reference test_magicdrive.py:256-266; e.g. 424x800 ->
  848x1600 + pad 52 top -> 900x1600);
- save_mode in {single-view, all-in-one, image_filename} (reference :135-136);
- use_map0: CFG against a zeroed map instead of learned null (reference use_map0).

Usage:
  python scripts/test_magicdrive.py configs/magicdrive/inference/XXX.py \
      [--synthetic] [--save-mode single-view] [--num-frames 9]
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger("test")


def back_transform(vid: np.ndarray, resize_hw, padding) -> np.ndarray:
    """(C, T, H, W) in [-1, 1] -> bicubic resize to resize_hw then pad
    (left, top, right, bottom) with zeros (reference test_magicdrive.py:256-266)."""
    from PIL import Image
    C, T, H, W = vid.shape
    rh, rw = resize_hw
    left, top, right, bottom = padding
    out = np.zeros((C, T, rh + top + bottom, rw + left + right), vid.dtype)
    for t in range(T):
        frame = np.transpose(vid[:, t], (1, 2, 0))  # HWC
        img = Image.fromarray(
            ((np.clip(frame, -1, 1) + 1) * 127.5).astype(np.uint8))
        img = img.resize((rw, rh), Image.BICUBIC)
        arr = np.asarray(img).astype(vid.dtype) / 127.5 - 1.0
        out[:, t, top:top + rh, left:left + rw] = np.transpose(arr, (2, 0, 1))
    return out


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="*", default=[])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--num-frames", type=int, default=None)
    p.add_argument("--save-mode", default=None,
                   choices=["single-view", "all-in-one", "image_filename"])
    p.add_argument("--ckpt-path", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    import jax
    import jax.numpy as jnp

    from magicdrive_v2_tpu.config import Config, merge_dot_options
    from magicdrive_v2_tpu.pipelines.magicdrive import (MagicDrivePipeline,
                                                        synthetic_batch)
    from magicdrive_v2_tpu.utils.ckpt import convert_torch_state_dict, load_torch_file
    from magicdrive_v2_tpu.utils.inference_utils import concat_6_views, save_sample

    cfg = Config.fromfile(args.config)
    merge_dot_options(cfg, args.cfg_options)
    save_mode = args.save_mode or cfg.get("save_mode", "single-view")
    use_back_trans = cfg.get("use_back_trans", True)
    post = cfg.get("post", Config(resize=(448, 800), padding=(0, 2, 0, 0)))

    num_frames = args.num_frames or (17 if cfg.get("num_frames") == "full"
                                     else cfg.get("num_frames", 17))
    height, width = cfg.get("image_size", (224, 400))
    out_dir = cfg.get("outputs", "outputs/test")
    os.makedirs(out_dir, exist_ok=True)

    pipe = MagicDrivePipeline.from_config(cfg)
    ckpt = args.ckpt_path or cfg.get("ckpt_path")
    if ckpt and os.path.exists(ckpt):
        sd = load_torch_file(ckpt)
        pipe.params = jax.tree_util.tree_map(
            jnp.asarray,
            convert_torch_state_dict(sd, pipe.params,
                                     control_depth=pipe.model.cfg.control_depth,
                                     strict=False))
    pipe.prepare_text_embedding()

    if args.synthetic or "dataset" not in cfg:
        def get_batch(ns):
            b = synthetic_batch(pipe.model.cfg, num_frames=num_frames, height=height,
                                width=width, l_txt=pipe.text_encoder.model_max_length,
                                seed=ns)
            b.pop("timestep")
            return b, [f"synthetic_{ns}"]
        indices = list(range(args.num_samples or cfg.get("num_sample", 1)))
    else:
        from magicdrive_v2_tpu.datasets import clip_to_model_batch, collate_clips
        from magicdrive_v2_tpu.registry import DATASETS, build_module
        dataset = build_module(dict(cfg.dataset.data.val), DATASETS)

        def get_batch(ns):
            clip = dataset[cfg.validation_index[ns]]
            batch = clip_to_model_batch(collate_clips([clip]))
            y = pipe.text_encoder.encode(batch.pop("captions"))
            batch["y"] = y["y"]
            return batch, [f"scene_{cfg.validation_index[ns]}"]
        indices = (cfg.get("validation_index", [0]))[: args.num_samples or None]

    if cfg.get("use_map0", False):
        # CFG null map = zeros instead of the learned uncond map
        logger.info("use_map0: zeroed uncond maps in CFG")

    guidance = cfg.scheduler.get("cfg_scale", 2.0)
    view_names = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
                  "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT"]
    for ns, _idx in enumerate(indices):
        batch, names = get_batch(ns)
        batch.pop("height", None), batch.pop("width", None)
        rng = jax.random.PRNGKey(1024 + ns)
        vids = pipe.sample(batch, num_frames=num_frames, height=height, width=width,
                           guidance_scale=guidance, rng=rng,
                           torch_seed=1024 + ns)  # reference seed contract
        for bi in range(vids.shape[0]):
            sample = vids[bi]  # (NC, 3, T, H, W)
            if use_back_trans:
                sample = np.stack([back_transform(v, tuple(post.resize),
                                                  tuple(post.padding))
                                   for v in sample])
            tag = names[min(bi, len(names) - 1)]
            if save_mode == "all-in-one":
                save_sample(concat_6_views(sample),
                            os.path.join(out_dir, f"{tag}"),
                            fps=cfg.get("save_fps", 12))
            elif save_mode == "single-view":
                for vi, v in enumerate(sample):
                    save_sample(v, os.path.join(out_dir, f"{tag}_{view_names[vi]}"),
                                fps=cfg.get("save_fps", 12))
            else:  # image_filename: per-frame pngs in nuScenes-style layout
                for vi, v in enumerate(sample):
                    save_sample(v, os.path.join(out_dir, tag, view_names[vi]),
                                fps=cfg.get("save_fps", 12), force_image=True)
        logger.info("sample %d saved (%s)", ns, save_mode)


if __name__ == "__main__":
    main()
