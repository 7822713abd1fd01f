"""Generation app (reference scripts/inference_magicdrive.py, 546 LoC; SURVEY.md §3.2).

Flow: config -> pipeline (model + CogVAE + T5 + rflow scheduler) -> optionally load a
converted reference checkpoint (ema.pt / .safetensors via utils/ckpt) -> per-sample
loop: conditioning from the nuScenes val set (or synthetic), seeded latents
(seed 1024+ns like the reference, inference_magicdrive.py:434), CFG sampling, VAE
decode, 2x3 six-view grid save.

Usage:
  python scripts/inference_magicdrive.py configs/magicdrive/inference/XXX.py \
      [--synthetic] [--num-samples 2] [--cfg-options key=value ...]
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logger = logging.getLogger("inference")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="*", default=[])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--num-frames", type=int, default=None,
                   help="override clip length (e.g. 9 for a smoke run)")
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
    from magicdrive_v2_tpu.utils.inference_utils import (concat_6_views,
                                                         edit_prompt, save_sample)

    cfg = Config.fromfile(args.config)
    merge_dot_options(cfg, args.cfg_options)

    # num_frames="full": generate the WHOLE scene (reference headline capability,
    # README_OLD.md:218 / fullx* configs). Scene lengths are ragged, so all
    # scenes pad to one bucket max-T (full_bucket_t, or the val set's longest
    # clip) and share ONE compiled program; frame_valid masks the pad frames
    # and the decoded video is trimmed back to the true length.
    full_length = cfg.get("num_frames") == "full" and args.num_frames is None
    num_frames = args.num_frames or (None if full_length
                                     else cfg.get("num_frames", 17))
    height, width = cfg.get("image_size", (224, 400))
    out_dir = cfg.get("outputs", "outputs/inference")
    os.makedirs(out_dir, exist_ok=True)

    pipe = MagicDrivePipeline.from_config(cfg)
    ckpt = args.ckpt_path or cfg.get("ckpt_path")
    if ckpt and ckpt != "???":
        if not os.path.exists(ckpt):
            # a configured-but-missing checkpoint must not silently fall
            # back to random init (VERDICT r3 item 8 class)
            raise FileNotFoundError(f"ckpt_path {ckpt!r} does not exist")
        logger.info("loading reference checkpoint %s", ckpt)
        sd = load_torch_file(ckpt)
        pipe.params = jax.tree_util.tree_map(
            jnp.asarray,
            convert_torch_state_dict(sd, pipe.params,
                                     control_depth=pipe.model.cfg.control_depth,
                                     strict=False))
    pipe.prepare_text_embedding()

    # conditioning source
    if args.synthetic or "dataset" not in cfg:
        if full_length:
            # synthetic clips have no natural scene length: run the whole
            # bucket as valid frames (full_bucket_t required — no silent
            # fallback to a short clip; VERDICT r3 item 8)
            num_frames = int(cfg.get("full_bucket_t", 0))
            if num_frames % 8 != 1:
                raise ValueError(
                    "num_frames='full' with synthetic conditioning needs "
                    "full_bucket_t (an 8n+1 scene length) in the config; "
                    f"got {num_frames!r}")

        def get_batch(ns):
            b = synthetic_batch(pipe.model.cfg, num_frames=num_frames, height=height,
                                width=width, l_txt=pipe.text_encoder.model_max_length,
                                seed=ns)
            b.pop("timestep")
            return b
        indices = list(range(args.num_samples or cfg.get("num_sample", 1)))
    else:
        from magicdrive_v2_tpu.datasets import (clip_to_model_batch, collate_clips,
                                                pad_model_batch_to_t)
        from magicdrive_v2_tpu.registry import DATASETS, build_module
        ds_cfg = dict(cfg.dataset.data.val)
        # thread the clip length into the dataset (same contract as the train
        # app, train_magicdrive.py): "full" builds whole-scene clips
        ds_cfg.setdefault("video_length", args.num_frames
                          or cfg.get("num_frames", 17))
        dataset = build_module(ds_cfg, DATASETS)
        if full_length:
            from magicdrive_v2_tpu.datasets.nuscenes import max_full_clip_len
            num_frames = int(cfg.get("full_bucket_t", 0)) or \
                max_full_clip_len(dataset)
            if num_frames % 8 != 1:
                raise ValueError(
                    f"full bucket length must be 8n+1, got {num_frames}")
            logger.info("full-length generation: bucket max-T = %d frames",
                        num_frames)

        def get_batch(ns):
            clip = dataset[cfg.validation_index[ns]]
            batch = clip_to_model_batch(collate_clips([clip]))
            if full_length:
                batch = pad_model_batch_to_t(batch, num_frames)
            captions = batch.pop("captions")
            # force_daytime/rainy/night prompt editing (reference
            # inference_magicdrive.py:402-430); negative prompt replaces null-y
            edited, neg = zip(*(edit_prompt(
                c, force_daytime=cfg.get("force_daytime", False),
                force_rainy=cfg.get("force_rainy", False),
                force_night=cfg.get("force_night", False)) for c in captions))
            y = pipe.text_encoder.encode(list(edited))
            batch["y"] = y["y"]
            if any(n is not None for n in neg):
                batch["neg_prompts"] = [n or "" for n in neg]
            return batch
        indices = (cfg.get("validation_index", [0]))[: args.num_samples or None]

    guidance = cfg.scheduler.get("cfg_scale", 2.0)
    bbox_param = dict(cfg.model.get("bbox_embedder_param", {}))
    for ns, _idx in enumerate(indices):
        batch = get_batch(ns)
        batch.pop("height", None), batch.pop("width", None)
        batch.pop("num_frames", None)
        t_valid = (None if "num_frames_valid" not in batch
                   else int(np.asarray(batch["num_frames_valid"])[0]))
        rng = jax.random.PRNGKey(1024 + ns)
        neg = batch.pop("neg_prompts", None)
        # reference seed contract (inference_magicdrive.py:434-440): ONE torch
        # generator per sample, z drawn first, box latents next from the same
        # stream — bit-comparable frames at matched seeds.
        from magicdrive_v2_tpu.utils.misc import add_box_latent, torch_randn_stream
        draw = torch_randn_stream(1024 + ns)
        mc = pipe.model.cfg
        b = 1
        lat_t, lat_h, lat_w = pipe.vae.get_latent_size([num_frames, height, width])
        z = jnp.asarray(draw((b, mc.in_channels * mc.nc, lat_t, lat_h, lat_w)))
        if bbox_param.get("sample_id") and "bbox" in batch \
                and "box_latent" not in batch["bbox"]:
            dim = bbox_param.get("class_token_dim", 1152)
            batch["bbox"] = add_box_latent(
                batch["bbox"], b, mc.nc, num_frames,
                lambda n: draw((n, dim)))
        vids = pipe.sample(batch, num_frames=num_frames, height=height, width=width,
                           guidance_scale=guidance, rng=rng, neg_prompts=neg, z=z)
        # vids: (b, NC, 3, T, H, W) float in [-1, 1]
        if t_valid is not None and t_valid < vids.shape[3]:
            vids = vids[:, :, :, :t_valid]  # drop bucket pad frames
        for bi in range(vids.shape[0]):
            grid = concat_6_views(vids[bi])  # (3, T, 2H, 3W)
            path = os.path.join(out_dir, f"sample_{ns}_{bi}")
            save_sample(grid, path, fps=cfg.get("save_fps", 12))
            logger.info("saved %s", path)


if __name__ == "__main__":
    main()
