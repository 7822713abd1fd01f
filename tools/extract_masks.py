"""Offline semantic-mask extraction for the BrushNet training data
(reference magicdrivedit/datasets/extract_masks.py:1-150: SegFormer cityscapes
inference -> per-camera `human/` and `vehicle/` binary PNG masks over
samples/ and sweeps/).

The reference pins an old mmsegmentation conda env for SegFormer; here the
default backend is transformers' SegFormer port (baked into this image; local
weights — e.g. a downloaded nvidia/segformer-b5-finetuned-cityscapes-1024-1024
snapshot — since there is no network egress), with mmseg kept as an optional
fallback for the reference's original checkpoint format. A `stub` backend
(flat-class output) keeps the walking/saving logic testable without weights.

Usage:
  python tools/extract_masks.py --data-root data/nuscenes \
      --save-root data/nuscenes_masks --segformer-path /path/to/weights
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

CAMS = ["CAM_FRONT", "CAM_FRONT_LEFT", "CAM_FRONT_RIGHT",
        "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]

# cityscapes trainIds (reference extract_masks.py:36-47)
GROUPS = {
    "human": [11, 12, 17, 18],    # person, rider, motorcycle, bicycle
    "vehicle": [13, 14, 15],      # car, truck, bus
}


class TransformersBackend:
    """SegFormer via transformers; returns the cityscapes trainId map."""

    def __init__(self, model_path: str, device: str = "cpu"):
        import torch
        from transformers import (SegformerForSemanticSegmentation,
                                  SegformerImageProcessor)
        self.torch = torch
        self.processor = SegformerImageProcessor.from_pretrained(model_path)
        self.model = SegformerForSemanticSegmentation.from_pretrained(model_path)
        self.model.to(device).eval()
        self.device = device

    def __call__(self, image_rgb: np.ndarray) -> np.ndarray:
        torch = self.torch
        inputs = self.processor(images=image_rgb,
                                return_tensors="pt").to(self.device)
        with torch.no_grad():
            logits = self.model(**inputs).logits
        up = torch.nn.functional.interpolate(
            logits, size=image_rgb.shape[:2], mode="bilinear",
            align_corners=False)
        return up.argmax(dim=1)[0].cpu().numpy().astype(np.uint8)


class MmsegBackend:
    """The reference's mmsegmentation + SegFormer-repo checkpoint path."""

    def __init__(self, config: str, checkpoint: str, device: str = "cpu"):
        from mmseg.apis import inference_segmentor, init_segmentor
        self.infer = inference_segmentor
        self.model = init_segmentor(config, checkpoint, device=device)

    def __call__(self, image_rgb: np.ndarray) -> np.ndarray:
        return self.infer(self.model, image_rgb[:, :, ::-1])[0].astype(np.uint8)


class StubBackend:
    """Deterministic fake segmentation (brightness-banded classes) so the
    directory walking + mask grouping is testable without model weights."""

    def __call__(self, image_rgb: np.ndarray) -> np.ndarray:
        lum = image_rgb.mean(axis=-1)
        return (lum / 256.0 * 19).astype(np.uint8)


def extract(data_root: str, save_root: str, backend, subdirs=("samples", "sweeps"),
            ignore_existing: bool = False, limit: int = 0) -> int:
    from PIL import Image
    count = 0
    for sub in subdirs:
        for cam in CAMS:
            cam_dir = os.path.join(data_root, sub, cam)
            if not os.path.isdir(cam_dir):
                continue
            out_dirs = {g: os.path.join(save_root, g, sub, cam) for g in GROUPS}
            for d in out_dirs.values():
                os.makedirs(d, exist_ok=True)
            for name in sorted(os.listdir(cam_dir)):
                if not name.lower().endswith((".jpg", ".png")):
                    continue
                outs = {g: os.path.join(out_dirs[g],
                                        os.path.splitext(name)[0] + ".png")
                        for g in GROUPS}
                if ignore_existing and all(os.path.exists(p)
                                           for p in outs.values()):
                    continue
                img = np.asarray(Image.open(
                    os.path.join(cam_dir, name)).convert("RGB"))
                seg = backend(img)
                for g, ids in GROUPS.items():
                    mask = np.isin(seg, ids).astype(np.uint8) * 255
                    Image.fromarray(mask).save(outs[g])
                count += 1
                if limit and count >= limit:
                    return count
                if count % 100 == 0:
                    print(f"{count} images")
    return count


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--save-root", required=True)
    p.add_argument("--backend", choices=["transformers", "mmseg", "stub"],
                   default="transformers")
    p.add_argument("--segformer-path",
                   default="./pretrained/segformer-b5-cityscapes",
                   help="transformers weights dir (no egress: must be local)")
    p.add_argument("--config", default="third_party/SegFormer/local_configs/"
                   "segformer/B5/segformer.b5.1024x1024.city.160k.py")
    p.add_argument("--checkpoint", default="./pretrained/segformer.b5.1024x1024."
                   "city.160k.pth")
    p.add_argument("--device", default="cpu")
    p.add_argument("--ignore-existing", action="store_true")
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args()

    if args.backend == "transformers":
        try:
            backend = TransformersBackend(args.segformer_path, args.device)
        except Exception as e:
            sys.exit(f"transformers SegFormer backend failed ({e}); pass "
                     f"--segformer-path to local weights or --backend stub")
    elif args.backend == "mmseg":
        backend = MmsegBackend(args.config, args.checkpoint, args.device)
    else:
        backend = StubBackend()
    n = extract(args.data_root, args.save_root, backend,
                ignore_existing=args.ignore_existing, limit=args.limit)
    print(f"done: {n} images -> {args.save_root}")


if __name__ == "__main__":
    main()
