"""Offline semantic-mask extraction (reference
magicdrivedit/datasets/extract_masks.py, 140 LoC: SegFormer Vehicle/human masks for
the BrushNet training data).

Writes per-image binary PNG masks for the requested cityscapes-style classes.
Requires mmsegmentation + the SegFormer checkpoint (reference uses the
third_party/SegFormer submodule in a dedicated docker); gated import.

Usage:
  python tools/extract_masks.py --img-root data/nuscenes/samples \
      --out-root data/nuscenes_masks --classes person rider
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# cityscapes trainId for the classes the reference extracts
CLASS_IDS = {"person": 11, "rider": 12, "car": 13, "truck": 14, "bus": 15,
             "motorcycle": 17, "bicycle": 18}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img-root", required=True)
    p.add_argument("--out-root", required=True)
    p.add_argument("--classes", nargs="+", default=["person", "rider"])
    p.add_argument("--config", default="third_party/SegFormer/local_configs/"
                   "segformer/B5/segformer.b5.1024x1024.city.160k.py")
    p.add_argument("--checkpoint", default="./pretrained/segformer.b5.1024x1024."
                   "city.160k.pth")
    args = p.parse_args()

    try:
        from mmseg.apis import inference_segmentor, init_segmentor
    except ImportError as e:
        sys.exit(f"extract_masks needs mmsegmentation + SegFormer: {e}")
    from PIL import Image

    model = init_segmentor(args.config, args.checkpoint, device="cpu")
    ids = [CLASS_IDS[c] for c in args.classes]
    count = 0
    for root, _dirs, files in os.walk(args.img_root):
        for name in sorted(files):
            if not name.lower().endswith((".jpg", ".png")):
                continue
            src = os.path.join(root, name)
            rel = os.path.relpath(src, args.img_root)
            dst = os.path.join(args.out_root, os.path.splitext(rel)[0] + "_mask.png")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            seg = inference_segmentor(model, src)[0]
            mask = np.isin(seg, ids).astype(np.uint8) * 255
            Image.fromarray(mask).save(dst)
            count += 1
            if count % 100 == 0:
                print(f"{count} masks")
    print(f"done: {count} masks -> {args.out_root}")


if __name__ == "__main__":
    main()
