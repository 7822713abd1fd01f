"""Stitch per-camera pedestrian renders into per-scene 2x3-grid videos (reference
create_video_12hz.py, ~200 LoC)."""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CAMS = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--render-dir", required=True,
                   help="scene dir containing <CAM>/fXXXXX.png renders")
    p.add_argument("--out", default=None)
    p.add_argument("--fps", type=int, default=12)
    args = p.parse_args()

    import imageio

    frames_per_cam = {}
    for cam in CAMS:
        d = os.path.join(args.render_dir, cam)
        frames_per_cam[cam] = sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if f.endswith(".png")) if os.path.isdir(d) else []
    n = min(len(v) for v in frames_per_cam.values() if v) if any(
        frames_per_cam.values()) else 0
    assert n > 0, f"no renders under {args.render_dir}"
    out = args.out or args.render_dir.rstrip("/") + "_grid.mp4"
    with imageio.get_writer(out, fps=args.fps, codec="libx264") as w:
        for fi in range(n):
            row_imgs = [imageio.imread(frames_per_cam[c][fi]) for c in CAMS]
            top = np.concatenate(row_imgs[:3], axis=1)
            bottom = np.concatenate(row_imgs[3:], axis=1)
            w.append_data(np.concatenate([top, bottom], axis=0))
    print(f"wrote {out} ({n} frames)")


if __name__ == "__main__":
    main()
