"""PNG-folder -> mp4 (reference tools/imgFoler2vid.py, 61 LoC)."""
from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("folder")
    p.add_argument("--fps", type=int, default=12)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import imageio

    frames = sorted(f for f in os.listdir(args.folder)
                    if f.endswith((".png", ".jpg")))
    assert frames, f"no frames in {args.folder}"
    out = args.out or args.folder.rstrip("/") + ".mp4"
    with imageio.get_writer(out, fps=args.fps, codec="libx264",
                            output_params=["-b:v", "4M"]) as w:
        for f in frames:
            w.append_data(imageio.imread(os.path.join(args.folder, f)))
    print(f"wrote {out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
