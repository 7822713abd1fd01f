"""Resume bookkeeping for the pedestrian pipeline (reference check_progress.py):
report which scenes have harvest/dense/render outputs."""
from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--work-dir", default="./outputs/pedestrian")
    p.add_argument("--num-scenes", type=int, default=850)
    args = p.parse_args()
    stages = {"harvest": "_harvest.pkl", "dense": "_dense.pkl", "render": "_render"}
    done = {k: [] for k in stages}
    for i in range(args.num_scenes):
        for stage, suffix in stages.items():
            if os.path.exists(os.path.join(args.work_dir, f"scene{i}{suffix}")):
                done[stage].append(i)
    for stage, idxs in done.items():
        print(f"{stage}: {len(idxs)}/{args.num_scenes} done")
    todo = [i for i in range(args.num_scenes) if i not in set(done["render"])]
    print("next:", todo[:20])


if __name__ == "__main__":
    main()
