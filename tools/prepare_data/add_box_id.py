"""Inject per-box instance ids into existing infos pkls (reference
tools/prepare_data/add_box_id.py): adds `gt_box_ids` from nuScenes
sample_annotation instance tokens so the token-aligned bbox processor can track
boxes across frames."""
from __future__ import annotations

import argparse
import pickle


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--info-file", required=True)
    p.add_argument("--out-file", required=True)
    p.add_argument("--dataroot", default="./data/nuscenes")
    p.add_argument("--version", default="v1.0-trainval")
    args = p.parse_args()

    from nuscenes.nuscenes import NuScenes
    nusc = NuScenes(version=args.version, dataroot=args.dataroot)

    with open(args.info_file, "rb") as f:
        data = pickle.load(f)
    n_done = 0
    for info in data["infos"]:
        if "gt_box_ids" in info:
            continue
        token = info["token"].split(";")[0]  # interpolated frames share the keyframe
        sample = nusc.get("sample", token)
        ids = [nusc.get("sample_annotation", a)["instance_token"]
               for a in sample["anns"]]
        if len(ids) == len(info["gt_boxes"]):
            info["gt_box_ids"] = ids
            n_done += 1
    with open(args.out_file, "wb") as f:
        pickle.dump(data, f)
    print(f"added ids to {n_done}/{len(data['infos'])} infos -> {args.out_file}")


if __name__ == "__main__":
    main()
