"""Build the BEV map h5 cache (reference tools/prepare_data/prepare_map_aux.py).

For every sample token, rasterize the static nuScenes map layers at the configured
bound/resolution, one-hot-pack them (datasets.bev.one_hot_encode) and store under
h5["gt_masks_bev_static"][token]. Training/inference then read the cache
(datasets.bev.LoadBEVSegmentation), which is also how the reference deploys.

Requires the nuscenes devkit map expansion.
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

LOCATIONS = ["singapore-onenorth", "singapore-hollandvillage", "singapore-queenstown",
             "boston-seaport"]

MAPPINGS = {
    "drivable_area": ["drivable_area"],
    "drivable_area*": ["road_segment", "lane"],
    "divider": ["road_divider", "lane_divider"],
}


def rasterize_sample(maps, info, classes, patch_size, canvas_size) -> np.ndarray:
    """Static layers for one sample: patch centered at the lidar pose, rotated to
    the ego yaw (reference LoadBEVSegmentation._get_data, loading.py:526-614)."""
    from magicdrive_v2_tpu.datasets.geometry import pose_to_matrix

    lidar2ego = pose_to_matrix(info["lidar2ego_rotation"],
                               info["lidar2ego_translation"])
    ego2global = pose_to_matrix(info["ego2global_rotation"],
                                info["ego2global_translation"])
    lidar2global = ego2global @ lidar2ego
    map_pose = lidar2global[:2, 3]
    patch_box = (map_pose[0], map_pose[1], patch_size[0], patch_size[1])
    v = lidar2global[:3, :3] @ np.array([1, 0, 0])
    patch_angle = np.arctan2(v[1], v[0]) / np.pi * 180

    layer_names = []
    for name in classes:
        layer_names.extend(MAPPINGS.get(name, [name]))
    layer_names = sorted(set(layer_names))
    masks = maps[info["location"]].get_map_mask(
        patch_box=patch_box, patch_angle=patch_angle, layer_names=layer_names,
        canvas_size=canvas_size)
    masks = masks.astype(bool)
    labels = np.zeros((len(classes), *canvas_size), np.uint8)
    for k, name in enumerate(classes):
        for ln in MAPPINGS.get(name, [name]):
            labels[k] |= masks[layer_names.index(ln)]
    return labels


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default="./data/nuscenes")
    p.add_argument("--info-file", required=True)
    p.add_argument("--out-file", required=True)
    p.add_argument("--bound", type=float, nargs=3, default=[-50.0, 50.0, 0.25])
    p.add_argument("--classes", nargs="+", default=[
        "drivable_area", "ped_crossing", "walkway", "stop_line", "carpark_area",
        "road_divider", "lane_divider", "road_block"])
    args = p.parse_args()

    import h5py
    from nuscenes.map_expansion.map_api import NuScenesMap

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from magicdrive_v2_tpu.datasets.bev import one_hot_encode

    lo, hi, step = args.bound
    patch = (hi - lo, hi - lo)
    canvas = (int(patch[0] / step), int(patch[1] / step))
    maps = {loc: NuScenesMap(args.dataroot, loc) for loc in LOCATIONS}

    with open(args.info_file, "rb") as f:
        infos = pickle.load(f)["infos"]
    os.makedirs(os.path.dirname(args.out_file) or ".", exist_ok=True)
    with h5py.File(args.out_file, "w") as h5:
        grp = h5.create_group("gt_masks_bev_static")
        for i, info in enumerate(infos):
            labels = rasterize_sample(maps, info, args.classes, patch, canvas)
            grp.create_dataset(info["token"], data=one_hot_encode(labels),
                               compression="gzip")
            if i % 500 == 0:
                print(f"{i}/{len(infos)}")
    print(f"wrote {args.out_file}")


if __name__ == "__main__":
    main()
