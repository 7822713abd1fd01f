"""Build 12Hz-interpolated nuScenes `infos` pkls (reference
tools/prepare_data/nuscenes_converter.py, 890 LoC + create_data.py).

Produces {"infos": [...], "scene_tokens": [[...]], "metadata": {...}} in the schema
consumed by magicdrive_v2_tpu.datasets.nuscenes.frame_from_info:
- per sample: token, timestamp, location, description, timeofday, lidar/ego poses
  (quaternion wxyz + translation), per-camera calib (intrinsics, sensor2lidar R/t,
  sensor2ego), gt_boxes (N, 9), gt_names, gt_box_ids (instance tokens),
  num_lidar_pts, valid_flag.
- 12 Hz: between 2 Hz keyframes, camera sweeps provide images; ego poses come from
  the sweeps' ego_pose records and box annotations are linearly interpolated
  (SLERP for rotations) between keyframes, like the reference's "advanced_12Hz"
  pipeline (interpolated frames get ";"-joined tokens so keyframe filters work).

Requires the nuscenes devkit; import is deferred so the rest of the framework
works without it.
"""
from __future__ import annotations

import argparse
import os
import pickle
from typing import Dict, List

import numpy as np

CAM_NAMES = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
             "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT"]


def _quat_slerp(q0, q1, t):
    from pyquaternion import Quaternion
    return Quaternion.slerp(Quaternion(q0), Quaternion(q1), t).elements.tolist()


def _cam_info(nusc, cam_token: str, lidar_cs, lidar_pose) -> Dict:
    from pyquaternion import Quaternion
    sd = nusc.get("sample_data", cam_token)
    cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
    pose = nusc.get("ego_pose", sd["ego_pose_token"])
    # sensor -> global
    s2e_r = Quaternion(cs["rotation"]).rotation_matrix
    s2e_t = np.array(cs["translation"])
    e2g_r = Quaternion(pose["rotation"]).rotation_matrix
    e2g_t = np.array(pose["translation"])
    # lidar frame at the reference timestamp
    l2e_r = Quaternion(lidar_cs["rotation"]).rotation_matrix
    l2e_t = np.array(lidar_cs["translation"])
    le2g_r = Quaternion(lidar_pose["rotation"]).rotation_matrix
    le2g_t = np.array(lidar_pose["translation"])
    # sensor -> lidar = inv(lidar->global) @ (sensor->global)
    s2g_r = e2g_r @ s2e_r
    s2g_t = e2g_r @ s2e_t + e2g_t
    l2g_r = le2g_r @ l2e_r
    l2g_t = le2g_r @ l2e_t + le2g_t
    s2l_r = l2g_r.T @ s2g_r
    s2l_t = l2g_r.T @ (s2g_t - l2g_t)
    return dict(
        data_path=sd["filename"],
        camera_intrinsics=np.array(cs["camera_intrinsic"]),
        sensor2lidar_rotation=s2l_r,
        sensor2lidar_translation=s2l_t,
        sensor2ego_rotation=list(cs["rotation"]),
        sensor2ego_translation=list(cs["translation"]),
    )


def _boxes_at(nusc, sample, name_map) -> Dict:
    """Keyframe annotations in the lidar frame -> (gt_boxes, names, ids, counts)."""
    from pyquaternion import Quaternion
    sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
    cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
    pose = nusc.get("ego_pose", sd["ego_pose_token"])
    boxes, names, ids, npts = [], [], [], []
    for ann_token in sample["anns"]:
        ann = nusc.get("sample_annotation", ann_token)
        box = nusc.get_box(ann_token)
        # global -> ego -> lidar
        box.translate(-np.array(pose["translation"]))
        box.rotate(Quaternion(pose["rotation"]).inverse)
        box.translate(-np.array(cs["translation"]))
        box.rotate(Quaternion(cs["rotation"]).inverse)
        name = name_map.get(ann["category_name"])
        if name is None:
            continue
        yaw = box.orientation.yaw_pitch_roll[0]
        # nuScenes wlh -> mmdet3d (dx=l? ) convention: (x, y, z_bottom, w, l, h, yaw)
        w, l, h = box.wlh
        boxes.append([box.center[0], box.center[1], box.center[2] - h / 2,
                      w, l, h, -yaw - np.pi / 2, 0.0, 0.0])
        names.append(name)
        ids.append(ann["instance_token"])
        npts.append(ann["num_lidar_pts"])
    return dict(gt_boxes=np.array(boxes).reshape(-1, 9),
                gt_names=np.array(names), gt_box_ids=ids,
                num_lidar_pts=np.array(npts, np.int64),
                valid_flag=np.array([n > 0 for n in npts], bool))


NAME_MAP = {
    "vehicle.car": "car", "vehicle.truck": "truck",
    "vehicle.construction": "construction_vehicle", "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus", "vehicle.trailer": "trailer",
    "movable_object.barrier": "barrier", "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle", "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "human.pedestrian.police_officer": "pedestrian",
    "movable_object.trafficcone": "traffic_cone",
}


def _interp_boxes(b0: Dict, b1: Dict, t: float) -> Dict:
    """Linear interpolation of boxes matched by instance id between keyframes."""
    idx1 = {tok: i for i, tok in enumerate(b1["gt_box_ids"])}
    boxes, names, ids, npts = [], [], [], []
    for i, tok in enumerate(b0["gt_box_ids"]):
        if tok not in idx1:
            continue
        j = idx1[tok]
        x0, x1 = b0["gt_boxes"][i], b1["gt_boxes"][j]
        x = (1 - t) * x0 + t * x1
        # yaw: shortest-path interpolation
        dyaw = np.arctan2(np.sin(x1[6] - x0[6]), np.cos(x1[6] - x0[6]))
        x[6] = x0[6] + t * dyaw
        boxes.append(x)
        names.append(b0["gt_names"][i])
        ids.append(tok)
        npts.append(max(b0["num_lidar_pts"][i], b1["num_lidar_pts"][j]))
    return dict(gt_boxes=np.array(boxes).reshape(-1, 9), gt_names=np.array(names),
                gt_box_ids=ids, num_lidar_pts=np.array(npts, np.int64),
                valid_flag=np.ones(len(ids), bool))


def build_infos(dataroot: str, version: str = "v1.0-trainval",
                hz: int = 12) -> Dict[str, Dict]:
    from nuscenes.nuscenes import NuScenes
    from nuscenes.utils import splits

    nusc = NuScenes(version=version, dataroot=dataroot)
    train_scenes = set(splits.train if "trainval" in version else splits.mini_train)
    out = {"train": {"infos": [], "scene_tokens": []},
           "val": {"infos": [], "scene_tokens": []}}
    for scene in nusc.scene:
        split = "train" if scene["name"] in train_scenes else "val"
        log = nusc.get("log", scene["log_token"])
        location = log["location"]
        description = scene["description"]
        sample = nusc.get("sample", scene["first_sample_token"])
        keyframes = []
        while True:
            keyframes.append(sample)
            if not sample["next"]:
                break
            sample = nusc.get("sample", sample["next"])

        scene_tok_list: List[str] = []
        n_interp = hz // 2  # 2 Hz keyframes -> hz output
        for ki in range(len(keyframes)):
            kf = keyframes[ki]
            b_now = _boxes_at(nusc, kf, NAME_MAP)
            kf_next = keyframes[ki + 1] if ki + 1 < len(keyframes) else None
            b_next = _boxes_at(nusc, kf_next, NAME_MAP) if kf_next else None
            steps = n_interp if kf_next else 1
            for si in range(steps):
                t = si / n_interp
                lidar_sd = nusc.get("sample_data", kf["data"]["LIDAR_TOP"])
                lidar_cs = nusc.get("calibrated_sensor",
                                    lidar_sd["calibrated_sensor_token"])
                lidar_pose = nusc.get("ego_pose", lidar_sd["ego_pose_token"])
                if si == 0:
                    token = kf["token"]
                    boxes = b_now
                    e2g_rot = lidar_pose["rotation"]
                    e2g_tr = lidar_pose["translation"]
                    ts = kf["timestamp"]
                else:
                    token = f"{kf['token']};{si}"
                    boxes = _interp_boxes(b_now, b_next, t)
                    next_sd = nusc.get("sample_data",
                                       kf_next["data"]["LIDAR_TOP"])
                    next_pose = nusc.get("ego_pose", next_sd["ego_pose_token"])
                    e2g_rot = _quat_slerp(lidar_pose["rotation"],
                                          next_pose["rotation"], t)
                    e2g_tr = ((1 - t) * np.array(lidar_pose["translation"])
                              + t * np.array(next_pose["translation"])).tolist()
                    ts = int((1 - t) * kf["timestamp"]
                             + t * kf_next["timestamp"])
                cams = {name: _cam_info(nusc, kf["data"][name], lidar_cs, lidar_pose)
                        for name in CAM_NAMES}
                info = dict(
                    token=token, timestamp=ts, location=location,
                    description=description,
                    timeofday="night" if "night" in description.lower() else "day",
                    lidar_path=lidar_sd["filename"], sweeps=[],
                    lidar2ego_rotation=list(lidar_cs["rotation"]),
                    lidar2ego_translation=list(lidar_cs["translation"]),
                    ego2global_rotation=list(e2g_rot),
                    ego2global_translation=list(e2g_tr),
                    cams=cams, **boxes)
                out[split]["infos"].append(info)
                scene_tok_list.append(token)
        out[split]["scene_tokens"].append(scene_tok_list)
    for split in out:
        out[split]["metadata"] = {"version": version}
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default="./data/nuscenes")
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--out-dir", default="./data/nuscenes_mmdet3d-12Hz")
    p.add_argument("--hz", type=int, default=12)
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    out = build_infos(args.dataroot, args.version, args.hz)
    for split, data in out.items():
        path = os.path.join(args.out_dir,
                            f"nuscenes_interp_{args.hz}Hz_infos_{split}_with_bid.pkl")
        with open(path, "wb") as f:
            pickle.dump(data, f)
        print(f"wrote {path}: {len(data['infos'])} infos, "
              f"{len(data['scene_tokens'])} scenes")


if __name__ == "__main__":
    main()
