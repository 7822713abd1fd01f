"""Build 12Hz-interpolated nuScenes `infos` pkls.

Consolidates the reference's two-stage pipeline — ASAP-style 12 Hz annotation
interpolation + tools/prepare_data/data_converter/nuscenes_converter.py (890
LoC) + create_data.py — into one tool emitting the same schema the datasets
layer consumes (magicdrive_v2_tpu.datasets.nuscenes.frame_from_info):

- per sample: token, timestamp, location, description, timeofday, is_key_frame,
  lidar/ego poses (quaternion wxyz + translation), per-camera calib
  (camera_intrinsics, sensor2lidar R/t, sensor2ego), gt_boxes (N, 9) in the
  SECOND convention (x, y, z_bottom, w, l, h, -yaw-pi/2), gt_names, gt_box_ids
  (instance tokens), gt_velocity, num_lidar_pts, num_radar_pts, visibility,
  valid_flag, ego_velocity.
- 12 Hz alignment mirrors the reference converter's cam-sweep walk
  (reference nuscenes_converter.py:491-509 _get_pn_cams/_sample_data_transform):
  non-keyframes use the REAL camera sweep images between keyframes, walking
  each camera's sample_data chain backward from the next keyframe; the frame's
  ego pose comes from the CAM_FRONT sweep's ego_pose record (reference :498-500
  `ego_pose_token=cams[0]["ego_pose_token"]`), falling back to SLERP between
  keyframe poses when sweeps are missing; non-keyframe tokens are
  `<next_keyframe_token>;-n` (reference :501-506).
- Box annotations at non-keyframes are interpolated between keyframes matched
  by instance token (linear center/size, shortest-arc yaw) — the role ASAP's
  interpolated annotation tables play for the reference's
  "interp_12Hz_trainval" version.
- test split (version containing "test"): no annotation fields, like the
  reference's `test=True` path (reference :57-151).

The nuScenes devkit is only needed for the real dataset; the math runs on any
object providing the devkit's table accessors (see tests/test_converter.py's
stub), and quaternions fall back to scipy when pyquaternion is absent.
"""
from __future__ import annotations

import argparse
import os
import pickle
from typing import Dict, List, Optional

import numpy as np

CAM_NAMES = ["CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
             "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]

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


# -- quaternion helpers (wxyz), pyquaternion-free ---------------------------


def quat_to_rot(q) -> np.ndarray:
    w, x, y, z = [float(v) for v in q]
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0 else 2.0 / n
    return np.array([
        [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
        [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
        [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
    ])


def quat_slerp(q0, q1, t: float):
    q0 = np.asarray(q0, np.float64)
    q1 = np.asarray(q1, np.float64)
    q0 = q0 / np.linalg.norm(q0)
    q1 = q1 / np.linalg.norm(q1)
    dot = float(np.dot(q0, q1))
    if dot < 0:
        q1, dot = -q1, -dot
    if dot > 0.9995:
        out = q0 + t * (q1 - q0)
        return (out / np.linalg.norm(out)).tolist()
    th = np.arccos(np.clip(dot, -1, 1))
    out = (np.sin((1 - t) * th) * q0 + np.sin(t * th) * q1) / np.sin(th)
    return (out / np.linalg.norm(out)).tolist()


def rot_yaw(rot: np.ndarray) -> float:
    """Yaw of a rotation matrix (pyquaternion yaw_pitch_roll convention)."""
    return float(np.arctan2(rot[1, 0], rot[0, 0]))


# -- per-record builders ----------------------------------------------------


def _cam_info(nusc, cam_token: str, lidar_cs, lidar_pose) -> Dict:
    """Camera calib relative to the frame's lidar (reference obtain_sensor2top,
    nuscenes_converter.py:541-598: sweep->ego->global->ego'->lidar)."""
    sd = nusc.get("sample_data", cam_token)
    cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
    pose = nusc.get("ego_pose", sd["ego_pose_token"])
    s2e_r = quat_to_rot(cs["rotation"])
    s2e_t = np.asarray(cs["translation"], np.float64)
    e2g_r = quat_to_rot(pose["rotation"])
    e2g_t = np.asarray(pose["translation"], np.float64)
    l2e_r = quat_to_rot(lidar_cs["rotation"])
    l2e_t = np.asarray(lidar_cs["translation"], np.float64)
    le2g_r = quat_to_rot(lidar_pose["rotation"])
    le2g_t = np.asarray(lidar_pose["translation"], np.float64)
    s2g_r = e2g_r @ s2e_r
    s2g_t = e2g_r @ s2e_t + e2g_t
    l2g_r = le2g_r @ l2e_r
    l2g_t = le2g_r @ l2e_t + le2g_t
    return dict(
        data_path=sd["filename"],
        type=sd.get("channel", ""),
        sample_data_token=cam_token,
        timestamp=sd.get("timestamp", 0),
        camera_intrinsics=np.asarray(cs["camera_intrinsic"], np.float64),
        sensor2lidar_rotation=l2g_r.T @ s2g_r,
        sensor2lidar_translation=l2g_r.T @ (s2g_t - l2g_t),
        sensor2ego_rotation=list(cs["rotation"]),
        sensor2ego_translation=list(cs["translation"]),
    )


def _global_boxes_at(nusc, sample, name_map) -> Dict:
    """Keyframe annotations in the GLOBAL frame (raw sample_annotation
    records). Interpolation happens here — NOT in lidar-local coordinates —
    because non-keyframes use the REAL camera-sweep ego pose: when actual ego
    motion deviates from a linear pose interpolation (turns, braking),
    locally-interpolated boxes would be misaligned with the sweep images.
    This mirrors the reference/ASAP pipeline, which interpolates annotations
    globally and transforms via the actual pose."""
    centers, quats, sizes = [], [], []
    names, ids, npts, nrad, vis, vels = [], [], [], [], [], []
    for ann_token in sample["anns"]:
        ann = nusc.get("sample_annotation", ann_token)
        name = name_map.get(ann["category_name"])
        if name is None:
            continue
        centers.append(np.asarray(ann["translation"], np.float64))
        quats.append(np.asarray(ann["rotation"], np.float64))
        sizes.append(np.asarray(ann["size"], np.float64))  # w, l, h
        names.append(name)
        ids.append(ann["instance_token"])
        npts.append(ann.get("num_lidar_pts", 0))
        nrad.append(ann.get("num_radar_pts", 0))
        vis.append(int(ann.get("visibility_token", 0) or 0))
        v = np.asarray(ann.get("velocity", [0.0, 0.0]), np.float64)
        vels.append(v[:2])
    return dict(
        center=np.asarray(centers, np.float64).reshape(-1, 3),
        quat=np.asarray(quats, np.float64).reshape(-1, 4),
        size=np.asarray(sizes, np.float64).reshape(-1, 3),
        names=np.asarray(names), ids=ids,
        vel=np.asarray(vels, np.float64).reshape(-1, 2),
        npts=np.asarray(npts, np.int64), nrad=np.asarray(nrad, np.int64),
        vis=np.asarray(vis, np.uint8))


def _interp_global(g0: Dict, g1: Dict, t: float) -> Dict:
    """Global-frame box interpolation matched by instance id: linear center /
    size / velocity, slerp rotation — the role ASAP's interpolated annotation
    tables play for the reference's interp_12Hz version."""
    idx1 = {tok: i for i, tok in enumerate(g1["ids"])}
    keep = [(i, idx1[tok]) for i, tok in enumerate(g0["ids"]) if tok in idx1]
    centers, quats, sizes, names, ids = [], [], [], [], []
    npts, nrad, vis, vels = [], [], [], []
    for i, j in keep:
        centers.append((1 - t) * g0["center"][i] + t * g1["center"][j])
        quats.append(np.asarray(quat_slerp(g0["quat"][i], g1["quat"][j], t)))
        sizes.append((1 - t) * g0["size"][i] + t * g1["size"][j])
        names.append(g0["names"][i])
        ids.append(g0["ids"][i])
        npts.append(max(g0["npts"][i], g1["npts"][j]))
        nrad.append(max(g0["nrad"][i], g1["nrad"][j]))
        vis.append(g0["vis"][i])
        vels.append((1 - t) * g0["vel"][i] + t * g1["vel"][j])
    return dict(
        center=np.asarray(centers, np.float64).reshape(-1, 3),
        quat=np.asarray(quats, np.float64).reshape(-1, 4),
        size=np.asarray(sizes, np.float64).reshape(-1, 3),
        names=np.asarray(names), ids=ids,
        vel=np.asarray(vels, np.float64).reshape(-1, 2),
        npts=np.asarray(npts, np.int64), nrad=np.asarray(nrad, np.int64),
        vis=np.asarray(vis, np.uint8))


def _boxes_to_lidar(g: Dict, lidar_cs, frame_pose) -> Dict:
    """Global-frame records -> the info dict's lidar-frame arrays using the
    frame's ACTUAL pose (reference _sample_data_transform, :355-410: SECOND
    box convention x, y, z_bottom, w, l, h, -yaw-pi/2)."""
    e2g_r = quat_to_rot(frame_pose["rotation"])
    e2g_t = np.asarray(frame_pose["translation"], np.float64)
    l2e_r = quat_to_rot(lidar_cs["rotation"])
    l2e_t = np.asarray(lidar_cs["translation"], np.float64)
    l2g_r = e2g_r @ l2e_r
    l2g_t = e2g_r @ l2e_t + e2g_t

    boxes, vels = [], []
    for i in range(len(g["ids"])):
        c_l = l2g_r.T @ (g["center"][i] - l2g_t)
        rot_l = l2g_r.T @ quat_to_rot(g["quat"][i])
        yaw = rot_yaw(rot_l)
        w, l, h = g["size"][i]
        boxes.append([c_l[0], c_l[1], c_l[2] - h / 2, w, l, h,
                      -yaw - np.pi / 2, 0.0, 0.0])
        v = g["vel"][i]
        vels.append((l2g_r.T @ np.array([v[0], v[1], 0.0]))[:2])
    return dict(
        gt_boxes=np.asarray(boxes, np.float64).reshape(-1, 9),
        gt_names=g["names"], gt_box_ids=list(g["ids"]),
        gt_velocity=np.asarray(vels, np.float64).reshape(-1, 2),
        num_lidar_pts=g["npts"], num_radar_pts=g["nrad"],
        visibility=g["vis"],
        valid_flag=np.asarray(g["npts"] + g["nrad"] > 0, bool))


_EMPTY_BOXES = dict(
    gt_boxes=np.zeros((0, 9)), gt_names=np.zeros((0,), "<U32"), gt_box_ids=[],
    gt_velocity=np.zeros((0, 2)), num_lidar_pts=np.zeros((0,), np.int64),
    num_radar_pts=np.zeros((0,), np.int64), visibility=np.zeros((0,), np.uint8),
    valid_flag=np.zeros((0,), bool))


def _interp_boxes(b0: Dict, b1: Dict, t: float) -> Dict:
    """Linear box interpolation matched by instance id between keyframes —
    the role ASAP's interpolated annotations play in the reference's
    interp_12Hz version."""
    idx1 = {tok: i for i, tok in enumerate(b1["gt_box_ids"])}
    boxes, names, ids, npts, nrad, vis, vels = [], [], [], [], [], [], []
    for i, tok in enumerate(b0["gt_box_ids"]):
        if tok not in idx1:
            continue
        j = idx1[tok]
        x0, x1 = b0["gt_boxes"][i], b1["gt_boxes"][j]
        x = (1 - t) * x0 + t * x1
        dyaw = np.arctan2(np.sin(x1[6] - x0[6]), np.cos(x1[6] - x0[6]))
        x[6] = x0[6] + t * dyaw
        boxes.append(x)
        names.append(b0["gt_names"][i])
        ids.append(tok)
        npts.append(max(b0["num_lidar_pts"][i], b1["num_lidar_pts"][j]))
        nrad.append(max(b0["num_radar_pts"][i], b1["num_radar_pts"][j]))
        vis.append(b0["visibility"][i])
        vels.append((1 - t) * b0["gt_velocity"][i] + t * b1["gt_velocity"][j])
    return dict(
        gt_boxes=np.asarray(boxes, np.float64).reshape(-1, 9),
        gt_names=np.asarray(names), gt_box_ids=ids,
        gt_velocity=np.asarray(vels, np.float64).reshape(-1, 2),
        num_lidar_pts=np.asarray(npts, np.int64),
        num_radar_pts=np.asarray(nrad, np.int64),
        visibility=np.asarray(vis, np.uint8),
        valid_flag=np.ones(len(ids), bool))


def _cam_sweep_chains(nusc, kf, kf_next, n_steps: int) -> List[Optional[List]]:
    """Per-step camera sweep tokens between kf and kf_next.

    Walks each camera's sample_data chain backward from kf_next (reference
    _get_pn_cams, :415-431: direction='prev' while the sweep still associates
    with the keyframe sample). Returns a list of length n_steps-1 (for steps
    1..n_steps-1); each entry is a {cam: token} dict, or None when the chain is
    too short/ambiguous (caller falls back to keyframe images)."""
    chains = {}
    for cam in CAM_NAMES:
        toks = []
        sd = nusc.get("sample_data", kf_next["data"][cam])
        cur = sd.get("prev", "")
        while cur:
            rec = nusc.get("sample_data", cur)
            if rec.get("is_key_frame"):
                break
            toks.append(cur)
            cur = rec.get("prev", "")
        toks.reverse()  # now forward in time from kf -> kf_next
        chains[cam] = toks
    out = []
    for si in range(1, n_steps):
        step = {}
        for cam in CAM_NAMES:
            toks = chains[cam]
            if not toks:
                step = None
                break
            # align the si-th interpolated frame with the nearest sweep:
            # endpoint-exact spread so the typical 5-sweeps-per-keyframe case
            # maps 1:1 and ambiguous counts interpolate across the chain
            k = int(round((si - 1) * (len(toks) - 1) / max(n_steps - 2, 1)))
            step[cam] = toks[min(max(0, k), len(toks) - 1)]
        out.append(step)
    return out


def build_infos(dataroot: str = None, version: str = "v1.0-trainval",
                hz: int = 12, nusc=None) -> Dict[str, Dict]:
    """dataroot/version instantiate the devkit; pass `nusc` directly for a
    pre-built (or stub) table object."""
    if nusc is None:
        from nuscenes.nuscenes import NuScenes
        nusc = NuScenes(version=version, dataroot=dataroot)
    is_test = "test" in version
    if is_test:
        train_scenes = set()
    else:
        try:
            from nuscenes.utils import splits
            train_scenes = set(
                splits.train if "trainval" in version else splits.mini_train)
        except ImportError:
            train_scenes = {s["name"] for s in nusc.scene}

    out = {"train": {"infos": [], "scene_tokens": []},
           "val": {"infos": [], "scene_tokens": []}}
    if is_test:
        out = {"test": {"infos": [], "scene_tokens": []}}

    for scene in nusc.scene:
        if is_test:
            split = "test"
        else:
            split = "train" if scene["name"] in train_scenes else "val"
        log = nusc.get("log", scene["log_token"])
        location = log["location"]
        description = scene["description"]
        timeofday = log.get("logfile", "")[5:]
        sample = nusc.get("sample", scene["first_sample_token"])
        keyframes = []
        while True:
            keyframes.append(sample)
            if not sample["next"]:
                break
            sample = nusc.get("sample", sample["next"])

        scene_tok_list: List[str] = []
        n_interp = hz // 2  # 2 Hz keyframes -> hz output
        for ki, kf in enumerate(keyframes):
            b_now = None if is_test else _global_boxes_at(nusc, kf, NAME_MAP)
            kf_next = keyframes[ki + 1] if ki + 1 < len(keyframes) else None
            b_next = (None if (kf_next is None or is_test)
                      else _global_boxes_at(nusc, kf_next, NAME_MAP))
            steps = n_interp if kf_next else 1
            sweep_steps = (_cam_sweep_chains(nusc, kf, kf_next, steps)
                           if kf_next else [])

            lidar_sd = nusc.get("sample_data", kf["data"]["LIDAR_TOP"])
            lidar_cs = nusc.get("calibrated_sensor",
                                lidar_sd["calibrated_sensor_token"])
            lidar_pose = nusc.get("ego_pose", lidar_sd["ego_pose_token"])
            if kf_next is not None:
                next_sd = nusc.get("sample_data", kf_next["data"]["LIDAR_TOP"])
                next_pose = nusc.get("ego_pose", next_sd["ego_pose_token"])

            for si in range(steps):
                t = si / n_interp
                if si == 0:
                    token = kf["token"]
                    g_boxes = b_now
                    frame_pose = lidar_pose
                    cam_tokens = {c: kf["data"][c] for c in CAM_NAMES
                                  if c in kf["data"]}
                    ts = kf["timestamp"]
                    key = True
                else:
                    # reference token naming: non-keyframes associate with the
                    # NEXT keyframe, counted backward (:501-506)
                    token = f"{kf_next['token']};-{steps - si}"
                    g_boxes = (None if is_test
                               else _interp_global(b_now, b_next, t))
                    sweeps = sweep_steps[si - 1]
                    if sweeps is not None:
                        cam_tokens = sweeps
                        front = nusc.get("sample_data", sweeps["CAM_FRONT"])
                        frame_pose = nusc.get("ego_pose",
                                              front["ego_pose_token"])
                        ts = front.get("timestamp") or int(
                            (1 - t) * kf["timestamp"]
                            + t * kf_next["timestamp"])
                    else:  # no sweeps on disk: keyframe images + SLERP pose
                        cam_tokens = {c: kf["data"][c] for c in CAM_NAMES
                                      if c in kf["data"]}
                        frame_pose = dict(
                            rotation=quat_slerp(lidar_pose["rotation"],
                                                next_pose["rotation"], t),
                            translation=(
                                (1 - t) * np.asarray(lidar_pose["translation"])
                                + t * np.asarray(next_pose["translation"])
                            ).tolist())
                        ts = int((1 - t) * kf["timestamp"]
                                 + t * kf_next["timestamp"])
                    key = False

                # boxes go global -> lidar through the frame's ACTUAL pose
                # (sweep ego pose when available), after interpolation in the
                # global frame
                boxes = (_EMPTY_BOXES if is_test
                         else _boxes_to_lidar(g_boxes, lidar_cs, frame_pose))
                cams = {name: _cam_info(nusc, tok, lidar_cs, frame_pose)
                        for name, tok in cam_tokens.items()}
                # ego velocity from the neighbouring keyframe poses
                # (reference get_ego_velocity, :202-252)
                if kf_next is not None:
                    dt = max((kf_next["timestamp"] - kf["timestamp"]) / 1e6,
                             1e-6)
                    ego_vel = ((np.asarray(next_pose["translation"])
                                - np.asarray(lidar_pose["translation"])) / dt)
                else:
                    ego_vel = np.zeros(3)
                info = dict(
                    token=token, timestamp=ts, location=location,
                    description=description,
                    timeofday=timeofday or (
                        "night" if "night" in description.lower() else "day"),
                    is_key_frame=key,
                    lidar_path=lidar_sd["filename"] if key else None,
                    sweeps=[],
                    ego_velocity=ego_vel,
                    lidar2ego_rotation=list(lidar_cs["rotation"]),
                    lidar2ego_translation=list(lidar_cs["translation"]),
                    ego2global_rotation=list(frame_pose["rotation"]),
                    ego2global_translation=list(frame_pose["translation"]),
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
