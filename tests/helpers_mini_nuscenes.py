"""Generate a tiny on-disk nuScenes-format dataset (2 scenes x 6 frames with real
JPEGs and full pose/calib records) for end-to-end pipeline tests."""
import os
import pickle

import numpy as np

CAMS = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT"]


def generate(root: str, scene_lengths=(6, 6)) -> str:
    from PIL import Image
    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/samples", exist_ok=True)
    infos, scene_tokens = [], []
    ts = 0
    for scene, n_frames in enumerate(scene_lengths):
        tokens = []
        for fi in range(n_frames):
            token = f"s{scene}f{fi}" if fi % 2 == 0 else f"s{scene}f{fi};interp"
            tokens.append(token)
            cams = {}
            for ci, cam in enumerate(CAMS):
                path = f"{root}/samples/{token}_{cam}.jpg"
                Image.fromarray(rng.integers(0, 255, (90, 160, 3), np.uint8)).save(path)
                yaw = ci * np.pi / 3
                c, s = np.cos(yaw), np.sin(yaw)
                cams[cam] = dict(
                    data_path=path,
                    camera_intrinsics=np.array([[120., 0, 80], [0, 120., 45], [0, 0, 1]]),
                    sensor2lidar_rotation=np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]]) @
                        np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]).T,
                    sensor2lidar_translation=np.array([1.5 * c, 1.5 * s, 1.6]),
                    sensor2ego_rotation=[1, 0, 0, 0], sensor2ego_translation=[0, 0, 1.6])
            n_box = 3
            boxes = np.concatenate([rng.uniform(-20, 20, (n_box, 2)),
                                    rng.uniform(-1, 0, (n_box, 1)),
                                    rng.uniform(1, 4, (n_box, 3)),
                                    rng.uniform(-3, 3, (n_box, 1)),
                                    np.zeros((n_box, 2))], axis=1)
            infos.append(dict(
                token=token, timestamp=ts, lidar_path="", sweeps=[],
                location="singapore-onenorth", description="sunny day",
                timeofday="day",
                lidar2ego_rotation=[1, 0, 0, 0], lidar2ego_translation=[0, 0, 1.8],
                ego2global_rotation=[np.cos(.05 * fi), 0, 0, np.sin(.05 * fi)],
                ego2global_translation=[2. * fi, .1 * fi, 0],
                cams=cams, gt_boxes=boxes,
                gt_names=np.array(["car", "truck", "pedestrian"]),
                gt_box_ids=[f"inst{scene}_{i}" for i in range(n_box)],
                num_lidar_pts=np.array([5, 5, 5]),
                valid_flag=np.array([True] * 3)))
            ts += 1
        scene_tokens.append(tokens)
    with open(f"{root}/infos.pkl", "wb") as f:
        pickle.dump({"infos": infos, "scene_tokens": scene_tokens,
                     "metadata": {"version": "mini"}}, f)
    return f"{root}/infos.pkl"
