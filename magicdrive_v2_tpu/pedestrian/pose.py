"""SMPL pose-sequence processing for the pedestrian pipeline (host-side numpy).

Port of the reference fork's PoseProcessor (reference pedestrian_processor.py:750-995):
sparse per-frame HMR2 estimates -> dense smooth sequences via
- 6D rotation representation (Zhou et al.) for averaging/filtering,
- median-trend outlier correction for "teleporting" glitches,
- linear interp for betas/cam/tform + per-joint SLERP for the 24 SMPL rotations,
- moving-average smoothing of body pose (root kept sharper).

No SMPL/HMR2 dependency — this is the pure math; the render stages live in
pipelines/pedestrian.py and are gated on their heavy deps.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from scipy.ndimage import median_filter
from scipy.spatial.transform import Rotation as R, Slerp

__all__ = ["PoseProcessor"]


class PoseProcessor:
    # -- rotation representation helpers (reference :754-772) --

    @staticmethod
    def matrix_to_rotation_6d(matrix: np.ndarray) -> np.ndarray:
        batch_dim = matrix.shape[:-2]
        m = matrix.reshape(-1, 3, 3)
        r6d = np.concatenate([m[:, :, 0], m[:, :, 1]], axis=1)
        return r6d.reshape(*batch_dim, 6)

    @staticmethod
    def rotation_6d_to_matrix(d6: np.ndarray) -> np.ndarray:
        batch_dim = d6.shape[:-1]
        d6 = d6.reshape(-1, 6)
        a1, a2 = d6[:, :3], d6[:, 3:]
        b1 = a1 / (np.linalg.norm(a1, axis=1, keepdims=True) + 1e-8)
        b2 = a2 - np.sum(b1 * a2, axis=1, keepdims=True) * b1
        b2 = b2 / (np.linalg.norm(b2, axis=1, keepdims=True) + 1e-8)
        b3 = np.cross(b1, b2)
        matrix = np.stack((b1, b2, b3), axis=-1)
        return matrix.reshape(*batch_dim, 3, 3)

    # -- outlier correction (reference :774-814) --

    def correct_outliers_with_trend(self, pose_mat: np.ndarray, cam: np.ndarray,
                                    window_size: int = 5, thresh_trans: float = 0.5,
                                    thresh_rot: float = 0.5):
        n = len(cam)
        if n < 5:
            return pose_mat, cam
        if window_size % 2 == 0:
            window_size += 1
        cam_trend = np.stack([
            median_filter(cam[:, i], size=window_size, mode="nearest")
            for i in range(cam.shape[1])], axis=1)
        root_6d = self.matrix_to_rotation_6d(pose_mat[:, 0:1]).reshape(n, 6)
        root_trend = np.stack([
            median_filter(root_6d[:, i], size=window_size, mode="nearest")
            for i in range(6)], axis=1)

        cam = cam.copy()
        pose_mat = pose_mat.copy()
        bad_cam = np.linalg.norm(cam - cam_trend, axis=1) > thresh_trans
        cam[bad_cam] = cam_trend[bad_cam]
        bad_rot = np.linalg.norm(root_6d - root_trend, axis=1) > thresh_rot
        if np.any(bad_rot):
            pose_mat[bad_rot, 0] = self.rotation_6d_to_matrix(root_trend[bad_rot])
        return pose_mat, cam

    # -- dense sequence construction (reference :816-995) --

    def process_sequence(self, sparse_data: Dict, total_frames: int,
                         full_cam2world: Optional[np.ndarray] = None,
                         rot_window: int = 31, body_window: int = 7
                         ) -> Optional[Dict]:
        indices = np.asarray(sparse_data["frame_indices"])
        pose = np.asarray(sparse_data["pose"], np.float64)
        betas = np.asarray(sparse_data["betas"], np.float64)
        cam = np.asarray(sparse_data["cam"], np.float64)
        tform = np.asarray(sparse_data["tform"], np.float64)
        if len(indices) < 2:
            return None

        orig_min, orig_max = int(indices.min()), int(indices.max())
        if pose.ndim == 2 and pose.shape[1] == 72:  # axis-angle per joint
            pose_mat = R.from_rotvec(pose.reshape(-1, 3)).as_matrix().reshape(
                -1, 24, 3, 3)
        elif pose.ndim == 4 and pose.shape[-2:] == (3, 3):
            pose_mat = pose
        else:
            raise ValueError(f"Unknown pose shape: {pose.shape}")

        order = np.argsort(indices)
        indices, pose_mat = indices[order], pose_mat[order]
        betas, cam, tform = betas[order], cam[order], tform[order]

        # deduplicate repeated detections per frame: mean in 6D space
        uniq, counts = np.unique(indices, return_counts=True)
        if len(uniq) < len(indices):
            new = {k: [] for k in ("pose", "betas", "cam", "tform")}
            for u in uniq:
                m = indices == u
                new["betas"].append(betas[m].mean(0))
                new["cam"].append(cam[m].mean(0))
                new["tform"].append(tform[m].mean(0))
                new["pose"].append(self.rotation_6d_to_matrix(
                    self.matrix_to_rotation_6d(pose_mat[m]).mean(0)))
            indices = uniq
            pose_mat = np.asarray(new["pose"])
            betas, cam, tform = (np.asarray(new["betas"]), np.asarray(new["cam"]),
                                 np.asarray(new["tform"]))

        pose_mat, cam = self.correct_outliers_with_trend(pose_mat, cam)

        all_idx = np.arange(total_frames)
        full_pose = np.zeros((total_frames, 24, 3, 3))
        full_betas = np.stack([np.interp(all_idx, indices, betas[:, i])
                               for i in range(betas.shape[1])], axis=1)
        full_cam = np.stack([np.interp(all_idx, indices, cam[:, i])
                             for i in range(cam.shape[1])], axis=1)
        tf = tform.reshape(len(indices), -1)
        full_tform = np.stack([np.interp(all_idx, indices, tf[:, i])
                               for i in range(tf.shape[1])], axis=1).reshape(
            total_frames, *tform.shape[1:])

        # per-joint SLERP inside the observed span; clamp outside
        valid = (all_idx >= orig_min) & (all_idx <= orig_max)
        vi = all_idx[valid]
        for j in range(24):
            slerp = Slerp(indices, R.from_matrix(pose_mat[:, j]))
            inside = (vi >= indices[0]) & (vi <= indices[-1])
            if inside.any():
                full_pose[vi[inside], j] = slerp(vi[inside]).as_matrix()
            full_pose[:indices[0], j] = pose_mat[0, j]
            full_pose[indices[-1] + 1:, j] = pose_mat[-1, j]

        # smooth body pose (jittery HMR) with a moving average in 6D; root uses a
        # wider window than the body joints (reference :941-995)
        pose_6d = self.matrix_to_rotation_6d(full_pose)  # (T, 24, 6)

        def smooth(x, window):
            if window <= 1 or total_frames < 3:
                return x
            # clamp to the sequence length, then force ODD (an even window
            # makes the edge-padded 'valid' convolution one element too long)
            window = min(window, total_frames)
            if window % 2 == 0:
                window -= 1
            if window < 3:
                return x
            pad = window // 2
            xp = np.pad(x, ((pad, pad), (0, 0)), mode="edge")
            kernel = np.ones(window) / window
            return np.stack([np.convolve(xp[:, i], kernel, mode="valid")
                             for i in range(x.shape[1])], axis=1)

        root = smooth(pose_6d[:, 0], min(rot_window, total_frames))
        body = pose_6d[:, 1:].reshape(total_frames, -1)
        body = smooth(body, min(body_window, total_frames)).reshape(
            total_frames, 23, 6)
        full_pose = self.rotation_6d_to_matrix(
            np.concatenate([root[:, None], body], axis=1))

        # optional world-frame alignment of the root using per-frame cam2world
        if full_cam2world is not None:
            for t in range(total_frames):
                R_c2w = full_cam2world[t, :3, :3]
                T_c2w = full_cam2world[t, :3, 3]
                full_pose[t, 0] = R_c2w.T @ full_pose[t, 0]
                full_cam[t] = R_c2w.T @ (full_cam[t] - T_c2w)

        return {"pose": full_pose, "betas": full_betas, "cam": full_cam,
                "tform": full_tform, "valid_range": (orig_min, orig_max)}
