"""PoseProcessor: 6D rotations, outlier correction, dense interpolation."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from magicdrive_v2_tpu.pedestrian import PoseProcessor


@pytest.fixture
def proc():
    return PoseProcessor()


def test_rotation_6d_roundtrip(proc):
    rng = np.random.default_rng(0)
    mats = R.random(32, random_state=0).as_matrix()
    d6 = proc.matrix_to_rotation_6d(mats)
    back = proc.rotation_6d_to_matrix(d6)
    assert np.allclose(back, mats, atol=1e-6)
    # 6D -> matrix is a projection: perturbed inputs still give valid rotations
    noisy = proc.rotation_6d_to_matrix(d6 + rng.normal(0, 0.05, d6.shape))
    eye = np.einsum("nij,nkj->nik", noisy, noisy)
    assert np.allclose(eye, np.eye(3), atol=1e-5)


def test_outlier_correction_fixes_teleport(proc):
    n = 21
    pose = np.tile(np.eye(3), (n, 24, 1, 1))
    cam = np.stack([np.linspace(0, 2, n), np.zeros(n), np.zeros(n)], axis=1)
    cam_bad = cam.copy()
    cam_bad[10] += [5.0, 0, 0]  # teleport glitch
    fixed_pose, fixed_cam = proc.correct_outliers_with_trend(pose, cam_bad)
    assert abs(fixed_cam[10, 0] - cam[10, 0]) < 0.3
    # inliers untouched
    assert np.allclose(fixed_cam[:9], cam_bad[:9])


def test_process_sequence_dense_interpolation(proc):
    # sparse detections at frames 2, 6, 10 with a rotating root
    idx = np.array([2, 6, 10])
    angles = np.array([0.0, 0.5, 1.0])
    pose = np.zeros((3, 72))
    pose[:, 2] = angles  # root yaw axis-angle z-component
    sparse = dict(frame_indices=idx, pose=pose,
                  betas=np.linspace(0, 1, 3)[:, None] * np.ones((3, 10)),
                  cam=np.linspace(0, 1, 3)[:, None] * np.ones((3, 3)),
                  tform=np.tile(np.eye(2, 3), (3, 1, 1)))
    out = proc.process_sequence(sparse, total_frames=12, rot_window=1,
                                body_window=1)
    assert out is not None
    assert out["pose"].shape == (12, 24, 3, 3)
    assert out["valid_range"] == (2, 10)
    # midpoint frame 4 between 2 and 6: yaw ~0.25 (slerp)
    yaw4 = R.from_matrix(out["pose"][4, 0]).as_rotvec()[2]
    assert abs(yaw4 - 0.25) < 0.02
    # betas/cam linear interp
    assert abs(out["betas"][4, 0] - 0.25) < 1e-6
    assert abs(out["cam"][8, 0] - 0.75) < 1e-6
    # clamped outside the observed span
    assert np.allclose(out["pose"][0, 0], out["pose"][2, 0], atol=1e-6)


def test_process_sequence_dedup_and_single(proc):
    idx = np.array([3, 3, 7])
    pose = np.zeros((3, 72))
    sparse = dict(frame_indices=idx, pose=pose, betas=np.ones((3, 10)),
                  cam=np.ones((3, 3)), tform=np.tile(np.eye(2, 3), (3, 1, 1)))
    out = proc.process_sequence(sparse, total_frames=10, rot_window=1,
                                body_window=1)
    assert out is not None and out["pose"].shape[0] == 10
    # fewer than 2 detections -> None
    assert proc.process_sequence(
        dict(frame_indices=np.array([5]), pose=np.zeros((1, 72)),
             betas=np.ones((1, 10)), cam=np.ones((1, 3)),
             tform=np.tile(np.eye(2, 3), (1, 1, 1))), 10) is None
