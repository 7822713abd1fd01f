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


# ---------------------------------------------------------------------------
# processor (texture harvest + re-render, reference pedestrian_processor.py)
# ---------------------------------------------------------------------------

import os
import tempfile

from magicdrive_v2_tpu import native
from magicdrive_v2_tpu.pedestrian.processor import (
    SyntheticBody, make_synthetic_processor)


def test_rasterizer_native_matches_numpy():
    rng = np.random.default_rng(3)
    verts = np.concatenate([rng.uniform(0, 64, (30, 2)),
                            rng.uniform(1, 5, (30, 1))], axis=1).astype(np.float32)
    faces = rng.integers(0, 30, (40, 3)).astype(np.int32)
    colors = rng.uniform(0, 1, (30, 3)).astype(np.float32)
    rgb, depth, fid = native.rasterize_mesh(verts, faces, colors, 64, 64)
    old = os.environ.get("MDV2_DISABLE_NATIVE")
    native._LIB, native._TRIED = None, False
    os.environ["MDV2_DISABLE_NATIVE"] = "1"
    try:
        rgb2, depth2, fid2 = native.rasterize_mesh(verts, faces, colors, 64, 64)
    finally:
        if old is None:
            os.environ.pop("MDV2_DISABLE_NATIVE")
        else:
            os.environ["MDV2_DISABLE_NATIVE"] = old
        native._LIB, native._TRIED = None, False
    assert (fid >= 0).sum() > 100
    assert (fid == fid2).all()
    m = fid >= 0
    np.testing.assert_allclose(rgb[m], rgb2[m], atol=1e-5)
    np.testing.assert_allclose(depth[m], depth2[m], atol=1e-4)


def test_instance_id_map_occlusion():
    p = make_synthetic_processor()
    # stand the capsule upright in image space (its axis is +z; the crop camera
    # looks along +z, so the unrotated body shows an open tube end-on)
    rx = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])
    tv = (p.body.v_template @ rx.T).astype(np.float32)
    near = dict(vertices=tv[None], cam_t=np.array([[0.0, 0, 30.0]]),
                crop_info={"tform": np.eye(3)[:2] * 1.0})
    far = dict(vertices=tv[None], cam_t=np.array([[0.0, 0, 60.0]]),
               crop_info={"tform": np.eye(3)[:2] * 1.0})
    id_map, depth = p.render_instance_id_map([near, far], [1, 2], (256, 256))
    # where both bodies project, the NEAR one (id 1) must win
    assert (id_map == 1).sum() > 0
    assert (id_map == 2).sum() == 0  # far body fully inside near's silhouette
    assert np.isfinite(depth[id_map == 1]).all()


def test_inpaint_symmetry_and_knn():
    p = make_synthetic_processor()
    tv = p.body.v_template
    n = len(tv)
    gt = np.linspace(0, 1, n)[:, None] * np.ones((n, 3), np.float32)
    sums = gt.copy()
    counts = np.ones((n, 1), np.float32)
    # erase the +x half -> symmetry fill from the -x half
    missing = tv[:, 0] > 0.01
    sums[missing] = 0
    counts[missing] = 0
    out = p.inpaint_missing_colors(sums, counts)
    assert np.isfinite(out).all()
    # rings are constant-z; symmetric partner has the same gt color band
    err = np.abs(out[missing] - gt[missing]).mean()
    assert err < 0.1, err


def test_synthetic_pipeline_end_to_end(tmp_path):
    """Both passes over the synthetic scene produce image+mask pairs whose
    rendered colors correlate with the ground-truth texture renders."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import pipeline_12hz as pl

    p = make_synthetic_processor()
    frames, gt_tex = pl.build_synthetic_scene(p)
    n, textures = pl.run_scene(p, frames, str(tmp_path))
    assert n >= 4, n
    outs = sorted(os.listdir(tmp_path))
    masks = [f for f in outs if f.endswith("_mask.png")]
    rgbs = [f for f in outs if not f.endswith("_mask.png")]
    assert len(masks) == len(rgbs) == n
    # harvested texture should recover the GT texture reasonably well
    assert "ped0" in textures
    tex_err = np.abs(textures["ped0"] - gt_tex).mean()
    assert tex_err < 0.25, tex_err
    # mask nonempty and matching render coverage (pair by stem)
    import cv2
    stem = masks[0].replace("_mask.png", "")
    m = cv2.imread(str(tmp_path / masks[0]), cv2.IMREAD_GRAYSCALE)
    r = cv2.imread(str(tmp_path / (stem + ".png")))
    assert (m > 0).sum() > 50
    assert (r.sum(-1)[m > 0] > 0).mean() > 0.8


def test_pose_smooth_even_total_frames():
    """Regression: total_frames=4 with the default windows used to crash the
    edge-padded moving average (even window)."""
    proc = PoseProcessor()
    idx = np.array([0, 1, 2, 3])
    pose = np.zeros((4, 72))
    sparse = dict(frame_indices=idx, pose=pose, betas=np.zeros((4, 10)),
                  cam=np.linspace(0, 1, 4)[:, None] * np.ones((4, 3)),
                  tform=np.tile(np.eye(2, 3), (4, 1, 1)))
    out = proc.process_sequence(sparse, total_frames=4)
    assert out is not None and out["pose"].shape == (4, 24, 3, 3)
