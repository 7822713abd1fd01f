"""Dataset-layer tests: geometry, bbox processors, collate, samplers, BEV.

All host-side numpy (no TPU): golden values derived from the formulas cited in
SURVEY.md §2.8/§2.9.
"""
import os

import numpy as np
import pytest

from magicdrive_v2_tpu.datasets import (
    BucketSampler, StatefulSampler, boxes_to_corners, clip_to_model_batch,
    collate_clips, collate_fn_single_clip, ensure_canvas, obtain_next2top,
    one_hot_decode, one_hot_encode, preprocess_bbox, preprocess_bbox_keep_all,
    quaternion_to_rotation_matrix, trans_boxes_to_view)
from magicdrive_v2_tpu.datasets.bev import LoadBEVSegmentation
from magicdrive_v2_tpu.datasets.transforms import aug_homography
from collections import OrderedDict


# ---------------- geometry ----------------

def test_quaternion_identity_and_axis():
    assert np.allclose(quaternion_to_rotation_matrix([1, 0, 0, 0]), np.eye(3))
    # 90 deg about z: (w, x, y, z) = (cos45, 0, 0, sin45)
    R = quaternion_to_rotation_matrix([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    assert np.allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-12)


def test_boxes_to_corners_axis_aligned():
    # bottom-center at origin, dims (2, 4, 6), yaw 0
    box = np.array([[0, 0, 0, 2, 4, 6, 0]], np.float32)
    corners = boxes_to_corners(box)[0]
    # mmdet3d order: x0y0z0, x0y0z1, x0y1z1, x0y1z0, x1y0z0, x1y0z1, x1y1z1, x1y1z0
    expected = np.array([
        [-1, -2, 0], [-1, -2, 6], [-1, 2, 6], [-1, 2, 0],
        [1, -2, 0], [1, -2, 6], [1, 2, 6], [1, 2, 0]], np.float32)
    assert np.allclose(corners, expected, atol=1e-5)


def test_boxes_to_corners_yaw():
    box = np.array([[5, 3, 1, 2, 2, 2, np.pi / 2]], np.float32)
    corners = boxes_to_corners(box)[0]
    # yaw pi/2 about z: (dx, dy) -> (-dy, dx) relative to center
    rel = corners - np.array([5, 3, 1])
    assert np.allclose(sorted(rel[:, 0]), [-1, -1, -1, -1, 1, 1, 1, 1], atol=1e-5)
    # corner 0 (x0y0z0) local (-1,-1,0); mmdet3d rotates clockwise for +yaw:
    # (x, y) -> (x cos + y sin, -x sin + y cos) => (-1, 1, 0)
    assert np.allclose(rel[0], [-1, 1, 0], atol=1e-5)


def _pose(yaw, t):
    q = [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)]
    return {"lidar2ego_rotation": [1, 0, 0, 0], "lidar2ego_translation": [0, 0, 0],
            "ego2global_rotation": q, "ego2global_translation": t}


def test_obtain_next2top_matches_se3_composition():
    first = _pose(0.3, [10.0, -2.0, 0.5])
    current = _pose(-0.8, [13.0, 4.0, 0.4])

    def l2g(p):
        m = np.eye(4)
        m[:3, :3] = quaternion_to_rotation_matrix(p["ego2global_rotation"]) @ \
            quaternion_to_rotation_matrix(p["lidar2ego_rotation"])
        # l2e translation is zero here, so translation = e2g translation
        m[:3, 3] = p["ego2global_translation"]
        return m

    # v2: maps points in the FIRST (top) lidar frame into the CURRENT frame
    expected = np.linalg.inv(l2g(current)) @ l2g(first)
    got = obtain_next2top(first, current, epsilon=None, v2=True)
    assert np.allclose(got, expected, atol=1e-9)
    # identity when first == current
    eye = obtain_next2top(first, first, epsilon=None, v2=True)
    assert np.allclose(eye, np.eye(4), atol=1e-9)


def test_trans_boxes_to_view_pinhole():
    # camera looking along +z of its own frame; lidar2image = K @ [I|0]
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 100.0
    K[0, 2], K[1, 2] = 50.0, 30.0
    # box center 10 m in front (z up in lidar... we fake: use transform = K)
    box = np.array([[0, 0, 10, 2, 2, 2, 0]], np.float32)
    coords = trans_boxes_to_view(box, K, None, proj=True)
    assert coords.shape == (1, 8, 3)
    assert np.all(coords[..., 2] == 1.0)  # positive z normalized to +1
    # center-ish projection near the principal point
    assert abs(coords[..., 0].mean() - 50.0) < 2.0
    assert abs(coords[..., 1].mean() - 30.0) < 2.0


def test_ensure_canvas():
    inside = np.zeros((1, 8, 3))
    inside[0, :, 0] = 10  # x
    inside[0, :, 1] = 10  # y
    inside[0, :, 2] = 1
    outside = inside.copy()
    outside[0, :, 0] = 500
    coords = np.concatenate([inside, outside])
    mask = ensure_canvas(coords, (100, 200))
    assert mask.tolist() == [True, False]


# ---------------- aug homography ----------------

def test_aug_homography_maps_pixels_like_pil_ops():
    # resize s, crop (x0, y0, ...), no flip/rot: p' = s*p - (x0, y0)
    s, crop = 0.5, (10, 20, 110, 70)
    H = aug_homography(s, crop, False, 0.0)
    p = np.array([100.0, 80.0, 0.0, 1.0])
    out = H @ p
    assert np.allclose(out[:2], [100 * s - 10, 80 * s - 20])
    # flip about the crop width: x -> (W - x)
    Hf = aug_homography(1.0, (0, 0, 200, 100), True, 0.0)
    out = Hf @ np.array([30.0, 40.0, 0.0, 1.0])
    assert np.allclose(out[:2], [170, 40])
    # 180-deg rotation about crop center
    Hr = aug_homography(1.0, (0, 0, 200, 100), False, 180.0)
    out = Hr @ np.array([30.0, 40.0, 0.0, 1.0])
    assert np.allclose(out[:2], [170, 60], atol=1e-9)


# ---------------- bbox processors ----------------

def _clip_frames(t=3, n_cam=2, n_box=2):
    frames = []
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 100.0
    K[0, 2], K[1, 2] = 200.0, 100.0
    # cam 0 looks at +x (lidar) -> z_cam = x_lidar; cam 1 looks at -x
    l2c0 = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
                    np.float64)
    l2c1 = np.array([[0, 1, 0, 0], [0, 0, -1, 0], [-1, 0, 0, 0], [0, 0, 0, 1]],
                    np.float64)
    for ti in range(t):
        boxes = np.array([[8 + ti, 0, 0, 2, 2, 2, 0],   # in front (+x)
                          [-8 - ti, 0, 0, 2, 2, 2, 0]], np.float32)[:n_box]
        frames.append({
            "boxes": boxes,
            "labels": np.arange(n_box, dtype=np.int64),
            "tokens": [f"tok{i}" for i in range(n_box)],
            "lidar2camera": np.stack([l2c0, l2c1][:n_cam]),
            "lidar2image": np.stack([K @ l2c0, K @ l2c1][:n_cam]),
            "img_aug_matrix": np.stack([np.eye(4)] * n_cam),
        })
    return frames


def test_preprocess_bbox_keep_all_token_alignment_and_visibility():
    frames = _clip_frames()
    out = preprocess_bbox_keep_all("all-xyz", (200, 400), frames, is_train=False)
    assert out["bboxes"].shape == (3, 1, 2, 8, 3)
    assert out["classes"].shape == (3, 1, 2)
    assert out["masks"].shape == (3, 2, 2)
    # box 0 (front, +x) visible only in cam 0; box 1 only in cam 1 (3d z>0 filter)
    assert np.all(out["masks"][:, 0] == [1, 0])
    assert np.all(out["masks"][:, 1] == [0, 1])
    # token slot stability across frames: slot 0 tracks tok0's moving box
    assert np.allclose(out["bboxes"][0, 0, 0].mean(0)[0], 8, atol=1.1)
    assert np.allclose(out["bboxes"][2, 0, 0].mean(0)[0], 10, atol=1.1)


def test_preprocess_bbox_keep_all_drop_marks_minus_one():
    frames = _clip_frames()
    import random as pyrandom
    out = preprocess_bbox_keep_all(
        "all-xyz", (200, 400), frames, is_train=True, bbox_drop_ratio=1.0,
        keyframe_rate=3, rng=pyrandom.Random(0))
    # frames 1, 2 are non-keyframes -> all visible entries flipped to -1
    assert np.all(out["masks"][0] >= 0)
    assert np.all(out["masks"][1:] <= 0)
    assert (out["masks"][1:] == -1).sum() > 0


def test_preprocess_bbox_padded_processor():
    frames = _clip_frames()
    out = preprocess_bbox("cxyz", (200, 400), frames, is_train=False)
    assert out["bboxes"].shape == (3, 2, 1, 4, 3)  # per-view max 1 visible box
    assert out["masks"].dtype == bool
    assert out["masks"].sum() == 6  # one box per view per frame


def test_preprocess_bbox_empty():
    frames = _clip_frames(n_box=0)
    for f in frames:
        f["tokens"] = []
    assert preprocess_bbox_keep_all("all-xyz", (200, 400), frames) is None
    assert preprocess_bbox("all-xyz", (200, 400), frames) is None


# ---------------- collate ----------------

def _full_frames(t=2, n_cam=2):
    frames = _clip_frames(t=t, n_cam=n_cam)
    for ti, f in enumerate(frames):
        f["img"] = np.zeros((n_cam, 3, 32, 64), np.float32) + ti
        f["gt_masks_bev"] = np.zeros((8, 20, 20), np.float32)
        f["gt_aux_bev"] = None
        f["camera_intrinsics"] = np.stack([np.eye(4, dtype=np.float32)] * n_cam)
        f["camera2lidar"] = np.stack([np.eye(4, dtype=np.float32)] * n_cam)
        f["next2top"] = np.eye(4, dtype=np.float32)
        f["metas"] = {"description": f"frame {ti}"}
    return frames


def test_collate_single_clip_and_batch_adapter():
    clip = collate_fn_single_clip(
        _full_frames(), template="A driving scene. {description}",
        frame_emb="next2top", bbox_mode="all-xyz", bbox_processor_type=2,
        is_train=False)
    assert clip["pixel_values"].shape == (2, 2, 3, 32, 64)
    assert clip["bev_map_with_aux"].shape == (2, 8, 20, 20)
    assert clip["camera_param"].shape == (2, 2, 3, 7)
    assert clip["frame_emb"].shape == (2, 4, 4)
    assert clip["captions"][0] == "A driving scene. frame 0"
    clip["fps"] = 12

    batch = collate_clips([clip, clip])
    assert batch["pixel_values"].shape == (2, 2, 2, 3, 32, 64)
    assert batch["bboxes_3d_data"]["bboxes"].shape[0] == 2

    model_batch = clip_to_model_batch(batch)
    assert model_batch["x"].shape == (4, 3, 2, 32, 64)  # (B*NC, C, T, H, W)
    assert model_batch["cams"].shape == (4, 2, 1, 3, 7)
    assert model_batch["rel_pos"].shape == (4, 2, 1, 4, 4)
    assert model_batch["bbox"]["bboxes"].shape[:2] == (4, 2)
    assert model_batch["bbox"]["masks"].shape == (4, 2, 2)
    assert "box_latent" not in model_batch["bbox"]

    # sample_id models need per-instance latents shared across views and time
    # (reference add_box_latent, train_magicdrive.py:500)
    mb = clip_to_model_batch(batch, box_latent_dim=16,
                             rng=np.random.default_rng(0))
    lat = mb["bbox"]["box_latent"]
    assert lat.shape == (4, 2, 2, 16)
    lat = lat.reshape(2, 2, 2, 2, 16)  # (B, NC, T, L, D)
    assert np.allclose(lat[:, 0, 0], lat[:, 1, 1])  # same instance, any view/frame


def test_full_bucket_clip_padding():
    """Ragged "full" scenes pad to ONE bucket max-T (per-frame tensors repeat
    the last valid frame, boxes pad null) and thread frame_valid /
    num_frames_valid through collate_clips + clip_to_model_batch; unpadded
    ragged batches fail LOUDLY (VERDICT r3 items 3b/8)."""
    from magicdrive_v2_tpu.datasets import (make_full_bucket_collate,
                                            pad_clip_to_t)

    def mk_clip(t):
        clip = collate_fn_single_clip(
            _full_frames(t=t), template="{description}", frame_emb="next2top",
            bbox_mode="all-xyz", bbox_processor_type=2, is_train=False)
        clip["fps"] = 12
        return clip

    c9, c17 = mk_clip(9), mk_clip(17)
    with pytest.raises(ValueError, match="full_bucket_t"):
        collate_clips([c9, dict(c17)])

    p9 = pad_clip_to_t(dict(c9), 17)
    assert p9["pixel_values"].shape[0] == 17
    assert p9["num_frames_valid"] == 9
    # pads repeat the last valid frame; boxes pad null
    np.testing.assert_array_equal(p9["pixel_values"][9:],
                                  np.repeat(c9["pixel_values"][8:9], 8, 0))
    np.testing.assert_array_equal(p9["camera_param"][16], c9["camera_param"][8])
    assert (p9["bboxes_3d_data"]["masks"][9:] == 0).all()
    assert (p9["bboxes_3d_data"]["classes"][9:] == -1).all()
    assert len(p9["captions"]) == 17

    batch = collate_clips([p9, dict(c17)])
    assert batch["num_frames"] == 17
    np.testing.assert_array_equal(batch["num_frames_valid"], [9, 17])
    np.testing.assert_array_equal(batch["frame_valid"][0],
                                  [1] * 9 + [0] * 8)
    assert batch["frame_valid"][1].all()

    mb = clip_to_model_batch(batch)
    assert mb["frame_valid"].shape == (2, 17)
    assert mb["x"].shape[2] == 17

    # the loader-side collate pads is_full_clip items (and 8n+1-trims first)
    collate = make_full_bucket_collate(17)
    c13 = mk_clip(13)  # fps-subsampled full clip, not 8n+1 -> trim to 9
    c13["is_full_clip"] = True
    c9b = mk_clip(9)
    c9b["is_full_clip"] = True
    b2 = collate([c13, c9b])
    assert b2["num_frames"] == 17
    np.testing.assert_array_equal(b2["num_frames_valid"], [9, 9])

    # non-8n+1 targets / shrinking are programmer errors, not silent clips
    with pytest.raises(ValueError, match="8n\\+1"):
        pad_clip_to_t(dict(c9), 16)
    with pytest.raises(ValueError, match="exceeds"):
        pad_clip_to_t(dict(c17), 9)


def test_pad_model_batch_snaps_ragged_clips_to_grid():
    """pad_model_batch_to_t first snaps a non-8n+1 clip DOWN to the grid (the
    app path has no make_full_bucket_collate in front of it — a 19-frame val
    scene must trim to 17, not raise; advisor r4 finding)."""
    from magicdrive_v2_tpu.datasets import pad_model_batch_to_t

    def mk_mb(t):
        clip = collate_fn_single_clip(
            _full_frames(t=t), template="{description}", frame_emb="next2top",
            bbox_mode="all-xyz", bbox_processor_type=2, is_train=False)
        clip["fps"] = 12
        return clip_to_model_batch(collate_clips([clip]))

    mb19 = pad_model_batch_to_t(mk_mb(19), 17)
    assert mb19["num_frames"] == 17 and mb19["x"].shape[2] == 17
    assert int(mb19["num_frames_valid"][0]) == 17
    assert mb19["frame_valid"].all()
    # trimmed frames match the first 17 of the raw clip exactly
    np.testing.assert_array_equal(mb19["x"], mk_mb(19)["x"][:, :, :17])
    np.testing.assert_array_equal(mb19["maps"], mk_mb(19)["maps"][:, :17])

    # trim composes with padding: 12 -> snap 9 -> pad 17
    mb12 = pad_model_batch_to_t(mk_mb(12), 17)
    assert int(mb12["num_frames_valid"][0]) == 9
    np.testing.assert_array_equal(mb12["frame_valid"][0], [1] * 9 + [0] * 8)

    # still loud when the snapped clip exceeds the bucket
    with pytest.raises(ValueError, match="exceeds"):
        pad_model_batch_to_t(mk_mb(25), 17)


def test_full_bucket_collate_handles_shape_only_items():
    """drop_ori_imgs items carry pixel_values_shape instead of pixel_values;
    the full-bucket collate must trim + pad them too (advisor r4 finding)."""
    from magicdrive_v2_tpu.datasets import make_full_bucket_collate

    clip = collate_fn_single_clip(
        _full_frames(t=13), template="{description}", frame_emb="next2top",
        bbox_mode="all-xyz", bbox_processor_type=2, is_train=False)
    clip["fps"] = 12
    clip["pixel_values_shape"] = np.array(clip.pop("pixel_values").shape)
    clip["is_full_clip"] = True

    out = make_full_bucket_collate(17)([clip])
    np.testing.assert_array_equal(out["num_frames_valid"], [9])  # 13 -> 9
    assert int(out["pixel_values_shape"][0][0]) == 17
    assert out["bev_map_with_aux"].shape[1] == 17


# ---------------- samplers ----------------

def test_bucket_sampler_static_shape_batches_and_resume():
    buckets = OrderedDict([
        ("224-400-12-9", list(range(10))),
        ("224-400-12-17", list(range(7))),
    ])
    cfg = {"224-400-12-9": 2, "224-400-12-17": 3}
    s = BucketSampler(buckets, cfg, num_replicas=2, rank=0, seed=3)
    batches = list(s)
    assert all(len(set(i.split("-", 1)[1] for i in b)) == 1 for b in batches)
    sizes = {b[0].split("-", 1)[1]: len(b) for b in batches}
    assert sizes["224-400-12-9"] == 2 and sizes.get("224-400-12-17", 3) == 3

    # deterministic across ranks: rank 1 sees the same access order
    s0 = BucketSampler(buckets, cfg, num_replicas=2, rank=0, seed=3)
    s1 = BucketSampler(buckets, cfg, num_replicas=2, rank=1, seed=3)
    b0, b1 = list(s0), list(s1)
    assert len(b0) == len(b1)

    # resume: consume 2 steps, save, reload -> identical remainder
    s2 = BucketSampler(buckets, cfg, num_replicas=2, rank=0, seed=3)
    it = iter(s2)
    first_two = [next(it), next(it)]
    state = s2.state_dict(num_steps=2)
    s3 = BucketSampler(buckets, cfg, num_replicas=2, rank=0, seed=3)
    s3.load_state_dict(state)
    resumed = list(s3)
    assert first_two + resumed == list(
        BucketSampler(buckets, cfg, num_replicas=2, rank=0, seed=3))


def test_bucket_sampler_dp_windows_share_bucket():
    """Every dp step's micro-batches must come from ONE bucket so the
    assembled global batch is single-shape (round-3 advisor high finding:
    per-rank bucket divergence crashed prepare_multirank_dataloader under
    bucket_config with dp>1)."""
    buckets = OrderedDict([
        ("224-400-12-9", list(range(10))),
        ("224-400-12-17", list(range(7))),
        ("424-800-12-9", list(range(5))),
    ])
    cfg = {"224-400-12-9": 2, "224-400-12-17": 3, "424-800-12-9": 1}
    R = 2
    per_rank = [list(BucketSampler(buckets, cfg, num_replicas=R, rank=r, seed=3))
                for r in range(R)]
    assert len(per_rank[0]) == len(per_rank[1]) > 0
    for step, (b0, b1) in enumerate(zip(*per_rank)):
        k0 = b0[0].split("-", 1)[1]
        k1 = b1[0].split("-", 1)[1]
        assert k0 == k1, f"step {step}: ranks diverged on bucket ({k0} vs {k1})"
        assert len(b0) == len(b1) == cfg[k0]
    # all buckets with >= bs*R samples (after cycling pad) are represented
    seen = {b[0].split("-", 1)[1] for b in per_rank[0]}
    assert seen == set(cfg)


def test_multirank_dataloader_bucketed_global_batches():
    """prepare_multirank_dataloader + bucket_config + dp=2: concat_batches must
    assemble a global batch (2*bs rows) every step without shape divergence."""
    from magicdrive_v2_tpu.datasets.dataloader import prepare_multirank_dataloader

    class _FakeMultiRes:
        buckets = OrderedDict([("64-80-12-9", list(range(8))),
                               ("64-80-12-17", list(range(6)))])

        def as_buckets(self):
            return self.buckets

        def __getitem__(self, key: str):
            idx, h, w, fps, t = key.split("-")
            t = int(t)
            return {
                "pixel_values": np.zeros((6, t, 8, 10, 3), np.float32),
                "captions": f"clip{idx}",
                "height": int(h), "width": int(w), "fps": int(fps),
                "num_frames": t,
            }

        def __len__(self):
            return 14

    loader, sampler = prepare_multirank_dataloader(
        _FakeMultiRes(), dp_total=2, dp_local=2,
        bucket_config={"64-80-12-9": 2, "64-80-12-17": 1},
        shuffle=True, seed=0, num_workers=1, prefetch=1,
        collate_fn=lambda items: {
            "pixel_values": np.stack([it["pixel_values"] for it in items]),
            "captions": [it["captions"] for it in items],
            "height": items[0]["height"], "width": items[0]["width"],
            "num_frames": items[0]["num_frames"],
        })
    steps = list(loader)
    assert len(steps) == len(sampler.samplers[0])
    for batch in steps:
        bs_local = 2 if batch["num_frames"] == 9 else 1
        assert batch["pixel_values"].shape[0] == 2 * bs_local
        assert len(batch["captions"]) == 2 * bs_local


def test_bucket_sampler_drops_minus_one():
    buckets = OrderedDict([("a", list(range(4))), ("b", list(range(4)))])
    s = BucketSampler(buckets, {"a": 2, "b": -1})
    assert all(i.endswith("-a") for b in s for i in b)


def test_stateful_sampler_resume():
    s = StatefulSampler(10, num_replicas=2, rank=0, seed=1)
    full = list(s)
    s2 = StatefulSampler(10, num_replicas=2, rank=0, seed=1)
    s2.load_state_dict(s2.state_dict(step=2))
    assert list(s2) == full[2:]


# ---------------- BEV ----------------

def test_one_hot_roundtrip():
    rng = np.random.default_rng(0)
    masks = rng.integers(0, 2, (8, 16, 16)).astype(np.uint8)
    assert np.array_equal(one_hot_decode(one_hot_encode(masks), 8), masks)


def test_bev_dynamic_and_aux():
    bev = LoadBEVSegmentation(
        dataset_root="", xbound=(-50, 50, 0.5), ybound=(-50, 50, 0.5),
        classes=[f"c{i}" for i in range(8)], object_classes=["car", "truck"],
        aux_data=["visibility", "center_offset", "center_ohw", "height"])
    data = {
        "token": "x", "boxes": np.array([[0, 0, 0, 4, 2, 1.5, 0.3]], np.float32),
        "labels": np.array([0]), "visibility": np.array([2.0]),
        "lidar2ego": np.eye(4), "ego2global": np.eye(4),
    }
    out = bev(data)
    assert out["gt_masks_bev"].shape == (10, 200, 200)
    assert out["gt_aux_bev"].shape == (8, 200, 200)
    # the car channel has the box footprint near the canvas center
    assert out["gt_masks_bev"][8].sum() > 10
    assert out["gt_masks_bev"][9].sum() == 0
    # aux visibility channel painted with the box's visibility value
    assert out["gt_aux_bev"][0].max() == pytest.approx(2.0)
    # height channel = dz
    assert out["gt_aux_bev"][7].max() == pytest.approx(1.5)


def test_extract_masks_stub_backend(tmp_path):
    """tools/extract_masks.py: directory walk + cityscapes group masking over
    samples/ and sweeps/ (reference datasets/extract_masks.py save layout)."""
    import sys as _sys
    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import extract_masks as em
    from PIL import Image

    rng = np.random.default_rng(0)
    for sub in ("samples", "sweeps"):
        d = tmp_path / "data" / sub / "CAM_FRONT"
        d.mkdir(parents=True)
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (32, 48, 3), np.uint8)).save(
                d / f"img{i}.jpg")
    n = em.extract(str(tmp_path / "data"), str(tmp_path / "masks"),
                   em.StubBackend())
    assert n == 4
    for g in ("human", "vehicle"):
        p = tmp_path / "masks" / g / "samples" / "CAM_FRONT" / "img0.png"
        assert p.exists()
        m = np.asarray(Image.open(p))
        assert m.dtype == np.uint8 and set(np.unique(m)) <= {0, 255}
    # stub bands guarantee both groups hit somewhere across random images
    tot = sum(np.asarray(Image.open(f)).sum()
              for g in ("human", "vehicle")
              for f in (tmp_path / "masks" / g).rglob("*.png"))
    assert tot > 0


def test_bev_live_map_rasterization_with_stub_api():
    """LoadBEVSegmentation in-pipeline static rasterization against a stub map
    API (reference loading.py:526-588: get_map_mask patch cut + composite
    class merging)."""
    bev = LoadBEVSegmentation(
        dataset_root="/nonexistent", xbound=(-50, 50, 0.5), ybound=(-50, 50, 0.5),
        classes=["drivable_area*", "ped_crossing", "divider"])

    calls = {}

    class StubMap:
        def get_map_mask(self, patch_box, patch_angle, layer_names, canvas_size):
            calls.update(patch_box=patch_box, patch_angle=patch_angle,
                         layer_names=list(layer_names))
            masks = np.zeros((len(layer_names), *canvas_size), np.uint8)
            # distinct square per layer so the class merge is visible
            for i in range(len(layer_names)):
                masks[i, 10 + i * 20:20 + i * 20, 10:20] = 1
            return masks

    bev._maps = {"boston-seaport": StubMap()}
    yaw = np.pi / 2
    e2g = np.eye(4)
    e2g[:2, :2] = [[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]]
    e2g[:2, 3] = [100.0, -40.0]
    data = dict(token="t0", location="boston-seaport",
                ego2global=e2g, lidar2ego=np.eye(4))
    out = bev(data)
    static = out["gt_masks_bev_static"]
    assert static.shape == (3, 200, 200)
    # patch centred on the lidar's global xy, rotated by the ego yaw
    np.testing.assert_allclose(calls["patch_box"], (100.0, -40.0, 100.0, 100.0))
    assert abs(calls["patch_angle"] - 90.0) < 1e-6
    # composite classes merge multiple layers
    ln = calls["layer_names"]
    assert {"road_segment", "lane", "road_divider", "lane_divider",
            "ped_crossing"} <= set(ln)
    drivable = static[0]
    merged = np.zeros((200, 200), bool)
    for layer in ("road_segment", "lane"):
        i = ln.index(layer)
        m = np.zeros((len(ln), 200, 200), np.uint8)
        m[i, 10 + i * 20:20 + i * 20, 10:20] = 1
        merged |= m[i].T.astype(bool)
    assert (drivable.astype(bool) == merged).all()
    # no devkit + unknown location -> zeros, not a crash
    bev2 = LoadBEVSegmentation(
        dataset_root="/nonexistent", xbound=(-50, 50, 0.5), ybound=(-50, 50, 0.5),
        classes=["divider"])
    out2 = bev2(dict(token="t1", location="nowhere",
                     ego2global=np.eye(4), lidar2ego=np.eye(4)))
    assert out2["gt_masks_bev_static"].sum() == 0
