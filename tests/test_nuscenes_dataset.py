"""End-to-end dataset integration: synthetic on-disk nuScenes infos pkl + JPEGs ->
composed yaml config -> NuScenesTDataset -> clip batch with all model inputs."""
import os
import pickle

import numpy as np
import pytest

from magicdrive_v2_tpu.config import merge_dataset_cfg, Config
from magicdrive_v2_tpu.config.yaml_compose import load_yaml_config
from magicdrive_v2_tpu.datasets.nuscenes import NuScenesTDataset

CAMS = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT"]
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mini_nuscenes(tmp_path_factory):
    """Two scenes x 6 frames with real JPEG files and full pose/calib records."""
    from PIL import Image
    root = tmp_path_factory.mktemp("nusc")
    rng = np.random.default_rng(0)
    img_dir = root / "samples"
    img_dir.mkdir()
    infos, scene_tokens = [], []
    ts = 0
    for scene in range(2):
        tokens = []
        for fi in range(6):
            token = f"s{scene}f{fi}" if fi % 2 == 0 else f"s{scene}f{fi};interp"
            tokens.append(token)
            cams = {}
            for ci, cam in enumerate(CAMS):
                path = img_dir / f"{token}_{cam}.jpg"
                Image.fromarray(rng.integers(0, 255, (90, 160, 3), np.uint8)).save(path)
                yaw = ci * np.pi / 3
                c, s = np.cos(yaw), np.sin(yaw)
                cams[cam] = dict(
                    data_path=str(path),
                    camera_intrinsics=np.array([[120.0, 0, 80], [0, 120.0, 45],
                                                [0, 0, 1]]),
                    sensor2lidar_rotation=np.array([[0, 0, 1], [-1, 0, 0],
                                                    [0, -1, 0]]) @ np.array(
                        [[c, -s, 0], [s, c, 0], [0, 0, 1]]).T,
                    sensor2lidar_translation=np.array([1.5 * c, 1.5 * s, 1.6]),
                    sensor2ego_rotation=[1, 0, 0, 0],
                    sensor2ego_translation=[0, 0, 1.6],
                )
            n_box = 3
            boxes = np.concatenate([
                rng.uniform(-20, 20, (n_box, 2)), rng.uniform(-1, 0, (n_box, 1)),
                rng.uniform(1, 4, (n_box, 3)), rng.uniform(-3, 3, (n_box, 1)),
                np.zeros((n_box, 2)),
            ], axis=1)
            infos.append(dict(
                token=token, timestamp=ts,
                lidar_path="", sweeps=[], location="singapore-onenorth",
                description="A sunny day with light traffic",
                timeofday="day",
                lidar2ego_rotation=[1, 0, 0, 0], lidar2ego_translation=[0, 0, 1.8],
                ego2global_rotation=[np.cos(0.05 * fi), 0, 0, np.sin(0.05 * fi)],
                ego2global_translation=[2.0 * fi, 0.1 * fi, 0],
                cams=cams,
                gt_boxes=boxes,
                gt_names=np.array(["car", "truck", "pedestrian"][:n_box]),
                gt_box_ids=[f"inst{scene}_{i}" for i in range(n_box)],
                num_lidar_pts=np.array([5, 5, 5][:n_box]),
                valid_flag=np.array([True] * n_box),
            ))
            ts += 1
        scene_tokens.append(tokens)
    pkl = root / "infos.pkl"
    with open(pkl, "rb" if False else "wb") as f:
        pickle.dump({"infos": infos, "scene_tokens": scene_tokens,
                     "metadata": {"version": "v1.0-mini"}}, f)
    return str(pkl)


def test_yaml_composition():
    cfg = load_yaml_config(os.path.join(
        REPO, "configs/dataset/Nuscenes_400_map_cache_box_t_with_n2t_12Hz.yaml"))
    assert cfg["image_size"] == [424, 800]
    assert cfg["map_bound"]["x"] == [-50.0, 50.0, 0.25]  # child override
    assert len(cfg["object_classes"]) == 10  # inherited from base
    aug = next(t for t in cfg["train_pipeline"] if t["type"] == "ImageAug3D")
    assert aug["final_dim"] == [424, 800]  # interpolation follows the override
    assert aug["resize_lim"] == [0.5, 0.5]
    ann = cfg["data"]["train"]["ann_file"]
    assert ann.endswith("nuscenes_advanced_12Hz_infos_train_with_v.pkl")
    assert ann.startswith("./data/nuscenes_mmdet3d-12Hz/")


def test_merge_dataset_cfg_into_experiment():
    cfg = Config({"num_frames": 9})
    merge_dataset_cfg(cfg, "Nuscenes_400_map_cache_box_t_with_n2t_12Hz",
                      overrides=(("dataset.data.val.ann_file", "/tmp/x.pkl"),
                                 ("+dataset.data.val.start_on_firstframe", True)),
                      search_dirs=[os.path.join(REPO, "configs/dataset")])
    assert cfg.dataset.data.val.ann_file == "/tmp/x.pkl"
    assert cfg.dataset.data.val.start_on_firstframe is True
    assert cfg.dataset.image_size == [424, 800]


def _build_ds(mini_nuscenes, with_aux=True):
    yaml_cfg = load_yaml_config(os.path.join(REPO, "configs/dataset/Nuscenes.yaml"))
    # small final_dim to keep the test fast
    pipeline = yaml_cfg["train_pipeline"]
    for t in pipeline:
        if t["type"] == "ImageAug3D":
            t["final_dim"] = [24, 40]
            t["resize_lim"] = [0.25, 0.25]
        if t["type"] == "LoadBEVSegmentation":
            t["xbound"] = [-50.0, 50.0, 1.0]
            t["ybound"] = [-50.0, 50.0, 1.0]
            if with_aux:
                # exercise the full dynamic+aux variant (main chain is map-only)
                t["object_classes"] = yaml_cfg["object_classes"]
                t["aux_data"] = yaml_cfg["aux_data"]
    return NuScenesTDataset(
        ann_file=mini_nuscenes, pipeline=pipeline, dataset_root="",
        object_classes=yaml_cfg["object_classes"],
        view_order=yaml_cfg["view_order"], video_length=3,
        start_on_keyframe=True, fps=12,
        img_collate_param=dict(
            template=yaml_cfg["template"], frame_emb="next2top",
            bbox_mode="all-xyz", bbox_processor_type=2, is_train=True))


def test_dataset_end_to_end(mini_nuscenes):
    ds = _build_ds(mini_nuscenes)
    # 2 scenes x 6 frames, clips of 3, keyframe starts only (even indices, and the
    # clip must fit) -> starts 0, 2 per scene = 4 clips
    assert len(ds) == 4
    clip = ds[0]
    assert clip["pixel_values"].shape == (3, 6, 3, 24, 40)
    # 8 static map + 10 object classes + 8 aux (1 vis + 2 offset + 4 ohw + 1 height)
    assert clip["bev_map_with_aux"].shape == (3, 8 + 10 + 8, 100, 100)
    assert clip["camera_param"].shape == (3, 6, 3, 7)
    assert clip["frame_emb"].shape == (3, 4, 4)
    assert np.allclose(clip["frame_emb"][0], np.eye(4), atol=1e-6)
    assert not np.allclose(clip["frame_emb"][2], np.eye(4), atol=1e-3)  # ego moved
    bbox = clip["bboxes_3d_data"]
    assert bbox is not None
    assert bbox["bboxes"].shape[0] == 3 and bbox["bboxes"].shape[1] == 1
    assert bbox["masks"].shape[1] == 6
    assert (bbox["masks"] == 1).sum() > 0
    assert "sunny day" in clip["captions"][0]
    assert clip["num_frames"] == 3 and clip["fps"] == 12

    # full batch path
    from magicdrive_v2_tpu.datasets import clip_to_model_batch, collate_clips
    batch = collate_clips([ds[0], ds[1]])
    mb = clip_to_model_batch(batch, box_latent_dim=8)
    assert mb["x"].shape == (12, 3, 3, 24, 40)
    assert mb["maps"].shape == (2, 3, 26, 100, 100)
    assert mb["bbox"]["box_latent"].shape[-1] == 8


def test_multirank_loader_covers_global_batch(mini_nuscenes):
    """prepare_multirank_dataloader: (a) dp_local=dp yields the FULL global
    batch (batch_size rows per dp rank — the reference's per-GPU semantics,
    fixing the old rank-0-slice-only behavior), with the rank partition
    covering the dataset exactly once; (b) per-process slices (dp_local=1 at
    each offset) concatenate to the same global batches — the multi-host
    contract make_global_batch relies on."""
    from magicdrive_v2_tpu.datasets import prepare_multirank_dataloader

    ds = _build_ds(mini_nuscenes, with_aux=False)
    kw = dict(bucket_config=None, batch_size=1, shuffle=True, seed=0,
              num_workers=1, drop_last=True)
    loader, sampler = prepare_multirank_dataloader(
        ds, dp_total=2, dp_local=2, dp_offset=0, **kw)
    global_batches = list(loader)
    assert len(global_batches) == 2  # 4 clips / (1 per rank x 2 ranks)
    b0 = global_batches[0]
    assert b0["pixel_values"].shape[0] == 2
    assert not np.allclose(b0["pixel_values"][0], b0["pixel_values"][1])
    seen = np.concatenate([b["pixel_values"] for b in global_batches])
    assert seen.shape[0] == 4  # whole dataset, once

    l0, _ = prepare_multirank_dataloader(ds, dp_total=2, dp_local=1,
                                         dp_offset=0, **kw)
    l1, _ = prepare_multirank_dataloader(ds, dp_total=2, dp_local=1,
                                         dp_offset=1, **kw)
    for g, r0, r1 in zip(global_batches, l0, l1):
        np.testing.assert_array_equal(g["pixel_values"][0],
                                      r0["pixel_values"][0])
        np.testing.assert_array_equal(g["pixel_values"][1],
                                      r1["pixel_values"][0])
        np.testing.assert_array_equal(g["fps"],
                                      np.concatenate([r0["fps"], r1["fps"]]))


def test_full_bucket_through_bucket_sampler(tmp_path):
    """The flagship multires training path with a "full" bucket: ragged scenes
    (9 and 19 raw frames) flow through NuScenesVariableDataset ->
    NuScenesMultiResDataset.as_buckets ("H-W-fps-full" key) -> BucketSampler ->
    make_full_bucket_collate, and every yielded batch has the ONE padded
    static shape (bucket max-T from max_full_clip_len) plus frame_valid."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers_mini_nuscenes import generate
    from magicdrive_v2_tpu.datasets import (max_full_clip_len,
                                            prepare_dataloader)
    from magicdrive_v2_tpu.datasets.nuscenes import (NuScenesMultiResDataset,
                                                     NuScenesVariableDataset)

    ann_file = generate(str(tmp_path / "nusc"), scene_lengths=(9, 19))
    yaml_cfg = load_yaml_config(os.path.join(REPO, "configs/dataset/Nuscenes.yaml"))
    pipeline = yaml_cfg["train_pipeline"]
    for t in pipeline:
        if t["type"] == "ImageAug3D":
            t["final_dim"] = [24, 40]
            t["resize_lim"] = [0.25, 0.25]
        if t["type"] == "LoadBEVSegmentation":
            t["xbound"] = [-50.0, 50.0, 1.0]
            t["ybound"] = [-50.0, 50.0, 1.0]
    var = NuScenesVariableDataset(
        ann_file=ann_file, pipeline=pipeline, dataset_root="",
        object_classes=yaml_cfg["object_classes"],
        view_order=yaml_cfg["view_order"], video_length=["full"],
        fps=[[12]], base_fps=12, start_on_keyframe=False,
        img_collate_param=dict(template=yaml_cfg["template"],
                               frame_emb="next2top", bbox_mode="all-xyz",
                               bbox_processor_type=2, is_train=True))
    ds = NuScenesMultiResDataset([((24, 40), var)])
    assert max_full_clip_len(ds) == 17  # 19 raw frames -> 8n+1

    loader, sampler = prepare_dataloader(
        ds, bucket_config={"24-40-12-full": 1}, batch_size=1,
        num_replicas=1, shuffle=True, seed=0, num_workers=1,
        full_bucket_t=17)
    batches = list(loader)
    assert len(batches) == 2
    valid_lens = set()
    for b in batches:
        assert b["num_frames"] == 17
        assert b["pixel_values"].shape[:2] == (1, 17)
        assert b["frame_valid"].shape == (1, 17)
        nv = int(b["num_frames_valid"][0])
        valid_lens.add(nv)
        np.testing.assert_array_equal(b["frame_valid"][0],
                                      ([1.0] * nv + [0.0] * (17 - nv)))
    assert valid_lens == {9, 17}


def test_build_clips_full_trims_exact_multiples():
    """'full' clips snap DOWN to the 8n+1 grid; the old `len % m - 1` trim
    left exact multiples (24 % 8 == 0) at 8n length (advisor r4 finding)."""
    from magicdrive_v2_tpu.datasets.nuscenes import NuScenesTDataset

    ds = NuScenesTDataset.__new__(NuScenesTDataset)
    ds.video_length = "full"
    ds.micro_frame_size = 8
    ds.start_on_firstframe = False
    ds.start_on_keyframe = False
    ds.balance_keywords = None
    lengths = {24: 17, 19: 17, 17: 17, 9: 9, 8: 1, 240: 233}
    for raw, want in lengths.items():
        infos = [{"token": f"t{i}"} for i in range(raw)]
        clips = ds.build_clips(infos, [[f"t{i}" for i in range(raw)]])
        assert len(clips[0]) == want, (raw, len(clips[0]))
