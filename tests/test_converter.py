"""Schema-golden tests for the 12Hz nuScenes converter
(tools/prepare_data/nuscenes_converter.py) against a stub devkit.

The real devkit/dataset aren't in this image; the stub implements the table
accessors the converter touches, so interpolation values, sweep alignment,
token naming, and the emitted schema are asserted hermetically (VERDICT r1
item 9; reference tools/prepare_data/data_converter/nuscenes_converter.py).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tools", "prepare_data"))

import nuscenes_converter as nc


class StubNusc:
    def __init__(self, with_sweeps=True, n_keyframes=2):
        self.tables = {k: {} for k in
                       ("log", "scene", "sample", "sample_data",
                        "calibrated_sensor", "ego_pose", "sample_annotation")}
        self.scene = []
        self._build(with_sweeps, n_keyframes)

    def get(self, table, token):
        return self.tables[table][token]

    def _add(self, table, token, **kw):
        self.tables[table][token] = dict(token=token, **kw)
        return self.tables[table][token]

    def _build(self, with_sweeps, n_kf):
        self._add("log", "log0", location="boston-seaport",
                  logfile="n008-2018-08-01-15-16-36-0400")
        qi = [1.0, 0, 0, 0]
        self._add("calibrated_sensor", "cs_lidar", rotation=qi,
                  translation=[0.9, 0.0, 1.8], camera_intrinsic=[])
        K = [[1266.0, 0.0, 816.0], [0.0, 1266.0, 491.0], [0.0, 0.0, 1.0]]
        for c in nc.CAM_NAMES:
            self._add("calibrated_sensor", f"cs_{c}", rotation=qi,
                      translation=[1.5, 0.2, 1.5], camera_intrinsic=K)

        t0 = 1_000_000_000
        dt_kf = 500_000  # 2 Hz keyframes
        kf_tokens = []
        for ki in range(n_kf):
            ts = t0 + ki * dt_kf
            # ego moves +x at 2 m/s with a slow yaw drift
            yaw = 0.2 * ki
            pose = self._add(
                "ego_pose", f"pose_kf{ki}",
                rotation=[np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)],
                translation=[1.0 * ki, 0.0, 0.0], timestamp=ts)
            data = {}
            self._add("sample_data", f"lidar{ki}", filename=f"lidar{ki}.bin",
                      calibrated_sensor_token="cs_lidar",
                      ego_pose_token=pose["token"], is_key_frame=True,
                      timestamp=ts, prev="", next="", channel="LIDAR_TOP")
            data["LIDAR_TOP"] = f"lidar{ki}"
            for c in nc.CAM_NAMES:
                self._add("sample_data", f"{c}_kf{ki}",
                          filename=f"{c}_kf{ki}.jpg",
                          calibrated_sensor_token=f"cs_{c}",
                          ego_pose_token=pose["token"], is_key_frame=True,
                          timestamp=ts, prev="", next="", channel=c)
                data[c] = f"{c}_kf{ki}"
            kf_tokens.append((f"sample{ki}", ts, data))

        # camera sweeps between kf0 and kf1, chained backward from kf1
        if with_sweeps and n_kf >= 2:
            for c in nc.CAM_NAMES:
                prev = f"{c}_kf0"
                for si in range(1, 6):
                    ts = t0 + si * dt_kf // 6
                    frac = si / 6.0
                    pose = self._add(
                        "ego_pose", f"pose_{c}_sw{si}",
                        rotation=nc.quat_slerp([1, 0, 0, 0],
                                               [np.cos(0.1), 0, 0, np.sin(0.1)],
                                               frac),
                        translation=[frac, 0.0, 0.0], timestamp=ts)
                    self._add("sample_data", f"{c}_sw{si}",
                              filename=f"{c}_sw{si}.jpg",
                              calibrated_sensor_token=f"cs_{c}",
                              ego_pose_token=pose["token"], is_key_frame=False,
                              timestamp=ts, prev=prev, next="", channel=c)
                    prev = f"{c}_sw{si}"
                # keyframe cam of kf1 points back at the last sweep
                self.tables["sample_data"][f"{c}_kf1"]["prev"] = f"{c}_sw5"

        # annotations: one car moving +x, one pedestrian static
        anns = []
        for ki in range(n_kf):
            for name, cat, x in [("car", "vehicle.car", 10.0 + 2.0 * ki),
                                 ("ped", "human.pedestrian.adult", 5.0)]:
                tok = f"ann_{name}_{ki}"
                self._add("sample_annotation", tok,
                          category_name=cat,
                          translation=[x, 2.0, 1.0], size=[2.0, 4.5, 1.6],
                          rotation=[1.0, 0, 0, 0], instance_token=f"inst_{name}",
                          num_lidar_pts=12, num_radar_pts=3,
                          visibility_token="4", velocity=[2.0 * (name == "car"), 0.0])
                anns.append((ki, tok))

        for ki, (stok, ts, data) in enumerate(kf_tokens):
            self._add("sample", stok, timestamp=ts, data=data,
                      anns=[t for k, t in anns if k == ki],
                      scene_token="scene0",
                      next=kf_tokens[ki + 1][0] if ki + 1 < n_kf else "",
                      prev=kf_tokens[ki - 1][0] if ki else "")
        sc = self._add("scene", "scene0", log_token="log0",
                       name="scene-0001", description="sunny day",
                       first_sample_token="sample0")
        self.scene = [sc]


@pytest.fixture(scope="module")
def infos():
    nusc = StubNusc(with_sweeps=True)
    return nc.build_infos(version="v1.0-trainval", nusc=nusc)


def test_counts_and_token_naming(infos):
    tr = infos["train"]
    # kf0 + 5 interpolated + kf1
    assert len(tr["infos"]) == 7
    toks = [i["token"] for i in tr["infos"]]
    assert toks[0] == "sample0"
    # reference naming: interpolated frames associate with the NEXT keyframe,
    # counted backward (nuscenes_converter.py:501-506)
    assert toks[1:6] == [f"sample1;-{n}" for n in (5, 4, 3, 2, 1)]
    assert toks[6] == "sample1"
    assert tr["scene_tokens"] == [toks]
    assert [i["is_key_frame"] for i in tr["infos"]] == [
        True, False, False, False, False, False, True]


def test_schema_fields(infos):
    info = infos["train"]["infos"][0]
    for key in ("token", "timestamp", "location", "description", "timeofday",
                "is_key_frame", "lidar2ego_rotation", "lidar2ego_translation",
                "ego2global_rotation", "ego2global_translation", "cams",
                "gt_boxes", "gt_names", "gt_box_ids", "gt_velocity",
                "num_lidar_pts", "num_radar_pts", "visibility", "valid_flag",
                "ego_velocity"):
        assert key in info, key
    assert info["gt_boxes"].shape == (2, 9)
    assert set(info["cams"]) == set(nc.CAM_NAMES)
    cam = info["cams"]["CAM_FRONT"]
    for key in ("data_path", "camera_intrinsics", "sensor2lidar_rotation",
                "sensor2lidar_translation", "sensor2ego_rotation",
                "sensor2ego_translation"):
        assert key in cam, key
    assert info["timeofday"].startswith("2018-08-01")


def test_sweep_images_and_pose(infos):
    """Interpolated frames use the real camera sweeps and the CAM_FRONT
    sweep's ego pose (reference :491-509)."""
    mids = infos["train"]["infos"][1:6]
    paths = [i["cams"]["CAM_FRONT"]["data_path"] for i in mids]
    assert all("sw" in p for p in paths), paths
    assert len(set(paths)) == 5  # distinct sweeps, forward in time
    assert paths == sorted(paths)
    # frame ego pose == that sweep's pose record (translation = si/6)
    for i in mids:
        sw = i["cams"]["CAM_FRONT"]["data_path"]  # e.g. CAM_FRONT_sw3.jpg
        si = int(sw.split("_sw")[1][0])
        np.testing.assert_allclose(i["ego2global_translation"],
                                   [si / 6.0, 0, 0], atol=1e-9)


def test_box_interpolation_values(infos):
    """Car moves 10 -> 12 in GLOBAL x over the keyframe gap; interpolation
    happens in the global frame and transforms into the mid frame through its
    ACTUAL (sweep) ego pose — here with the 0.1 rad yaw drift — not through a
    linearly-interpolated local frame (advisor r2 finding: local interpolation
    misaligns gt with the sweep images when ego motion is non-linear)."""
    tr = infos["train"]["infos"]
    ids0 = tr[0]["gt_box_ids"]
    car0 = tr[0]["gt_boxes"][ids0.index("inst_car")]
    ids6 = tr[6]["gt_box_ids"]
    car6 = tr[6]["gt_boxes"][ids6.index("inst_car")]
    info = tr[3]
    mid = info["gt_boxes"][info["gt_box_ids"].index("inst_car")]

    # expected: global lerp center [11, 2, 1] through the frame's real pose
    e2g_r = nc.quat_to_rot(info["ego2global_rotation"])
    e2g_t = np.asarray(info["ego2global_translation"])
    l2g_t = e2g_r @ np.array([0.9, 0.0, 1.8]) + e2g_t  # lidar2ego rot = I
    c = e2g_r.T @ (np.array([11.0, 2.0, 1.0]) - l2g_t)
    yaw_l = nc.rot_yaw(e2g_r.T)  # global car yaw 0 seen under ego yaw 0.1
    want = [c[0], c[1], c[2] - 0.8, 2.0, 4.5, 1.6,
            -yaw_l - np.pi / 2, 0.0, 0.0]
    np.testing.assert_allclose(mid, want, atol=1e-9)
    # and it is NOT the lidar-local lerp (the pre-fix behavior)
    assert np.abs(mid - (car0 + car6) / 2).max() > 1e-3
    # sizes identical; z_bottom = (z_global - lidar_height) - h/2
    assert abs(car0[5] - 1.6) < 1e-9 and abs(car0[2] - (1.0 - 1.8 - 0.8)) < 1e-9
    # velocity survives into the schema
    v = tr[0]["gt_velocity"][ids0.index("inst_car")]
    np.testing.assert_allclose(v, [2.0, 0.0], atol=1e-9)


def test_fallback_without_sweeps():
    nusc = StubNusc(with_sweeps=False)
    out = nc.build_infos(version="v1.0-trainval", nusc=nusc)
    mids = out["train"]["infos"][1:6]
    # keyframe images reused; ego pose SLERP/linear between keyframes
    assert all("kf0" in i["cams"]["CAM_FRONT"]["data_path"] for i in mids)
    np.testing.assert_allclose(mids[2]["ego2global_translation"],
                               [0.5, 0, 0], atol=1e-9)
    # slerp of yaw 0 -> 0.2 at t=0.5 is yaw 0.1
    q = mids[2]["ego2global_rotation"]
    yaw = 2 * np.arctan2(q[3], q[0])
    assert abs(yaw - 0.1) < 1e-6


def test_test_split_has_no_annotations():
    nusc = StubNusc(with_sweeps=True)
    out = nc.build_infos(version="v1.0-test", nusc=nusc)
    assert "test" in out
    for i in out["test"]["infos"]:
        assert i["gt_boxes"].shape == (0, 9)
        assert len(i["gt_box_ids"]) == 0


def test_dataset_consumes_converted_schema(tmp_path):
    """The datasets layer parses the converter's output (frame_from_info)."""
    from magicdrive_v2_tpu.datasets.nuscenes import frame_from_info
    nusc = StubNusc(with_sweeps=True)
    out = nc.build_infos(version="v1.0-trainval", nusc=nusc)
    frame = frame_from_info(out["train"]["infos"][2])
    assert "cams" in frame or frame is not None


# ---------------------------------------------------------------------------
# validate_infos.py — field-level infos-pkl comparator (run it for real against
# a reference-produced pkl once real data exists; here: self-consistency +
# detection power on the stub-devkit output)
# ---------------------------------------------------------------------------

import copy
import pickle

import validate_infos as vi


def _dump(tmp_path, name, data):
    p = tmp_path / name
    with open(p, "wb") as f:
        pickle.dump(data, f)
    return str(p)


def test_validate_identical_ok(infos, tmp_path, capsys):
    a = _dump(tmp_path, "a.pkl", infos)
    b = _dump(tmp_path, "b.pkl", infos)
    assert vi.main([a, b]) == 0
    assert "RESULT: OK" in capsys.readouterr().out


def test_validate_detects_box_and_pose_drift(infos, tmp_path, capsys):
    mut = copy.deepcopy(infos)
    tgt = mut["train"]["infos"][2]
    tgt["gt_boxes"] = np.asarray(tgt["gt_boxes"], float).copy()
    tgt["gt_boxes"][0, 0] += 1.0  # 1 m center drift >> atol-box
    tgt["ego2global_translation"] = (
        np.asarray(tgt["ego2global_translation"], float) + 0.01).tolist()
    a = _dump(tmp_path, "a.pkl", infos)
    b = _dump(tmp_path, "b.pkl", mut)
    assert vi.main([a, b]) == 1
    out = capsys.readouterr().out
    assert "[FAIL] gt_boxes" in out
    assert "[FAIL] ego2global_translation" in out
    # untouched fields still pass
    assert "[ok] cams.sensor2lidar_rotation" in out


def test_validate_aligns_boxes_by_id(infos, tmp_path):
    """Row order differences are fine when gt_box_ids match."""
    mut = copy.deepcopy(infos)
    for info in mut["train"]["infos"]:
        n = len(info["gt_box_ids"])
        if n > 1:
            perm = np.arange(n)[::-1]
            for f in ("gt_boxes", "gt_velocity", "gt_names", "gt_box_ids",
                      "num_lidar_pts", "num_radar_pts", "visibility",
                      "valid_flag"):
                if f in info and len(info[f]) == n:
                    info[f] = np.asarray(info[f])[perm]
    a = _dump(tmp_path, "a.pkl", infos)
    b = _dump(tmp_path, "b.pkl", mut)
    assert vi.main([a, b]) == 0


def test_validate_reports_missing_tokens(infos, tmp_path, capsys):
    mut = copy.deepcopy(infos)
    del mut["train"]["infos"][3]
    a = _dump(tmp_path, "a.pkl", infos)
    b = _dump(tmp_path, "b.pkl", mut)
    assert vi.main([a, b]) == 1
    assert "only-ours" in capsys.readouterr().out


def test_validate_detects_dropped_box(infos, tmp_path, capsys):
    """Our side missing a box the reference has (a strict id-subset) must FAIL —
    the permutation may not silently drop reference-only rows."""
    mut = copy.deepcopy(infos)  # plays "ours", one box removed
    for info in mut["train"]["infos"]:
        n = len(info.get("gt_box_ids", ()))
        if n > 1:
            keep = np.arange(n - 1)
            for f in ("gt_boxes", "gt_velocity", "gt_names", "gt_box_ids",
                      "num_lidar_pts", "num_radar_pts", "visibility",
                      "valid_flag"):
                if f in info and len(info[f]) == n:
                    info[f] = np.asarray(info[f])[keep]
            break
    a = _dump(tmp_path, "a.pkl", mut)
    b = _dump(tmp_path, "b.pkl", infos)
    assert vi.main([a, b]) == 1
    assert "unalignable box ids" in capsys.readouterr().out
