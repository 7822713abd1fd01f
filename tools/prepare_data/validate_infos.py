#!/usr/bin/env python
"""Field-level comparison of two nuScenes `infos` pickles.

Purpose: validate this repo's 12 Hz converter output
(`tools/prepare_data/nuscenes_converter.py`) against a pickle produced by the
reference pipeline (reference `tools/prepare_data/data_converter/
nuscenes_converter.py` + `add_box_id.py`), field by field — the converter's
golden tests run against a stub devkit, so this is the check to run once real
nuScenes data (and a reference-produced pkl) are on disk:

    python tools/prepare_data/validate_infos.py ours.pkl reference.pkl \
        [--atol-geom 1e-4] [--atol-box 0.05] [--max-report 10]

Both pkl layouts are accepted: a split dict `{"infos": [...],
"scene_tokens": [...]}` or the flat `{"train": {...}, "val": {...}}` file.
Frames are aligned by `token` (the reference's non-keyframe naming
`<next_kf_token>;-<k>` is shared by both converters); boxes within a frame are
aligned by `gt_box_ids` when present on both sides, else by row order.

Interpolated (non-keyframe) geometry legitimately differs at the level of the
pose/interp arithmetic (float64 quaternion ops vs the reference's pyquaternion),
so geometry fields get a loose default tolerance and the report shows the
actual max/percentile error per field rather than stopping at the first
mismatch. Exit code 0 = all fields within tolerance.
"""
from __future__ import annotations

import argparse
import pickle
import sys
from collections import defaultdict

import numpy as np

# field -> tolerance class
GEOM_FIELDS = (
    "lidar2ego_rotation", "lidar2ego_translation",
    "ego2global_rotation", "ego2global_translation", "ego_velocity",
)
CAM_GEOM_FIELDS = (
    "sensor2lidar_rotation", "sensor2lidar_translation",
    "sensor2ego_rotation", "sensor2ego_translation", "camera_intrinsics",
)
BOX_FIELDS = ("gt_boxes", "gt_velocity")
EXACT_FIELDS = ("location", "description", "timeofday", "is_key_frame")
COUNT_FIELDS = ("num_lidar_pts", "num_radar_pts", "visibility", "valid_flag")


def _load(path):
    with open(path, "rb") as f:
        data = pickle.load(f)
    if "infos" in data:
        return {"<file>": data}
    return {k: v for k, v in data.items() if isinstance(v, dict)
            and "infos" in v}


def _index(split):
    return {info["token"]: info for info in split["infos"]}


class FieldStats:
    def __init__(self):
        self.n = 0
        self.max_err = 0.0
        self.errs = []
        self.mismatches = []  # (token, detail) for exact fields

    def add_num(self, token, a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        if a.shape != b.shape:
            self.mismatches.append((token, f"shape {a.shape} vs {b.shape}"))
            return
        err = float(np.max(np.abs(a - b))) if a.size else 0.0
        self.n += 1
        self.errs.append(err)
        if err > self.max_err:
            self.max_err = err

    def add_exact(self, token, a, b):
        self.n += 1
        if a != b:
            self.mismatches.append((token, f"{a!r} vs {b!r}"))

    def summary(self, atol):
        if self.mismatches:
            return False, f"{len(self.mismatches)}/{self.n} mismatched"
        if not self.errs:
            return True, f"{self.n} compared (exact)"
        errs = np.asarray(self.errs)
        ok = self.max_err <= atol
        return ok, (f"max {self.max_err:.3g}  p99 "
                    f"{np.percentile(errs, 99):.3g}  (n={self.n}, "
                    f"atol={atol:g})")


def _box_perm(a_info, b_info):
    """Row alignment for per-box arrays: by gt_box_ids when both sides carry
    them, else identity (requires equal counts)."""
    ids_a = a_info.get("gt_box_ids")
    ids_b = b_info.get("gt_box_ids")
    if ids_a is None or ids_b is None:
        n_a = len(np.asarray(a_info.get("gt_boxes", ())))
        n_b = len(np.asarray(b_info.get("gt_boxes", ())))
        if n_a != n_b:
            return None, f"box count differs ({n_a} ours vs {n_b} reference)"
        return None, None
    ids_a = np.asarray(ids_a).tolist()
    ids_b = np.asarray(ids_b).tolist()
    if len(ids_a) != len(ids_b):
        # a strict-subset permutation would silently drop reference-only boxes
        # (exactly the converter-lost-a-box failure this validator must catch)
        return None, f"box count differs ({len(ids_a)} ours vs {len(ids_b)} reference)"
    pos_b = {bid: i for i, bid in enumerate(ids_b)}
    perm = [pos_b.get(bid, -1) for bid in ids_a]
    if any(p < 0 for p in perm) or len(set(perm)) != len(perm):
        return None, "box-id sets differ"
    return np.asarray(perm), None


def compare_split(a, b, args, name):
    ia, ib = _index(a), _index(b)
    only_a = sorted(set(ia) - set(ib))
    only_b = sorted(set(ib) - set(ia))
    shared = [t for t in ia if t in ib]
    stats = defaultdict(FieldStats)
    box_align_fail = 0

    for tok in shared:
        fa, fb = ia[tok], ib[tok]
        for f in EXACT_FIELDS:
            if f in fa or f in fb:
                stats[f].add_exact(tok, fa.get(f), fb.get(f))
        for f in GEOM_FIELDS:
            if f in fa and f in fb:
                stats[f].add_num(tok, fa[f], fb[f])
        stats["timestamp"].add_num(tok, fa.get("timestamp", 0),
                                   fb.get("timestamp", 0))
        # camera entries
        for cam in sorted(set(fa.get("cams", {})) & set(fb.get("cams", {}))):
            ca, cb = fa["cams"][cam], fb["cams"][cam]
            stats["cams.data_path"].add_exact(
                tok, ca.get("data_path"), cb.get("data_path"))
            for f in CAM_GEOM_FIELDS:
                if f in ca and f in cb:
                    stats[f"cams.{f}"].add_num(tok, ca[f], cb[f])
        # per-box arrays, aligned by box id
        if "gt_boxes" in fa and "gt_boxes" in fb:
            perm, err = _box_perm(fa, fb)
            if err:
                box_align_fail += 1
                continue
            for f in BOX_FIELDS + COUNT_FIELDS + ("gt_names",):
                if f not in fa or f not in fb:
                    continue
                va, vb = np.asarray(fa[f]), np.asarray(fb[f])
                if perm is not None and len(perm) == len(va) \
                        and len(vb) >= len(perm):
                    vb = vb[perm]
                if f == "gt_names":
                    stats[f].add_exact(tok, va.tolist(), vb.tolist())
                elif f == "gt_boxes" and va.shape == vb.shape and va.size:
                    # yaw (col 6) compared modulo 2*pi
                    d = np.abs(va - vb)
                    if va.shape[1] > 6:
                        dy = np.abs(((va[:, 6] - vb[:, 6]) + np.pi)
                                    % (2 * np.pi) - np.pi)
                        d[:, 6] = dy
                    stats[f].add_num(tok, d, np.zeros_like(d))
                else:
                    stats[f].add_num(tok, va, vb)

    print(f"\n== split {name}: {len(shared)} shared frames"
          f" ({len(only_a)} only-ours, {len(only_b)} only-reference) ==")
    if only_a[:args.max_report]:
        print("  only-ours tokens:", only_a[:args.max_report])
    if only_b[:args.max_report]:
        print("  only-reference tokens:", only_b[:args.max_report])
    if box_align_fail:
        print(f"  frames with unalignable box ids: {box_align_fail}")

    ok_all = not only_a and not only_b and not box_align_fail
    for f in sorted(stats):
        atol = args.atol_box if f.split(".")[-1] in BOX_FIELDS else (
            args.atol_geom if ("rotation" in f or "translation" in f
                               or "velocity" in f or "intrinsics" in f)
            else args.atol_count if f.split(".")[-1] in COUNT_FIELDS
            else args.atol_ts if f == "timestamp" else 0.0)
        ok, msg = stats[f].summary(atol)
        print(f"  [{'ok' if ok else 'FAIL'}] {f:36s} {msg}")
        if not ok:
            for tok, detail in stats[f].mismatches[:args.max_report]:
                print(f"         {tok}: {detail}")
        ok_all = ok_all and ok
    return ok_all


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("ours")
    p.add_argument("reference")
    p.add_argument("--atol-geom", type=float, default=1e-4,
                   help="calibration / pose / velocity tolerance")
    p.add_argument("--atol-box", type=float, default=0.05,
                   help="box center/size/yaw tolerance (m / rad); "
                        "interpolated frames carry interp-arithmetic noise")
    p.add_argument("--atol-count", type=float, default=0.0)
    p.add_argument("--atol-ts", type=float, default=1.0,
                   help="timestamp tolerance (us)")
    p.add_argument("--max-report", type=int, default=10)
    args = p.parse_args(argv)

    a_splits = _load(args.ours)
    b_splits = _load(args.reference)
    if set(a_splits) == {"<file>"} or set(b_splits) == {"<file>"}:
        pairs = [("<file>", next(iter(a_splits.values())),
                  next(iter(b_splits.values())))]
    else:
        pairs = [(k, a_splits[k], b_splits[k])
                 for k in sorted(set(a_splits) & set(b_splits))]
        for k in sorted(set(a_splits) ^ set(b_splits)):
            print(f"split {k!r} present on one side only")
    ok = bool(pairs)
    for name, a, b in pairs:
        ok = compare_split(a, b, args, name) and ok
    print("\nRESULT:", "OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
