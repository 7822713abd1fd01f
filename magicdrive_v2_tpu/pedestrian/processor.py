"""Pedestrian texture-harvest + re-render processor (passes 1-2 of the 12 Hz
pedestrian pipeline).

Port of the reference fork's headline feature (reference
pedestrian_processor.py:49-749, consumed by pipeline_12hz.py:99-432): per scene,

  pass 1: SegFormer person masks + HMR2 SMPL fits per (frame, camera) ->
          per-vertex visibility-filtered color harvesting across the clip;
  pose smoothing: PoseProcessor (pedestrian/pose.py, already ported);
  inpaint: symmetry + KNN + mesh-neighborhood median fill of unseen vertices;
  pass 2: re-render the textured body per camera with real intrinsics + a
          z-merged instance buffer, emitting RGB + mask pairs consumed by the
          BrushNet training data path.

The neural stages are pluggable backends so the geometry/texture logic runs
and is tested without GPU checkpoints:

  Segmenter:  image_bgr -> bool person mask     (ref get_global_human_mask :107)
  SmplFitter: crop_256 -> smpl params           (ref estimate_smpl :132)
  BodyModel:  v_template/faces/vertices(...)    (ref hmr2_model.smpl)

`SegformerSegmenter` wraps transformers' SegFormer (local weights only — this
image has zero egress). `Synthetic*` backends are deterministic stand-ins used
by tests and `scripts/pipeline_12hz.py --synthetic-backends`.

Rendering uses the native z-buffer vertex-color rasterizer
(native/src/mdv2_native.cpp mdv2_rasterize_mesh) in place of pytorch3d.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..native import rasterize_mesh

F_HMR = 5000.0  # HMR crop camera focal length (reference :295)
C_HMR = 128.0   # crop principal point
CROP = 256      # crop resolution


# ---------------------------------------------------------------------------
# affine crop helpers (cv2-free math kept minimal; cv2 only used when present)
# ---------------------------------------------------------------------------


def crop_affine(center: np.ndarray, scale: float) -> np.ndarray:
    """2x3 affine mapping the full-image box (center, scale*200) to 256x256,
    matching the reference's cv2.getAffineTransform construction (:143-158)."""
    src_w = scale * 200.0
    s = (CROP - 1) / src_w
    # maps x_img -> (x_img - (cx - w/2)) * s
    t = np.array([
        [s, 0.0, -(center[0] - src_w / 2) * s],
        [0.0, s, -(center[1] - src_w / 2) * s],
    ], np.float64)
    return t


def invert_affine(t: np.ndarray) -> np.ndarray:
    a = np.eye(3)
    a[:2] = t
    inv = np.linalg.inv(a)
    return inv[:2]


def warp_affine_nearest(img: np.ndarray, t: np.ndarray, out_wh: Tuple[int, int],
                        border):
    """Nearest-neighbor affine warp, border-constant. img HxW[xC]."""
    w_out, h_out = out_wh
    inv = invert_affine(t)
    ys, xs = np.mgrid[0:h_out, 0:w_out]
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    xi = np.round(src_x).astype(np.int64)
    yi = np.round(src_y).astype(np.int64)
    valid = (xi >= 0) & (xi < img.shape[1]) & (yi >= 0) & (yi < img.shape[0])
    out = np.full((h_out, w_out) + img.shape[2:], border, img.dtype)
    out[valid] = img[yi[valid], xi[valid]]
    return out


# ---------------------------------------------------------------------------
# backends
# ---------------------------------------------------------------------------


class BodyModel:
    """Body mesh interface (the role of hmr2_model.smpl in the reference)."""
    v_template: np.ndarray  # (V, 3)
    faces: np.ndarray       # (F, 3) int

    def vertices(self, global_orient: np.ndarray, body_pose: np.ndarray,
                 betas: np.ndarray) -> np.ndarray:
        raise NotImplementedError


def _capsule_body(n_rings: int = 24, n_seg: int = 16) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic x-symmetric humanoid-ish capsule (~1.7 m tall, origin at
    pelvis) for the synthetic backend. Symmetric across x so symmetry
    inpainting is exercised."""
    vs, faces = [], []
    heights = np.linspace(-0.85, 0.85, n_rings)
    for i, z in enumerate(heights):
        # torso bulge + head taper
        t = (z + 0.85) / 1.7
        r = 0.16 + 0.12 * np.sin(np.pi * min(t, 0.8) / 0.8) * (1.0 - 0.5 * (t > 0.85))
        for j in range(n_seg):
            a = 2 * np.pi * j / n_seg
            vs.append([r * np.cos(a), r * np.sin(a), z])
    for i in range(n_rings - 1):
        for j in range(n_seg):
            a = i * n_seg + j
            b = i * n_seg + (j + 1) % n_seg
            c = (i + 1) * n_seg + j
            d = (i + 1) * n_seg + (j + 1) % n_seg
            faces.append([a, b, c])
            faces.append([b, d, c])
    return np.asarray(vs, np.float32), np.asarray(faces, np.int32)


class SyntheticBody(BodyModel):
    """Parametric capsule body: betas[0] scales girth, global_orient rotates."""

    def __init__(self):
        self.v_template, self.faces = _capsule_body()

    def vertices(self, global_orient, body_pose, betas):
        del body_pose
        v = self.v_template.copy()
        if betas is not None and len(np.ravel(betas)):
            v[:, :2] *= (1.0 + 0.1 * float(np.ravel(betas)[0]))
        if global_orient is not None:
            rot = np.asarray(global_orient, np.float64).reshape(3, 3)
            v = v @ rot.T
        return v.astype(np.float32)


class SyntheticSegmenter:
    """Person mask = pixels that differ from a flat background color."""

    def __init__(self, background: int = 0):
        self.background = background

    def __call__(self, image_bgr: np.ndarray) -> np.ndarray:
        return np.any(image_bgr.astype(np.int32) != self.background, axis=-1)


class SyntheticSmplFitter:
    """Places the synthetic body at the depth implied by the bbox height in the
    crop camera (z = f * body_height / pixel_height), like HMR's weak
    perspective lift. Deterministic."""

    def __init__(self, body: BodyModel):
        self.body = body

    def fit(self, crop_bgr: np.ndarray, bbox_px_height: float) -> Dict:
        del crop_bgr
        body_h = float(np.ptp(self.body.v_template[:, 2]))
        # bbox height in crop pixels is ~CROP * bbox/longest-side; approximate
        z = F_HMR * body_h / max(CROP * 0.9, 1.0)
        return dict(
            vertices=self.body.v_template[None].copy(),
            cam_t=np.array([[0.0, 0.0, z]], np.float32),
            smpl_pose=np.broadcast_to(np.eye(3, dtype=np.float32),
                                      (1, 23, 3, 3)).copy(),
            global_orient=np.eye(3, dtype=np.float32)[None, None].copy(),
            betas=np.zeros((1, 10), np.float32),
        )


class SegformerSegmenter:
    """Cityscapes SegFormer person masks via transformers (reference
    get_global_human_mask, pedestrian_processor.py:107-130; person class 11).
    Local weights only — this environment has no network egress."""

    PERSON_CLASS = 11

    def __init__(self, model_path: str, device: str = "cpu"):
        import torch
        from transformers import (SegformerForSemanticSegmentation,
                                  SegformerImageProcessor)
        self.torch = torch
        self.processor = SegformerImageProcessor.from_pretrained(model_path)
        self.model = SegformerForSemanticSegmentation.from_pretrained(model_path)
        self.model.to(device).eval()
        self.device = device

    def __call__(self, image_bgr: np.ndarray) -> np.ndarray:
        torch = self.torch
        rgb = image_bgr[:, :, ::-1]
        inputs = self.processor(images=rgb, return_tensors="pt").to(self.device)
        with torch.no_grad():
            logits = self.model(**inputs).logits
        up = torch.nn.functional.interpolate(logits, size=rgb.shape[:2],
                                             mode="bilinear", align_corners=False)
        pred = up.argmax(dim=1)[0].cpu().numpy()
        return pred == self.PERSON_CLASS


# ---------------------------------------------------------------------------
# processor
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PedestrianProcessor:
    """Texture harvest + re-render (reference PedestrianProcessor)."""
    segmenter: object
    fitter: object
    body: BodyModel

    def __post_init__(self):
        self.symmetry_idx = self._symmetry_indices()

    def _symmetry_indices(self) -> np.ndarray:
        """Nearest template vertex of each x-flipped vertex (reference :93-105)."""
        from scipy.spatial import cKDTree
        tv = np.asarray(self.body.v_template, np.float64)
        flipped = tv.copy()
        flipped[:, 0] *= -1
        _, idx = cKDTree(tv).query(flipped, k=1)
        return idx

    # -- pass 1 -------------------------------------------------------------

    def get_global_human_mask(self, image_bgr: np.ndarray) -> np.ndarray:
        return self.segmenter(image_bgr)

    def estimate_smpl(self, image_bgr: np.ndarray, bbox: Sequence[float]) -> Dict:
        """Crop around bbox, run the fitter, return reference-shaped output
        (reference estimate_smpl :132-182)."""
        x1, y1, x2, y2 = bbox
        center = np.array([(x1 + x2) / 2.0, (y1 + y2) / 2.0])
        width, height = x2 - x1, y2 - y1
        scale = max(width, height) / 200.0
        tform = crop_affine(center, scale)
        crop = warp_affine_nearest(image_bgr, tform, (CROP, CROP), 0)
        out = self.fitter.fit(crop, height)
        out["crop_info"] = {"tform": tform}
        out["bbox_height"] = height
        return out

    def compute_vertices(self, smpl_params: Dict) -> np.ndarray:
        return self.body.vertices(smpl_params["global_orient"],
                                  smpl_params["body_pose"],
                                  smpl_params["betas"])[None]

    def _project_crop(self, verts_cam: np.ndarray) -> np.ndarray:
        """(V, 3) camera-space -> (V, 3) crop-screen u, v, z."""
        z = verts_cam[:, 2]
        u = F_HMR * verts_cam[:, 0] / z + C_HMR
        v = F_HMR * verts_cam[:, 1] / z + C_HMR
        return np.stack([u, v, z], axis=1)

    def render_instance_id_map(self, smpl_outputs: List[Dict],
                               ped_ids: Sequence[int],
                               image_shape) -> Tuple[np.ndarray, np.ndarray]:
        """Per-person crop depth render, warped back and z-merged into full-image
        id/depth maps for occlusion handling (reference :212-280)."""
        H, W = image_shape[:2]
        full_id = np.zeros((H, W), np.int32)
        full_depth = np.full((H, W), np.inf, np.float32)
        for smpl_out, pid in zip(smpl_outputs, ped_ids):
            verts_cam = smpl_out["vertices"][0] + smpl_out["cam_t"][0]
            screen = self._project_crop(verts_cam)
            _, depth_crop, fid = rasterize_mesh(screen, self.body.faces, None,
                                                CROP, CROP)
            mask_crop = fid >= 0
            tinv = invert_affine(np.asarray(smpl_out["crop_info"]["tform"]))
            depth_full = warp_affine_nearest(depth_crop, tinv, (W, H), np.inf)
            mask_full = warp_affine_nearest(mask_crop.astype(np.uint8), tinv,
                                            (W, H), 0).astype(bool)
            update = mask_full & (depth_full < full_depth)
            full_depth[update] = depth_full[update]
            full_id[update] = pid
        return full_id, full_depth

    def project_and_sample_vertices(self, smpl_out: Dict, image_bgr: np.ndarray,
                                    seg_mask: np.ndarray, id_map: np.ndarray,
                                    depth_map: np.ndarray, current_id: int,
                                    depth_threshold: float = 0.05):
        """Project vertices to the full image; keep those that land on the
        person mask, are not occluded by another instance, and pass the
        self-occlusion depth test; bilinear-sample colors weighted by
        bbox_height^2 (reference :282-407)."""
        vertices = smpl_out["vertices"][0]
        cam_t = smpl_out["cam_t"][0]
        tform = np.asarray(smpl_out["crop_info"]["tform"])
        H, W = image_bgr.shape[:2]

        v_cam = vertices + cam_t
        z = v_cam[:, 2]
        u = F_HMR * v_cam[:, 0] / z + C_HMR
        v = F_HMR * v_cam[:, 1] / z + C_HMR
        tinv = invert_affine(tform)
        u_full = tinv[0, 0] * u + tinv[0, 1] * v + tinv[0, 2]
        v_full = tinv[1, 0] * u + tinv[1, 1] * v + tinv[1, 2]

        u_int = np.round(u_full).astype(np.int64)
        v_int = np.round(v_full).astype(np.int64)
        valid = (u_int >= 1) & (u_int < W - 1) & (v_int >= 1) & (v_int < H - 1)
        final_mask = np.zeros(len(vertices), bool)
        idx = np.where(valid)[0]
        if len(idx):
            us, vs = u_int[idx], v_int[idx]
            is_person = seg_mask[vs, us]
            is_vis_id = (id_map[vs, us] == current_id) | (id_map[vs, us] == 0)
            is_vis_depth = (z[idx] - depth_map[vs, us]) < depth_threshold
            final_mask[idx[is_person & is_vis_id & is_vis_depth]] = True

        colors = np.zeros((len(vertices), 3), np.float32)
        weights = np.zeros((len(vertices), 1), np.float32)
        if np.any(final_mask):
            uf, vf = u_full[final_mask], v_full[final_mask]
            u0 = np.clip(np.floor(uf).astype(np.int64), 0, W - 1)
            v0 = np.clip(np.floor(vf).astype(np.int64), 0, H - 1)
            u1 = np.clip(u0 + 1, 0, W - 1)
            v1 = np.clip(v0 + 1, 0, H - 1)
            wu = np.clip(uf - u0, 0, 1)[:, None]
            wv = np.clip(vf - v0, 0, 1)[:, None]
            rgb = image_bgr[:, :, ::-1].astype(np.float32) / 255.0
            col = (rgb[v0, u0] * (1 - wu) * (1 - wv) + rgb[v0, u1] * wu * (1 - wv)
                   + rgb[v1, u0] * (1 - wu) * wv + rgb[v1, u1] * wu * wv)
            w = max(float(smpl_out.get("bbox_height", 100.0)), 50.0) ** 2
            colors[final_mask] = col * w
            weights[final_mask] = w
        return colors, weights

    # -- inpainting ----------------------------------------------------------

    def inpaint_missing_colors(self, vertex_sums: np.ndarray,
                               vertex_counts: np.ndarray) -> np.ndarray:
        """Average -> symmetry fill -> KNN fill -> mesh-median filter
        (reference :410-465)."""
        from scipy.spatial import cKDTree
        counts = vertex_counts.copy()
        counts[counts == 0] = 1.0
        avg = vertex_sums / counts
        valid = vertex_counts[:, 0] > 0
        missing = ~valid
        if not np.any(valid):
            return np.ones_like(avg) * 0.5
        if np.any(missing):
            mi = np.where(missing)[0]
            si = self.symmetry_idx[mi]
            ok = valid[si]
            avg[mi[ok]] = avg[si[ok]]
            valid[mi[ok]] = True
            missing[mi[ok]] = False
        if np.any(missing):
            tv = np.asarray(self.body.v_template, np.float64)
            tree = cKDTree(tv[valid])
            vcol = avg[valid]
            mi = np.where(missing)[0]
            _, nn = tree.query(tv[mi], k=min(3, int(valid.sum())))
            nn = np.atleast_2d(nn)
            avg[mi] = vcol[nn].mean(axis=1)
        return self._median_filter_colors(avg, np.ones(len(avg), bool))

    def _median_filter_colors(self, colors: np.ndarray,
                              valid_mask: np.ndarray) -> np.ndarray:
        """Mesh-neighborhood per-channel median (reference :468-506)."""
        if valid_mask.sum() < 10:
            return colors
        n = len(colors)
        neighbors = [set() for _ in range(n)]
        for face in self.body.faces:
            for i in range(3):
                for j in range(3):
                    if i != j:
                        neighbors[face[i]].add(face[j])
        out = colors.copy()
        for i in np.where(valid_mask)[0]:
            nb = list(neighbors[i])
            if len(nb) < 3:
                continue
            nb_valid = valid_mask[nb]
            if nb_valid.sum() >= 3:
                stack = np.vstack([colors[i:i + 1],
                                   colors[np.asarray(nb)[nb_valid]]])
                out[i] = np.median(stack, axis=0)
        return out

    # -- pass 2 --------------------------------------------------------------

    def render_colored_mesh(self, smpl_out: Dict, vertex_colors: np.ndarray,
                            image_shape, intrinsics: Optional[np.ndarray] = None):
        """Render the textured body into the full image (ROI-cropped pinhole
        camera; reference :508-647). Returns (bgr uint8, mask bool, depth f32)."""
        H, W = image_shape[:2]
        vertices = np.asarray(smpl_out["vertices"])
        if vertices.ndim == 3:
            vertices = vertices[0]
        tform = np.asarray(smpl_out["crop_info"]["tform"])
        tinv = invert_affine(tform)

        if intrinsics is not None and "pos_cam" in smpl_out:
            T_mesh = np.asarray(smpl_out["pos_cam"]).reshape(3)
            K = np.asarray(intrinsics)
            f_x, f_y = K[0, 0], K[1, 1]
            c_x, c_y = K[0, 2], K[1, 2]
        else:
            T_mesh = np.asarray(smpl_out["cam_t"]).reshape(-1)[-3:]
            s_x, s_y = tinv[0, 0], tinv[1, 1]
            t_x, t_y = tinv[0, 2], tinv[1, 2]
            f_x, f_y = s_x * F_HMR, s_y * F_HMR
            c_x, c_y = s_x * C_HMR + t_x, s_y * C_HMR + t_y

        corners = np.array([[0, 0, 1], [CROP, 0, 1], [CROP, CROP, 1], [0, CROP, 1]],
                           np.float64)
        full = (tinv @ corners.T).T
        min_x, max_x = full[:, 0].min(), full[:, 0].max()
        min_y, max_y = full[:, 1].min(), full[:, 1].max()
        pad_x, pad_y = (max_x - min_x) * 0.5, (max_y - min_y) * 0.5
        rx0 = int(max(0, min_x - pad_x))
        ry0 = int(max(0, min_y - pad_y))
        rx1 = int(min(W, max_x + pad_x))
        ry1 = int(min(H, max_y + pad_y))
        rw, rh = rx1 - rx0, ry1 - ry0
        render = np.zeros((H, W, 3), np.uint8)
        mask = np.zeros((H, W), bool)
        depth = np.full((H, W), np.inf, np.float32)
        if rw <= 0 or rh <= 0:
            return render, mask, depth

        verts_cam = vertices + T_mesh[None]
        z = verts_cam[:, 2]
        u = f_x * verts_cam[:, 0] / np.where(z == 0, 1e-6, z) + (c_x - rx0)
        v = f_y * verts_cam[:, 1] / np.where(z == 0, 1e-6, z) + (c_y - ry0)
        screen = np.stack([u, v, z], axis=1).astype(np.float32)
        rgb_roi, depth_roi, fid = rasterize_mesh(
            screen, self.body.faces, np.asarray(vertex_colors, np.float32),
            rh, rw, z_near=0.05)
        m_roi = fid >= 0
        bgr = (np.clip(rgb_roi[:, :, ::-1], 0, 1) * 255).astype(np.uint8)
        render[ry0:ry1, rx0:rx1][m_roi] = bgr[m_roi]
        mask[ry0:ry1, rx0:rx1] = m_roi
        d = depth[ry0:ry1, rx0:rx1]
        d[m_roi] = depth_roi[m_roi]
        return render, mask, depth

    # -- coordinate conversions (reference :649-725) -------------------------

    def convert_crop_cam_to_world(self, cam_t, crop_info, cam_intrinsics, c2w):
        tform = np.asarray(crop_info["tform"])
        s = (np.linalg.norm(tform[0, :2]) + np.linalg.norm(tform[1, :2])) / 2.0
        K = np.asarray(cam_intrinsics)
        f_real = (K[0, 0] + K[1, 1]) / 2.0
        z_crop = cam_t[2]
        z_real = z_crop * (s * f_real / F_HMR)
        u_crop = F_HMR * cam_t[0] / z_crop + C_HMR
        v_crop = F_HMR * cam_t[1] / z_crop + C_HMR
        pt_img = invert_affine(tform) @ np.array([u_crop, v_crop, 1.0])
        x_real = (pt_img[0] - K[0, 2]) * z_real / f_real
        y_real = (pt_img[1] - K[1, 2]) * z_real / f_real
        pos_cam = np.array([x_real, y_real, z_real])
        return np.asarray(c2w)[:3, :3] @ pos_cam + np.asarray(c2w)[:3, 3]

    def convert_world_to_crop_cam(self, pos_world, crop_info, cam_intrinsics, c2w):
        c2w = np.asarray(c2w)
        pos_cam = c2w[:3, :3].T @ (np.asarray(pos_world) - c2w[:3, 3])
        x_real, y_real, z_real = pos_cam
        z_real = max(z_real, 0.1)
        K = np.asarray(cam_intrinsics)
        f_real = (K[0, 0] + K[1, 1]) / 2.0
        u_img = f_real * x_real / z_real + K[0, 2]
        v_img = f_real * y_real / z_real + K[1, 2]
        tform = np.asarray(crop_info["tform"])
        u_crop, v_crop = tform @ np.array([u_img, v_img, 1.0])
        s = (np.linalg.norm(tform[0, :2]) + np.linalg.norm(tform[1, :2])) / 2.0
        z_crop = z_real * (F_HMR / (s * f_real))
        x_crop = (u_crop - C_HMR) * z_crop / F_HMR
        y_crop = (v_crop - C_HMR) * z_crop / F_HMR
        return np.array([x_crop, y_crop, z_crop])

    def is_mesh_valid(self, smpl_out: Dict) -> bool:
        """Reject implausible fits whose crop-space extent exceeds 300 px
        (reference :727-748)."""
        v_cam = smpl_out["vertices"][0] + smpl_out["cam_t"][0]
        z = v_cam[:, 2]
        u = F_HMR * v_cam[:, 0] / z + C_HMR
        v = F_HMR * v_cam[:, 1] / z + C_HMR
        return (u.max() - u.min()) <= 300 and (v.max() - v.min()) <= 300


def make_synthetic_processor() -> PedestrianProcessor:
    body = SyntheticBody()
    return PedestrianProcessor(segmenter=SyntheticSegmenter(),
                               fitter=SyntheticSmplFitter(body), body=body)
