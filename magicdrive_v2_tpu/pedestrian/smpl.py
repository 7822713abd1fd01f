"""Real SMPL body model + HMR2 fitter backends for the pedestrian pipeline.

The reference drives its texture-harvest/re-render passes with
`hmr2_model.smpl` (a SMPL body layer) and the HMR2 regressor (reference
pedestrian_processor.py:49-66, 135-201). Here:

- `SmplBody` loads the licensed SMPL pickle
  (`basicModel_neutral_lbs_10_207_0_v1.0.0.pkl`, pointed to by
  scripts/prepare_checkpoints.py) and implements the full SMPL forward —
  shape blendshapes, pose blendshapes, kinematic chain, linear blend
  skinning — in numpy (host-side; the pedestrian pipeline is CPU work, out
  of the TPU hot path). Semantics match the standard SMPL layer with
  `pose2rot=False` (rotation-matrix input, the HMR2 convention) and also
  accept axis-angle input.
- `Hmr2SmplFitter` adapts a HMR2 regressor to the pipeline's `fit(crop,
  bbox_px_height)` interface (reference estimate_smpl:135-182 preprocessing:
  256x256 crop, ImageNet normalization). The torch module is injected (or
  loaded via the `hmr2` package when installed); everything around it is
  package-free.

SMPL model pickles store chumpy arrays; `load_smpl_pickle` unpickles them
without chumpy installed via a minimal shim and converts scipy-sparse
regressors to dense.
"""
from __future__ import annotations

import pickle
import sys
import types
from typing import Dict, Optional

import numpy as np

from .processor import CROP, BodyModel

# standard SMPL kinematic tree (24 joints); used to validate loaded models and
# by tests to synthesize pickles in the same format
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
     19, 20, 21], np.int32)
NUM_JOINTS = 24
NUM_BETAS = 10
NUM_POSE_BASIS = 207  # 23 joints x 9 rotation residuals


class _ChumpyStub:
    """Minimal stand-in for chumpy.Ch so SMPL pickles unpickle without the
    chumpy package. Chumpy arrays pickle their dense data under ``x``."""

    def __setstate__(self, state):
        self.__dict__.update(state)

    def __array__(self, dtype=None):
        x = np.asarray(self.__dict__.get("x"))
        return x.astype(dtype) if dtype is not None else x


def _install_chumpy_stub():
    if "chumpy" in sys.modules:
        return
    mod = types.ModuleType("chumpy")
    mod.Ch = _ChumpyStub
    ch_mod = types.ModuleType("chumpy.ch")
    ch_mod.Ch = _ChumpyStub
    reord = types.ModuleType("chumpy.reordering")
    for name in ("transpose", "Transpose", "Select"):
        setattr(reord, name, _ChumpyStub)
    mod.ch = ch_mod
    sys.modules["chumpy"] = mod
    sys.modules["chumpy.ch"] = ch_mod
    sys.modules["chumpy.reordering"] = reord


def _to_np(a) -> np.ndarray:
    if hasattr(a, "toarray"):  # scipy sparse (J_regressor)
        return np.asarray(a.toarray(), np.float64)
    return np.asarray(a, np.float64)


def load_smpl_pickle(path: str) -> Dict[str, np.ndarray]:
    """Load a SMPL model pickle (v1.0 layout: v_template, f, shapedirs,
    posedirs, J_regressor, weights, kintree_table)."""
    try:
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
    except ModuleNotFoundError:
        _install_chumpy_stub()
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
    return _normalize_model(data)


def _normalize_model(data: Dict) -> Dict[str, np.ndarray]:
    """Raw pickle-layout dict (f/kintree_table keys) -> loader layout."""
    if "faces" in data and "parents" in data:
        return data
    out = {}
    for key in ("v_template", "shapedirs", "posedirs", "weights"):
        out[key] = _to_np(data[key])
    out["J_regressor"] = _to_np(data["J_regressor"])
    out["faces"] = np.asarray(data["f"], np.int64)
    out["parents"] = np.asarray(data["kintree_table"], np.int64)[0]
    out["parents"][0] = -1  # stored as 2**32-1 in the pickle
    return out


def rodrigues(aa: np.ndarray) -> np.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3)."""
    aa = np.asarray(aa, np.float64)
    theta = np.linalg.norm(aa, axis=-1, keepdims=True)
    axis = aa / np.maximum(theta, 1e-12)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = np.zeros_like(x)
    K = np.stack([zero, -z, y, z, zero, -x, -y, x, zero],
                 axis=-1).reshape(aa.shape[:-1] + (3, 3))
    t = theta[..., None]
    eye = np.broadcast_to(np.eye(3), K.shape)
    return eye + np.sin(t) * K + (1 - np.cos(t)) * (K @ K)


class SmplBody(BodyModel):
    """SMPL forward in numpy with the pipeline's BodyModel interface.

    vertices(global_orient, body_pose, betas):
      global_orient: (1, 3, 3) / (3, 3) rotation, or (3,) axis-angle, or None
      body_pose:     (23, 3, 3) rotations, or (69,)/(23, 3) axis-angle, or None
      betas:         (<=n_betas,) shape coefficients or None
    Returns (V, 3) posed vertices (no global translation, like the standard
    SMPL layer / HMR2's pred_vertices before cam_t).
    """

    def __init__(self, model_or_path):
        m = (load_smpl_pickle(model_or_path) if isinstance(model_or_path, str)
             else _normalize_model(model_or_path))
        self.v_template = np.asarray(m["v_template"], np.float64)  # (V, 3)
        self.faces = np.asarray(m["faces"], np.int64)
        self.shapedirs = np.asarray(m["shapedirs"], np.float64)    # (V, 3, nb)
        posedirs = np.asarray(m["posedirs"], np.float64)
        if posedirs.ndim == 2:  # (nb, V*3) smplx layout
            posedirs = posedirs.T.reshape(self.v_template.shape[0], 3, -1)
        self.posedirs = posedirs                                   # (V, 3, 207)
        self.J_regressor = np.asarray(m["J_regressor"], np.float64)  # (J, V)
        self.weights = np.asarray(m["weights"], np.float64)        # (V, J)
        self.parents = np.asarray(m.get("parents", SMPL_PARENTS), np.int64)
        J = self.J_regressor.shape[0]
        assert self.weights.shape[1] == J and len(self.parents) == J

    @staticmethod
    def _as_rotmats(pose, n_joints: int) -> np.ndarray:
        if pose is None:
            return np.broadcast_to(np.eye(3), (n_joints, 3, 3)).copy()
        pose = np.asarray(pose, np.float64)
        if pose.shape[-2:] == (3, 3):
            return pose.reshape(-1, 3, 3)[:n_joints]
        return rodrigues(pose.reshape(n_joints, 3))

    def vertices(self, global_orient, body_pose, betas) -> np.ndarray:
        nb = self.shapedirs.shape[-1]
        J = self.J_regressor.shape[0]
        b = np.zeros(nb)
        if betas is not None:
            bet = np.ravel(np.asarray(betas, np.float64))[:nb]
            b[:len(bet)] = bet
        v_shaped = self.v_template + self.shapedirs @ b
        joints = self.J_regressor @ v_shaped  # (J, 3)

        rots = np.concatenate([self._as_rotmats(global_orient, 1),
                               self._as_rotmats(body_pose, J - 1)], axis=0)
        pose_feature = (rots[1:] - np.eye(3)).ravel()
        v_posed = v_shaped + self.posedirs @ pose_feature

        # forward kinematics: world transform per joint
        G = np.zeros((J, 4, 4))
        G[0] = np.eye(4)
        G[0, :3, :3] = rots[0]
        G[0, :3, 3] = joints[0]
        for i in range(1, J):
            local = np.eye(4)
            local[:3, :3] = rots[i]
            local[:3, 3] = joints[i] - joints[self.parents[i]]
            G[i] = G[self.parents[i]] @ local
        # remove rest-pose joint locations
        A = G.copy()
        A[:, :3, 3] -= np.einsum("jab,jb->ja", G[:, :3, :3], joints)
        T = np.einsum("vj,jab->vab", self.weights, A)  # (V, 4, 4)
        out = np.einsum("vab,vb->va", T[:, :3, :3], v_posed) + T[:, :3, 3]
        return out.astype(np.float32)


class Hmr2SmplFitter:
    """HMR2 regressor behind the pipeline's SmplFitter interface (reference
    estimate_smpl, pedestrian_processor.py:135-182: 256x256 affine crop,
    ImageNet normalization, forward, pick pred_* outputs)."""

    IMAGENET_MEAN = np.array([0.485, 0.456, 0.406])
    IMAGENET_STD = np.array([0.229, 0.224, 0.225])

    def __init__(self, model, device: str = "cpu"):
        import torch
        self.torch = torch
        self.model = model.to(device).eval()
        self.device = device

    @classmethod
    def from_checkpoint(cls, checkpoint_path: str, device: str = "cpu"):
        """Load via the `hmr2` package (4D-Humans); gated import — the package
        is not bundled in this environment."""
        try:
            from hmr2.models import load_hmr2
        except ImportError as e:
            raise ImportError(
                "HMR2 checkpoint loading needs the `hmr2` (4D-Humans) package; "
                "pass a loaded torch module to Hmr2SmplFitter(...) instead"
            ) from e
        model, _ = load_hmr2(checkpoint_path)
        return cls(model, device=device)

    def fit(self, crop_bgr: np.ndarray, bbox_px_height: float) -> Dict:
        del bbox_px_height  # HMR2 regresses cam_t itself
        torch = self.torch
        assert crop_bgr.shape[:2] == (CROP, CROP), crop_bgr.shape
        rgb = crop_bgr[:, :, ::-1].astype(np.float32) / 255.0
        rgb = (rgb - self.IMAGENET_MEAN) / self.IMAGENET_STD
        img = torch.from_numpy(rgb.transpose(2, 0, 1)[None].astype(np.float32))
        with torch.no_grad():
            out = self.model({"img": img.to(self.device)})
        smpl = out["pred_smpl_params"]
        return dict(
            vertices=out["pred_vertices"].cpu().numpy(),
            cam_t=out["pred_cam_t"].cpu().numpy(),
            smpl_pose=smpl["body_pose"].cpu().numpy().reshape(1, -1, 3, 3),
            global_orient=smpl["global_orient"].cpu().numpy().reshape(1, 1, 3, 3),
            betas=smpl["betas"].cpu().numpy().reshape(1, -1),
        )


def make_real_processor(smpl_path: str, segformer_path: Optional[str] = None,
                        hmr2_checkpoint: Optional[str] = None,
                        hmr2_model=None, device: str = "cpu"):
    """Assemble a PedestrianProcessor with real backends where assets exist
    (reference PedestrianProcessor.__init__, pedestrian_processor.py:49-105):
    SMPL body from the licensed pickle, SegFormer segmenter when a local
    snapshot is given, HMR2 fitter when a model/checkpoint is given; synthetic
    fitter otherwise (deterministic placement, real mesh)."""
    from .processor import (PedestrianProcessor, SegformerSegmenter,
                            SyntheticSegmenter, SyntheticSmplFitter)
    body = SmplBody(smpl_path)
    if hmr2_model is not None:
        fitter = Hmr2SmplFitter(hmr2_model, device=device)
    elif hmr2_checkpoint:
        fitter = Hmr2SmplFitter.from_checkpoint(hmr2_checkpoint, device=device)
    else:
        fitter = SyntheticSmplFitter(body)
    segmenter = (SegformerSegmenter(segformer_path, device=device)
                 if segformer_path else SyntheticSegmenter())
    return PedestrianProcessor(segmenter=segmenter, fitter=fitter, body=body)
