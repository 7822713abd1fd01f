"""SMPL body model: pickle loading (chumpy/scipy layouts) + LBS correctness.

The licensed basicModel pickle can't ship, so tests synthesize a small model in
the exact v1.0 pickle layout (v_template/f/shapedirs/posedirs/J_regressor/
weights/kintree_table) and verify the forward against hand-computed results.
"""
import pickle

import numpy as np
import pytest

from magicdrive_v2_tpu.pedestrian.smpl import (NUM_POSE_BASIS, SMPL_PARENTS,
                                               Hmr2SmplFitter, SmplBody,
                                               load_smpl_pickle, rodrigues)


def _tiny_model(V=30, rng=None):
    """Synthetic SMPL-format model dict: 24 joints, V verts along a line."""
    rng = rng or np.random.default_rng(0)
    J = 24
    v_template = np.stack([np.zeros(V), np.zeros(V),
                           np.linspace(-0.8, 0.8, V)], axis=1)
    shapedirs = rng.standard_normal((V, 3, 10)) * 0.01
    posedirs = rng.standard_normal((V, 3, NUM_POSE_BASIS)) * 0.001
    # joint j regressed from vertex j (first 24 verts are "joints")
    J_regressor = np.zeros((J, V))
    J_regressor[np.arange(J), np.arange(J)] = 1.0
    weights = np.zeros((V, J))
    weights[np.arange(V), np.minimum(np.arange(V), J - 1) % J] = 1.0
    kintree = np.stack([SMPL_PARENTS.astype(np.int64),
                        np.arange(J, dtype=np.int64)])
    kintree[0, 0] = 2 ** 32 - 1  # as stored in the real pickle
    return dict(v_template=v_template, f=np.zeros((1, 3), np.int64),
                shapedirs=shapedirs, posedirs=posedirs,
                J_regressor=J_regressor, weights=weights,
                kintree_table=kintree)


def _root_only_model(V=30):
    """All skinning weight on the root joint -> closed-form expectations."""
    m = _tiny_model(V)
    m["weights"] = np.zeros((V, 24))
    m["weights"][:, 0] = 1.0
    m["shapedirs"] *= 0
    m["posedirs"] *= 0
    return m


def test_pickle_roundtrip(tmp_path):
    m = _tiny_model()
    p = tmp_path / "smpl.pkl"
    with open(p, "wb") as f:
        pickle.dump(m, f)
    loaded = load_smpl_pickle(str(p))
    assert loaded["parents"][0] == -1
    assert np.array_equal(loaded["parents"][1:], SMPL_PARENTS[1:])
    body = SmplBody(str(p))
    assert body.v_template.shape == (30, 3)


def test_pickle_scipy_sparse(tmp_path):
    scipy_sparse = pytest.importorskip("scipy.sparse")
    m = _tiny_model()
    m["J_regressor"] = scipy_sparse.csc_matrix(m["J_regressor"])
    p = tmp_path / "smpl_sparse.pkl"
    with open(p, "wb") as f:
        pickle.dump(m, f)
    body = SmplBody(str(p))
    assert body.J_regressor.shape == (24, 30)
    assert body.J_regressor[3, 3] == 1.0


def test_neutral_pose_is_template():
    body = SmplBody(_root_only_model())
    v = body.vertices(None, None, None)
    assert np.allclose(v, body.v_template, atol=1e-6)


def test_betas_blendshapes():
    m = _tiny_model()
    m["posedirs"] *= 0
    m["weights"] = np.zeros_like(m["weights"])
    m["weights"][:, 0] = 1.0
    body = SmplBody(m)
    betas = np.arange(10) * 0.1
    v = body.vertices(None, None, betas)
    want = m["v_template"] + m["shapedirs"] @ betas
    # identity pose: shaped template passes through unchanged
    assert np.allclose(v, want, atol=1e-5)


def test_global_orient_rotates_about_root():
    m = _root_only_model()
    body = SmplBody(m)
    R = rodrigues(np.array([0.0, 0.0, np.pi / 2]))
    v = body.vertices(R, None, None)
    j0 = m["v_template"][0]  # root joint == vertex 0 by construction
    want = (m["v_template"] - j0) @ np.asarray(R).T + j0
    assert np.allclose(v, want, atol=1e-5)


def test_child_joint_moves_only_its_vertices():
    m = _tiny_model()
    m["shapedirs"] *= 0
    m["posedirs"] *= 0
    body = SmplBody(m)
    # rotate joint 4 (parent chain 0->1->4); pose2rot=False rotmat input
    pose = np.broadcast_to(np.eye(3), (23, 3, 3)).copy()
    pose[3] = rodrigues(np.array([np.pi / 4, 0, 0]))  # body_pose[3] = joint 4
    v0 = body.vertices(None, None, None)
    v1 = body.vertices(None, pose, None)
    moved = np.linalg.norm(v1 - v0, axis=1) > 1e-8
    # vertices on joint 4's DESCENDANTS (7, 10 — chain 0-1-4-7-10) move (the
    # joint-4 vertex itself sits at the pivot); root-bound vertices do not
    w = body.weights
    assert moved[w[:, 7] > 0].all()
    assert moved[w[:, 10] > 0].all()
    assert not moved[w[:, 0] > 0].any()
    assert not moved[w[:, 2] > 0].any()  # sibling chain unaffected


def test_axis_angle_and_rotmat_agree():
    body = SmplBody(_tiny_model())
    aa = np.zeros((23, 3))
    aa[5] = [0.3, -0.2, 0.1]
    v_aa = body.vertices(np.array([0.1, 0.2, 0.3]), aa, np.zeros(10))
    v_rm = body.vertices(rodrigues(np.array([0.1, 0.2, 0.3])),
                         rodrigues(aa), np.zeros(10))
    assert np.allclose(v_aa, v_rm, atol=1e-6)


def test_rodrigues_matches_scipy():
    R = pytest.importorskip("scipy.spatial.transform").Rotation
    aa = np.array([[0.0, 0.0, 0.0], [0.5, -0.3, 1.2], [np.pi, 0, 0]])
    want = R.from_rotvec(aa).as_matrix()
    got = rodrigues(aa)
    assert np.allclose(got, want, atol=1e-8)


def test_hmr2_fitter_adapter():
    """Adapter contract with a fake torch HMR2 module."""
    torch = pytest.importorskip("torch")

    class FakeHmr2(torch.nn.Module):
        def forward(self, batch):
            b = batch["img"].shape[0]
            assert batch["img"].shape == (b, 3, 256, 256)
            return {
                "pred_vertices": torch.zeros(b, 30, 3),
                "pred_cam_t": torch.tensor([[0.0, 0.0, 5.0]]),
                "pred_smpl_params": {
                    "body_pose": torch.eye(3).repeat(b, 23, 1, 1),
                    "global_orient": torch.eye(3).repeat(b, 1, 1, 1),
                    "betas": torch.zeros(b, 10),
                },
            }

        def __call__(self, batch):  # bypass nn.Module __call__ hooks cleanly
            return self.forward(batch)

    fitter = Hmr2SmplFitter(FakeHmr2())
    crop = np.zeros((256, 256, 3), np.uint8)
    out = fitter.fit(crop, 120.0)
    assert out["vertices"].shape == (1, 30, 3)
    assert out["cam_t"].shape == (1, 3)
    assert out["smpl_pose"].shape == (1, 23, 3, 3)
    assert out["global_orient"].shape == (1, 1, 3, 3)
    assert out["betas"].shape == (1, 10)


def test_real_processor_factory(tmp_path):
    """make_real_processor builds a working processor from a SMPL pickle with
    synthetic fitter/segmenter fallbacks."""
    from magicdrive_v2_tpu.pedestrian.smpl import make_real_processor
    p = tmp_path / "smpl.pkl"
    with open(p, "wb") as f:
        pickle.dump(_tiny_model(), f)
    proc = make_real_processor(str(p))
    assert proc.body.v_template.shape == (30, 3)
    assert proc.symmetry_idx.shape == (30,)
