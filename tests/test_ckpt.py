"""Checkpoint tests: torch<->flax conversion round-trip + orbax save/load/resume."""
import numpy as np
import os
import pytest

import jax
import jax.numpy as jnp

from magicdrive_v2_tpu.utils.ckpt import (
    convert_torch_state_dict, export_torch_state_dict, find_latest,
    flax_path_to_torch_key, load_checkpoint, save_checkpoint)


@pytest.fixture(scope="module")
def tiny_model_params():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _fast_init, _flagship_config
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import MagicDriveSTDiT3
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch

    cfg = _flagship_config(tiny=True, dtype=jnp.float32)
    model = MagicDriveSTDiT3(cfg)
    batch = synthetic_batch(cfg, num_frames=9, height=32, width=32, l_txt=8, b=1,
                            map_size=(8, 64, 64))
    params = _fast_init(model, batch)
    return cfg, params


def test_flax_path_to_torch_key_rules():
    k, scan = flax_path_to_torch_key(("params", "t_block_1", "kernel"))
    assert k == "t_block.1.weight" and scan is None
    k, _ = flax_path_to_torch_key(("params", "t_embedder", "mlp_0", "bias"))
    assert k == "t_embedder.mlp.0.bias"
    k, scan = flax_path_to_torch_key(
        ("params", "ctrl_layers", "base_s", "attn", "qkv", "kernel"))
    assert k == "base_blocks_s.{i}.attn.qkv.weight" and scan[1] == 0
    k, scan = flax_path_to_torch_key(
        ("params", "plain_layers", "base_t", "mlp", "fc1", "kernel"), control_depth=13)
    assert k == "base_blocks_t.{i}.mlp.fc1.weight" and scan[1] == 13
    # temporal mini-transformer flattening
    k, _ = flax_path_to_torch_key(
        ("params", "bbox_embedder", "temp", "attn", "qkv", "bias"))
    assert k == "bbox_embedder.attn.qkv.bias"
    # shared-qkv attention (cross-view)
    k, _ = flax_path_to_torch_key(
        ("params", "ctrl_layers", "base_s", "cross_view_attn", "qkv_kernel"))
    assert k == "base_blocks_s.{i}.cross_view_attn.qkv.weight"
    k, _ = flax_path_to_torch_key(("params", "bbox_embedder", "class_tokens"))
    assert k == "bbox_embedder._class_tokens"
    k, _ = flax_path_to_torch_key(
        ("params", "bbox_embedder", "second_linear_0", "kernel"))
    assert k == "bbox_embedder.second_linear.0.weight"
    k, _ = flax_path_to_torch_key(
        ("params", "controlnet_cond_embedder", "blocks_3", "kernel"))
    assert k == "controlnet_cond_embedder.blocks.3.weight"
    k, _ = flax_path_to_torch_key(
        ("params", "controlnet_cond_embedder_temp", "conv_blocks_0", "conv", "kernel"))
    assert k == "controlnet_cond_embedder_temp.conv_blocks.0.conv.weight"


def test_torch_roundtrip_full_model(tiny_model_params):
    cfg, params = tiny_model_params
    torch_sd = export_torch_state_dict(params, control_depth=cfg.control_depth)
    # sanity: exported names look like the reference module tree
    assert "x_embedder.proj.weight" in torch_sd
    assert "base_blocks_s.0.attn.qkv.weight" in torch_sd
    assert f"base_blocks_s.{cfg.depth - 1}.mlp.fc2.weight" in torch_sd
    assert "control_blocks_s.0.after_proj.weight" in torch_sd
    assert "final_layer.scale_shift_table" in torch_sd
    assert "y_embedder.y_proj.fc1.weight" in torch_sd
    assert "camera_embedder.uncond_cam" in torch_sd
    # Conv3d layout: (O, I, kt, kh, kw)
    w = torch_sd["x_embedder.proj.weight"]
    pt, ph, pw = cfg.patch_size
    assert w.shape == (cfg.hidden_size, cfg.in_channels, pt, ph, pw)

    restored = convert_torch_state_dict(torch_sd, params,
                                        control_depth=cfg.control_depth, strict=True)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(restored)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        assert np.allclose(np.asarray(a), np.asarray(b)), pa


def test_convert_reports_missing(tiny_model_params):
    cfg, params = tiny_model_params
    torch_sd = export_torch_state_dict(params, control_depth=cfg.control_depth)
    torch_sd.pop("before_proj.weight")
    with pytest.raises(KeyError):
        convert_torch_state_dict(torch_sd, params, control_depth=cfg.control_depth,
                                 strict=True)


def test_y_embedding_resize(tiny_model_params):
    cfg, params = tiny_model_params
    torch_sd = export_torch_state_dict(params, control_depth=cfg.control_depth)
    y = torch_sd["y_embedder.y_embedding"]
    torch_sd["y_embedder.y_embedding"] = np.concatenate([y, y], axis=0)[: y.shape[0] // 2]
    restored = convert_torch_state_dict(torch_sd, params,
                                        control_depth=cfg.control_depth)
    got = restored["params"]["y_embedder"]["y_embedding"]
    assert got.shape == y.shape
    assert np.allclose(got[: y.shape[0] // 2], y[: y.shape[0] // 2])
    assert np.all(got[y.shape[0] // 2:] == 0)


def test_save_load_checkpoint_roundtrip(tmp_path):
    params = {"params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                         "b": jnp.ones((3,), jnp.float32)}}
    opt_state = {"mu": jnp.zeros((2, 3)), "nu": jnp.full((3,), 2.0)}
    p1 = save_checkpoint(str(tmp_path), 10, params=params, opt_state=opt_state,
                         ema_params=params,
                         running_states={"epoch": 1},
                         sampler_state={"last_micro_batch_access_index": 20})
    save_checkpoint(str(tmp_path), 5, params=params)
    assert find_latest(str(tmp_path)) == p1

    out = load_checkpoint(p1, load_ema=True)
    assert np.allclose(out["params"]["params"]["w"], np.arange(6).reshape(2, 3))
    assert out["running_states"]["step"] == 10
    assert out["running_states"]["epoch"] == 1
    assert out["running_states"]["sampler"]["last_micro_batch_access_index"] == 20
    assert np.allclose(out["ema"]["params"]["b"], 1.0)


def test_rng_state_roundtrip(tmp_path):
    import random as pyrandom
    from magicdrive_v2_tpu.utils.ckpt import load_rng_state, save_rng_state
    pyrandom.seed(42)
    np.random.seed(42)
    save_rng_state(str(tmp_path / "rng.pkl"))
    expected_py = pyrandom.random()
    expected_np = np.random.rand()
    pyrandom.seed(7)
    np.random.seed(7)
    load_rng_state(str(tmp_path / "rng.pkl"))
    assert pyrandom.random() == expected_py
    assert np.random.rand() == expected_np


def test_load_checkpoint_relative_path(tmp_path, monkeypatch):
    """find_latest returns exp-dir-relative paths when configs use relative
    `outputs`; orbax needs absolute (regression: resume failed on relative)."""
    params = {"params": {"w": jnp.ones((2, 2))}}
    monkeypatch.chdir(tmp_path)
    save_checkpoint("ckpts", 3, params=params)
    latest = find_latest("ckpts")
    assert not os.path.isabs(latest)
    out = load_checkpoint(latest)
    assert np.allclose(out["params"]["params"]["w"], 1.0)
