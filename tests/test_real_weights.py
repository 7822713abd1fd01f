"""Asset-gated REAL-weights tests (VERDICT r3 item 4/5; docs/REAL_WEIGHTS.md).

These run only when real pretrained snapshots are mounted locally (this build
has zero egress). Point MDV2_CKPT_ROOT at a directory holding any of:

  <root>/CogVideoX-2b/vae/          diffusers VAE snapshot (config.json + weights)
  <root>/t5-v1_1-xxl/               HF T5 snapshot
  <root>/MagicDriveDiT*/ema.pt      reference DiT release weights (.pt/.safetensors)

(default root: /data/ckpts). Each test skips cleanly when its asset is absent,
so the suite stays green on asset-less CI; with assets present they prove the
real release weights flow through the converters into working JAX modules —
the reference counterpart is scripts/inference_magicdrive.py:274-297 loading
ema.pt + CogVideoX VAE + T5 for the released demos.

A digest of each converted state dict is pinned in tests/golden/
real_weights_digest.json on the first asset-ful run and asserted on every
later run — conversion regressions (dropped keys, transposes) change it.
"""
import glob
import json
import os

import numpy as np
import pytest

CKPT_ROOT = os.environ.get("MDV2_CKPT_ROOT", "/data/ckpts")
GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "real_weights_digest.json")


def _find_vae_dir():
    for pat in ("CogVideoX*", "cogvideox*"):
        for d in sorted(glob.glob(os.path.join(CKPT_ROOT, pat))):
            if os.path.isfile(os.path.join(d, "vae", "config.json")):
                return d
    return None


def _find_dit_ckpt():
    for pat in ("MagicDrive*/ema.pt", "MagicDrive*/ema.safetensors",
                "MagicDrive*/model/*.safetensors", "ema.pt"):
        hits = sorted(glob.glob(os.path.join(CKPT_ROOT, pat)))
        if hits:
            return hits[0]
    return None


def _find_t5_dir():
    for pat in ("t5-v1_1-xxl", "t5*"):
        for d in sorted(glob.glob(os.path.join(CKPT_ROOT, pat))):
            if os.path.isfile(os.path.join(d, "config.json")):
                return d
    return None


def _digest(tree) -> dict:
    """Order-independent structural+numeric digest of a param tree: per-leaf
    shape and float64 mean/absmean folded into one stable checksum."""
    import jax
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    acc = {}
    for path, leaf in leaves:
        a = np.asarray(leaf, np.float64)
        acc[jax.tree_util.keystr(path)] = [list(np.shape(a)),
                                           float(a.mean()),
                                           float(np.abs(a).mean())]
    blob = json.dumps(acc, sort_keys=True)
    import hashlib
    return {"n_leaves": len(acc),
            "sha256": hashlib.sha256(blob.encode()).hexdigest()}


def _check_golden(name: str, digest: dict):
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    pinned = {}
    if os.path.isfile(GOLDEN):
        pinned = json.load(open(GOLDEN))
    if name in pinned:
        assert pinned[name] == digest, (
            f"converted {name} state-dict digest changed: conversion "
            f"regression?\npinned: {pinned[name]}\nnow:    {digest}")
    else:
        pinned[name] = digest
        json.dump(pinned, open(GOLDEN, "w"), indent=1, sort_keys=True)


@pytest.mark.skipif(_find_vae_dir() is None,
                    reason=f"no CogVideoX VAE snapshot under {CKPT_ROOT}")
def test_real_vae_loads_and_reconstructs():
    """Real CogVideoX-VAE snapshot -> load_pretrained -> a smooth clip must
    reconstruct with high correlation (random init, by construction, cannot)."""
    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.models.vae.cogvideox import (
        CogVAEConfig, VideoAutoencoderKLCogVideoX)

    vae = VideoAutoencoderKLCogVideoX(
        CogVAEConfig(), from_pretrained=_find_vae_dir(), subfolder="vae",
        micro_frame_size=None)
    vae.load_pretrained()
    _check_golden("cogvideox_vae", _digest(vae.params))

    t = np.linspace(0, 1, 64, dtype=np.float32)
    img = (np.sin(8 * t)[None, :] * np.cos(5 * t)[:, None]).astype(np.float32)
    x = jnp.asarray(np.broadcast_to(img, (1, 3, 9, 64, 64)) * 0.5)
    z = vae.encode(x, sample=False)
    assert z.shape[1] == vae.out_channels
    dec = np.asarray(vae.decode(z).astype(jnp.float32))
    corr = np.corrcoef(dec.reshape(-1), np.asarray(x).reshape(-1))[0, 1]
    assert corr > 0.9, f"real-weights VAE roundtrip corr={corr}"


@pytest.mark.skipif(_find_dit_ckpt() is None,
                    reason=f"no MagicDriveDiT ema checkpoint under {CKPT_ROOT}")
@pytest.mark.slow
def test_real_dit_converts_and_runs():
    """Real ema.pt -> convert_torch_state_dict into the flagship XL/2 layout
    (scan-group stacking, y_embedding resize) with ZERO missing model params,
    then one bf16 forward at 224x400/T=9 produces finite velocities."""
    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import (MagicDriveSTDiT3,
                                                            build_model_config)
    from magicdrive_v2_tpu.config.presets import MV_ORDER_MAP, xl2_model
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch
    from magicdrive_v2_tpu.utils.ckpt import (convert_torch_state_dict,
                                              load_torch_file)

    mcfg = build_model_config(xl2_model(bbox_mode="all-xyz",
                                        control_skip_temporal=False),
                              vae_out_channels=16, mv_order_map=MV_ORDER_MAP,
                              dtype=jnp.bfloat16)
    model = MagicDriveSTDiT3(mcfg)
    batch = synthetic_batch(mcfg, num_frames=9, height=224, width=400,
                            l_txt=300, seed=0)
    abstract = jax.eval_shape(
        lambda k: model.init(k, **batch), jax.random.PRNGKey(0))
    sd = load_torch_file(_find_dit_ckpt())
    import logging
    records = []
    handler = logging.Handler()
    handler.emit = lambda r: records.append(r.getMessage())
    logging.getLogger("magicdrive_v2_tpu.utils.ckpt").addHandler(handler)
    params = convert_torch_state_dict(sd, abstract,
                                      control_depth=mcfg.control_depth,
                                      strict=False)
    missing = [m for m in records if "missing" in m.lower()]
    assert not missing, f"real ema.pt left params unconverted: {missing[:5]}"
    params = jax.tree_util.tree_map(jnp.asarray, params)
    _check_golden("magicdrive_dit_ema", _digest(params))

    out = model.apply(params, **batch)
    assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.skipif(_find_t5_dir() is None,
                    reason=f"no T5 snapshot under {CKPT_ROOT}")
@pytest.mark.slow
def test_real_t5_encodes():
    from magicdrive_v2_tpu.registry import MODELS

    te = MODELS.get("t5")(from_pretrained=_find_t5_dir(), model_max_length=300)
    out = te.encode(["A driving scene at boston-seaport. Daytime."])
    y = np.asarray(out["y"], np.float32)
    assert y.shape[-1] == 4096 and np.isfinite(y).all()
    # identical text -> identical embedding; different text -> different
    out2 = te.encode(["Rainy night. A driving scene at singapore."])
    assert not np.allclose(y, np.asarray(out2["y"], np.float32))
