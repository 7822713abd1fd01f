"""CogVideoX-VAE weight-conversion parity vs the reference torch module.

Runs the reference's vendored AutoencoderKLCogVideoX (vae_cogvideox.py:925-1310)
with functional diffusers stubs (see test_reference_parity._install_stubs), loads
the SAME weights into our flax VAE through utils/ckpt.convert_torch_state_dict,
and compares encoder moments / decoder frames. This is the proof that a real
pretrained CogVideoX-VAE checkpoint (diffusers snapshot dir) produces real
pixels through our decode path.

Marked heavy-ish but kept tiny (4-channel latent, 32x32, 9 frames) so it runs in
seconds on CPU.
"""
import json
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference mount")

sys.path.insert(0, os.path.dirname(__file__))

TINY = dict(in_channels=3, out_channels=3, block_out_channels=(8, 16, 16, 32),
            latent_channels=4, layers_per_block=1, norm_num_groups=4,
            temporal_compression_ratio=4)


@pytest.fixture(scope="module")
def ref_vae():
    from test_reference_parity import _install_stubs
    _install_stubs()
    import importlib
    return importlib.import_module("magicdrivedit.models.vae.vae_cogvideox")


@pytest.fixture(scope="module")
def pair(ref_vae):
    """(torch tiny VAE, flax module, converted flax params)"""
    import torch

    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.models.vae.cogvideox import (AutoencoderKLCogVideoX,
                                                        CogVAEConfig)
    from magicdrive_v2_tpu.utils.ckpt import convert_torch_state_dict

    torch.manual_seed(0)
    tmod = ref_vae.AutoencoderKLCogVideoX(**TINY).eval()
    cfg = CogVAEConfig(block_out_channels=TINY["block_out_channels"],
                       latent_channels=TINY["latent_channels"],
                       layers_per_block=TINY["layers_per_block"],
                       norm_num_groups=TINY["norm_num_groups"])
    fmod = AutoencoderKLCogVideoX(cfg)
    abstract = jax.eval_shape(
        lambda k: fmod.init(k, jnp.zeros((1, 3, 1, 16, 16))), jax.random.PRNGKey(0))
    sd = {k: v.detach().float().numpy() for k, v in tmod.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_torch_state_dict(sd, abstract))
    return tmod, fmod, params


def test_encoder_parity(pair):
    import torch

    import jax.numpy as jnp
    tmod, fmod, params = pair
    x = np.random.default_rng(0).standard_normal((1, 3, 9, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tmod.encoder(torch.tensor(x)).numpy()
    tmod._clear_fake_context_parallel_cache()
    got = np.asarray(fmod.apply(params, jnp.asarray(x),
                                method=fmod.encode_moments))
    assert got.shape == want.shape == (1, 8, 3, 4, 4)
    assert np.max(np.abs(got - want)) < 2e-4, np.max(np.abs(got - want))


def test_decoder_parity(pair):
    import torch

    import jax.numpy as jnp
    tmod, fmod, params = pair
    z = np.random.default_rng(1).standard_normal((1, 4, 3, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = tmod.decoder(torch.tensor(z)).numpy()
    tmod._clear_fake_context_parallel_cache()
    got = np.asarray(fmod.apply(params, jnp.asarray(z), method=fmod.decode))
    assert got.shape == want.shape == (1, 3, 9, 32, 32)
    assert np.max(np.abs(got - want)) < 2e-3, np.max(np.abs(got - want))


def test_streaming_encode_parity(pair):
    """Our micro_frame streaming encode (conv caches carried across chunks via
    the flax "cache" collection) == the reference wrapper's chunked _encode
    (vae_cogvideox.py:1347-1374), where torch CausalConv3d caches persist
    across the per-chunk encoder calls."""
    import torch

    import jax.numpy as jnp
    from magicdrive_v2_tpu.models.vae.cogvideox import VideoAutoencoderKLCogVideoX

    tmod, fmod, params = pair
    # 8n+1 with n=3: first chunk takes 9 frames, then TWO scan chunks of 8 —
    # exercises the multi-chunk time-concat order (chunk axis must merge as
    # the slow side), which T=17 (single scan chunk) cannot catch
    T = 25
    x = np.random.default_rng(3).standard_normal((1, 3, T, 16, 16)).astype(np.float32)

    # torch chunked-with-cache moments, mirroring wrapper._encode chunking
    with torch.no_grad():
        xt = torch.tensor(x)
        chunks = [xt[:, :, :9], xt[:, :, 9:17], xt[:, :, 17:]]
        want = torch.cat([tmod.encoder(c) for c in chunks], dim=2).numpy()
    tmod._clear_fake_context_parallel_cache()

    from magicdrive_v2_tpu.models.vae.cogvideox import CogVAEConfig
    cfg = CogVAEConfig(block_out_channels=TINY["block_out_channels"],
                       latent_channels=TINY["latent_channels"],
                       layers_per_block=TINY["layers_per_block"],
                       norm_num_groups=TINY["norm_num_groups"])
    vae = VideoAutoencoderKLCogVideoX(cfg, micro_frame_size=8)
    vae.params = params

    got = np.asarray(vae.encode(jnp.asarray(x), sample=False))
    want_mode = want[:, :TINY["latent_channels"]] * vae.scaling_factor
    assert got.shape == want_mode.shape == (1, 4, 7, 2, 2)
    assert np.max(np.abs(got - want_mode)) < 3e-4, np.max(np.abs(got - want_mode))

    # latent count agrees with get_latent_size under micro_frame chunking
    assert vae.get_latent_size([T, 16, 16]) == [7, 2, 2]


def test_streaming_decode_parity(pair):
    """Our frame-batched streaming decode == the reference module's _decode
    (vae_cogvideox.py:1147-1165): 2 latent frames per chunk (first chunk takes
    the remainder) with carried conv caches."""
    import torch

    import jax.numpy as jnp
    from magicdrive_v2_tpu.models.vae.cogvideox import (AutoencoderKLCogVideoX,
                                                        VideoAutoencoderKLCogVideoX)

    tmod, fmod, params = pair
    # T'=7 latents: first chunk 3, then TWO scan chunks of 2 — exercises the
    # multi-chunk pixel-concat order (T'=5 gives a single scan chunk)
    z = np.random.default_rng(4).standard_normal((1, 4, 7, 4, 4)).astype(np.float32)
    with torch.no_grad():
        want = tmod._decode(torch.tensor(z)).sample.numpy()
    tmod._clear_fake_context_parallel_cache()

    from magicdrive_v2_tpu.models.vae.cogvideox import CogVAEConfig
    cfg = CogVAEConfig(block_out_channels=TINY["block_out_channels"],
                       latent_channels=TINY["latent_channels"],
                       layers_per_block=TINY["layers_per_block"],
                       norm_num_groups=TINY["norm_num_groups"])
    vae = VideoAutoencoderKLCogVideoX(cfg, scaling_factor=1.0)
    vae.params = params

    got = np.asarray(vae.decode(jnp.asarray(z)))
    assert got.shape == want.shape == (1, 3, 25, 32, 32)
    assert np.max(np.abs(got - want)) < 5e-3, np.max(np.abs(got - want))


def test_wrapper_load_pretrained_dir(pair, tmp_path):
    """End-to-end: a diffusers-layout snapshot dir (config.json + .bin) loads
    through VideoAutoencoderKLCogVideoX.load_pretrained and matches torch
    mode-encode * scaling_factor (the reference's training encode path)."""
    import torch

    import jax.numpy as jnp
    from magicdrive_v2_tpu.models.vae.cogvideox import VideoAutoencoderKLCogVideoX

    tmod, _, _ = pair
    d = tmp_path / "vae"
    d.mkdir()
    cfg_json = dict(TINY)
    cfg_json["block_out_channels"] = list(TINY["block_out_channels"])
    cfg_json["scaling_factor"] = 0.7
    (d / "config.json").write_text(json.dumps(cfg_json))
    torch.save(tmod.state_dict(), d / "diffusion_pytorch_model.bin")

    vae = VideoAutoencoderKLCogVideoX(from_pretrained=str(tmp_path),
                                      subfolder="vae")
    vae.load_pretrained()
    assert vae.cfg.latent_channels == 4
    assert vae.scaling_factor == pytest.approx(0.7)
    assert vae.out_channels == 4

    x = np.random.default_rng(2).standard_normal((1, 3, 9, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tmod.encoder(torch.tensor(x)).numpy()[:, :4] * 0.7  # mode * sf
    tmod._clear_fake_context_parallel_cache()
    got = np.asarray(vae.encode(jnp.asarray(x), sample=False))
    assert np.max(np.abs(got - want)) < 2e-4

    # decode round-trip shape contract
    dec = np.asarray(vae.decode(jnp.asarray(got)))
    assert dec.shape == (1, 3, 9, 16, 16)


def test_pipeline_from_config_keeps_pretrained_vae(pair, tmp_path):
    """MagicDrivePipeline.from_config(init_params=True) — the path every
    inference app takes — must NOT re-init the VAE after load_pretrained
    installed real weights (regression: vae.init(k2) used to clobber them)."""
    import torch

    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.config import Config
    from magicdrive_v2_tpu.pipelines.magicdrive import (MagicDrivePipeline,
                                                        synthetic_batch)

    tmod, _, _ = pair
    d = tmp_path / "vae"
    d.mkdir()
    cfg_json = dict(TINY)
    cfg_json["block_out_channels"] = list(TINY["block_out_channels"])
    (d / "config.json").write_text(json.dumps(cfg_json))
    torch.save(tmod.state_dict(), d / "diffusion_pytorch_model.bin")

    from test_pipeline import TINY_CFG, _model_cfg
    cfg = Config({**TINY_CFG, "vae_out_channels": 4,
                  "vae": dict(from_pretrained=str(tmp_path), subfolder="vae",
                              micro_frame_size=None)})
    pipe = MagicDrivePipeline.from_config(
        cfg, rng=jax.random.PRNGKey(0),
        example_batch=synthetic_batch(_model_cfg(cfg), num_frames=9, height=32,
                                      width=40, l_txt=8, caption_channels=16,
                                      map_size=(8, 40, 40)))

    x = np.random.default_rng(5).standard_normal((1, 3, 9, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = tmod.encoder(torch.tensor(x)).numpy()[:, :4] \
            * pipe.vae.scaling_factor
    tmod._clear_fake_context_parallel_cache()
    got = np.asarray(pipe.vae.encode(jnp.asarray(x), sample=False))
    assert np.max(np.abs(got - want)) < 2e-4, \
        "from_config lost the pretrained VAE weights"
