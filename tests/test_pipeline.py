import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdrive_v2_tpu.config import Config
from magicdrive_v2_tpu.pipelines.magicdrive import MagicDrivePipeline, synthetic_batch

TINY_CFG = dict(
    dtype="fp32",
    vae_out_channels=4,
    scheduler=dict(type="rflow", use_timestep_transform=True, cog_style_trans=True,
                   num_sampling_steps=3, cfg_scale=2.0),
    mv_order_map={0: [5, 1], 1: [0, 2], 2: [1, 3], 3: [2, 4], 4: [3, 5], 5: [4, 0]},
    model=dict(
        type="MagicDriveSTDiT3",
        in_channels=4,
        hidden_size=32,
        depth=4,
        control_depth=2,
        num_heads=4,
        pred_sigma=False,
        caption_channels=16,
        model_max_length=8,
        qk_norm=True,
        with_temp_block=True,
        use_x_control_embedder=True,
        control_skip_cross_view=True,
        control_skip_temporal=False,
        micro_frame_size=None,
        map_embedder_downsample_rate=4.5,
        cam_encoder_cls="CamEmbedder",
        cam_encoder_param=dict(input_dim=3, num=7, after_proj=True),
        frame_emb_cls="CamEmbedderTemp",
        frame_emb_param=dict(input_dim=3, num=4, after_proj=True, num_heads=4,
                             qk_norm=True, use_scale_shift_table=True,
                             time_downsample_factor=4.5),
        bbox_embedder_cls="ContinuousBBoxWithTextTempEmbedding",
        bbox_embedder_param=dict(n_classes=10, class_token_dim=32,
                                 proj_dims=[32, 16, 16, 32], mode="all-xyz",
                                 minmax_normalize=False, after_proj=True,
                                 sample_id=False, num_heads=4, qk_norm=True,
                                 use_scale_shift_table=True,
                                 time_downsample_factor=4.5),
        map_embedder_param=dict(conditioning_size=[8, 40, 40],
                                block_out_channels=[4, 8, 12, 16]),
    ),
    vae=dict(type="VideoAutoencoderKLCogVideoX", micro_frame_size=None),
    text_encoder=dict(type="t5-dummy", model_max_length=8, output_dim=16),
)


@pytest.fixture(scope="module")
def pipe():
    cfg = Config(TINY_CFG)
    # tiny VAE to match in_channels=4
    from magicdrive_v2_tpu.models.vae.cogvideox import CogVAEConfig, VideoAutoencoderKLCogVideoX
    pipe = MagicDrivePipeline.from_config(
        cfg, rng=jax.random.PRNGKey(0), init_params=True,
        example_batch=synthetic_batch(
            _model_cfg(cfg), num_frames=9, height=32, width=40, l_txt=8,
            caption_channels=16, map_size=(8, 40, 40)))
    vae = VideoAutoencoderKLCogVideoX(
        CogVAEConfig(block_out_channels=(8, 8, 8, 16), latent_channels=4,
                     layers_per_block=1, norm_num_groups=4))
    vae.init(jax.random.PRNGKey(1))
    pipe.vae = vae
    return pipe


def _model_cfg(cfg):
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import build_model_config
    return build_model_config(cfg.model, vae_out_channels=4,
                              mv_order_map=cfg.mv_order_map, dtype=jnp.float32)


def _cond_batch(cfg, num_frames=9, h=32, w=40):
    mc = _model_cfg(cfg)
    batch = synthetic_batch(mc, num_frames=num_frames, height=h, width=w, l_txt=8,
                            caption_channels=16, map_size=(8, 40, 40))
    for k in ("x", "timestep", "height", "width"):
        batch.pop(k)
    return batch


@pytest.mark.heavy
def test_end_to_end_sampling(pipe):
    batch = _cond_batch(Config(TINY_CFG))
    vids = pipe.sample(batch, num_frames=9, height=32, width=40,
                       rng=jax.random.PRNGKey(7))
    assert vids.shape == (1, 6, 3, 9, 32, 40)
    assert np.isfinite(vids).all()


def test_sampling_latents_deterministic(pipe):
    batch = _cond_batch(Config(TINY_CFG))
    s1 = pipe.sample(batch, num_frames=9, height=32, width=40,
                     rng=jax.random.PRNGKey(3), decode=False)
    s2 = pipe.sample(batch, num_frames=9, height=32, width=40,
                     rng=jax.random.PRNGKey(3), decode=False)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_slice_cfg_matches_batched(pipe):
    """rflow vs rflow-slice must be numerically equivalent (same math, different
    batching; reference rf/__init__.py:426+)."""
    batch = _cond_batch(Config(TINY_CFG))
    z = jax.random.normal(jax.random.PRNGKey(11), (1, 4 * 6, 3, 4, 5))
    s_batched = pipe.sample(batch, num_frames=9, height=32, width=40, z=z,
                            decode=False)
    import dataclasses
    pipe.scheduler = dataclasses.replace(pipe.scheduler, slice_cfg=True)
    try:
        s_slice = pipe.sample(batch, num_frames=9, height=32, width=40, z=z,
                              decode=False)
    finally:
        pipe.scheduler = dataclasses.replace(pipe.scheduler, slice_cfg=False)
    np.testing.assert_allclose(np.asarray(s_batched), np.asarray(s_slice), atol=2e-4)


def test_sample_fn_cache_reused_across_calls(pipe):
    """Repeat `sample` calls at one (shape, scheduler) bucket must reuse the
    jit-compiled program (one cache entry), and changing the guidance scale must
    NOT add entries (scale is traced, not static)."""
    batch = _cond_batch(Config(TINY_CFG))
    z = jnp.zeros((1, 24, 3, 4, 5), jnp.float32)
    pipe._sample_fns.clear()
    pipe.sample(batch, num_frames=9, height=32, width=40, z=z, decode=False)
    assert len(pipe._sample_fns) == 1
    fn = next(iter(pipe._sample_fns.values()))
    n_traces = fn._cache_size()
    pipe.sample(batch, num_frames=9, height=32, width=40, z=z, decode=False,
                guidance_scale=7.5)
    assert len(pipe._sample_fns) == 1
    assert fn._cache_size() == n_traces  # scale change: no retrace
    pipe.sample(batch, num_frames=5, height=32, width=40, z=z[:, :, :2],
                decode=False)
    assert len(pipe._sample_fns) == 2  # new shape bucket: new entry


def test_frame_mask_pins_reference_frames(pipe):
    batch = _cond_batch(Config(TINY_CFG))
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 4 * 6, 3, 4, 5))
    mask = jnp.array([[0.0, 1.0, 1.0]])  # frame 0 is reference (kept)
    out = pipe.sample(batch, num_frames=9, height=32, width=40, z=z, mask=mask,
                      decode=False)
    np.testing.assert_allclose(np.asarray(out[:, :, 0]), np.asarray(z[:, :, 0]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(out[:, :, 1]), np.asarray(z[:, :, 1]))


def test_torch_randn_matches_reference_contract():
    """z must be bit-identical to torch.manual_seed(1024+ns); torch.randn(...)
    (reference inference_magicdrive.py:434)."""
    import numpy as np
    import torch

    from magicdrive_v2_tpu.utils.misc import torch_randn

    torch.manual_seed(1024)
    want = torch.randn(2, 3, 4).numpy()
    got = torch_randn((2, 3, 4), seed=1024)
    assert np.array_equal(got, want)


def test_edit_prompt_modes():
    from magicdrive_v2_tpu.utils.inference_utils import edit_prompt

    p = "A driving scene at boston-seaport. Rain at night, water reflections."
    day, neg = edit_prompt(p, force_daytime=True)
    assert day.startswith("Daytime. ")
    assert "rain" not in day and "night" not in day
    assert "boston-seaport" not in day and "singapore-onenorth" in day
    assert "Rain" in neg and "Night" in neg

    rainy, neg = edit_prompt("A sunny day.", force_rainy=True)
    assert "Rain" in rainy and "Daytime" in neg
    same, _ = edit_prompt("Heavy rain ahead.", force_rainy=True)
    assert same == "Heavy rain ahead."

    night, neg = edit_prompt("A sunny day.", force_night=True)
    assert "Night" in night and "rain" in neg
    plain, neg = edit_prompt(p)
    assert plain == p and neg is None


def test_neg_prompts_change_cfg_output(pipe):
    batch = _cond_batch(Config(TINY_CFG))
    z = jnp.zeros((1, 24, 3, 4, 5), jnp.float32)
    s_null = pipe.sample(batch, num_frames=9, height=32, width=40, z=z,
                         decode=False, rng=jax.random.PRNGKey(3))
    s_neg = pipe.sample(batch, num_frames=9, height=32, width=40, z=z,
                        decode=False, rng=jax.random.PRNGKey(3),
                        neg_prompts=["rain, night"])
    assert not np.allclose(np.asarray(s_null), np.asarray(s_neg))


def test_use_map0_zeroes_uncond_map(pipe):
    """use_map0: the uncond half of the CFG batch must see a ZEROED map
    (reference add_null_condition use_map0, inference_utils.py:273-280) — at
    random init the zero-init control projections hide it from the output, so
    assert at the condition-doubling level — and it must get its own jit-cache
    entry (different compiled program)."""
    from magicdrive_v2_tpu.utils.inference_utils import add_null_condition

    batch = _cond_batch(Config(TINY_CFG))
    args = {k: batch[k] for k in ("y", "maps", "bbox", "cams", "rel_pos", "fps")}
    args["maps"] = args["maps"] + 1.0
    doubled = add_null_condition(args, pipe.uncond_cam, pipe.uncond_rel_pos,
                                 use_map0=True)
    b = args["maps"].shape[0]
    assert doubled["maps"].shape[0] == 2 * b
    np.testing.assert_array_equal(np.asarray(doubled["maps"][b:]), 0.0)
    np.testing.assert_array_equal(np.asarray(doubled["maps"][:b]),
                                  np.asarray(args["maps"]))
    # without the flag the uncond half reuses the conditional map
    plain = add_null_condition(args, pipe.uncond_cam, pipe.uncond_rel_pos)
    np.testing.assert_array_equal(np.asarray(plain["maps"][b:]),
                                  np.asarray(args["maps"]))

    # distinct jit-cache entries per use_map0 value
    z = jnp.zeros((1, 24, 3, 4, 5), jnp.float32)
    kw = dict(num_frames=9, height=32, width=40, z=z, decode=False,
              rng=jax.random.PRNGKey(3))
    pipe._sample_fns.clear()
    pipe.sample(batch, **kw)
    pipe.sample(batch, use_map0=True, **kw)
    assert len(pipe._sample_fns) == 2


@pytest.mark.heavy
def test_sp_pipeline_sample_matches_single_device(pipe):
    """sp_size>1 inference (reference --sp_size N, doc/FAQ.md memory tables):
    the pipeline traces its sample program under a (1, sp) mesh, GSPMD shards
    the token axis. With H' divisible by sp (no pad -> no grid effect) the
    samples must match the unsharded pipeline exactly (same params)."""
    cfg = Config({**TINY_CFG, "sp_size": 4})
    # 64x80 px -> latent 8x10 -> token grid 4x5, S=20 divisible by sp=4: no
    # H-pad, so SP must match the unsharded program exactly (at 32x40 the
    # model would pad H for sp — the documented grid effect — and outputs
    # legitimately differ; that path is covered by
    # test_sp_h_padding_path_matches_unsharded)
    h, w = 64, 80
    ex = synthetic_batch(_model_cfg(cfg), num_frames=9, height=h, width=w,
                         l_txt=8, caption_channels=16, map_size=(8, 40, 40))
    pipe_sp = MagicDrivePipeline.from_config(
        cfg, rng=jax.random.PRNGKey(0), init_params=True, example_batch=ex)
    assert pipe_sp.mesh is not None and pipe_sp.mesh.shape["sp"] == 4
    pipe_sp.params = pipe.params  # identical weights

    batch = _cond_batch(Config(TINY_CFG), h=h, w=w)
    z = jax.random.normal(jax.random.PRNGKey(9), (1, 24, 3, 8, 10), jnp.float32)
    kw = dict(num_frames=9, height=h, width=w, z=z, decode=False,
              rng=jax.random.PRNGKey(4))
    ref = pipe.sample(batch, **kw)
    got = pipe_sp.sample(batch, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_resolve_num_frames_full_is_loud():
    """num_frames='full' resolves via full_bucket_t or --num-frames, and FAILS
    otherwise — no silent fallback to 17 (VERDICT r3 item 8)."""
    from magicdrive_v2_tpu.config import Config
    from magicdrive_v2_tpu.utils.inference_utils import resolve_num_frames

    assert resolve_num_frames(Config(num_frames=17)) == 17
    assert resolve_num_frames(Config(num_frames="full", full_bucket_t=233)) == 233
    assert resolve_num_frames(Config(num_frames="full"), cli_num_frames=9) == 9
    with pytest.raises(ValueError, match="full_bucket_t"):
        resolve_num_frames(Config(num_frames="full"))
    with pytest.raises(ValueError, match="8n\\+1"):
        resolve_num_frames(Config(num_frames="full", full_bucket_t=16))


def test_full_length_padded_sampling_matches_unpadded(pipe):
    """Full-length generation (VERDICT r3 item 3): a 9-frame clip padded to the
    17-frame bucket via pad_model_batch_to_t + frame_valid must produce the
    SAME latents on valid frames as sampling the unpadded clip — i.e. the
    whole Euler loop (timestep transform included, via num_frames_valid) is
    pad-exact, so ONE compiled program per bucket serves every scene length."""
    from magicdrive_v2_tpu.datasets import pad_model_batch_to_t

    mcfg = pipe.model.cfg
    b9 = synthetic_batch(mcfg, num_frames=9, height=32, width=40, l_txt=8,
                         caption_channels=16, map_size=(8, 40, 40), seed=5)
    for k in ("x", "timestep", "height", "width"):
        b9.pop(k)
    rng = np.random.default_rng(11)
    z9 = rng.standard_normal((1, 4 * 6, 3, 4, 5)).astype(np.float32)
    z17 = rng.standard_normal((1, 4 * 6, 5, 4, 5)).astype(np.float32)
    z17[:, :, :3] = z9

    key = jax.random.PRNGKey(3)
    lat_ref = pipe.sample(dict(b9), num_frames=9, height=32, width=40,
                          rng=key, z=jnp.asarray(z9), decode=False)

    b17 = pad_model_batch_to_t(
        {**{k: np.asarray(v) for k, v in b9.items() if k != "bbox"},
         "bbox": {k: np.asarray(v) for k, v in b9["bbox"].items()},
         "num_frames": 9}, 17)
    b17.pop("num_frames")
    lat_pad = pipe.sample(b17, num_frames=17, height=32, width=40,
                          rng=key, z=jnp.asarray(z17), decode=False)
    assert lat_pad.shape[2] == 5
    np.testing.assert_allclose(np.asarray(lat_pad[:, :, :3]),
                               np.asarray(lat_ref), rtol=2e-4, atol=2e-4)
