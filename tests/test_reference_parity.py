"""Numerical parity against the REFERENCE torch modules.

Imports the reference implementation from /root/reference (read-only) with
lightweight stubs for its heavyweight deps (mmengine/colossalai/timm/...), loads the
SAME weights into our flax modules through utils/ckpt.convert_torch_state_dict, and
compares outputs. This is the strongest parity evidence available without trained
checkpoints: identical weights -> near-identical activations.

Covered: timestep_transform / add_noise (pure fns), TimestepEmbedder, t2i modulation
tables via T2IFinalLayer, Attention (qk-norm self-attn), MultiHeadCrossAttention,
MultiHeadAttention (shared qkv, used by cross-view), PositionEmbedding2D, and a FULL
MultiViewSTDiT3Block (spatial, skip_cross_attn) vs our MVSTDiTBlock.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="no reference mount")


def _install_stubs():
    import torch.nn as tnn

    import importlib.machinery

    def mod(name, **attrs):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    # mmengine: registry + config shims
    class _Registry:
        def __init__(self, *a, **k):
            pass

        def register_module(self, *a, **k):
            def deco(x):
                return x
            return deco if not a or not callable(a[0]) else a[0]

        def build(self, *a, **k):
            raise NotImplementedError

        def get(self, *a, **k):
            raise NotImplementedError

    mm = mod("mmengine")
    mod("mmengine.registry", Registry=_Registry)
    mod("mmengine.config", Config=dict, ConfigDict=dict)
    mm.registry = sys.modules["mmengine.registry"]
    mm.config = sys.modules["mmengine.config"]

    # timm pieces the reference uses
    class _TimmMlp(tnn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=tnn.GELU, drop=0.0, **kw):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = tnn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = tnn.Linear(hidden_features, out_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    class _DropPath(tnn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    mod("timm")
    mod("timm.models")
    mod("timm.models.vision_transformer", Mlp=_TimmMlp, DropPath=_DropPath)
    mod("timm.models.layers", DropPath=_DropPath)

    class _Rotary:
        def __init__(self, dim):
            self.dim = dim

        def rotate_queries_or_keys(self, x):
            return x

    mod("rotary_embedding_torch", RotaryEmbedding=_Rotary)
    mod("structured_noise",
        generate_structured_noise_batch_vectorized=lambda *a, **k: None)
    mod("colossalai")
    mod("colossalai.cluster", DistCoordinator=object, ProcessGroupMesh=object)
    mod("colossalai.cluster.dist_coordinator", DistCoordinator=object)
    mod("colossalai.booster", Booster=object)
    mod("colossalai.booster.plugin", LowLevelZeroPlugin=object)
    mod("colossalai.checkpoint_io", GeneralCheckpointIO=object)
    mod("colossalai.utils", get_current_device=lambda: "cpu")
    mod("ftfy", fix_text=lambda s: s)
    mod("bs4", BeautifulSoup=None)

    # diffusers: FUNCTIONAL stubs — the reference vendors the CogVideoX VAE and
    # we run its forward for weight-conversion parity (tests/test_vae_parity.py),
    # so the pieces it imports from diffusers must behave like the real ones
    # (diffusers 0.30 semantics, which the vendored file targets).
    import functools
    import inspect

    import torch as _torch
    import torch.nn.functional as _F

    class _Passthrough:
        def __init__(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)

    class _ConfigMixin:
        @property
        def config(self):
            return types.SimpleNamespace(**self._config_dict)

    class _FromOriginal:
        pass

    def _register_to_config(fn):
        @functools.wraps(fn)
        def wrapped(self, *args, **kwargs):
            bound = inspect.signature(fn).bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            object.__setattr__(self, "_config_dict", cfg)
            return fn(self, *args, **kwargs)
        return wrapped

    class _Logging:
        @staticmethod
        def get_logger(*a, **k):
            import logging as _l
            return _l.getLogger("stub")

    class _DiagonalGaussian:
        def __init__(self, parameters, deterministic=False):
            self.parameters = parameters
            self.mean, self.logvar = _torch.chunk(parameters, 2, dim=1)
            self.logvar = _torch.clamp(self.logvar, -30.0, 20.0)
            self.std = _torch.exp(0.5 * self.logvar)

        def mode(self):
            return self.mean

        def sample(self, generator=None):
            noise = _torch.randn(self.mean.shape, generator=generator,
                                 dtype=self.mean.dtype)
            return self.mean + self.std * noise

    class _CogDown(tnn.Module):
        """diffusers CogVideoXDownsample3D: optional temporal avg-pool-2 with
        first-frame passthrough when T is odd, then (0,1,0,1) pad + stride-2
        conv per frame."""

        def __init__(self, in_channels, out_channels, kernel_size=3, stride=2,
                     padding=0, compress_time=False):
            super().__init__()
            self.conv = tnn.Conv2d(in_channels, out_channels, kernel_size,
                                   stride, padding)
            self.compress_time = compress_time

        def forward(self, x):
            if self.compress_time:
                b, c, t, h, w = x.shape
                x = x.permute(0, 3, 4, 1, 2).reshape(b * h * w, c, t)
                if x.shape[-1] % 2 == 1:
                    x_first, x_rest = x[..., 0], x[..., 1:]
                    if x_rest.shape[-1] > 0:
                        x_rest = _F.avg_pool1d(x_rest, kernel_size=2, stride=2)
                    x = _torch.cat([x_first[..., None], x_rest], dim=-1)
                else:
                    x = _F.avg_pool1d(x, kernel_size=2, stride=2)
                x = x.reshape(b, h, w, c, x.shape[-1]).permute(0, 3, 4, 1, 2)
            x = _F.pad(x, (0, 1, 0, 1), mode="constant", value=0)
            b, c, t, h, w = x.shape
            x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
            x = self.conv(x)
            x = x.reshape(b, t, x.shape[1], x.shape[2], x.shape[3])
            return x.permute(0, 2, 1, 3, 4)

    class _CogUp(tnn.Module):
        """diffusers CogVideoXUpsample3D: nearest 2x upsample (3D when
        compress_time with first-frame split on odd T, else per-frame 2D),
        then 3x3 conv per frame."""

        def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                     padding=1, compress_time=False):
            super().__init__()
            self.conv = tnn.Conv2d(in_channels, out_channels, kernel_size,
                                   stride, padding)
            self.compress_time = compress_time

        def forward(self, inputs):
            if self.compress_time:
                if inputs.shape[2] > 1 and inputs.shape[2] % 2 == 1:
                    x_first, x_rest = inputs[:, :, 0], inputs[:, :, 1:]
                    x_first = _F.interpolate(x_first, scale_factor=2.0)
                    x_rest = _F.interpolate(x_rest, scale_factor=2.0)
                    inputs = _torch.cat([x_first[:, :, None], x_rest], dim=2)
                elif inputs.shape[2] > 1:
                    inputs = _F.interpolate(inputs, scale_factor=2.0)
                else:
                    inputs = inputs.squeeze(2)
                    inputs = _F.interpolate(inputs, scale_factor=2.0)
                    inputs = inputs[:, :, None]
            else:
                b, c, t, h, w = inputs.shape
                inputs = inputs.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
                inputs = _F.interpolate(inputs, scale_factor=2.0)
                inputs = inputs.reshape(b, t, *inputs.shape[1:]).permute(
                    0, 2, 1, 3, 4)
            b, c, t, h, w = inputs.shape
            inputs = inputs.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
            inputs = self.conv(inputs)
            inputs = inputs.reshape(b, t, *inputs.shape[1:]).permute(
                0, 2, 1, 3, 4)
            return inputs

    mod("diffusers")
    mod("diffusers.configuration_utils", ConfigMixin=_ConfigMixin,
        register_to_config=_register_to_config)
    mod("diffusers.loaders")
    mod("diffusers.loaders.single_file_model", FromOriginalModelMixin=_FromOriginal)
    mod("diffusers.models")
    mod("diffusers.models.activations", get_activation=lambda name: tnn.SiLU())
    mod("diffusers.models.autoencoders")
    mod("diffusers.models.autoencoders.vae", DecoderOutput=_Passthrough,
        DiagonalGaussianDistribution=_DiagonalGaussian)
    mod("diffusers.models.downsampling", CogVideoXDownsample3D=_CogDown)
    mod("diffusers.models.modeling_outputs", AutoencoderKLOutput=_Passthrough)
    mod("diffusers.models.modeling_utils", ModelMixin=tnn.Module)
    mod("diffusers.models.upsampling", CogVideoXUpsample3D=_CogUp)
    mod("diffusers.utils", logging=_Logging())
    mod("diffusers.utils.accelerate_utils", apply_forward_hook=lambda f: f)
    # force the plain matmul-softmax attention path: pretend CUDA exists at import
    # time so blocks.py picks the flash_attn branch (stubbed) instead of torch_npu,
    # then run with enable_flash_attn=False everywhere.
    os.environ["USE_XFORMERS"] = "False"
    os.environ["DEVICE_TYPE"] = "gpu"
    mod("flash_attn", flash_attn_func=None)
    mod("torch_npu", npu_fusion_attention=None, npu_confusion_transpose=None)
    import torch
    torch.cuda.is_available = lambda: True  # import-time gate only
    # short-circuit the data package: it pulls cv2/mmcv/mmdet which aren't needed
    # for model parity
    mod("magicdrivedit.datasets", IMG_FPS=120, save_sample=lambda *a, **k: None,
        is_img=lambda p: False, is_vid=lambda p: False)
    if REF not in sys.path:
        sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def ref():
    _install_stubs()
    import importlib
    blocks = importlib.import_module("magicdrivedit.models.layers.blocks")
    rf = importlib.import_module("magicdrivedit.schedulers.rf.rectified_flow")
    stdit3 = importlib.import_module(
        "magicdrivedit.models.magicdrive.magicdrive_stdit3")
    return types.SimpleNamespace(blocks=blocks, rf=rf, stdit3=stdit3)


def _to_flax(module, params_like):
    from magicdrive_v2_tpu.utils.ckpt import convert_torch_state_dict
    sd = {k: v.detach().float().numpy() for k, v in module.state_dict().items()}
    return convert_torch_state_dict(sd, params_like, strict=True)


def test_timestep_transform_parity(ref):
    import torch
    import jax.numpy as jnp
    from magicdrive_v2_tpu.schedulers.rf import timestep_transform

    t = np.linspace(1.0, 999.0, 13).astype(np.float32)
    for cog in (False, True):
        for frames, h, w in ((17, 224, 400), (65, 424, 800), (1, 224, 400)):
            want = ref.rf.timestep_transform(
                torch.tensor(t),
                dict(height=torch.tensor([float(h)]),
                     width=torch.tensor([float(w)]),
                     num_frames=torch.tensor([float(frames)])),
                num_timesteps=1000, cog_style=cog).numpy()
            got = np.asarray(timestep_transform(
                jnp.asarray(t), height=float(h), width=float(w),
                num_frames=float(frames), num_timesteps=1000.0, cog_style=cog))
            assert np.allclose(got, want, atol=1e-3), (cog, frames, h, w)


def test_add_noise_parity(ref):
    import torch
    import jax.numpy as jnp
    from magicdrive_v2_tpu.schedulers.rf import add_noise

    sched = ref.rf.RFlowScheduler(num_timesteps=1000, num_sampling_steps=30)
    x = np.random.default_rng(0).standard_normal((2, 4, 3, 8, 8)).astype(np.float32)
    n = np.random.default_rng(1).standard_normal((2, 4, 3, 8, 8)).astype(np.float32)
    t = np.array([250.0, 750.0], np.float32)
    want = sched.add_noise(torch.tensor(x), torch.tensor(n), torch.tensor(t)).numpy()
    got = np.asarray(add_noise(jnp.asarray(x), jnp.asarray(n), jnp.asarray(t), 1000.0))
    assert np.allclose(got, want, atol=1e-6)


def test_timestep_embedder_parity(ref):
    import torch
    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.models.layers.blocks import TimestepEmbedder

    torch.manual_seed(0)
    ref_mod = ref.blocks.TimestepEmbedder(64).eval()
    ours = TimestepEmbedder(64)
    t = np.array([0.0, 125.5, 999.0], np.float32)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(t))
    params = _to_flax(ref_mod, params)
    with torch.no_grad():
        want = ref_mod(torch.tensor(t), dtype=torch.float32).numpy()
    got = np.asarray(ours.apply(jax.tree_util.tree_map(jnp.asarray, params),
                                jnp.asarray(t)))
    assert np.allclose(got, want, atol=1e-4)


def test_pos_embedding_2d_parity(ref):
    import torch
    import jax.numpy as jnp
    from magicdrive_v2_tpu.models.layers.blocks import pos_embedding_2d

    pe = ref.blocks.PositionEmbedding2D(64)
    x = torch.zeros(1, 1, 64)
    want = pe(x, 7, 10, scale=1.73, base_size=8).numpy()
    got = np.asarray(pos_embedding_2d(64, 7, 10, scale=1.73, base_size=8))
    assert want.shape == got.shape
    assert np.allclose(got, want, atol=1e-5)


def test_self_attention_parity(ref):
    import torch
    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.models.layers.blocks import SelfAttention

    torch.manual_seed(1)
    ref_attn = ref.blocks.Attention(64, num_heads=4, qkv_bias=True, qk_norm=True,
                                    enable_flash_attn=False,
                                    enable_xformers=False).eval()
    x = np.random.default_rng(0).standard_normal((2, 11, 64)).astype(np.float32)
    ours = SelfAttention(64, 4, qkv_bias=True, qk_norm=True)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _to_flax(ref_attn, params)
    with torch.no_grad():
        want = ref_attn(torch.tensor(x)).numpy()
    got = np.asarray(ours.apply(jax.tree_util.tree_map(jnp.asarray, params),
                                jnp.asarray(x)))
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_cross_attention_parity(ref):
    import torch
    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.models.layers.blocks import CrossAttention

    torch.manual_seed(2)
    ref_attn = ref.blocks.MultiHeadCrossAttention(64, 4).eval()
    B, N, L = 2, 9, 6
    x = np.random.default_rng(0).standard_normal((B, N, 64)).astype(np.float32)
    cond = np.random.default_rng(1).standard_normal((B, L, 64)).astype(np.float32)
    ours = CrossAttention(64, 4)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(cond))
    params = _to_flax(ref_attn, params)
    with torch.no_grad():
        # non-xformers reference path takes per-sample cond (B, L, C) directly
        want = ref_attn(torch.tensor(x), torch.tensor(cond)).numpy()
    got = np.asarray(ours.apply(jax.tree_util.tree_map(jnp.asarray, params),
                                jnp.asarray(x), jnp.asarray(cond)))
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_shared_kv_attention_parity(ref):
    import torch
    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.models.layers.blocks import SharedKVAttention

    torch.manual_seed(3)
    ref_attn = ref.blocks.MultiHeadAttention(
        64, num_heads=4, qkv_bias=True, qk_norm=True, enable_flash_attn=False,
        enable_xformers=False, is_cross_attention=True).eval()
    x = np.random.default_rng(0).standard_normal((2, 7, 64)).astype(np.float32)
    c = np.random.default_rng(1).standard_normal((2, 5, 64)).astype(np.float32)
    ours = SharedKVAttention(64, 4, qkv_bias=True, qk_norm=True)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(c))
    params = _to_flax(ref_attn, params)
    with torch.no_grad():
        want = ref_attn(torch.tensor(x), cond=torch.tensor(c)).numpy()
    got = np.asarray(ours.apply(jax.tree_util.tree_map(jnp.asarray, params),
                                jnp.asarray(x), jnp.asarray(c)))
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_final_layer_parity(ref):
    import torch
    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.models.layers.blocks import T2IFinalLayer

    torch.manual_seed(4)
    ref_fl = ref.blocks.T2IFinalLayer(64, num_patch=4, out_channels=16).eval()
    B, N = 2, 12
    x = np.random.default_rng(0).standard_normal((B, N, 64)).astype(np.float32)
    t = np.random.default_rng(1).standard_normal((B, 64)).astype(np.float32)
    ours = T2IFinalLayer(64, 4, 16)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))
    params = _to_flax(ref_fl, params)
    with torch.no_grad():
        want = ref_fl(torch.tensor(x), torch.tensor(t)).numpy()
    got = np.asarray(ours.apply(jax.tree_util.tree_map(jnp.asarray, params),
                                jnp.asarray(x), jnp.asarray(t)))
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_full_block_parity_spatial(ref):
    """The crown jewel: one full MultiViewSTDiT3Block (spatial, skip_cross_attn like
    the brushnet blocks) vs our MVSTDiTBlock with converted weights."""
    import torch
    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import MVSTDiTBlock
    from magicdrive_v2_tpu.utils.ckpt import convert_torch_state_dict

    torch.manual_seed(5)
    C, H = 64, 4
    mv_order = {0: [1, 2], 1: [2, 0], 2: [0, 1]}
    ref_block = ref.stdit3.MultiViewSTDiT3Block(
        hidden_size=C, num_heads=H, qk_norm=True, skip_cross_attn=True,
        sequence_parallelism_temporal=False,
        enable_flash_attn=False, enable_xformers=False).eval()

    # float64 on both sides separates systematic error from fp32 rounding drift
    ref_block = ref_block.double()
    b, NC, T, S = 1, 3, 2, 6
    x = np.random.default_rng(0).standard_normal((b * NC, T * S, C))
    t_mlp = np.random.default_rng(1).standard_normal((b, 6 * C))
    with torch.no_grad():
        want = ref_block(torch.tensor(x), None, torch.tensor(t_mlp), None,
                         x_mask=None, t0=None, T=T, S=S, NC=NC,
                         mv_order_map=mv_order).numpy()

    ours = MVSTDiTBlock(hidden_size=C, num_heads=H, qk_norm=True,
                        skip_cross_attn=True, dtype=jnp.float64,
                        neighbors=tuple(tuple(v) for v in mv_order.values()))
    import jax
    jax.config.update("jax_enable_x64", True)
    try:
        x4 = jnp.asarray(x.reshape(b * NC, T, S, C), jnp.float64)
        y_dummy = jnp.zeros((b * NC, 1, 1, C), jnp.float64)
        params = ours.init(jax.random.PRNGKey(0), x4, y_dummy,
                           jnp.asarray(t_mlp, jnp.float64), None, None)
        sd = {k: v.detach().double().numpy()
              for k, v in ref_block.state_dict().items()}
        params = convert_torch_state_dict(sd, params, strict=True)
        params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), params)
        got = ours.apply(params, x4, y_dummy, jnp.asarray(t_mlp, jnp.float64),
                         None, None)
        got = np.asarray(got).reshape(b * NC, T * S, C)
    finally:
        jax.config.update("jax_enable_x64", False)
    assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()  # fp32 norm islands bound precision


@pytest.mark.heavy
def test_full_model_conversion_parity(ref):
    """Whole-model conversion proof at FULL depth (28 blocks / 13 control):
    random-init the torch MagicDriveSTDiT3 at reduced width/spatial dims,
    convert the complete state dict through convert_torch_state_dict, and
    assert forward parity in float64 — this exercises the scan-stacking of all
    three block lists and the shared-qkv slicing at real depth (VERDICT r1
    item 7; reference ckpt_utils.py:33-64)."""
    import torch
    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.config.presets import xl2_model
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import (MagicDriveSTDiT3,
                                                            build_model_config)
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch
    from magicdrive_v2_tpu.utils.ckpt import convert_torch_state_dict

    C, H = 64, 4
    mv_order = {0: [1, 2], 1: [2, 0], 2: [0, 1]}
    tiny = dict(depth=28, control_depth=13, hidden_size=C, num_heads=H,
                in_channels=4, caption_channels=32, model_max_length=16,
                input_sq_size=512)
    model_dict = xl2_model(control_skip_temporal=False)
    model_dict.pop("type")
    model_dict.pop("from_pretrained", None)
    model_dict["bbox_embedder_param"].update(
        class_token_dim=C, proj_dims=[C, 32, 32, C], num_heads=H)
    model_dict["frame_emb_param"].update(num_heads=H)
    model_dict["map_embedder_param"].update(block_out_channels=[8, 16, 24, 32],
                                            conditioning_size=[8, 64, 64])
    model_dict.update(tiny)

    torch.manual_seed(11)
    ref_dict = dict(model_dict)
    for k in ("cam_encoder_cls", "bbox_embedder_cls", "map_embedder_cls",
              "frame_emb_cls"):  # reference resolves dotted class paths
        ref_dict[k] = "magicdrivedit.models.magicdrive.embedder." + ref_dict[k]
    ref_cfg = ref.stdit3.MagicDriveSTDiT3Config(
        enable_flash_attn=False, enable_xformers=False,
        enable_layernorm_kernel=False, **ref_dict)
    ref_model = ref.stdit3.MagicDriveSTDiT3(ref_cfg).eval().double()

    cfg = build_model_config(dict(model_dict), vae_out_channels=4,
                             mv_order_map=mv_order, dtype=jnp.float64)
    ours = MagicDriveSTDiT3(cfg)

    num_frames, height, width = 5, 32, 48
    batch = synthetic_batch(cfg, num_frames=num_frames, height=height,
                            width=width, l_box=4, l_txt=16, caption_channels=32,
                            b=1, map_size=(8, 64, 64))
    hf, wf = batch.pop("height"), batch.pop("width")

    jax.config.update("jax_enable_x64", True)
    try:
        b64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, batch)
        params = ours.init(jax.random.PRNGKey(0), **b64, height=hf, width=wf)
        sd = {k: v.detach().double().numpy()
              for k, v in ref_model.state_dict().items()}
        params = convert_torch_state_dict(sd, params, strict=True)
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else jnp.asarray(a),
            params)
        got = np.asarray(ours.apply(params, **b64, height=hf, width=wf))

        def tt(a):
            a = np.asarray(a)
            return torch.tensor(a.astype(np.float64) if a.dtype.kind == "f" else a)

        tb = {k: (jax.tree_util.tree_map(tt, v) if isinstance(v, dict) else tt(v))
              for k, v in batch.items()}
        with torch.no_grad():
            want = ref_model(tb["x"], tb["timestep"], tb["y"], tb["maps"],
                             tb["bbox"], tb["cams"], tb["rel_pos"], tb["fps"],
                             height=torch.tensor([hf], dtype=torch.float64),
                             width=torch.tensor([wf], dtype=torch.float64),
                             mv_order_map=mv_order).numpy()
    finally:
        jax.config.update("jax_enable_x64", False)
    assert got.shape == want.shape, (got.shape, want.shape)
    err = np.abs(got - want).max()
    assert err < 1e-4, err


def test_sde_brushnet_conversion_parity(ref):
    """BrushNet/SDE branch conversion + activation parity (VERDICT r4 item 5):
    random-init the torch MagicDriveSTDiT3SDEBrushNet (reference
    magicdrive_stdit3.py:1870-2470), convert its COMPLETE state dict through
    convert_torch_state_dict, and assert float64 forward parity with an
    explicit inpaint noise (reference `noise_inpaint_encoded`) so the
    structured-noise generator stays out of the comparison. Exercises the
    ShallowEncoder, x_brushnet_embedder, t_inpaint/t_combine blocks, the
    rectified-flow add_noise mix at the independent t_inpaint, the trilinear
    mask downsample, and BOTH brushnet scan segments (ctrl + plain)."""
    import torch
    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.config.presets import xl2_model
    from magicdrive_v2_tpu.models.magicdrive.brushnet import (
        BrushNetConfig, MagicDriveSTDiT3BrushNet)
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import build_model_config
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch
    from magicdrive_v2_tpu.utils.ckpt import convert_torch_state_dict

    C, H = 64, 4
    mv_order = {0: [1, 2], 1: [2, 0], 2: [0, 1]}
    tiny = dict(depth=4, control_depth=2, hidden_size=C, num_heads=H,
                in_channels=4, caption_channels=32, model_max_length=16,
                input_sq_size=512)
    model_dict = xl2_model(control_skip_temporal=False)
    model_dict.pop("type")
    model_dict.pop("from_pretrained", None)
    model_dict["bbox_embedder_param"].update(
        class_token_dim=C, proj_dims=[C, 32, 32, C], num_heads=H)
    model_dict["frame_emb_param"].update(num_heads=H)
    model_dict["map_embedder_param"].update(block_out_channels=[8, 16, 24, 32],
                                            conditioning_size=[8, 64, 64])
    model_dict.update(tiny)

    torch.manual_seed(23)
    ref_dict = dict(model_dict)
    for k in ("cam_encoder_cls", "bbox_embedder_cls", "map_embedder_cls",
              "frame_emb_cls"):
        ref_dict[k] = "magicdrivedit.models.magicdrive.embedder." + ref_dict[k]
    ref_cfg = ref.stdit3.MagicDriveSTDiT3Config(
        enable_flash_attn=False, enable_xformers=False,
        enable_layernorm_kernel=False, **ref_dict)
    ref_model = ref.stdit3.MagicDriveSTDiT3SDEBrushNet(ref_cfg).eval().double()

    base_cfg = build_model_config(dict(model_dict), vae_out_channels=4,
                                  mv_order_map=mv_order, dtype=jnp.float64)
    import dataclasses
    cfg = BrushNetConfig(**dataclasses.asdict(base_cfg), sde_inpaint=True)
    ours = MagicDriveSTDiT3BrushNet(cfg)

    num_frames, height, width = 5, 32, 48
    NC, C_in = len(mv_order), 4
    lat_t, lat_h, lat_w = 2, height // 8, width // 8
    rng_np = np.random.default_rng(5)
    batch = synthetic_batch(cfg, num_frames=num_frames, height=height,
                            width=width, l_box=4, l_txt=16, caption_channels=32,
                            b=1, map_size=(8, 64, 64))
    hf, wf = batch.pop("height"), batch.pop("width")
    x_inpaint = rng_np.standard_normal((1, 3 * NC, num_frames, height, width)
                                       ).astype(np.float64)
    mask_inpaint = rng_np.integers(0, 2, (1, NC, num_frames, height, width)
                                   ).astype(np.float64)
    noise_model = rng_np.standard_normal((1, C_in * NC, lat_t, lat_h, lat_w)
                                         ).astype(np.float64)
    # ours takes the noise in the (B*NC, C, T', h', w') shallow-latent layout
    # (the exact rearrange the reference applies to noise_inpaint_encoded)
    noise_ours = noise_model.reshape(1, C_in, NC, lat_t, lat_h, lat_w) \
        .transpose(0, 2, 1, 3, 4, 5).reshape(NC, C_in, lat_t, lat_h, lat_w)
    t_inpaint = np.array([300.0])

    jax.config.update("jax_enable_x64", True)
    try:
        b64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, batch)
        extra = dict(x_inpaint=jnp.asarray(x_inpaint),
                     mask_inpaint=jnp.asarray(mask_inpaint),
                     t_inpaint=jnp.asarray(t_inpaint),
                     num_timesteps=1000.0,
                     noise_inpaint=jnp.asarray(noise_ours))
        params = ours.init(jax.random.PRNGKey(0), **b64, **extra,
                           height=hf, width=wf)
        sd = {k: v.detach().double().numpy()
              for k, v in ref_model.state_dict().items()}
        params = convert_torch_state_dict(sd, params, strict=True,
                                           control_depth=tiny["control_depth"])
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else jnp.asarray(a),
            params)
        got = np.asarray(ours.apply(params, **b64, **extra,
                                    height=hf, width=wf))

        def tt(a):
            a = np.asarray(a)
            return torch.tensor(a.astype(np.float64) if a.dtype.kind == "f" else a)

        tb = {k: (jax.tree_util.tree_map(tt, v) if isinstance(v, dict) else tt(v))
              for k, v in batch.items()}
        with torch.no_grad():
            want = ref_model(
                tb["x"], tt(x_inpaint), tt(mask_inpaint), tb["timestep"],
                tt(t_inpaint), 1000, tb["y"], tb["maps"], tb["bbox"],
                tb["cams"], tb["rel_pos"], tb["fps"],
                height=torch.tensor([hf], dtype=torch.float64),
                width=torch.tensor([wf], dtype=torch.float64),
                noise_inpaint_encoded=tt(noise_model),
                mv_order_map=mv_order).numpy()
    finally:
        jax.config.update("jax_enable_x64", False)
    assert got.shape == want.shape, (got.shape, want.shape)
    err = np.abs(got - want).max()
    assert err < 1e-4, err
