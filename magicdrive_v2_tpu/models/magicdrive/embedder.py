"""Condition embedders: 3D boxes, camera poses, ego motion, BEV maps.

Flax re-design of the reference embedders (reference:
magicdrivedit/models/magicdrive/embedder.py). Structure kept 1:1 at the parameter level
(so torch checkpoints convert mechanically) while computation is vectorized for XLA:
no per-frame python loops; temporal mini-transformers run batched over (boxes/views).

Mask conventions follow the reference (embedder.py:290-344):
  null_mask: 0 -> "really no box" (padding) -> learned null feature
  mask:      0 -> box exists but hidden (dropout / visibility) -> learned mask feature
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers.blocks import (
    Mlp,
    RMSNorm,
    SelfAttention,
    layer_norm_fp32,
    normal_02,
    t2i_modulate,
    xavier_uniform,
    zeros_init,
)

Dtype = Any

XYZ_MIN = jnp.array([-200.0, -300.0, -20.0])
XYZ_RANGE = jnp.array([350.0, 650.0, 80.0])


def normalizer(mode: str, data: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize box corners (reference embedder.py:26-38)."""
    if mode in ("cxyz", "all-xyz"):
        return (data - XYZ_MIN.astype(data.dtype)) / XYZ_RANGE.astype(data.dtype)
    raise NotImplementedError(mode)


def fourier_embed(x: jnp.ndarray, num_freqs: int, include_input: bool = True,
                  log_sampling: bool = True) -> jnp.ndarray:
    """NeRF-style frequency embedding (reference FourierEmbedder, embedder.py:487-532).

    Output channel order matches the reference: [x, sin(x*f0), cos(x*f0), sin(x*f1), ...]
    with f_k = 2^k for log sampling (max_freq_log2 = num_freqs - 1).
    """
    outs = [x] if include_input else []
    if log_sampling:
        freqs = 2.0 ** jnp.linspace(0.0, num_freqs - 1, num_freqs)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs)
    for f in freqs:
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def fourier_out_dim(input_dims: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dims * ((1 if include_input else 0) + 2 * num_freqs)


def cog_temp_down(x: jnp.ndarray) -> jnp.ndarray:
    """CogVideoX temporal halving: odd T keeps the first frame, the rest avg-pool by 2
    (reference cog_temp_down, embedder.py:117-141). x: (B, T, N, D)."""
    T = x.shape[1]
    if T % 2 == 1:
        first, rest = x[:, :1], x[:, 1:]
        if rest.shape[1] > 0:
            rest = (rest[:, 0::2] + rest[:, 1::2]) / 2
            return jnp.concatenate([first, rest], axis=1)
        return first
    return (x[:, 0::2] + x[:, 1::2]) / 2


def make_time_downsampler(factor) -> Callable[..., jnp.ndarray]:
    """(reference embedder.py:426-433) factor -1: mean; 4.5: cog x2; 0: identity.

    `valid`: optional (B, T) frame-validity mask for full-length clips padded
    to a bucket max-T. factor -1 becomes a masked mean; factor 4.5 needs no
    masking — valid lengths are trimmed to 8n+1 (micro_frame) so the pairwise
    halvings never average a valid frame with a padded one (pads start at an
    odd index and pair only with pads); factor 0 keeps pads (masked downstream).
    """
    if factor == -1:
        def mean_down(x, valid=None):
            if valid is None:
                return jnp.mean(x, axis=1, keepdims=True)
            v = valid.astype(x.dtype).reshape(valid.shape + (1,) * (x.ndim - 2))
            return (x * v).sum(axis=1, keepdims=True) / \
                jnp.maximum(v.sum(axis=1, keepdims=True), 1.0)
        return mean_down
    if factor == 4.5:
        return lambda x, valid=None: cog_temp_down(cog_temp_down(x))
    if factor == 0:
        return lambda x, valid=None: x
    raise NotImplementedError(factor)


class TemporalTransformerBlock(nn.Module):
    """RoPE attention + MLP over the time axis, used by the temporal bbox/cam embedders
    (reference embedder.py:400-433,460-478). Input (B', T, D)."""
    hidden_size: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qk_norm: bool = False
    use_scale_shift_table: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 kv_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """kv_mask: optional (B', T) bool validity — padded frames (full-length
        clips padded to a bucket max-T) are excluded as attention keys so they
        cannot leak into valid frames' condition tokens."""
        if self.use_scale_shift_table:
            table = self.param(
                "scale_shift_table",
                lambda key, shape: jax.random.normal(key, shape, jnp.float32) / self.hidden_size**0.5,
                (6, self.hidden_size)).astype(x.dtype)
            sh_mha, sc_mha, g_mha, sh_mlp, sc_mlp, g_mlp = table[:, None, :]
        else:
            sh_mha = sc_mha = sh_mlp = sc_mlp = 0.0
            g_mha = g_mlp = 1.0

        x_m = t2i_modulate(layer_norm_fp32(x), sh_mha, sc_mha)
        x_m = SelfAttention(self.hidden_size, self.num_heads, qkv_bias=True,
                            qk_norm=self.qk_norm, use_rope=True, dtype=self.dtype,
                            name="attn")(x_m, kv_mask=kv_mask)
        x = x + g_mha * x_m
        x_m = t2i_modulate(layer_norm_fp32(x), sh_mlp, sc_mlp)
        # normal(0.02) init per reference initialize_weights (magicdrive_stdit3.py:832-835)
        x_m = Mlp(int(self.hidden_size * self.mlp_ratio), dtype=self.dtype,
                  kernel_init=normal_02, name="mlp")(x_m)
        x = x + g_mlp * x_m
        return x


class ContinuousBBoxWithTextEmbedding(nn.Module):
    """Per-box token from Fourier corner coords + class token
    (reference embedder.py:144-351)."""
    n_classes: int
    class_token_dim: int = 768
    trainable_class_token: bool = False
    embedder_num_freq: int = 4
    proj_dims: Sequence[int] = (768, 512, 512, 768)
    mode: str = "cxyz"
    minmax_normalize: bool = True
    use_text_encoder_init: bool = True
    after_proj: bool = False
    sample_id: bool = False
    dtype: Dtype = jnp.float32

    # the temporal subclass replaces the base zero-init output proj with final_proj
    # (reference asserts self.after_proj is None there, embedder.py:420-424)
    _base_after_proj = True

    @property
    def n_corners(self) -> int:
        return {"cxyz": 4, "all-xyz": 8}[self.mode]

    @property
    def pos_dim(self) -> int:
        return fourier_out_dim(3, self.embedder_num_freq) * self.n_corners

    def setup(self):
        randn = lambda key, shape: jax.random.normal(key, shape, jnp.float32)
        self.bbox_proj = nn.Dense(self.proj_dims[0], dtype=self.dtype,
                                  kernel_init=xavier_uniform, name="bbox_proj")
        self.second_linear = [
            nn.Dense(self.proj_dims[1], dtype=self.dtype, kernel_init=xavier_uniform,
                     name="second_linear_0"),
            nn.Dense(self.proj_dims[2], dtype=self.dtype, kernel_init=xavier_uniform,
                     name="second_linear_2"),
            nn.Dense(self.proj_dims[3], dtype=self.dtype, kernel_init=xavier_uniform,
                     name="second_linear_4"),
        ]
        # class tokens initialized from T5 class-name embeddings by
        # pipelines.prepare_text_embedding (reference set_category_token,
        # embedder.py:263-271); a torch buffer -> non-trainable param here.
        self.class_tokens = self.param("class_tokens", randn,
                                       (self.n_classes, self.class_token_dim))
        if self.sample_id:
            self.mean_var = self.param("mean_var", randn, (self.n_classes, 2))
        self.null_class_feature = self.param("null_class_feature", zeros_init,
                                             (self.class_token_dim,), jnp.float32)
        self.null_pos_feature = self.param("null_pos_feature", zeros_init,
                                           (self.pos_dim,), jnp.float32)
        self.mask_class_feature = self.param("mask_class_feature", zeros_init,
                                             (self.class_token_dim,), jnp.float32)
        self.mask_pos_feature = self.param("mask_pos_feature", zeros_init,
                                           (self.pos_dim,), jnp.float32)
        if self.after_proj and self._base_after_proj:
            self.after_proj_layer = nn.Dense(self.proj_dims[-1], dtype=self.dtype,
                                             kernel_init=zeros_init, bias_init=zeros_init,
                                             name="after_proj")

    def forward_feature(self, pos_emb: jnp.ndarray, cls_emb: jnp.ndarray) -> jnp.ndarray:
        emb = jax.nn.silu(self.bbox_proj(pos_emb))
        emb = jnp.concatenate([emb, cls_emb.astype(emb.dtype)], axis=-1)
        emb = self.second_linear[0](emb)
        emb = jax.nn.silu(emb)
        emb = self.second_linear[1](emb)
        emb = jax.nn.silu(emb)
        emb = self.second_linear[2](emb)
        return emb

    def embed_boxes(self, bboxes: jnp.ndarray, classes: jnp.ndarray,
                    null_mask: Optional[jnp.ndarray] = None,
                    mask: Optional[jnp.ndarray] = None,
                    box_latent: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """bboxes: (B, N, n_corners, 3); classes: (B, N) int; masks: (B, N) in {0,1}.
        Returns (B, N, proj_dims[-1])."""
        B, N = classes.shape
        flat = bboxes.reshape(B * N, self.n_corners, 3)

        def prep_mask(m):
            if m is None:
                m = jnp.ones((B * N,), jnp.float32)
            return m.reshape(B * N, 1).astype(self.dtype)

        mask = prep_mask(mask)
        null_mask = prep_mask(null_mask)

        if self.minmax_normalize:
            flat = normalizer(self.mode, flat)
        pos = fourier_embed(flat, self.embedder_num_freq).reshape(B * N, -1).astype(self.dtype)
        null_pos = self.null_pos_feature[None].astype(self.dtype)
        mask_pos = self.mask_pos_feature[None].astype(self.dtype)
        pos = pos * null_mask + null_pos * (1 - null_mask)
        pos = pos * mask + mask_pos * (1 - mask)

        cls = self.class_tokens[classes.reshape(-1)].astype(self.dtype)
        if self.sample_id:
            mv = self.mean_var[classes.reshape(-1)]
            mu, logvar = mv[:, :1], mv[:, 1:]
            std = jnp.exp(0.5 * logvar)
            assert box_latent is not None, "sample_id requires box_latent"
            lat = box_latent.reshape(B * N, -1).astype(jnp.float32)
            cls = cls + (lat * std + mu).astype(self.dtype)
        null_cls = self.null_class_feature[None].astype(self.dtype)
        mask_cls = self.mask_class_feature[None].astype(self.dtype)
        cls = cls * null_mask + null_cls * (1 - null_mask)
        cls = cls * mask + mask_cls * (1 - mask)

        emb = self.forward_feature(pos, cls).reshape(B, N, -1)
        if self.after_proj and self._base_after_proj:
            emb = self.after_proj_layer(emb)
        return emb

    def __call__(self, bboxes, classes, null_mask=None, mask=None, box_latent=None):
        return self.embed_boxes(bboxes, classes, null_mask, mask, box_latent)


class ContinuousBBoxWithTextTempEmbedding(ContinuousBBoxWithTextEmbedding):
    """Temporal variant: per-box token sequence over T frames -> temporal transformer ->
    temporal downsample to latent frames (reference embedder.py:354-484)."""
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qk_norm: bool = False
    use_scale_shift_table: bool = False
    time_downsample_factor: Any = -1

    _base_after_proj = False

    def setup(self):
        super().setup()
        hidden = self.proj_dims[-1]
        self.temp_block = TemporalTransformerBlock(
            hidden_size=hidden, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qk_norm=self.qk_norm, use_scale_shift_table=self.use_scale_shift_table,
            dtype=self.dtype, name="temp")
        if self.after_proj:
            # reference uses zero-init `final_proj` instead of the base after_proj here
            self.final_proj = nn.Dense(hidden, dtype=self.dtype, kernel_init=zeros_init,
                                       bias_init=zeros_init, name="final_proj")
        self.downsampler = make_time_downsampler(self.time_downsample_factor)

    def __call__(self, bboxes, classes, null_mask=None, mask=None, box_latent=None,
                 frame_valid=None):
        """bboxes: (B, T, N, n_corners, 3); classes: (B, T, N); masks: (B, T, N);
        frame_valid: optional (B, T) bool — padded frames excluded from the
        temporal attention keys and the downsampler. Returns (B, T_latent, N, D)."""
        B, T, N = classes.shape
        flat = lambda a: None if a is None else a.reshape((B * T,) + a.shape[2:])
        emb = self.embed_boxes(bboxes.reshape(B * T, N, self.n_corners, 3),
                               classes.reshape(B * T, N), flat(null_mask), flat(mask),
                               flat(box_latent))  # (B*T, N, D)
        D = emb.shape[-1]
        # (B*T, N, D) -> (B*N, T, D): temporal attention per box track
        emb = emb.reshape(B, T, N, D).transpose(0, 2, 1, 3).reshape(B * N, T, D)
        kv_mask = None
        if frame_valid is not None:
            kv_mask = jnp.broadcast_to(frame_valid.astype(bool)[:, None],
                                       (B, N, T)).reshape(B * N, T)
        emb = self.temp_block(emb, kv_mask=kv_mask)
        emb = emb.reshape(B, N, T, D).transpose(0, 2, 1, 3)  # (B, T, N, D)
        if self.after_proj:
            emb = self.final_proj(emb)
        return self.downsampler(emb, valid=frame_valid)


class CamEmbedder(nn.Module):
    """Camera intrinsics+extrinsics token (reference embedder.py:535-574)."""
    input_dim: int
    out_dim: int
    num: int = 7
    num_freqs: int = 4
    include_input: bool = True
    log_sampling: bool = True
    after_proj: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.emb2token = nn.Dense(self.out_dim, dtype=self.dtype, kernel_init=normal_02,
                                  name="emb2token")
        self.uncond_cam = self.param(
            "uncond_cam", lambda key, shape: jax.random.normal(key, shape, jnp.float32),
            (self.input_dim, self.num))
        if self.after_proj:
            self.after_proj_layer = nn.Dense(self.out_dim, dtype=self.dtype,
                                             kernel_init=zeros_init, bias_init=zeros_init,
                                             name="after_proj")

    def embed_cam(self, param: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                  **kwargs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """param: (N, 3, num) or (N, 4, num); mask: (N,), >0 keeps, else uncond."""
        if param.shape[1] == 4:
            param = param[:, :-1]
        bs = param.shape[0]
        if mask is not None:
            param = jnp.where((mask > 0)[:, None, None], param,
                              self.uncond_cam[None].astype(param.dtype))
        # fourier per column vector: (b, 3, num) -> (b*num, 3)
        cols = param.transpose(0, 2, 1).reshape(bs * self.num, self.input_dim)
        emb = fourier_embed(cols, self.num_freqs, self.include_input, self.log_sampling)
        emb = emb.reshape(bs, -1).astype(self.dtype)
        token = self.emb2token(emb)
        if self.after_proj:
            token = self.after_proj_layer(token)
        return token, emb

    def __call__(self, param, mask=None):
        return self.embed_cam(param, mask)[0]


class CamEmbedderTemp(CamEmbedder):
    """Ego-motion (frame) embedder: camera token + temporal transformer + downsample
    (reference embedder.py:577-675)."""
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qk_norm: bool = False
    use_scale_shift_table: bool = False
    time_downsample_factor: Any = -1

    def setup(self):
        self.emb2token = nn.Dense(self.out_dim, dtype=self.dtype, kernel_init=normal_02,
                                  name="emb2token")
        self.uncond_cam = self.param(
            "uncond_cam", lambda key, shape: jax.random.normal(key, shape, jnp.float32),
            (self.input_dim, self.num))
        self.temp_block = TemporalTransformerBlock(
            hidden_size=self.out_dim, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qk_norm=self.qk_norm, use_scale_shift_table=self.use_scale_shift_table,
            dtype=self.dtype, name="temp")
        if self.after_proj:
            self.final_proj = nn.Dense(self.out_dim, dtype=self.dtype,
                                       kernel_init=zeros_init, bias_init=zeros_init,
                                       name="final_proj")
        self.downsampler = make_time_downsampler(self.time_downsample_factor)

    def embed_cam(self, param: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                  T: Optional[int] = None, S: Optional[int] = None,
                  frame_valid: Optional[jnp.ndarray] = None):
        """frame_valid: optional (b, T) bool — padded frames excluded from the
        temporal attention keys and the downsampler (full-length bucket pad)."""
        if param.shape[1] == 4:
            param = param[:, :-1]
        bs = param.shape[0]
        if mask is not None:
            param = jnp.where((mask > 0)[:, None, None], param,
                              self.uncond_cam[None].astype(param.dtype))
        cols = param.transpose(0, 2, 1).reshape(bs * self.num, self.input_dim)
        emb = fourier_embed(cols, self.num_freqs, self.include_input, self.log_sampling)
        emb = emb.reshape(bs, -1).astype(self.dtype)
        token = self.emb2token(emb)
        # (b*T*S, D) -> (b*S, T, D)
        D = token.shape[-1]
        b = bs // (T * S)
        token = token.reshape(b, T, S, D).transpose(0, 2, 1, 3).reshape(b * S, T, D)
        kv_mask = None
        if frame_valid is not None:
            kv_mask = jnp.broadcast_to(
                frame_valid.astype(bool)[:, None], (b, S, T)).reshape(b * S, T)
        token = self.temp_block(token, kv_mask=kv_mask)
        token = token.reshape(b, S, T, D).transpose(0, 2, 1, 3)  # (b, T, S, D)
        if self.after_proj:
            token = self.final_proj(token)
        return self.downsampler(token, valid=frame_valid), emb


class MapControlEmbedding(nn.Module):
    """ControlNet-style conv pyramid encoding the BEV map (reference
    embedder.py:678-794). Input (B, C_map, H, W) channel-first; output
    (B, emb_ch, H', W') channel-first."""
    conditioning_embedding_channels: int = 320
    conditioning_size: Sequence[int] = (25, 200, 200)
    block_out_channels: Sequence[int] = (32, 64, 128, 256)
    use_uncond_map: Optional[str] = None
    drop_cond_ratio: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        bo = self.block_out_channels
        self.conv_in = nn.Conv(bo[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")
        blocks = []
        for i in range(len(bo) - 2):
            blocks.append(nn.Conv(bo[i], (3, 3), padding=1, dtype=self.dtype,
                                  name=f"blocks_{2 * i}"))
            blocks.append(nn.Conv(bo[i + 1], (3, 3), strides=2,
                                  padding=((2, 2), (1, 1)), dtype=self.dtype,
                                  name=f"blocks_{2 * i + 1}"))
        n = len(bo) - 2
        blocks.append(nn.Conv(bo[-2], (3, 3), padding=((2, 2), (1, 1)),
                              dtype=self.dtype, name=f"blocks_{2 * n}"))
        blocks.append(nn.Conv(bo[-1], (3, 3), strides=(2, 1),
                              padding=((2, 2), (1, 1)), dtype=self.dtype,
                              name=f"blocks_{2 * n + 1}"))
        self.blocks = blocks
        self.conv_out = nn.Conv(self.conditioning_embedding_channels, (3, 3), padding=1,
                                dtype=self.dtype, name="conv_out")
        if self.use_uncond_map is not None and self.drop_cond_ratio > 0:
            if self.use_uncond_map == "learnable":
                self.uncond_map = self.param(
                    "uncond_map",
                    lambda key, shape: jax.random.normal(key, shape, jnp.float32),
                    tuple(self.conditioning_size))
            elif self.use_uncond_map == "negative1":
                self.uncond_map = -jnp.ones(tuple(self.conditioning_size))
            elif self.use_uncond_map == "random":
                self.uncond_map = jax.random.normal(jax.random.PRNGKey(0),
                                                    tuple(self.conditioning_size))
            else:
                raise TypeError(f"Unknown map type: {self.use_uncond_map}")

    def __call__(self, cond: jnp.ndarray) -> jnp.ndarray:
        x = jnp.transpose(cond, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        x = jax.nn.silu(self.conv_in(x))
        for blk in self.blocks:
            x = jax.nn.silu(blk(x))
        x = self.conv_out(x)
        return jnp.transpose(x, (0, 3, 1, 2))


class CausalConv3d(nn.Module):
    """Causal 3D conv: front-only time padding (reference vae_temporal.py:35-70).
    Input/output (B, C, T, H, W)."""
    chan_out: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    time_stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt, kh, kw = self.kernel_size
        time_pad = (kt - 1) + (1 - self.time_stride)
        x = jnp.transpose(x, (0, 2, 3, 4, 1))  # NDHWC
        x = jnp.pad(x, ((0, 0), (time_pad, 0), (kh // 2, kh // 2), (kw // 2, kw // 2),
                        (0, 0)))
        x = nn.Conv(self.chan_out, self.kernel_size, strides=(self.time_stride, 1, 1),
                    padding="VALID", dtype=self.dtype, name="conv")(x.astype(self.dtype))
        return jnp.transpose(x, (0, 4, 1, 2, 3))


class CogDownsample3D(nn.Module):
    """CogVideoX downsample block (reference CogVideoXDownsample3D, embedder.py:41-95)
    with the ZeroPad2d(1,0,1,0) pre-pad fused in (reference embedder.py:814-818).
    Input/output (B, C, T, H, W); stride=1 keeps H,W, compress_time halves T cog-style."""
    out_channels: int
    stride: int = 1
    compress_time: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, C, T, H, W = x.shape
        # pre-pad: H top+1, W left+1 (nn.ZeroPad2d((1, 0, 1, 0)))
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0), (1, 0)))
        H, W = H + 1, W + 1
        if self.compress_time:
            t = x.transpose(0, 2, 3, 4, 1).reshape(B, T, (H * W), C)
            t = cog_temp_down(t)
            T = t.shape[1]
            x = t.reshape(B, T, H, W, C).transpose(0, 4, 1, 2, 3)
        # pad H bottom+1, W right+1, then 3x3 conv valid per frame
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 1)))
        x = x.transpose(0, 2, 3, 4, 1).reshape(B * T, H + 1, W + 1, C)
        x = nn.Conv(self.out_channels, (3, 3), strides=self.stride, padding="VALID",
                    dtype=self.dtype, name="conv")(x.astype(self.dtype))
        Ho, Wo = x.shape[1], x.shape[2]
        return x.reshape(B, T, Ho, Wo, self.out_channels).transpose(0, 4, 1, 2, 3)


class MapControlTempEmbedding(nn.Module):
    """Temporal compression of map features (reference embedder.py:797-833).
    Input/output (B, C, T, H, W)."""
    hidden_size: int
    time_downsample_factor: Any = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.hidden_size
        if self.time_downsample_factor == 4:
            pad = (-x.shape[2]) % 4
            if pad:
                x = jnp.pad(x, ((0, 0), (0, 0), (pad, 0), (0, 0), (0, 0)))
            x = CausalConv3d(h // 2, (3, 3, 3), time_stride=2, dtype=self.dtype,
                             name="conv_blocks_0")(x)
            x = CausalConv3d(h, (3, 3, 3), time_stride=2, dtype=self.dtype,
                             name="conv_blocks_1")(x)
            return x
        if self.time_downsample_factor == 1:
            x = CausalConv3d(h // 2, (3, 3, 3), time_stride=1, dtype=self.dtype,
                             name="conv_blocks_0")(x)
            x = CausalConv3d(h, (3, 3, 3), time_stride=1, dtype=self.dtype,
                             name="conv_blocks_1")(x)
            return x
        if self.time_downsample_factor == 4.5:
            x = CogDownsample3D(h // 2, stride=1, compress_time=True, dtype=self.dtype,
                                name="conv_blocks_1")(x)
            x = CogDownsample3D(h, stride=1, compress_time=True, dtype=self.dtype,
                                name="conv_blocks_3")(x)
            return x
        raise NotImplementedError(self.time_downsample_factor)
