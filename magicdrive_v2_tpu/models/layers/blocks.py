"""Layer library for the MagicDrive-V2 TPU rebuild.

Flax/JAX re-design of the reference layer library (reference:
magicdrivedit/models/layers/blocks.py). Norms run in fp32 and cast back to the compute
dtype (the reference relies on apex FusedLayerNorm / fp32 softmax for the same numerics,
blocks.py:54-93,256-265). All attention goes through ops.dot_product_attention (Pallas
flash-attn on TPU / fp32-softmax XLA path) instead of flash-attn/xformers dispatch.

Canonical token layout in this framework is 4D ``(B, T, S, C)`` — keeping T and S as
separate axes lets `jax.sharding` express sequence parallelism as a plain
``P(dp, None, sp, None)`` sharding and avoids reshape churn between blocks.
"""
from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.attention import dot_product_attention
from ...ops.flash_fused import fused_qkv_attention
from ...ops.rope import apply_rope, rope_frequencies, rotate_half_interleaved
from ...parallel.sharding import SP_AXIS, get_current_mesh, shard_hint

Dtype = Any
xavier_uniform = nn.initializers.xavier_uniform()
zeros_init = nn.initializers.zeros
normal_02 = nn.initializers.normal(stddev=0.02)


def approx_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def t2i_modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """(reference blocks.py:92-93)"""
    return x * (1 + scale) + shift


def layer_norm_fp32(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Affine-free LayerNorm computed in fp32 (reference get_layernorm, blocks.py:71-80)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(dtype)


class RMSNorm(nn.Module):
    """LlamaRMSNorm (reference blocks.py:54-68): fp32 inner computation."""
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        x32 = x32 * jax.lax.rsqrt(var + self.eps)
        return (weight * x32.astype(dtype)).astype(dtype)


class Mlp(nn.Module):
    """timm-style MLP: fc1 -> act -> fc2."""
    hidden_features: int
    out_features: Optional[int] = None
    act: Callable = approx_gelu
    dtype: Dtype = jnp.float32
    kernel_init: Callable = xavier_uniform
    fc2_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     kernel_init=self.kernel_init, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(out, dtype=self.dtype,
                     kernel_init=self.fc2_init or self.kernel_init, name="fc2")(x)
        return x


class PatchEmbed3D(nn.Module):
    """Video-to-patch embedding via strided Conv3D (reference blocks.py:101-155).

    Input (B, C, T, H, W) channel-first (to mirror the reference's data contract);
    internally NDHWC for TPU-friendly convolution. Output (B, T'*H'*W', E).
    """
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    flatten: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        _, _, D, H, W = x.shape
        pt, ph, pw = self.patch_size
        pad_d, pad_h, pad_w = (-D) % pt, (-H) % ph, (-W) % pw
        if pad_d or pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_d), (0, pad_h), (0, pad_w)))
        x = jnp.transpose(x, (0, 2, 3, 4, 1)).astype(self.dtype)  # NDHWC
        x = nn.Conv(self.embed_dim, kernel_size=self.patch_size,
                    strides=self.patch_size, padding="VALID", dtype=self.dtype,
                    kernel_init=xavier_uniform, name="proj")(x)
        if self.flatten:
            b = x.shape[0]
            x = x.reshape(b, -1, self.embed_dim)
        else:
            x = jnp.transpose(x, (0, 4, 1, 2, 3))
        return x


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding, [cos|sin] order (reference blocks.py:927-945)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    """(reference blocks.py:913-952)"""
    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = timestep_embedding(t, self.frequency_embedding_size).astype(self.dtype)
        emb = nn.Dense(self.hidden_size, dtype=self.dtype, kernel_init=xavier_uniform,
                       name="mlp_0")(emb)
        emb = jax.nn.silu(emb)
        emb = nn.Dense(self.hidden_size, dtype=self.dtype, kernel_init=xavier_uniform,
                       name="mlp_2")(emb)
        return emb


class SizeEmbedder(nn.Module):
    """Embeds a vector of scalars (e.g. fps) to (B, d*hidden) (reference blocks.py:985-1016)."""
    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, s: jnp.ndarray, bs: int) -> jnp.ndarray:
        if s.ndim == 1:
            s = s[:, None]
        if s.shape[0] != bs:
            s = jnp.tile(s, (bs // s.shape[0], 1))
        b, d = s.shape
        emb = timestep_embedding(s.reshape(-1), self.frequency_embedding_size)
        emb = emb.astype(self.dtype)
        emb = nn.Dense(self.hidden_size, dtype=self.dtype, kernel_init=xavier_uniform,
                       name="mlp_0")(emb)
        emb = jax.nn.silu(emb)
        emb = nn.Dense(self.hidden_size, dtype=self.dtype, kernel_init=xavier_uniform,
                       name="mlp_2")(emb)
        return emb.reshape(b, d * self.hidden_size)


class CaptionEmbedder(nn.Module):
    """Caption projection with null-embedding drop for CFG (reference blocks.py:1019-1064).

    ``y_embedding`` is a learned-at-init, non-trainable table (a torch buffer in the
    reference); it lives in `params` and is excluded from training via the optimizer mask
    (utils/train_utils.trainable_mask).
    """
    in_channels: int
    hidden_size: int
    uncond_prob: float = 0.0
    token_num: int = 120
    dtype: Dtype = jnp.float32

    def setup(self):
        self.y_embedding = self.param(
            "y_embedding",
            lambda key, shape: jax.random.normal(key, shape, jnp.float32) / self.in_channels**0.5,
            (self.token_num, self.in_channels))
        self.y_proj = Mlp(hidden_features=self.hidden_size, out_features=self.hidden_size,
                          dtype=self.dtype, name="y_proj")

    def token_drop(self, caption: jnp.ndarray, drop_ids: jnp.ndarray) -> jnp.ndarray:
        # caption: (B, 1, L, C) with L <= token_num; drop_ids: (B,) bool/int
        drop = drop_ids.astype(bool)[:, None, None, None]
        null = self.y_embedding[: caption.shape[2]].astype(caption.dtype)
        return jnp.where(drop, null, caption)

    def __call__(self, caption: jnp.ndarray, force_drop_ids: Optional[jnp.ndarray] = None):
        if force_drop_ids is not None:
            caption = self.token_drop(caption, force_drop_ids)
        return self.y_proj(caption.astype(self.dtype))


def pos_embedding_2d(dim: int, h: int, w: int, scale: float = 1.0,
                     base_size: Optional[int] = None) -> jnp.ndarray:
    """2D sincos positional embedding, (1, h*w, dim).

    Matches reference PositionEmbedding2D (blocks.py:1067-1116): channel layout at grid
    position (i, j) is [sin(gw_j f), cos(gw_j f), sin(gh_i f), cos(gh_i f)] with
    gh = arange(h)/scale * base/h, gw = arange(w)/scale * base/w.
    """
    assert dim % 4 == 0
    half = dim // 2
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, half, 2, dtype=jnp.float32) / half))
    gh = jnp.arange(h, dtype=jnp.float32) / scale
    gw = jnp.arange(w, dtype=jnp.float32) / scale
    if base_size is not None:
        gh = gh * (base_size / h)
        gw = gw * (base_size / w)

    def sincos(t):  # (M,) -> (M, half)
        out = jnp.einsum("i,d->id", t, inv_freq)
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)

    emb_w = sincos(gw)  # (w, half)
    emb_h = sincos(gh)  # (h, half)
    emb = jnp.concatenate([
        jnp.broadcast_to(emb_w[None, :, :], (h, w, half)),
        jnp.broadcast_to(emb_h[:, None, :], (h, w, half)),
    ], axis=-1)
    return emb.reshape(1, h * w, dim)


# ---------------------------------------------------------------------------
# Attention modules
# ---------------------------------------------------------------------------


class _NormWeight(nn.Module):
    """Holds an RMSNorm weight with the same param tree as RMSNorm (name/weight)
    so the fused-attention path (which normalizes inside the kernel) and the XLA
    fallback share one checkpoint layout."""
    dim: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)


def _rms_apply(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Functional RMSNorm matching the RMSNorm module's numerics."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    return (weight * x32.astype(dtype)).astype(dtype)


def _pad_heads() -> bool:
    """MDV2_PAD_HEADS=1: allocate qkv/proj weights with head_dim padded to the
    128-lane width (72 -> 128 on the flagship) so spatial attention operands
    are tile-aligned and XLA inserts no slow misaligned-relayout copies.
    Experimental; numerics match unpadded to ~1e-5 (rms eps over the zero
    lanes), exactness test in test_blocks.py."""
    return os.environ.get("MDV2_PAD_HEADS") == "1"


def _use_fused_attention(seq_len: int) -> bool:
    """Dispatch to the Pallas fused-qkv kernel (ops/flash_fused.py).

    Default policy (measured, docs/PERF.md): LONG sequences (beyond the
    full-row VMEM limit, e.g. 848p S=5300) use the blocked-K online-softmax
    kernel — the chunked-XLA composition there is HBM-bound on materialized
    fp32 logits (~3.2 GB traffic per chunk, ~480 ms/site in-graph vs the
    kernel's ~102 ms). SHORT sequences (424p S=1350) stay on the fused-XLA
    composition, which beats the full-row kernel in-graph (75 vs 99
    ms/spatial-block: the custom call's operand relayout + lost fusion eat the
    standalone win). MDV2_FUSED_ATTN=1 forces the kernel everywhere, =0
    disables it. Requires tracing OUTSIDE a mesh context (under GSPMD the XLA
    composition keeps sequence sharding)."""
    from ...ops.flash_fused import FULL_ROW_MAX_N
    flag = os.environ.get("MDV2_FUSED_ATTN")
    if flag == "0":
        return False
    if get_current_mesh() is not None:
        return False
    if flag == "1":
        return True
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        return False
    return on_tpu and seq_len > FULL_ROW_MAX_N


class SelfAttention(nn.Module):
    """Fused-QKV self-attention with optional per-head RMS qk-norm and RoPE
    (reference Attention, blocks.py:158-278)."""
    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_norm: bool = False
    use_rope: bool = False
    dtype: Dtype = jnp.float32
    proj_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 kv_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """kv_mask: optional (B, N_keys) bool — False keys are excluded from
        every query's softmax. Used by temporal attention to keep padded
        frames (full-length clips padded to a bucket max-T) from influencing
        valid frames; queries at padded positions still compute (static
        shapes), their outputs are discarded downstream."""
        H, D = self.num_heads, self.dim // self.num_heads
        if x.ndim == 4 and self.use_rope:
            # Temporal attention in (B, T, S, C) token layout: T is tiny (<=9
            # latent frames) while S is lane-sized, so attention runs as
            # einsums batched over (B, S, H) with S kept on the minor axis —
            # no (B*S, T, C) transpose materialization, and the softmax
            # reduces over a non-minor axis instead of XLA's pathologically
            # (8,128)-padded (T, T) tiles (~4.6 ms/site at 424p, docs/PERF.md).
            # Under SP the S axis stays sequence-sharded: the attention is
            # batched over S, so no collective is needed at all.
            B, T, S, C = x.shape
            qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                           kernel_init=xavier_uniform, name="qkv")(x)
            qkv = qkv.reshape(B, T, S, 3, H, D)
            q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
            if self.qk_norm:
                q = _rms_apply(q, _NormWeight(D, name="q_norm")())
                k = _rms_apply(k, _NormWeight(D, name="k_norm")())
            ang = rope_frequencies(D, T)
            cos = jnp.cos(ang).astype(q.dtype)[None, :, None, None, :]
            sin = jnp.sin(ang).astype(q.dtype)[None, :, None, None, :]
            q = q * cos + rotate_half_interleaved(q) * sin
            k = k * cos + rotate_half_interleaved(k) * sin
            q, k, v = (shard_hint(a, {2: SP_AXIS}) for a in (q, k, v))
            logits = jnp.einsum("btshd,bushd->bhtus", q, k,
                                preferred_element_type=jnp.float32) * D ** -0.5
            if kv_mask is not None:
                logits = jnp.where(kv_mask[:, None, None, :, None], logits,
                                   jnp.float32(-1e9))
            w = jax.nn.softmax(logits, axis=3).astype(v.dtype)
            out = jnp.einsum("bhtus,bushd->btshd", w, v).reshape(B, T, S, C)
            return nn.Dense(C, dtype=self.dtype, kernel_init=self.proj_init,
                            name="proj")(out)
        B, N, C = x.shape
        if not self.use_rope and _pad_heads():
            # Head-dim padding folded into the PROJECTION WEIGHTS
            # (MDV2_PAD_HEADS=1, experimental — docs/PERF.md r5): qkv projects
            # straight onto (H, 128)-lane-aligned heads so the attention
            # operands never take the misaligned (..., 72)-minor relayout
            # copies (~0.68 s/step of `copy` HLOs at 424p). The zero lanes
            # leave q.k and the value mix exact; the qk-norm rms over Dp-D
            # zeros inflates q,k by sqrt(Dp/D) each, compensated in the logit
            # scale. Param shapes change: qkv (C, 3*H*Dp), proj (H*Dp, C).
            Dp = -(-D // 128) * 128
            qkv = nn.Dense(3 * H * Dp, use_bias=self.qkv_bias, dtype=self.dtype,
                           kernel_init=xavier_uniform, name="qkv")(x)
            q, k, v = jnp.split(qkv.reshape(B, N, 3, H, Dp), 3, axis=2)
            q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
            scale = D ** -0.5
            if self.qk_norm:
                q = _rms_apply(q, jnp.pad(_NormWeight(D, name="q_norm")(),
                                          (0, Dp - D)))
                k = _rms_apply(k, jnp.pad(_NormWeight(D, name="k_norm")(),
                                          (0, Dp - D)))
                scale = scale * (D / Dp)
            q, k, v = (shard_hint(a, {2: SP_AXIS}) for a in (q, k, v))
            bias = None
            if kv_mask is not None:
                bias = jnp.where(kv_mask[:, None, None, :], 0.0,
                                 -1e9).astype(jnp.float32)
            out = dot_product_attention(q, k, v, scale=scale, bias=bias)
            out = out.reshape(B, N, H * Dp)
            return nn.Dense(C, dtype=self.dtype, kernel_init=self.proj_init,
                            name="proj")(out)
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="qkv")(x)
        qw = kw = None
        if self.qk_norm:
            qw = _NormWeight(D, name="q_norm")()
            kw = _NormWeight(D, name="k_norm")()
        if not self.use_rope and kv_mask is None and _use_fused_attention(N):
            # fused Pallas path: RMSNorm + attention straight off the qkv
            # projection, no head transposes (ops/flash_fused.py)
            out = fused_qkv_attention(qkv.reshape(B, N, 3, H, D), qw, kw, None,
                                      D ** -0.5)
            out = out.reshape(B, N, C)
            return nn.Dense(C, dtype=self.dtype, kernel_init=self.proj_init,
                            name="proj")(out)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, H, D), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        if self.qk_norm:
            q = _rms_apply(q, qw)
            k = _rms_apply(k, kw)
        if self.use_rope:
            q = apply_rope(q.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
            k = apply_rope(k.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
        # Ulysses under GSPMD: heads sharded over 'sp' inside attention; the surrounding
        # activations are sequence-sharded, so XLA materializes the head<->seq all-to-all
        # (replaces reference SeqParallelAttention, blocks.py:281-381).
        q, k, v = (shard_hint(a, {2: SP_AXIS}) for a in (q, k, v))
        bias = None
        if kv_mask is not None:
            bias = jnp.where(kv_mask[:, None, None, :], 0.0, -1e9).astype(jnp.float32)
        out = dot_product_attention(q, k, v, scale=D**-0.5, bias=bias)
        out = out.reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, kernel_init=self.proj_init, name="proj")(out)


class SharedKVAttention(nn.Module):
    """Self/cross attention sharing one qkv projection: q from x, kv from cond
    (reference MultiHeadAttention, blocks.py:384-514). Used for cross-view attention."""
    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, N, C = x.shape
        H, D = self.num_heads, self.dim // self.num_heads
        kernel = self.param("qkv_kernel", xavier_uniform, (C, 3 * C), jnp.float32)
        kernel = kernel.astype(self.dtype)
        if self.qkv_bias:
            bias = self.param("qkv_bias", zeros_init, (3 * C,), jnp.float32).astype(self.dtype)
        else:
            bias = jnp.zeros((3 * C,), self.dtype)
        if cond is None:
            cond = x
        Nc = cond.shape[1]
        q = (x @ kernel[:, :C] + bias[:C]).reshape(B, N, H, D)
        kv = (cond @ kernel[:, C:] + bias[C:]).reshape(B, Nc, 2, H, D)
        k, v = kv[:, :, 0], kv[:, :, 1]
        if self.qk_norm:
            q = RMSNorm(D, name="q_norm")(q)
            k = RMSNorm(D, name="k_norm")(k)
        q, k, v = (shard_hint(a, {2: SP_AXIS}) for a in (q, k, v))
        out = dot_product_attention(q, k, v, scale=D**-0.5)
        out = out.reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, kernel_init=xavier_uniform, name="proj")(out)


class CrossViewAttention(nn.Module):
    """Cross-view attention over static camera neighbors (reference cross_view_attn,
    MultiHeadAttention blocks.py:384-514 + the per-neighbor loop
    magicdrive_stdit3.py:303-332).

    Parameter layout matches SharedKVAttention (one shared qkv), but q/k/v are
    projected ONCE per camera and neighbors are gathered post-projection — the
    reference (and our earlier version) projected the duplicated per-neighbor
    tensors, doing ~2x the projection FLOPs.

    Attention runs as one call PER NEIGHBOR (not one call with neighbors folded
    into batch): folding n_nbr into batch pushed the fp32 logits over the
    chunked-attention threshold, turning this site into a fori_loop of
    dynamic-update-slices (~0.7 s/step of pure update traffic in the 424p device
    profile); per-neighbor calls keep each attention on the fast fused-XLA path.

    The reference sums per-neighbor `proj(attn_j)` outputs; since proj is linear
    this equals `proj(sum_j attn_j)` plus (n_nbr-1) extra bias terms — computed
    that way here to halve the output-projection FLOPs with identical numerics.
    """
    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_mv: jnp.ndarray, neighbors) -> jnp.ndarray:
        # x_mv: (B', NC, S, C); neighbors: static (NC, n_nbr) index array
        import numpy as np
        Bp, NC, S, C = x_mv.shape
        H, D = self.num_heads, self.dim // self.num_heads
        nbr = np.asarray(neighbors)
        n_nbr = nbr.shape[1]
        pad = _pad_heads() and D % 128 != 0
        Dp = -(-D // 128) * 128 if pad else D
        kernel = self.param("qkv_kernel", xavier_uniform, (C, 3 * H * Dp),
                            jnp.float32)
        kernel = kernel.astype(self.dtype)
        if self.qkv_bias:
            bias = self.param("qkv_bias", zeros_init, (3 * H * Dp,),
                              jnp.float32).astype(self.dtype)
        else:
            bias = jnp.zeros((3 * H * Dp,), self.dtype)
        qkv = (x_mv @ kernel + bias)
        qw = kw = None
        if self.qk_norm:
            qw = _NormWeight(D, name="q_norm")()
            kw = _NormWeight(D, name="k_norm")()
            if pad:
                qw, kw = (jnp.pad(w, (0, Dp - D)) for w in (qw, kw))
        scale = D ** -0.5 * ((D / Dp) if (pad and self.qk_norm) else 1.0)
        if _use_fused_attention(S) and not pad:
            # fused Pallas path: the neighbor gather becomes a static (n_nbr, G)
            # group permutation resolved in the kernel's index map — no k/v
            # copy, one kernel call for all neighbors (per-neighbor softmax,
            # summed in VMEM)
            qkv5 = qkv.reshape(Bp * NC, S, 3, H, D)
            base = np.arange(Bp)[:, None] * NC
            perm = tuple(tuple((base + nbr[None, :, j]).reshape(-1).tolist())
                         for j in range(n_nbr))
            out = fused_qkv_attention(qkv5, qw, kw, perm, D ** -0.5)
            out = out.reshape(Bp, NC, S, C)
        else:
            qkv6 = qkv.reshape(Bp, NC, S, 3, H, Dp)
            q, k, v = qkv6[..., 0, :, :], qkv6[..., 1, :, :], qkv6[..., 2, :, :]
            if self.qk_norm:
                q = _rms_apply(q, qw)
                k = _rms_apply(k, kw)
            # per-neighbor attention on gathered k/v, summed (per-neighbor
            # softmax). The neighbor gather is unrolled into static slices —
            # an advanced-index gather here lowers to an XLA while-loop of
            # dynamic-update-slices (~7.5 ms/block measured, docs/PERF.md).
            flat = (Bp * NC, S, H, Dp)
            q_f = q.reshape(flat)
            out = None
            for j in range(n_nbr):
                k_j = jnp.stack([k[:, int(i)] for i in nbr[:, j]],
                                axis=1).reshape(flat)
                v_j = jnp.stack([v[:, int(i)] for i in nbr[:, j]],
                                axis=1).reshape(flat)
                o = dot_product_attention(q_f, k_j, v_j, scale=scale)
                out = o if out is None else out + o
            out = out.reshape(Bp, NC, S, H * Dp)
        proj = nn.Dense(C, dtype=self.dtype, kernel_init=xavier_uniform, name="proj")
        c_in = out.shape[-1]  # H*Dp under MDV2_PAD_HEADS, else C
        out = proj(out)
        if n_nbr > 1:
            # the reference applies proj per neighbor, so its bias enters n_nbr
            # times; proj(zeros) == bias, which XLA folds to a constant
            out = out + (n_nbr - 1) * proj(jnp.zeros((1, 1, 1, c_in), out.dtype))
        return out  # (B', NC, S, C)


class CrossAttention(nn.Module):
    """PixArt-style condition cross-attention (reference MultiHeadCrossAttention,
    blocks.py:648-747).

    The reference packs variable-length conditions with xformers BlockDiagonalMask; here
    condition tokens are fixed-length with null-feature padding (TPU-friendly static
    shapes), so no mask is needed — padded box slots carry the learned null embedding.
    """
    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    proj_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        Nc = cond.shape[1]
        H, D = self.num_heads, self.dim // self.num_heads
        # MDV2_PAD_HEADS: heads padded to the 128-lane width inside the
        # projection weights (no qk-norm here, so zero lanes are exact)
        Dp = -(-D // 128) * 128 if (_pad_heads() and D % 128 != 0) else D
        q = nn.Dense(H * Dp, dtype=self.dtype, kernel_init=xavier_uniform,
                     name="q_linear")(x).reshape(B, N, H, Dp)
        kv = nn.Dense(2 * H * Dp, dtype=self.dtype, kernel_init=xavier_uniform,
                      name="kv_linear")(cond).reshape(B, Nc, 2, H, Dp)
        k, v = kv[:, :, 0], kv[:, :, 1]
        # conditions are replicated; split on heads over 'sp' (replaces reference
        # SeqParallelMultiHeadCrossAttention kv head-split, blocks.py:777-781)
        q, k, v = (shard_hint(a, {2: SP_AXIS}) for a in (q, k, v))
        out = dot_product_attention(q, k, v, scale=D**-0.5)
        out = out.reshape(B, N, H * Dp)
        return nn.Dense(C, dtype=self.dtype, kernel_init=self.proj_init, name="proj")(out)


class T2IFinalLayer(nn.Module):
    """Final adaLN projection (reference T2IFinalLayer, blocks.py:869-905)."""
    hidden_size: int
    num_patch: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 x_mask: Optional[jnp.ndarray] = None, t0: Optional[jnp.ndarray] = None,
                 T: Optional[int] = None, S: Optional[int] = None) -> jnp.ndarray:
        # x: (B, T*S, C); t: (B, C)
        table = self.param(
            "scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape, jnp.float32) / self.hidden_size**0.5,
            (2, self.hidden_size))
        table = table.astype(x.dtype)
        shift, scale = (table[None] + t[:, None]).swapaxes(0, 1)  # 2 x (B, C)
        normed = layer_norm_fp32(x)
        out = t2i_modulate(normed, shift[:, None, :], scale[:, None, :])
        if x_mask is not None:
            shift0, scale0 = (table[None] + t0[:, None]).swapaxes(0, 1)
            out0 = t2i_modulate(normed, shift0[:, None, :], scale0[:, None, :])
            out = t_mask_select(x_mask, out, out0, T, S)
        return nn.Dense(self.num_patch * self.out_channels, dtype=self.dtype,
                        kernel_init=xavier_uniform, name="linear")(out)


def t_mask_select(x_mask: jnp.ndarray, x: jnp.ndarray, masked_x: jnp.ndarray,
                  T: int, S: int) -> jnp.ndarray:
    """Frame-conditioned select (reference MultiViewSTDiT3Block.t_mask_select,
    magicdrive_stdit3.py:148-156). x/masked_x: (B, T*S, C), x_mask: (B, T) bool."""
    B, N, C = x.shape
    x4 = x.reshape(B, T, S, C)
    m4 = masked_x.reshape(B, T, S, C)
    out = jnp.where(x_mask[:, :, None, None], x4, m4)
    return out.reshape(B, N, C)


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG dropout (reference blocks.py:955-982).
    Unused by the MagicDrive configs; kept for layer-library parity."""
    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, labels: jnp.ndarray,
                 force_drop_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        use_cfg = self.dropout_prob > 0
        table = self.param("embedding_table", normal_02,
                           (self.num_classes + int(use_cfg), self.hidden_size))
        if force_drop_ids is not None:
            labels = jnp.where(force_drop_ids.astype(bool), self.num_classes, labels)
        return table[labels]


class FinalLayer(nn.Module):
    """Plain (non-adaLN) final projection (reference FinalLayer, blocks.py:851-866)."""
    hidden_size: int
    num_patch: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = layer_norm_fp32(x)
        return nn.Dense(self.num_patch * self.out_channels, dtype=self.dtype,
                        kernel_init=zeros_init, bias_init=zeros_init,
                        name="linear")(x)
