"""Unified attention entry point.

All attention paths in the framework (spatial self-attn, temporal self-attn, condition
cross-attn, cross-view attn) funnel through :func:`dot_product_attention`, replacing the
reference's flash-attn / xformers / npu_fusion_attention triple dispatch (reference
magicdrivedit/models/layers/blocks.py:226-267 and friends) with:

- ``impl="pallas"``: our Pallas TPU flash-attention kernel (ops/flash_attention.py);
- ``impl="xla"``: a fused-by-XLA einsum path with fp32 softmax (matches the reference's
  fp32-softmax numerics, blocks.py:256-265);
- ``impl="auto"``: pallas on TPU for long sequences, xla otherwise.

Layout convention is BNHD: (batch, seq, heads, head_dim).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_PALLAS_MIN_SEQ = 512


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  scale: Optional[float] = None,
                  bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B, N, H, D) x (B, M, H, D) -> (B, N, H, D); softmax in fp32."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", weights, v)


def chunked_xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          scale: Optional[float] = None,
                          q_chunk: int = 1024,
                          max_logit_elems: float = 2**28) -> jnp.ndarray:
    """Exact attention with O(N/chunks) logit memory: scan over query chunks, each
    chunk sees the FULL key row so softmax needs no online accumulation
    (Rabe & Staats memory-efficient attention, arXiv:2112.05682 — the same role the
    reference's xformers memory_efficient_attention plays, blocks.py:252).

    XLA's fused einsum-softmax-einsum runs at ~3x our hand-written Pallas kernel for
    this model's head_dim=72 (measured on v5e; see bench notes), so long sequences
    are chunked XLA rather than a flash kernel.
    """
    B, N, H, D = q.shape
    M = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    # also bound the per-chunk logits by splitting batch when B*H*q_chunk*M is big
    n_chunks = max(1, -(-N // q_chunk))
    pad = (-N) % n_chunks
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    qc = q.reshape(B, n_chunks, -1, H, D).transpose(1, 0, 2, 3, 4)

    def one(q_i):
        return xla_attention(q_i, k, v, scale=scale)

    out = jax.lax.map(one, qc)  # sequential over chunks
    out = out.transpose(1, 0, 2, 3, 4).reshape(B, -1, H, D)
    return out[:, :N]


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          scale: Optional[float] = None,
                          bias: Optional[jnp.ndarray] = None,
                          impl: str = "auto") -> jnp.ndarray:
    """Attention with BNHD layout. `bias` is broadcast to (B, H, N, M) if given.

    auto policy (measured on v5e, see bench.py notes): XLA fused attention while the
    fp32 logits stay small (<= ~1 GB), q-chunked XLA beyond that; our Pallas flash
    kernel via MDV2_ATTN_IMPL=pallas (slower at head_dim 72 but O(block) memory).
    """
    assert q.ndim == 4 and k.ndim == 4 and v.ndim == 4, (q.shape, k.shape, v.shape)
    import os
    forced = os.environ.get("MDV2_ATTN_IMPL")
    if forced:
        impl = forced
    if impl == "auto":
        B, N, H, _ = q.shape
        M = k.shape[1]
        logit_elems = B * H * N * M
        if bias is None and logit_elems > 2.7e8:  # ~1 GB fp32 logits
            impl = "chunked"
        else:
            impl = "xla"
    if impl == "chunked" and bias is None:
        return chunked_xla_attention(q, k, v, scale=scale)
    if impl == "pallas":
        from .flash_attention import flash_attention
        try:
            return flash_attention(q, k, v, scale=scale)
        except Exception:  # pragma: no cover - fallback for unsupported shapes
            return xla_attention(q, k, v, scale=scale, bias=bias)
    return xla_attention(q, k, v, scale=scale, bias=bias)
