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


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          scale: Optional[float] = None,
                          bias: Optional[jnp.ndarray] = None,
                          impl: str = "auto") -> jnp.ndarray:
    """Attention with BNHD layout. `bias` is broadcast to (B, H, N, M) if given."""
    assert q.ndim == 4 and k.ndim == 4 and v.ndim == 4, (q.shape, k.shape, v.shape)
    if impl == "auto":
        use_pallas = (
            _on_tpu()
            and bias is None
            and q.shape[1] >= _PALLAS_MIN_SEQ
            and q.shape[-1] in (64, 72, 96, 128)
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        from .flash_attention import flash_attention
        try:
            return flash_attention(q, k, v, scale=scale)
        except Exception:  # pragma: no cover - fallback for unsupported shapes
            return xla_attention(q, k, v, scale=scale, bias=bias)
    return xla_attention(q, k, v, scale=scale, bias=bias)
