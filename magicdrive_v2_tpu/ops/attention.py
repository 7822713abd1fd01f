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
import os
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
    """(B, N, H, D) x (B, M, H, D) -> (B, N, H, D); softmax in fp32.

    head_dim zero-padding to a lane multiple (MDV2_ATTN_PAD=1, default OFF): tried as the
    (b, n, h, d) -> (b, h, d, n) operand relayouts XLA inserts run ~5x faster
    on a 128-aligned minor dim in theory, but measured SLOWER e2e (91 vs 75
    ms/spatial-block at 424p) — the pads cost more than the relayout saves. Zero
    columns change no numerics (q.k over zeros; extra v columns sliced off);
    MXU pads d internally either way."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    D = q.shape[-1]
    pad = (-D) % 128
    if pad and os.environ.get("MDV2_ATTN_PAD") == "1":
        widths = ((0, 0), (0, 0), (0, 0), (0, pad))
        q = jnp.pad(q, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", weights, v)
    return out[..., :D] if (pad and out.shape[-1] != D) else out


def chunked_xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          scale: Optional[float] = None,
                          max_logit_elems: int = 2**28) -> jnp.ndarray:
    """Exact attention with bounded logit memory: sequential map over (batch, query)
    chunks; every chunk sees the FULL key row so softmax needs no online accumulation
    (Rabe & Staats memory-efficient attention, arXiv:2112.05682 — the same role the
    reference's xformers memory_efficient_attention plays, blocks.py:252).

    XLA's fused einsum-softmax-einsum runs at ~3x our hand-written Pallas kernel for
    this model's head_dim=72 (measured on v5e; see docs/PERF.md), so long sequences
    are chunked XLA rather than a flash kernel. Chunk sizes are chosen so the fp32
    logits per step stay under max_logit_elems (default ~1 GB).
    """
    B, N, H, D = q.shape
    M = k.shape[1]
    if scale is None:
        scale = D ** -0.5
    # batch chunk first (keeps queries whole), then query chunk inside
    b_chunk = max(1, min(B, int(max_logit_elems // max(1, H * N * M))))
    per_b = H * M
    q_chunk = max(128, int(max_logit_elems // max(1, b_chunk * per_b)))
    q_chunk = min(q_chunk, N)
    nq = -(-N // q_chunk)
    pad_q = nq * q_chunk - N

    # STATIC python loop over batch chunks: k/v per chunk are plain slices
    # (views), where a fori_loop with lax.dynamic_slice forced a COPY of the
    # full k/v rows on every iteration (~47 GB of pure copy traffic per 848p
    # forward — most of its runtime). Only the q axis is chunked dynamically
    # inside, and q chunks are small.
    outs = []
    for b0 in range(0, B, b_chunk):
        b1 = min(b0 + b_chunk, B)
        q_b, k_b, v_b = q[b0:b1], k[b0:b1], v[b0:b1]
        if nq == 1:
            outs.append(xla_attention(q_b, k_b, v_b, scale=scale).astype(q.dtype))
            continue
        qp = jnp.pad(q_b, ((0, 0), (0, pad_q), (0, 0), (0, 0))) if pad_q else q_b

        def body(qi, out, k_b=k_b, v_b=v_b, qp=qp, nb_=b1 - b0):
            q_i = jax.lax.dynamic_slice(
                qp, (0, qi * q_chunk, 0, 0), (nb_, q_chunk, H, D))
            o = xla_attention(q_i, k_b, v_b, scale=scale).astype(out.dtype)
            return jax.lax.dynamic_update_slice(out, o, (0, qi * q_chunk, 0, 0))

        out_b = jax.lax.fori_loop(0, nq, body, jnp.zeros(qp.shape, q.dtype))
        outs.append(out_b[:, :N])
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def scan_chunked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           scale: Optional[float] = None,
                           q_chunk: int = 512) -> jnp.ndarray:
    """DIFFERENTIABLE q-chunked attention: lax.scan over query chunks with
    jax.checkpoint around each chunk, so the backward pass recomputes each
    chunk's logits instead of saving them — O(chunk) fp32-logit memory in
    forward AND backward.

    This is the training-path memory lever for big spatial shapes: at
    6x424x800x17f the fused-XLA spatial attention materializes ~3.5 GB of
    fp32 logits per site and its backward doubles that, which is what pushes
    the single-chip fwd+bwd HBM plan past 16 GB (docs/PERF.md). fori_loop
    (chunked_xla_attention) is not reverse-differentiable; scan is.
    """
    B, N, H, Dh = q.shape
    if scale is None:
        scale = Dh ** -0.5
    if N <= q_chunk:
        return xla_attention(q, k, v, scale=scale)
    nq = -(-N // q_chunk)
    pad = nq * q_chunk - N
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else q
    qs = jnp.moveaxis(qp.reshape(B, nq, q_chunk, H, Dh), 1, 0)


    @functools.partial(jax.checkpoint, prevent_cse=False)
    def chunk(qc, k, v):
        return xla_attention(qc, k, v, scale=scale).astype(q.dtype)

    def body(_, qc):
        return None, chunk(qc, k, v)

    _, outs = jax.lax.scan(body, None, qs)
    out = jnp.moveaxis(outs, 0, 1).reshape(B, nq * q_chunk, H, Dh)
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
    forced = os.environ.get("MDV2_ATTN_IMPL")
    if forced:
        impl = forced
    if impl == "auto":
        B, N, H, _ = q.shape
        M = k.shape[1]
        logit_elems = B * H * N * M
        # XLA's fused attention handles transient fp32 logits up to a few GB on a
        # 16 GB chip without chunking (424p spatial = 1.75e9 elems runs FASTER
        # unchunked: 5.9 vs 6.7 s/step e2e); chunk only beyond ~7 GB.
        # MDV2_TRAIN_CHUNK_ATTN=1: training mode — differentiable scan-chunked
        # attention once logits exceed ~1 GB, bounding fwd+bwd logit memory
        # (the fwd+bwd pair would otherwise double the transient).
        if (bias is None and logit_elems > 2 ** 28
                and os.environ.get("MDV2_TRAIN_CHUNK_ATTN") == "1"):
            impl = "scan-chunked"
        elif bias is None and logit_elems > 1.8e9:
            impl = "chunked"
        else:
            impl = "xla"
    if impl == "scan-chunked" and bias is None:
        return scan_chunked_attention(q, k, v, scale=scale)
    if impl == "chunked" and bias is None:
        return chunked_xla_attention(q, k, v, scale=scale)
    if impl == "pallas":
        if bias is not None:
            # the flash kernel takes no bias — masked attention (e.g. the
            # full-length pad mask) must NOT silently drop it (r4 self-review)
            return xla_attention(q, k, v, scale=scale, bias=bias)
        from .flash_attention import flash_attention
        try:
            return flash_attention(q, k, v, scale=scale)
        except Exception:  # pragma: no cover - fallback for unsupported shapes
            return xla_attention(q, k, v, scale=scale, bias=bias)
    return xla_attention(q, k, v, scale=scale, bias=bias)
