"""Pallas TPU flash attention.

Replaces the reference's CUDA flash-attn / xformers kernels (reference
magicdrivedit/models/layers/blocks.py:240-252) for the long-sequence attention paths
(spatial self-attn with S up to ~21k tokens, cross-view attn).

Design: grid = (batch*heads, q_blocks, k_blocks), online-softmax accumulation in fp32
VMEM scratch; k is the innermost (sequential) grid axis so the accumulator carries across
k blocks. Inputs in BNHD layout. Sequence lengths are padded to block multiples in the
wrapper and masked inside the kernel.

The backward pass is the standard rematerialization trick: `jax.custom_vjp` whose bwd
recomputes attention with the XLA path and differentiates it — numerically the gradient
of the same function, no extra residuals saved.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import xla_attention

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512

# Set MDV2_PALLAS_INTERPRET=1 to run the kernel in interpreter mode (CPU tests).
import os as _os
INTERPRET = _os.environ.get("MDV2_PALLAS_INTERPRET", "0") == "1"


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
               scale: float, kv_len: int, block_k: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, D)
    k = k_ref[0]  # (bk, D)
    v = v_ref[0]  # (bk, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s * scale
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, -jnp.inf)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _done():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_attention_fwd_impl(q, k, v, scale, block_q, block_k):
    B, N, H, D = q.shape
    M = k.shape[1]
    block_q = min(block_q, max(128, 1 << (N - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (M - 1).bit_length()))

    qt = _pad_to(q.transpose(0, 2, 1, 3).reshape(B * H, N, D), 1, block_q)
    kt = _pad_to(k.transpose(0, 2, 1, 3).reshape(B * H, M, D), 1, block_k)
    vt = _pad_to(v.transpose(0, 2, 1, 3).reshape(B * H, M, D), 1, block_k)
    Np, Mp = qt.shape[1], kt.shape[1]

    grid = (B * H, Np // block_q, Mp // block_k)
    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, kv_len=M, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, D), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(qt, kt, vt)
    return out[:, :N].reshape(B, H, N, D).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, scale: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K):
    """Flash attention, BNHD layout: (B, N, H, D) -> (B, N, H, D)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_attention_fwd_impl(q, k, v, scale, block_q, block_k)


def _fa_fwd(q, k, v, scale, block_q, block_k):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out = _flash_attention_fwd_impl(q, k, v, scale, block_q, block_k)
    return out, (q, k, v)


def _fa_bwd(scale, block_q, block_k, res, g):
    q, k, v = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    _, vjp = jax.vjp(lambda q_, k_, v_: xla_attention(q_, k_, v_, scale=scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
