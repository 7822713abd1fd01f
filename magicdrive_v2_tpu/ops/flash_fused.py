"""Fused qkv-direct attention kernel (Pallas TPU).

Motivation (424p device profile, docs/PERF.md): XLA's attention at this model's
head_dim=72 spends more time on operand LAYOUT than on math — two ~6.6 ms
transposes to reach the (B, H, D, N) logits layout per site, plus a separate
q/k RMSNorm pass, on top of ~8.5 ms of matmuls. This kernel removes all of it:

- consumes the qkv projection output directly as (G, N, 3, H, D) — no split, no
  head transpose, no separate RMSNorm pass (the per-head fp32 RMSNorm runs on
  the VMEM tile);
- softmax is exact full-row (k/v for one (group, head) fit VMEM at this model's
  sequence lengths — S=1350 at 424p, 5300 at 848p), so no online-softmax
  accumulator is needed;
- an optional static group permutation (`kv_perm`, via scalar prefetch) reads
  k/v from a DIFFERENT group than q — cross-view attention's neighbor gather
  (reference magicdrive_stdit3.py:303-332) becomes an index-map lookup instead
  of a gather copy of the whole k/v tensor.

Numerics match the XLA path: RMSNorm uses _rms_apply's exact cast points
(fp32 normalize -> compute-dtype round -> fp32 weight -> round back), logits
and softmax are fp32, p@v is compute-dtype with fp32 accumulation.

The backward pass rematerializes via the XLA attention composition
(jax.custom_vjp), like ops/flash_attention.py.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("MDV2_PALLAS_INTERPRET", "0") == "1"

DEFAULT_BLOCK_Q = 512
_EPS = 1e-6


def _rms_kernel(x, w):
    """In-kernel RMSNorm with the exact cast points of blocks._rms_apply: fp32
    normalize, round the normalized activation to the compute dtype, multiply
    by the fp32 weight, round back. Keeps fused and XLA paths bit-consistent."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + _EPS)
    return (w.astype(jnp.float32) * x32.astype(dtype).astype(jnp.float32)
            ).astype(dtype)


def _fused_fwd_impl(qkv, q_w, k_w, kv_perm, scale, block_q, use_norm):
    """qkv: (G, N, 3, H, D). kv_perm None | (G,) | (J, G) — 2D sums attention
    outputs over the J k/v sources (cross-view neighbors, per-source softmax).
    Returns (G, N, H, D)."""
    G, N, _, H, D = qkv.shape
    bq = min(block_q, N)
    nq = -(-N // bq)
    if q_w is None:
        q_w = jnp.ones((H, D), jnp.float32)
        k_w = jnp.ones((H, D), jnp.float32)
    else:
        q_w = jnp.broadcast_to(q_w.astype(jnp.float32), (H, D))
        k_w = jnp.broadcast_to(k_w.astype(jnp.float32), (H, D))
    if kv_perm is None:
        kv_perm = np.arange(G, dtype=np.int32)
    kv_perm = np.asarray(kv_perm, np.int32)
    if kv_perm.ndim == 1:
        kv_perm = kv_perm[None]
    J = kv_perm.shape[0]
    kv_perm = jnp.asarray(kv_perm)

    def kernel(perm_ref, q_op, k_op, v_op, qw_ref, kw_ref, o_ref):
        # one program = one (group, q-block, kv-source); ALL heads processed in
        # an unrolled loop so k/v stream into VMEM once per (group, source).
        # The output block is revisited across the innermost j axis and
        # accumulated (per-source softmax, outputs summed — reference
        # magicdrive_stdit3.py:303-332 semantics).
        del perm_ref
        j = pl.program_id(2)
        outs = []
        for h in range(H):
            q = q_op[0, :, 0, h, :]                       # (bq, D) compute dtype
            k = k_op[0, :, 0, h, :]                       # (N, D)
            v = v_op[0, :, 0, h, :]                       # (N, D) compute dtype
            if use_norm:
                # cast points match _rms_apply (blocks.py): fp32 normalize,
                # round to the compute dtype, fp32 weight multiply, round back
                q = _rms_kernel(q, qw_ref[h])
                k = _rms_kernel(k, kw_ref[h])
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            outs.append((o / l).astype(o_ref.dtype))
        # concat heads on the lane axis -> one (bq, H*D) store, which is also
        # the (.., C) layout the output projection consumes
        cat = jnp.concatenate(outs, axis=-1)
        if J == 1:
            o_ref[0] = cat
        else:
            @pl.when(j == 0)
            def _init():
                o_ref[0] = cat

            @pl.when(j > 0)
            def _acc():
                o_ref[0] += cat

    # qkv is passed three times with different BlockSpecs (same HBM buffer):
    # q rows blocked over qi; k/v full-sequence rows, group-permuted via the
    # scalar-prefetched kv_perm.
    grid = (G, nq, J)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, 1, H, D),
                             lambda g, qi, j, perm: (g, qi, 0, 0, 0)),
                pl.BlockSpec((1, N, 1, H, D),
                             lambda g, qi, j, perm: (perm[j, g], 0, 1, 0, 0)),
                pl.BlockSpec((1, N, 1, H, D),
                             lambda g, qi, j, perm: (perm[j, g], 0, 2, 0, 0)),
                pl.BlockSpec((H, D), lambda g, qi, j, perm: (0, 0)),
                pl.BlockSpec((H, D), lambda g, qi, j, perm: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, H * D),
                                   lambda g, qi, j, perm: (g, qi, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((G, N, H * D), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            # working set: k/v full-sequence tiles (double-buffered) + fp32
            # logits block; the 16 MB default scoped-vmem limit is too small
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(kv_perm, qkv, qkv, qkv, q_w, k_w)
    return out.reshape(G, N, H, D)


def _fused_fwd_blocked(qkv, q_w, k_w, kv_perm, scale, block_q, block_k,
                       use_norm):
    """Blocked-K online-softmax variant for long sequences (848p: S=5300 k/v
    rows no longer fit VMEM whole). Same operand contract as
    _fused_fwd_impl; grid adds an innermost k-block axis with fp32
    running-max/sum/accumulator scratch per head."""
    G, N, _, H, D = qkv.shape
    bq = min(block_q, N)
    nq = -(-N // bq)
    bk = min(block_k, N)
    nk = -(-N // bk)
    if q_w is None:
        q_w = jnp.ones((H, D), jnp.float32)
        k_w = jnp.ones((H, D), jnp.float32)
    else:
        q_w = jnp.broadcast_to(q_w.astype(jnp.float32), (H, D))
        k_w = jnp.broadcast_to(k_w.astype(jnp.float32), (H, D))
    if kv_perm is None:
        kv_perm = np.arange(G, dtype=np.int32)
    kv_perm = np.asarray(kv_perm, np.int32)
    if kv_perm.ndim == 1:
        kv_perm = kv_perm[None]
    J = kv_perm.shape[0]
    kv_perm = jnp.asarray(kv_perm)
    kv_len = N  # logical rows; the trailing k block may be partial

    def kernel(perm_ref, q_op, k_op, v_op, qw_ref, kw_ref, o_ref,
               acc_scr, m_scr, l_scr):
        j = pl.program_id(2)
        ki = pl.program_id(3)

        @pl.when(ki == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        # mask out-of-range rows of the trailing k block; v rows must be
        # zeroed too: p is 0 there, but 0 * garbage(=inf/nan) poisons p@v
        base = ki * bk
        col_ids = base + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        col_ok = col_ids < kv_len  # (1, bk)
        row_ok = (base + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
                  ) < kv_len  # (bk, 1)

        for h in range(H):
            q = q_op[0, :, 0, h, :]                       # (bq, D) compute dtype
            k = k_op[0, :, 0, h, :]                       # (bk, D)
            v = v_op[0, :, 0, h, :]                       # (bk, D)
            if use_norm:
                q = _rms_kernel(q, qw_ref[h])
                k = _rms_kernel(k, kw_ref[h])
            v = jnp.where(row_ok, v, jnp.zeros_like(v))
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(col_ok, s, -jnp.inf)
            m_prev = m_scr[h, :, :1]                       # (bq, 1)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = alpha * l_scr[h, :, :1] + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_scr[h] = acc_scr[h] * alpha + pv
            m_scr[h] = jnp.broadcast_to(m_new, m_scr.shape[1:])
            l_scr[h] = jnp.broadcast_to(l_new, l_scr.shape[1:])

        @pl.when(ki == nk - 1)
        def _done():
            outs = [(acc_scr[h] / l_scr[h, :, :1]).astype(o_ref.dtype)
                    for h in range(H)]
            cat = jnp.concatenate(outs, axis=-1)
            if J == 1:
                o_ref[0] = cat
            else:
                @pl.when(j == 0)
                def _first():
                    o_ref[0] = cat

                @pl.when(j > 0)
                def _acc():
                    o_ref[0] += cat

    grid = (G, nq, J, nk)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, 1, H, D),
                             lambda g, qi, j, ki, perm: (g, qi, 0, 0, 0)),
                pl.BlockSpec((1, bk, 1, H, D),
                             lambda g, qi, j, ki, perm: (perm[j, g], ki, 1, 0, 0)),
                pl.BlockSpec((1, bk, 1, H, D),
                             lambda g, qi, j, ki, perm: (perm[j, g], ki, 2, 0, 0)),
                pl.BlockSpec((H, D), lambda g, qi, j, ki, perm: (0, 0)),
                pl.BlockSpec((H, D), lambda g, qi, j, ki, perm: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, H * D),
                                   lambda g, qi, j, ki, perm: (g, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((H, bq, D), jnp.float32),
                pltpu.VMEM((H, bq, 128), jnp.float32),
                pltpu.VMEM((H, bq, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((G, N, H * D), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(kv_perm, qkv, qkv, qkv, q_w, k_w)
    return out.reshape(G, N, H, D)


def _fused_fwd_blocked_hsplit(qkv, q_w, k_w, kv_perm, scale, block_q, block_k,
                              use_norm):
    """Head-split-grid variant of the blocked-K online-softmax kernel.

    The unrolled-head kernel's floor is its 16-way head loop: a huge kernel
    body with 16 live online-softmax states (register spills) and small
    per-head matmuls interleaved with VPU softmax. Here the head is a GRID
    axis instead: each program handles one (group, q-block, head, source,
    k-block) with a single softmax state, so Mosaic pipelines k/v loads
    against compute across programs.

    Mosaic requires the last two block dims to be (divisible by 8, divisible
    by 128 or full), so the head axis cannot be blocked while second-minor —
    the operand is transposed to (G, H, 3, N, D) once outside the kernel
    (HBM-bandwidth cost, ~3 ms for the 848p site's 1.1 GB qkv vs the
    hundreds-of-ms attention) and the output comes back as (G, H, N, D);
    the caller's output projection contracts (H, D) jointly."""
    G, N, _, H, D = qkv.shape
    bq = min(block_q, N)
    nq = -(-N // bq)
    bk = min(block_k, N)
    nk = -(-N // bk)
    if q_w is None:
        q_w = jnp.ones((H, 1, D), jnp.float32)
        k_w = jnp.ones((H, 1, D), jnp.float32)
    else:
        q_w = jnp.broadcast_to(q_w.astype(jnp.float32), (H, D))[:, None]
        k_w = jnp.broadcast_to(k_w.astype(jnp.float32), (H, D))[:, None]
    if kv_perm is None:
        kv_perm = np.arange(G, dtype=np.int32)
    kv_perm = np.asarray(kv_perm, np.int32)
    if kv_perm.ndim == 1:
        kv_perm = kv_perm[None]
    J = kv_perm.shape[0]
    kv_perm = jnp.asarray(kv_perm)
    kv_len = N

    qkv_t = jnp.transpose(qkv, (0, 3, 2, 1, 4))  # (G, H, 3, N, D)

    def kernel(perm_ref, q_op, k_op, v_op, qw_ref, kw_ref, o_ref,
               acc_scr, m_scr, l_scr):
        j = pl.program_id(3)
        ki = pl.program_id(4)

        @pl.when(ki == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        base = ki * bk
        col_ok = (base + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
                  ) < kv_len
        row_ok = (base + jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
                  ) < kv_len

        q = q_op[0, 0, 0, :, :]                       # (bq, D) compute dtype
        k = k_op[0, 0, 0, :, :]                       # (bk, D)
        v = v_op[0, 0, 0, :, :]
        if use_norm:
            q = _rms_kernel(q, qw_ref[0, 0])
            k = _rms_kernel(k, kw_ref[0, 0])
        v = jnp.where(row_ok, v, jnp.zeros_like(v))
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(col_ok, s, -jnp.inf)
        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha + pv
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

        @pl.when(ki == nk - 1)
        def _done():
            res = (acc_scr[...] / l_scr[:, :1]).astype(o_ref.dtype)
            if J == 1:
                o_ref[0, 0] = res
            else:
                @pl.when(j == 0)
                def _first():
                    o_ref[0, 0] = res

                @pl.when(j > 0)
                def _acc():
                    o_ref[0, 0] += res

    grid = (G, nq, H, J, nk)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, 1, bq, D),
                             lambda g, qi, h, j, ki, perm: (g, h, 0, qi, 0)),
                pl.BlockSpec((1, 1, 1, bk, D),
                             lambda g, qi, h, j, ki, perm:
                             (perm[j, g], h, 1, ki, 0)),
                pl.BlockSpec((1, 1, 1, bk, D),
                             lambda g, qi, h, j, ki, perm:
                             (perm[j, g], h, 2, ki, 0)),
                pl.BlockSpec((1, 1, D), lambda g, qi, h, j, ki, perm: (h, 0, 0)),
                pl.BlockSpec((1, 1, D), lambda g, qi, h, j, ki, perm: (h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, D),
                                   lambda g, qi, h, j, ki, perm:
                                   (g, h, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, D), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((G, H, N, D), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary",
                                 "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(kv_perm, qkv_t, qkv_t, qkv_t, q_w, k_w)
    return jnp.transpose(out, (0, 2, 1, 3))  # (G, N, H, D) API contract


def _xla_reference(qkv, q_w, k_w, kv_perm, scale):
    """Composition-of-XLA-ops reference; used off-TPU and as the vjp target."""
    q = qkv[:, :, 0]
    k = qkv[:, :, 1]
    v = qkv[:, :, 2]
    if q_w is not None:
        def rms(x, w):
            x32 = x.astype(jnp.float32)
            x32 = x32 * jax.lax.rsqrt(
                jnp.mean(x32 * x32, axis=-1, keepdims=True) + _EPS)
            return (x32 * w.astype(jnp.float32)).astype(x.dtype)
        q = rms(q, q_w)
        k = rms(k, k_w)
    def attend(k, v):
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * scale
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", w, v)

    if kv_perm is None:
        return attend(k, v)
    perm = np.asarray(kv_perm)
    if perm.ndim == 1:
        perm = perm[None]
    out = None
    for j in range(perm.shape[0]):
        o = attend(k[jnp.asarray(perm[j])], v[jnp.asarray(perm[j])])
        out = o if out is None else out + o
    return out


# full k/v rows stream whole into VMEM below this length; blocked-K online
# softmax beyond (848p S=5300 needs ~228 MB for full rows vs 128 MB VMEM).
# Env-overridable for dispatch experiments (e.g. force the head-split blocked
# kernel at the 424p S=1350 shape: MDV2_FUSED_ATTN=1 MDV2_FULL_ROW_MAX_N=1024)
FULL_ROW_MAX_N = int(os.environ.get("MDV2_FULL_ROW_MAX_N", "2048"))
DEFAULT_BLOCK_K = 1024
# the blocked path unrolls all 16 heads with live online-softmax state; at
# block_q=512 Mosaic spills ~100 MB of registers to scoped VMEM, so it runs
# with a smaller q block than the full-row path
BLOCKED_BLOCK_Q = 256
# single-head programs have one softmax state -> large q blocks fit
HSPLIT_BLOCK_Q = int(os.environ.get("MDV2_HSPLIT_BQ", "512"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_qkv_attention(qkv: jnp.ndarray,
                        q_norm_weight: Optional[jnp.ndarray],
                        k_norm_weight: Optional[jnp.ndarray],
                        kv_perm=None,
                        scale: Optional[float] = None,
                        block_q: int = DEFAULT_BLOCK_Q) -> jnp.ndarray:
    """Attention straight off the fused qkv projection.

    qkv: (G, N, 3, H, D); q/k_norm_weight: (D,) per-head RMSNorm weights or
    None (both or neither); kv_perm: static (G,) or (n_nbr, G) int sequence,
    k/v are read from group kv_perm[j][g] (cross-view neighbors; 2D sums the
    per-source attention outputs) — None for self-attention.
    Returns (G, N, H, D). Dispatch: exact full-row softmax while k/v rows fit
    VMEM (N <= FULL_ROW_MAX_N), blocked-K online softmax beyond.
    """
    if scale is None:
        scale = qkv.shape[-1] ** -0.5
    on_tpu = INTERPRET or jax.devices()[0].platform == "tpu"
    if not on_tpu:
        return _xla_reference(qkv, q_norm_weight, k_norm_weight, kv_perm, scale)
    use_norm = q_norm_weight is not None
    if qkv.shape[1] > FULL_ROW_MAX_N:
        # head-split grid by default (single-softmax-state programs pipeline
        # far better than the 16-way unrolled head loop; see docs/PERF.md);
        # MDV2_BLOCKED_IMPL=unrolled restores the r2 kernel
        if os.environ.get("MDV2_BLOCKED_IMPL", "hsplit") == "hsplit":
            return _fused_fwd_blocked_hsplit(
                qkv, q_norm_weight, k_norm_weight, kv_perm, scale,
                HSPLIT_BLOCK_Q, DEFAULT_BLOCK_K, use_norm)
        return _fused_fwd_blocked(qkv, q_norm_weight, k_norm_weight, kv_perm,
                                  scale, min(block_q, BLOCKED_BLOCK_Q),
                                  DEFAULT_BLOCK_K, use_norm)
    return _fused_fwd_impl(qkv, q_norm_weight, k_norm_weight, kv_perm, scale,
                           block_q, use_norm=use_norm)


def _fwd(qkv, q_w, k_w, kv_perm, scale, block_q):
    out = fused_qkv_attention(qkv, q_w, k_w, kv_perm, scale, block_q)
    return out, (qkv, q_w, k_w)


def _bwd(kv_perm, scale, block_q, res, g):
    qkv, q_w, k_w = res
    if scale is None:
        scale = qkv.shape[-1] ** -0.5
    if q_w is not None:
        f = lambda a, b, c: _xla_reference(a, b, c, kv_perm, scale)
        _, vjp = jax.vjp(f, qkv, q_w, k_w)
        return vjp(g)
    f = lambda a: _xla_reference(a, None, None, kv_perm, scale)
    _, vjp = jax.vjp(f, qkv)
    return vjp(g) + (None, None)


fused_qkv_attention.defvjp(_fwd, _bwd)
