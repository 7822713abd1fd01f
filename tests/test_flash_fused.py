"""Unit tests for the fused qkv attention kernel (ops/flash_fused.py).

Runs the Pallas kernel in interpret mode on CPU (MDV2_PALLAS_INTERPRET=1 set in
conftest-compatible fashion here) and checks it against the XLA composition,
including the cross-view group permutation and the custom_vjp backward.
"""
import os

os.environ.setdefault("MDV2_PALLAS_INTERPRET", "1")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdrive_v2_tpu.ops import flash_fused
from magicdrive_v2_tpu.ops.flash_fused import fused_qkv_attention, _xla_reference

G, N, H, D = 4, 40, 2, 8


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((G, N, 3, H, D)), jnp.float32)
    qw = jnp.asarray(rng.standard_normal((D,)) * 0.1 + 1.0, jnp.float32)
    kw = jnp.asarray(rng.standard_normal((D,)) * 0.1 + 1.0, jnp.float32)
    return qkv, qw, kw


def test_self_attention_with_norm(data):
    qkv, qw, kw = data
    a = flash_fused._fused_fwd_impl(qkv, qw, kw, None, D ** -0.5, 16, True)
    b = _xla_reference(qkv, qw, kw, None, D ** -0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_self_attention_no_norm(data):
    qkv, _, _ = data
    a = flash_fused._fused_fwd_impl(qkv, None, None, None, D ** -0.5, 64, False)
    b = _xla_reference(qkv, None, None, None, D ** -0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_kv_perm_matches_gather(data):
    qkv, qw, kw = data
    perm = np.roll(np.arange(G), 1).astype(np.int32)
    a = flash_fused._fused_fwd_impl(qkv, qw, kw, tuple(perm), D ** -0.5, 16, True)
    b = _xla_reference(qkv, qw, kw, perm, D ** -0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_uneven_q_blocks(data):
    """N not divisible by block_q exercises the padded trailing q block."""
    qkv, qw, kw = data
    a = flash_fused._fused_fwd_impl(qkv, qw, kw, None, D ** -0.5, 32, True)  # 40 = 32+8
    b = _xla_reference(qkv, qw, kw, None, D ** -0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_backward_matches_xla(data):
    qkv, qw, kw = data

    def loss_fused(qkv, qw, kw):
        return (fused_qkv_attention(qkv, qw, kw) ** 2).sum()

    def loss_ref(qkv, qw, kw):
        return (_xla_reference(qkv, qw, kw, None, D ** -0.5) ** 2).sum()

    ga = jax.grad(loss_fused, argnums=(0, 1, 2))(qkv, qw, kw)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2))(qkv, qw, kw)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-4, rtol=1e-3)


def test_cross_view_module_fused_matches_fallback():
    """CrossViewAttention wiring: fused (interpret) path == gather fallback."""
    from magicdrive_v2_tpu.models.layers import blocks as B

    nbr = ((2, 1), (0, 2), (1, 0))
    rng = np.random.default_rng(1)
    x_mv = jnp.asarray(rng.standard_normal((2, 3, 16, 16)), jnp.float32)
    mod = B.CrossViewAttention(dim=16, num_heads=2, qkv_bias=False, qk_norm=True,
                               dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x_mv, nbr)

    orig = B._use_fused_attention
    try:
        B._use_fused_attention = lambda n: True
        out_fused = mod.apply(params, x_mv, nbr)
        B._use_fused_attention = lambda n: False
        out_ref = mod.apply(params, x_mv, nbr)
    finally:
        B._use_fused_attention = orig
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)


def test_self_attention_module_fused_matches_fallback():
    from magicdrive_v2_tpu.models.layers import blocks as B

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 24, 16)), jnp.float32)
    mod = B.SelfAttention(dim=16, num_heads=2, qkv_bias=True, qk_norm=True,
                          dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    orig = B._use_fused_attention
    try:
        B._use_fused_attention = lambda n: True
        out_fused = mod.apply(params, x)
        B._use_fused_attention = lambda n: False
        out_ref = mod.apply(params, x)
    finally:
        B._use_fused_attention = orig
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=2e-5, rtol=1e-4)


def test_blocked_k_matches_full_row(data):
    """Online-softmax blocked-K path == full-row path (long-sequence kernel)."""
    qkv, qw, kw = data
    full = flash_fused._fused_fwd_impl(qkv, qw, kw, None, D ** -0.5, 16, True)
    blocked = flash_fused._fused_fwd_blocked(qkv, qw, kw, None, D ** -0.5,
                                             16, 16, True)  # 40 = 2x16 + 8
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(full),
                               atol=2e-5, rtol=1e-4)


def test_blocked_k_perm_two_sources(data):
    qkv, _, _ = data
    perm = np.stack([np.roll(np.arange(G), 1), np.roll(np.arange(G), -1)])
    blocked = flash_fused._fused_fwd_blocked(qkv, None, None,
                                             tuple(map(tuple, perm)),
                                             D ** -0.5, 16, 16, False)
    ref = _xla_reference(qkv, None, None, perm, D ** -0.5)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_hsplit_matches_full_row(data):
    """Head-split-grid blocked kernel == full-row path (4D output layout)."""
    qkv, qw, kw = data
    full = flash_fused._fused_fwd_impl(qkv, qw, kw, None, D ** -0.5, 16, True)
    hs = flash_fused._fused_fwd_blocked_hsplit(qkv, qw, kw, None, D ** -0.5,
                                               16, 16, True)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(full),
                               atol=2e-5, rtol=1e-4)


def test_hsplit_perm_two_sources(data):
    qkv, _, _ = data
    perm = np.stack([np.roll(np.arange(G), 1), np.roll(np.arange(G), -1)])
    hs = flash_fused._fused_fwd_blocked_hsplit(qkv, None, None,
                                               tuple(map(tuple, perm)),
                                               D ** -0.5, 16, 16, False)
    ref = _xla_reference(qkv, None, None, perm, D ** -0.5)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
