import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdrive_v2_tpu.ops.attention import xla_attention
from magicdrive_v2_tpu.ops.flash_attention import flash_attention
from magicdrive_v2_tpu.ops.rope import apply_rope, rope_frequencies


def naive_attention(q, k, v, scale):
    # independent reference implementation (numpy)
    q, k, v = np.asarray(q, np.float64), np.asarray(k, np.float64), np.asarray(v, np.float64)
    logits = np.einsum("bnhd,bmhd->bhnm", q, k) * scale
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bhnm,bmhd->bnhd", w, v)


def test_xla_attention_matches_naive(rng):
    q, k, v = jax.random.normal(rng, (3, 2, 17, 4, 8))
    out = xla_attention(q, k, v, scale=8**-0.5)
    ref = naive_attention(q, k, v, 8**-0.5)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_xla_attention_cross_shapes(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (2, 10, 4, 8))
    k = jax.random.normal(k2, (2, 33, 4, 8))
    v = jax.random.normal(k3, (2, 33, 4, 8))
    out = xla_attention(q, k, v)
    assert out.shape == (2, 10, 4, 8)
    np.testing.assert_allclose(np.asarray(out), naive_attention(q, k, v, 8**-0.5), atol=1e-5)


@pytest.mark.parametrize("n,m,d", [(256, 256, 64), (300, 300, 72), (128, 520, 64)])
def test_flash_attention_interpret(rng, n, m, d):
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (1, n, 2, d), jnp.float32)
    k = jax.random.normal(k2, (1, m, 2, d), jnp.float32)
    v = jax.random.normal(k3, (1, m, 2, d), jnp.float32)
    out = flash_attention(q, k, v, None, 128, 128)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_grad_matches_xla(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (1, 128, 2, 64))
    k = jax.random.normal(k2, (1, 128, 2, 64))
    v = jax.random.normal(k3, (1, 128, 2, 64))

    g1 = jax.grad(lambda q_: flash_attention(q_, k, v, None, 128, 128).sum())(q)
    g2 = jax.grad(lambda q_: xla_attention(q_, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)


def test_rope_frequencies_formula():
    d, n = 8, 5
    angles = np.asarray(rope_frequencies(d, n))
    # angle[p, 2i] = angle[p, 2i+1] = p / 10000^(2i/d)
    for p in range(n):
        for i in range(d // 2):
            expect = p / (10000 ** (2 * i / d))
            assert np.allclose(angles[p, 2 * i], expect, rtol=1e-6)
            assert np.allclose(angles[p, 2 * i + 1], expect, rtol=1e-6)


def test_rope_preserves_pair_norm(rng):
    x = jax.random.normal(rng, (2, 3, 16, 8))
    y = apply_rope(x)
    # rotation preserves the norm of each (2i, 2i+1) pair
    xp = np.asarray(x).reshape(2, 3, 16, 4, 2)
    yp = np.asarray(y).reshape(2, 3, 16, 4, 2)
    np.testing.assert_allclose(
        np.linalg.norm(xp, axis=-1), np.linalg.norm(yp, axis=-1), atol=1e-5)


def test_rope_position_zero_identity(rng):
    x = jax.random.normal(rng, (1, 4, 1, 8))  # seq axis (-2) length 1 => angle 0
    y = apply_rope(x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_rope_relative_property(rng):
    # <rope(q,m), rope(k,n)> depends only on m-n
    d = 16
    q = jax.random.normal(rng, (d,))
    k = jax.random.normal(jax.random.PRNGKey(1), (d,))

    def dot_at(m, n, span):
        qs = jnp.zeros((span, d)).at[m].set(q)
        ks = jnp.zeros((span, d)).at[n].set(k)
        rq, rk = apply_rope(qs), apply_rope(ks)
        return float(rq[m] @ rk[n])

    assert abs(dot_at(2, 5, 8) - dot_at(0, 3, 8)) < 1e-4
    assert abs(dot_at(7, 1, 8) - dot_at(6, 0, 8)) < 1e-4


def test_chunked_xla_attention_matches_full():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from magicdrive_v2_tpu.ops.attention import chunked_xla_attention, xla_attention

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, 300, 4, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 300, 4, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 300, 4, 16))
    ref = xla_attention(q, k, v)
    # small budget forces batch + query chunking, exercising the pad/slice paths
    out = chunked_xla_attention(q, k, v, max_logit_elems=4 * 128 * 300)
    assert out.shape == ref.shape
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # batch-only chunking path
    out2 = chunked_xla_attention(q, k, v, max_logit_elems=1 * 4 * 300 * 300)
    assert np.allclose(np.asarray(out2), np.asarray(ref), atol=1e-5)


def test_dot_product_attention_auto_dispatch():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from magicdrive_v2_tpu.ops.attention import dot_product_attention, xla_attention

    key = jax.random.PRNGKey(0)
    # large logits (B*H*N*M > 2.7e8) -> chunked path
    q = jax.random.normal(key, (8, 2048, 8, 8))
    out = dot_product_attention(q, q, q)
    ref = xla_attention(q[:1], q[:1], q[:1])
    assert np.allclose(np.asarray(out[:1]), np.asarray(ref), atol=1e-5)


def test_fused_adaln_matches_composition():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from magicdrive_v2_tpu.models.layers.blocks import layer_norm_fp32, t2i_modulate
    from magicdrive_v2_tpu.ops.fused_adaln import adaln_modulate

    key = jax.random.PRNGKey(0)
    # C=128 exercises the pallas kernel (interpret mode on CPU via conftest)
    x = jax.random.normal(key, (2, 300, 128), jnp.float32)
    shift = jax.random.normal(jax.random.PRNGKey(1), (2, 128))
    scale = jax.random.normal(jax.random.PRNGKey(2), (2, 128))
    out = adaln_modulate(x, shift, scale)
    ref = t2i_modulate(layer_norm_fp32(x), shift[:, None], scale[:, None])
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # fallback path (C not multiple of 128) agrees too
    x2 = jax.random.normal(key, (2, 17, 72), jnp.float32)
    s2 = jax.random.normal(key, (2, 72))
    out2 = adaln_modulate(x2, s2, s2)
    ref2 = t2i_modulate(layer_norm_fp32(x2), s2[:, None], s2[:, None])
    assert np.allclose(np.asarray(out2), np.asarray(ref2), atol=1e-5)


def test_scan_chunked_attention_fwd_and_grad():
    """Differentiable q-chunked attention == plain XLA attention, incl. grads
    (the 424p training-path memory lever; remat per chunk)."""
    import jax
    import jax.numpy as jnp
    from magicdrive_v2_tpu.ops.attention import (scan_chunked_attention,
                                                 xla_attention)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 70, 3, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 70, 3, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 70, 3, 8)), jnp.float32)

    a = scan_chunked_attention(q, k, v, q_chunk=16)  # 70 = 4*16 + 6 (padded)
    b = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)

    ga = jax.grad(lambda q, k, v: (scan_chunked_attention(
        q, k, v, q_chunk=16) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(lambda q, k, v: (xla_attention(q, k, v) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=2e-4, rtol=1e-4)
