import jax
import jax.numpy as jnp
import numpy as np

from magicdrive_v2_tpu.models.layers import blocks as B


def test_timestep_embedding_formula():
    t = jnp.array([0.0, 1.0, 10.0])
    emb = np.asarray(B.timestep_embedding(t, 8))
    half = 4
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    for bi, tv in enumerate([0.0, 1.0, 10.0]):
        np.testing.assert_allclose(emb[bi, :half], np.cos(tv * freqs), atol=1e-6)
        np.testing.assert_allclose(emb[bi, half:], np.sin(tv * freqs), atol=1e-6)


def test_pos_embedding_2d_layout():
    dim, h, w = 8, 3, 5
    emb = np.asarray(B.pos_embedding_2d(dim, h, w)).reshape(h, w, dim)
    half = dim // 2
    inv_freq = 1.0 / (10000 ** (np.arange(0, half, 2) / half))
    for i in range(h):
        for j in range(w):
            expect_w = np.concatenate([np.sin(j * inv_freq), np.cos(j * inv_freq)])
            expect_h = np.concatenate([np.sin(i * inv_freq), np.cos(i * inv_freq)])
            np.testing.assert_allclose(emb[i, j, :half], expect_w, atol=1e-6)
            np.testing.assert_allclose(emb[i, j, half:], expect_h, atol=1e-6)


def test_pos_embedding_base_size_scaling():
    # doubling resolution with base_size fixed keeps the embedding grid range
    e1 = np.asarray(B.pos_embedding_2d(8, 4, 4, base_size=4))
    e2 = np.asarray(B.pos_embedding_2d(8, 8, 8, base_size=4)).reshape(8, 8, 8)[::2, ::2]
    np.testing.assert_allclose(e1.reshape(4, 4, 8), e2, atol=1e-5)


def test_rmsnorm_matches_manual(rng):
    x = jax.random.normal(rng, (2, 5, 16)) * 3
    mod = B.RMSNorm(16)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = np.asarray(mod.apply(params, x))
    xn = np.asarray(x)
    expect = xn / np.sqrt((xn**2).mean(-1, keepdims=True) + 1e-6)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_layer_norm_fp32(rng):
    x = jax.random.normal(rng, (4, 7)) * 5 + 2
    out = np.asarray(B.layer_norm_fp32(x))
    assert np.allclose(out.mean(-1), 0, atol=1e-5)
    assert np.allclose(out.std(-1), 1, atol=1e-2)


def test_patch_embed_3d_shapes(rng):
    mod = B.PatchEmbed3D(patch_size=(1, 2, 2), embed_dim=32)
    x = jax.random.normal(rng, (2, 4, 3, 9, 10))  # H=9 needs padding to 10
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (2, 3 * 5 * 5, 32)


def test_self_attention_permutation_equivariance(rng):
    mod = B.SelfAttention(dim=32, num_heads=4, qk_norm=True)
    x = jax.random.normal(rng, (2, 6, 32))
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    perm = jnp.array([3, 1, 0, 2, 5, 4])
    out_p = mod.apply(params, x[:, perm])
    np.testing.assert_allclose(np.asarray(out[:, perm]), np.asarray(out_p), atol=1e-5)


def test_shared_kv_attention_self_equals_cond_x(rng):
    mod = B.SharedKVAttention(dim=32, num_heads=4)
    x = jax.random.normal(rng, (2, 6, 32))
    params = mod.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(mod.apply(params, x)), np.asarray(mod.apply(params, x, x)), atol=1e-6)


def test_cross_attention_shapes(rng):
    mod = B.CrossAttention(dim=32, num_heads=4)
    x = jax.random.normal(rng, (3, 10, 32))
    cond = jax.random.normal(jax.random.PRNGKey(1), (3, 7, 32))
    params = mod.init(jax.random.PRNGKey(0), x, cond)
    assert mod.apply(params, x, cond).shape == (3, 10, 32)


def test_caption_embedder_drop(rng):
    mod = B.CaptionEmbedder(in_channels=16, hidden_size=32, uncond_prob=0.1, token_num=5)
    y = jax.random.normal(rng, (2, 1, 5, 16))
    params = mod.init(jax.random.PRNGKey(0), y)
    out_keep = mod.apply(params, y, jnp.array([0, 0]))
    out_drop = mod.apply(params, y, jnp.array([1, 1]))
    # dropped entries equal the projected null embedding, independent of y
    out_drop2 = mod.apply(params, y * 100, jnp.array([1, 1]))
    np.testing.assert_allclose(np.asarray(out_drop), np.asarray(out_drop2), atol=1e-5)
    assert not np.allclose(np.asarray(out_keep), np.asarray(out_drop))


def test_t_mask_select():
    x = jnp.ones((1, 2 * 3, 4))
    m = jnp.zeros((1, 2 * 3, 4))
    x_mask = jnp.array([[True, False]])
    out = np.asarray(B.t_mask_select(x_mask, x, m, 2, 3)).reshape(1, 2, 3, 4)
    assert (out[:, 0] == 1).all() and (out[:, 1] == 0).all()


def test_t2i_final_layer(rng):
    mod = B.T2IFinalLayer(hidden_size=32, num_patch=4, out_channels=8)
    x = jax.random.normal(rng, (2, 6, 32))
    t = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    params = mod.init(jax.random.PRNGKey(0), x, t)
    assert mod.apply(params, x, t).shape == (2, 6, 32)
    # x_mask path
    x_mask = jnp.array([[True, False], [False, True]])
    t0 = jnp.zeros_like(t)
    out = mod.apply(params, x, t, x_mask, t0, 2, 3)
    assert out.shape == (2, 6, 32)


def test_size_embedder(rng):
    mod = B.SizeEmbedder(hidden_size=16)
    s = jnp.array([[12.0]])
    params = mod.init(jax.random.PRNGKey(0), s, 4)
    out = mod.apply(params, s, 4)
    assert out.shape == (4, 16)
    # all batch entries equal (broadcast from one fps value)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[3]), atol=1e-6)


def test_self_attention_pad_heads_numerics(rng, monkeypatch):
    """MDV2_PAD_HEADS=1 (head_dim padded to the 128-lane width inside the qkv/
    proj WEIGHTS, docs/PERF.md r5): padded output == unpadded output when the
    padded params embed the unpadded ones (zero lanes). Tolerance covers the
    rms-eps shift from averaging over the zero lanes."""
    dim, H = 64 * 4, 4  # D=64 -> Dp=128 per head
    x = jax.random.normal(rng, (2, 6, dim))
    mod = B.SelfAttention(dim=dim, num_heads=H, qk_norm=True)
    params = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(params, x)

    monkeypatch.setenv("MDV2_PAD_HEADS", "1")
    D, Dp = dim // H, 128
    p = params["params"]
    kq = np.asarray(p["qkv"]["kernel"]).reshape(dim, 3, H, D)
    kq_p = np.zeros((dim, 3, H, Dp), np.float32)
    kq_p[..., :D] = kq
    bq = np.asarray(p["qkv"]["bias"]).reshape(3, H, D)
    bq_p = np.zeros((3, H, Dp), np.float32)
    bq_p[..., :D] = bq
    kp = np.asarray(p["proj"]["kernel"]).reshape(H, D, dim)
    kp_p = np.zeros((H, Dp, dim), np.float32)
    kp_p[:, :D] = kp
    padded = {"params": {
        "qkv": {"kernel": jnp.asarray(kq_p.reshape(dim, 3 * H * Dp)),
                "bias": jnp.asarray(bq_p.reshape(3 * H * Dp))},
        "proj": {"kernel": jnp.asarray(kp_p.reshape(H * Dp, dim)),
                 "bias": p["proj"]["bias"]},
        "q_norm": p["q_norm"], "k_norm": p["k_norm"]}}
    got = mod.apply(padded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    # masked keys still excluded under padding
    mask = jnp.array([[True] * 4 + [False] * 2, [True] * 6])
    got_m = mod.apply(padded, x, kv_mask=mask)
    monkeypatch.delenv("MDV2_PAD_HEADS")
    want_m = mod.apply(params, x, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m), atol=2e-4)


def test_cross_view_and_cross_attention_pad_heads(rng, monkeypatch):
    """Padded-head variants of CrossViewAttention / CrossAttention match the
    unpadded modules when the padded params embed the unpadded ones."""
    dim, H = 128, 2  # D=64 -> Dp=128
    D, Dp = dim // H, 128
    nbr = ((1, 2), (2, 0), (0, 1))
    x_mv = jax.random.normal(rng, (2, 3, 5, dim))
    mod = B.CrossViewAttention(dim=dim, num_heads=H, qk_norm=True)
    params = mod.init(jax.random.PRNGKey(0), x_mv, nbr)
    want = mod.apply(params, x_mv, nbr)

    p = params["params"]
    kq = np.asarray(p["qkv_kernel"]).reshape(dim, 3, H, D)
    kq_p = np.zeros((dim, 3, H, Dp), np.float32)
    kq_p[..., :D] = kq
    bq = np.asarray(p["qkv_bias"]).reshape(3, H, D)
    bq_p = np.zeros((3, H, Dp), np.float32)
    bq_p[..., :D] = bq
    kp = np.asarray(p["proj"]["kernel"]).reshape(H, D, dim)
    kp_p = np.zeros((H, Dp, dim), np.float32)
    kp_p[:, :D] = kp
    padded = {"params": {
        "qkv_kernel": jnp.asarray(kq_p.reshape(dim, 3 * H * Dp)),
        "qkv_bias": jnp.asarray(bq_p.reshape(3 * H * Dp)),
        "proj": {"kernel": jnp.asarray(kp_p.reshape(H * Dp, dim)),
                 "bias": p["proj"]["bias"]},
        "q_norm": p["q_norm"], "k_norm": p["k_norm"]}}
    monkeypatch.setenv("MDV2_PAD_HEADS", "1")
    got = mod.apply(padded, x_mv, nbr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    # CrossAttention (no qk-norm: zero lanes exact)
    monkeypatch.delenv("MDV2_PAD_HEADS")
    ca = B.CrossAttention(dim=dim, num_heads=H)
    xq = jax.random.normal(rng, (2, 6, dim))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 4, dim))
    cparams = ca.init(jax.random.PRNGKey(0), xq, cond)
    cwant = ca.apply(cparams, xq, cond)
    cp = cparams["params"]
    kq = np.asarray(cp["q_linear"]["kernel"]).reshape(dim, H, D)
    kq_p = np.zeros((dim, H, Dp), np.float32)
    kq_p[..., :D] = kq
    bqq = np.asarray(cp["q_linear"]["bias"]).reshape(H, D)
    bq_p = np.zeros((H, Dp), np.float32)
    bq_p[..., :D] = bqq
    kkv = np.asarray(cp["kv_linear"]["kernel"]).reshape(dim, 2, H, D)
    kkv_p = np.zeros((dim, 2, H, Dp), np.float32)
    kkv_p[..., :D] = kkv
    bkv = np.asarray(cp["kv_linear"]["bias"]).reshape(2, H, D)
    bkv_p = np.zeros((2, H, Dp), np.float32)
    bkv_p[..., :D] = bkv
    kp = np.asarray(cp["proj"]["kernel"]).reshape(H, D, dim)
    kp_p = np.zeros((H, Dp, dim), np.float32)
    kp_p[:, :D] = kp
    cpadded = {"params": {
        "q_linear": {"kernel": jnp.asarray(kq_p.reshape(dim, H * Dp)),
                     "bias": jnp.asarray(bq_p.reshape(H * Dp))},
        "kv_linear": {"kernel": jnp.asarray(kkv_p.reshape(dim, 2 * H * Dp)),
                      "bias": jnp.asarray(bkv_p.reshape(2 * H * Dp))},
        "proj": {"kernel": jnp.asarray(kp_p.reshape(H * Dp, dim)),
                 "bias": cp["proj"]["bias"]}}}
    monkeypatch.setenv("MDV2_PAD_HEADS", "1")
    cgot = ca.apply(cpadded, xq, cond)
    np.testing.assert_allclose(np.asarray(cgot), np.asarray(cwant), atol=2e-5)
