import jax
import jax.numpy as jnp
import numpy as np

from magicdrive_v2_tpu.models.magicdrive import embedder as E


def test_fourier_embed_values():
    x = jnp.array([[0.5]])
    out = np.asarray(E.fourier_embed(x, 2))
    # [x, sin(x), cos(x), sin(2x), cos(2x)]
    np.testing.assert_allclose(
        out[0], [0.5, np.sin(0.5), np.cos(0.5), np.sin(1.0), np.cos(1.0)], atol=1e-6)
    assert E.fourier_out_dim(3, 4) == 27


def test_cog_temp_down():
    x = jnp.arange(5, dtype=jnp.float32).reshape(1, 5, 1, 1)
    out = np.asarray(E.cog_temp_down(x)).reshape(-1)
    # keep frame0; avg (1,2), (3,4)
    np.testing.assert_allclose(out, [0.0, 1.5, 3.5], atol=1e-6)
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 4, 1, 1)
    np.testing.assert_allclose(np.asarray(E.cog_temp_down(x)).reshape(-1), [0.5, 2.5],
                               atol=1e-6)


def test_bbox_embedder_null_mask_ignores_coords(rng):
    mod = E.ContinuousBBoxWithTextEmbedding(n_classes=10, class_token_dim=64,
                                            proj_dims=[64, 32, 32, 64], mode="all-xyz",
                                            minmax_normalize=False)
    B, N = 2, 3
    boxes = jax.random.normal(rng, (B, N, 8, 3))
    classes = jnp.zeros((B, N), jnp.int32)
    params = mod.init(jax.random.PRNGKey(0), boxes, classes)
    null0 = jnp.zeros((B, N))
    out1 = mod.apply(params, boxes, classes, null0, None)
    out2 = mod.apply(params, boxes * 100, classes, null0, None)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    assert out1.shape == (B, N, 64)


def test_bbox_embedder_sample_id(rng):
    mod = E.ContinuousBBoxWithTextEmbedding(n_classes=4, class_token_dim=32,
                                            proj_dims=[32, 16, 16, 32], mode="all-xyz",
                                            minmax_normalize=False, sample_id=True)
    B, N = 1, 2
    boxes = jax.random.normal(rng, (B, N, 8, 3))
    classes = jnp.zeros((B, N), jnp.int32)
    lat = jnp.zeros((B, N, 32))
    params = mod.init(jax.random.PRNGKey(0), boxes, classes, box_latent=lat)
    out = mod.apply(params, boxes, classes, box_latent=lat)
    out2 = mod.apply(params, boxes, classes, box_latent=lat + 1.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_temporal_bbox_embedder_downsamples(rng):
    mod = E.ContinuousBBoxWithTextTempEmbedding(
        n_classes=4, class_token_dim=32, proj_dims=[32, 16, 16, 32], mode="all-xyz",
        minmax_normalize=False, after_proj=True, num_heads=4,
        time_downsample_factor=4.5)
    B, T, N = 1, 17, 2
    boxes = jax.random.normal(rng, (B, T, N, 8, 3))
    classes = jnp.zeros((B, T, N), jnp.int32)
    params = mod.init(jax.random.PRNGKey(0), boxes, classes)
    out = mod.apply(params, boxes, classes)
    assert out.shape == (B, 5, N, 32)  # 17 -> 9 -> 5
    # zero-init final_proj => output starts at zero
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_cam_embedder_uncond(rng):
    mod = E.CamEmbedder(input_dim=3, out_dim=32, num=7, after_proj=False)
    cam = jax.random.normal(rng, (4, 3, 7))
    params = mod.init(jax.random.PRNGKey(0), cam)
    tok, emb = mod.apply(params, cam, jnp.array([1, 1, 0, 0]), method=mod.embed_cam)
    assert tok.shape == (4, 32)
    # masked-out entries use the shared uncond_cam token
    np.testing.assert_allclose(np.asarray(tok[2]), np.asarray(tok[3]), atol=1e-5)
    assert not np.allclose(np.asarray(tok[0]), np.asarray(tok[1]))


def test_cam_embedder_temp_shapes(rng):
    mod = E.CamEmbedderTemp(input_dim=3, out_dim=32, num=4, after_proj=True, num_heads=4,
                            time_downsample_factor=4.5)
    b, T, S = 2, 9, 1
    rel_pos = jax.random.normal(rng, (b * T * S, 4, 4))
    params = mod.init(jax.random.PRNGKey(0), rel_pos[:, :3],
                      method=lambda m, p: m.embed_cam(p, None, T=T, S=S))
    out, _ = mod.apply(params, rel_pos, None, T=T, S=S, method=mod.embed_cam)
    assert out.shape == (b, 3, S, 32)  # 9 -> 5 -> 3


def test_map_control_embedding_shape(rng):
    mod = E.MapControlEmbedding(conditioning_embedding_channels=64,
                                conditioning_size=(8, 400, 400),
                                block_out_channels=(4, 8, 12, 16))
    maps = jax.random.normal(rng, (1, 8, 400, 400))
    params = mod.init(jax.random.PRNGKey(0), maps)
    out = mod.apply(params, maps)
    # 400x400 -> 201x200 -> 102x100 -> 104x100 -> 53x100 (reference conv arithmetic)
    assert out.shape == (1, 64, 53, 100)


def test_map_temp_embedding_cog(rng):
    mod = E.MapControlTempEmbedding(hidden_size=16, time_downsample_factor=4.5)
    x = jax.random.normal(rng, (1, 8, 17, 6, 10))
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (1, 16, 5, 6, 10)


def test_causal_conv3d_is_causal(rng):
    mod = E.CausalConv3d(chan_out=4, kernel_size=(3, 3, 3), time_stride=1)
    x = jax.random.normal(rng, (1, 4, 6, 5, 5))
    params = mod.init(jax.random.PRNGKey(0), x)
    y1 = mod.apply(params, x)
    x2 = x.at[:, :, 4:].set(99.0)  # change the future
    y2 = mod.apply(params, x2)
    # frames 0..3 must be unaffected
    np.testing.assert_allclose(np.asarray(y1[:, :, :4]), np.asarray(y2[:, :, :4]),
                               atol=1e-5)
