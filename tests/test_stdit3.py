import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdrive_v2_tpu.models.magicdrive.stdit3 import (
    MagicDriveSTDiT3,
    MagicDriveSTDiT3Config,
)

NC = 6


def tiny_config(**kw):
    defaults = dict(
        in_channels=4,
        patch_size=(1, 2, 2),
        hidden_size=32,
        depth=4,
        num_heads=4,
        pred_sigma=False,
        caption_channels=16,
        model_max_length=8,
        qk_norm=True,
        with_temp_block=True,
        control_depth=2,
        use_x_control_embedder=True,
        control_skip_cross_view=True,
        control_skip_temporal=False,
        micro_frame_size=None,
        map_embedder_downsample_rate=4.5,
        cam_encoder_cls="CamEmbedder",
        cam_encoder_param=(("input_dim", 3), ("num", 7), ("after_proj", True)),
        frame_emb_cls="CamEmbedderTemp",
        frame_emb_param=(("input_dim", 3), ("num", 4), ("after_proj", True),
                         ("num_heads", 4), ("qk_norm", True),
                         ("use_scale_shift_table", True),
                         ("time_downsample_factor", 4.5)),
        bbox_embedder_cls="ContinuousBBoxWithTextTempEmbedding",
        bbox_embedder_param=(("n_classes", 10), ("class_token_dim", 32),
                             ("proj_dims", (32, 16, 16, 32)), ("mode", "all-xyz"),
                             ("minmax_normalize", False), ("after_proj", True),
                             ("sample_id", True), ("num_heads", 4), ("qk_norm", True),
                             ("use_scale_shift_table", True),
                             ("time_downsample_factor", 4.5)),
        map_embedder_param=(("conditioning_size", (8, 40, 40)),
                            ("block_out_channels", (4, 8, 12, 16))),
        grad_checkpoint=False,
        dtype=jnp.float32,
    )
    defaults.update(kw)
    return MagicDriveSTDiT3Config(**defaults)


def tiny_inputs(rng, b=1, T_img=9, H=32, W=40, L_box=3, L_txt=8):
    ks = jax.random.split(rng, 8)
    T_lat, H_lat, W_lat = (T_img - 1) // 4 + 1, H // 8, W // 8
    x = jax.random.normal(ks[0], (b, 4 * NC, T_lat, H_lat, W_lat))
    timestep = jnp.full((b,), 500.0)
    y = jax.random.normal(ks[1], (b, 1, L_txt, 16))
    maps = jax.random.uniform(ks[2], (b, T_img, 8, 40, 40))
    bbox = {
        "bboxes": jax.random.normal(ks[3], (b * NC, T_img, L_box, 8, 3)),
        "classes": jnp.zeros((b * NC, T_img, L_box), jnp.int32),
        "masks": jnp.ones((b * NC, T_img, L_box), jnp.int32),
        "box_latent": jax.random.normal(ks[4], (b * NC, T_img, L_box, 32)),
    }
    cams = jax.random.normal(ks[5], (b * NC, T_img, 1, 3, 7))
    rel_pos = jax.random.normal(ks[6], (b * NC, T_img, 1, 4, 4))
    fps = jnp.full((b,), 12.0)
    return dict(x=x, timestep=timestep, y=y, maps=maps, bbox=bbox, cams=cams,
                rel_pos=rel_pos, fps=fps, height=float(H), width=float(W))


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_config()
    model = MagicDriveSTDiT3(cfg)
    inputs = tiny_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(42), **inputs)
    return model, params, inputs


def test_forward_shape_and_dtype(model_and_params):
    model, params, inputs = model_and_params
    out = model.apply(params, **inputs)
    assert out.shape == inputs["x"].shape
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_full_length_token_shape_forward():
    """Full-length smoke at the flagship temporal extent (VERDICT r3 item 3c):
    T_img=233 -> T'=59 latent frames (the reference's ~20 s scene anchor,
    README_OLD.md:218 / doc/FAQ.md full-length rows, 232f/T'=58 — ours is the
    nearest 8n+1 grid) at the REAL 224x400 spatial token grid (28x50 latents,
    patch 2 -> 350 tokens/frame). A scene valid to 225 frames padded to the
    233 bucket must leave valid-frame outputs bit-identical when pad-frame
    latents change — full-length generation is pad-exact at scale, not just
    at the 17-frame test shape."""
    cfg = tiny_config(depth=2, control_depth=1)
    model = MagicDriveSTDiT3(cfg)
    inputs = tiny_inputs(jax.random.PRNGKey(0), T_img=233, H=224, W=400,
                         L_box=2)
    fv = jnp.zeros((1, 233)).at[:, :225].set(1.0)
    params = model.init(jax.random.PRNGKey(1), **inputs, frame_valid=fv)
    fwd = jax.jit(lambda p, x: model.apply(
        p, **{**inputs, "x": x}, frame_valid=fv))
    out = fwd(params, inputs["x"])
    assert out.shape == (1, 4 * NC, 59, 28, 50)
    valid = np.asarray(out[:, :, :57])  # 225 pixel frames -> 57 latent frames
    assert np.isfinite(valid).all()
    x2 = inputs["x"].at[:, :, 57:].add(3.0)  # garbage on pad latent frames
    out2 = fwd(params, x2)
    np.testing.assert_array_equal(np.asarray(out2[:, :, :57]), valid)


@pytest.mark.heavy
def test_zero_init_gives_base_only_behavior(model_and_params):
    """With zero-init control/mva/temporal projections, the control branch and
    cross-view/temporal additions start as no-ops: changing the map must not change the
    output at init (reference zero-init contract, magicdrive_stdit3.py:789-825)."""
    model, params, inputs = model_and_params
    out1 = model.apply(params, **inputs)
    inputs2 = dict(inputs)
    inputs2["maps"] = inputs["maps"] * 0.0
    out2 = model.apply(params, **inputs2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


@pytest.mark.heavy
def test_x_mask_path(model_and_params):
    model, params, inputs = model_and_params
    T_lat = inputs["x"].shape[2]
    x_mask = jnp.ones((1, T_lat), bool).at[0, 0].set(False)
    out = model.apply(params, **inputs, x_mask=x_mask)
    assert out.shape == inputs["x"].shape
    # all-True mask must equal the no-mask path
    out_all = model.apply(params, **inputs, x_mask=jnp.ones((1, T_lat), bool))
    out_none = model.apply(params, **inputs)
    np.testing.assert_allclose(np.asarray(out_all), np.asarray(out_none), atol=1e-5)


@pytest.mark.heavy
def test_single_frame_image_mode():
    cfg = tiny_config()
    model = MagicDriveSTDiT3(cfg)
    inputs = tiny_inputs(jax.random.PRNGKey(1), T_img=1)
    params = model.init(jax.random.PRNGKey(2), **inputs)
    out = model.apply(params, **inputs)
    assert out.shape == inputs["x"].shape


@pytest.mark.heavy
def test_h_pad_for_sp():
    # force_pad_h_for_sp_size pads H so S % sp == 0 and output is still unpadded
    cfg = tiny_config(force_pad_h_for_sp_size=8)
    model = MagicDriveSTDiT3(cfg)
    inputs = tiny_inputs(jax.random.PRNGKey(1), H=24, W=40)  # latent 3x5, S=15 -> pad H
    params = model.init(jax.random.PRNGKey(2), **inputs)
    out = model.apply(params, **inputs)
    assert out.shape == inputs["x"].shape


def test_drop_cond_mask_nulls_conditions(model_and_params):
    model, params, inputs = model_and_params
    drop = jnp.zeros((1,))  # drop everything
    out_dropped = model.apply(params, **inputs, drop_cond_mask=drop,
                              drop_frame_mask=jnp.zeros((1, 9)))
    inputs2 = dict(inputs)
    inputs2["y"] = inputs["y"] * 3.0 + 1.0
    out_dropped2 = model.apply(params, **inputs2, drop_cond_mask=drop,
                               drop_frame_mask=jnp.zeros((1, 9)))
    # with captions dropped, y must not influence the output
    np.testing.assert_allclose(np.asarray(out_dropped), np.asarray(out_dropped2),
                               atol=1e-5)


@pytest.mark.heavy
def test_sequence_parallel_matches_single_device():
    """SURVEY.md §4(b): the Ulysses-equivalence contract — the model under a
    (dp=1, sp=4) mesh with GSPMD sequence sharding must reproduce the unsharded
    forward bit-for-bit up to reduction order."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _fast_init, _flagship_config
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import MagicDriveSTDiT3
    from magicdrive_v2_tpu.parallel.sharding import make_mesh, use_mesh
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch

    cfg = _flagship_config(tiny=True, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, grad_checkpoint=False)
    # latent 8x10 -> S=20 tokens, divisible by sp=4: no padding difference
    batch = synthetic_batch(cfg, num_frames=9, height=64, width=80, l_txt=8, b=1,
                            map_size=(8, 80, 80))
    h, w = batch.pop("height"), batch.pop("width")

    model_ref = MagicDriveSTDiT3(cfg)
    params = _fast_init(model_ref, {**batch, "height": h, "width": w})
    ref = model_ref.apply(params, **batch, height=h, width=w)

    cfg_sp = dataclasses.replace(cfg, enable_sequence_parallelism=True)
    model_sp = MagicDriveSTDiT3(cfg_sp)
    mesh = make_mesh(dp=1, sp=4)
    with use_mesh(mesh):
        out = jax.jit(lambda p, b: model_sp.apply(p, **b, height=h, width=w))(
            params, batch)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-4), \
        float(np.abs(np.asarray(out) - np.asarray(ref)).max())


def test_sp_actually_partitions_sequence():
    """VERDICT r1 weak #4: prove GSPMD *splits* the sequence dim over 'sp'
    (not replicate+all-gather, which is numerically identical but memory-useless):
    every residual-stream hint point must come out sharded PartitionSpec(..,'sp'),
    and the compiled program must contain all-to-all collectives (the Ulysses
    head<->sequence exchange, reference blocks.py:281-381)."""
    import dataclasses

    from __graft_entry__ import _fast_init, _flagship_config
    import magicdrive_v2_tpu.models.magicdrive.stdit3 as stdit3_mod
    from magicdrive_v2_tpu.parallel.sharding import make_mesh, use_mesh
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch

    cfg = _flagship_config(tiny=True, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, grad_checkpoint=False,
                              enable_sequence_parallelism=True)
    batch = synthetic_batch(cfg, num_frames=9, height=64, width=160, l_txt=8, b=1,
                            map_size=(8, 80, 80))
    h, w = batch.pop("height"), batch.pop("width")
    model = stdit3_mod.MagicDriveSTDiT3(cfg)
    params = _fast_init(model, {**batch, "height": h, "width": w})

    seen = []
    orig = stdit3_mod.shard_hint

    def spy(x, axes):
        out = orig(x, axes)
        if 2 in axes:  # sequence-dim hints
            jax.debug.inspect_array_sharding(out, callback=seen.append)
        return out

    mesh = make_mesh(dp=1, sp=4, devices=jax.devices()[:4])
    stdit3_mod.shard_hint = spy
    try:
        with use_mesh(mesh):
            fn = jax.jit(lambda p, b: model.apply(p, **b, height=h, width=w))
            compiled = fn.lower(params, batch).compile()
            fn(params, batch).block_until_ready()
    finally:
        stdit3_mod.shard_hint = orig

    assert len(seen) >= 4
    for s in seen:
        assert "sp" in str(s.spec[2]), f"sequence dim not sharded: {s}"
    hlo = compiled.as_text()
    assert hlo.count("all-to-all") > 0, "no Ulysses all-to-all in compiled program"


@pytest.mark.heavy
def test_sp_h_padding_path_matches_unsharded():
    """Grid-effect trap (reference doc/FAQ.md:169-185, magicdrive_stdit3.py:1090-1115):
    when S is NOT divisible by sp, H gets padded. The sharded run must equal an
    unsharded run of the same padded program (force_pad_h_for_sp_size), and the
    padded program must NOT equal the unpadded one (that difference is the grid
    effect simulate_sp_size exists to train through)."""
    import dataclasses

    from __graft_entry__ import _fast_init, _flagship_config
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import MagicDriveSTDiT3
    from magicdrive_v2_tpu.parallel.sharding import make_mesh, use_mesh
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch

    cfg = _flagship_config(tiny=True, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, grad_checkpoint=False)
    # pixel 48x80 -> latent 6x10 -> tokens 3x5: S=15, 15 % 4 != 0 -> pad H 3->4
    batch = synthetic_batch(cfg, num_frames=9, height=48, width=80, l_txt=8, b=1,
                            map_size=(8, 80, 80))
    h, w = batch.pop("height"), batch.pop("width")

    model_plain = MagicDriveSTDiT3(cfg)
    params = _fast_init(model_plain, {**batch, "height": h, "width": w})
    out_unpadded = model_plain.apply(params, **batch, height=h, width=w)

    cfg_pad = dataclasses.replace(cfg, force_pad_h_for_sp_size=4)
    out_padded_ref = MagicDriveSTDiT3(cfg_pad).apply(params, **batch,
                                                     height=h, width=w)

    cfg_sp = dataclasses.replace(cfg, enable_sequence_parallelism=True)
    model_sp = MagicDriveSTDiT3(cfg_sp)
    mesh = make_mesh(dp=1, sp=4, devices=jax.devices()[:4])
    with use_mesh(mesh):
        out_sp = jax.jit(lambda p, b: model_sp.apply(p, **b, height=h, width=w))(
            params, batch)

    # sharded pad path == unsharded pad path (numerical faithfulness)
    assert np.allclose(np.asarray(out_sp), np.asarray(out_padded_ref), atol=2e-4), \
        float(np.abs(np.asarray(out_sp) - np.asarray(out_padded_ref)).max())
    # ...and padding itself changes the function (the documented grid effect)
    assert not np.allclose(np.asarray(out_padded_ref), np.asarray(out_unpadded),
                           atol=1e-3)


def test_simulate_sp_pad_matches_forced_pad():
    """simulate_sp=N at train time must produce exactly the force_pad_h_for_sp_size=N
    program (reference simulate_sp_size, magicdrive_stdit3.py:1056-1089)."""
    import dataclasses

    from __graft_entry__ import _fast_init, _flagship_config
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import MagicDriveSTDiT3
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch

    cfg = _flagship_config(tiny=True, dtype=jnp.float32)
    cfg = dataclasses.replace(cfg, grad_checkpoint=False)
    batch = synthetic_batch(cfg, num_frames=9, height=48, width=80, l_txt=8, b=1,
                            map_size=(8, 80, 80))
    h, w = batch.pop("height"), batch.pop("width")
    model = MagicDriveSTDiT3(cfg)
    params = _fast_init(model, {**batch, "height": h, "width": w})

    out_simu = model.apply(params, **batch, height=h, width=w, simulate_sp=8)
    cfg_pad = dataclasses.replace(cfg, force_pad_h_for_sp_size=8)
    out_forced = MagicDriveSTDiT3(cfg_pad).apply(params, **batch, height=h, width=w)
    np.testing.assert_allclose(np.asarray(out_simu), np.asarray(out_forced),
                               atol=1e-6)


def test_offload_carry_remat_matches_full():
    """remat_policy="offload_carry" (per-layer carry residuals stashed in
    pinned_host — the single-chip lever for buckets whose full-remat plan
    exceeds HBM, reference --cpu-offload) must be a pure memory-placement
    change: loss AND grads identical to plain full remat."""
    import dataclasses

    cfg = tiny_config(grad_checkpoint=True)
    inputs = tiny_inputs(jax.random.PRNGKey(1))
    model_full = MagicDriveSTDiT3(cfg)
    params = model_full.init(jax.random.PRNGKey(7), **inputs)
    model_off = MagicDriveSTDiT3(
        dataclasses.replace(cfg, remat_policy="offload_carry"))

    def loss_fn(model):
        def f(p):
            return (model.apply(p, **inputs) ** 2).mean()
        return jax.jit(jax.value_and_grad(f))

    l_full, g_full = loss_fn(model_full)(params)
    l_off, g_off = loss_fn(model_off)(params)
    np.testing.assert_allclose(float(l_full), float(l_off), rtol=1e-6)
    flat_full = jax.tree_util.tree_leaves(g_full)
    flat_off = jax.tree_util.tree_leaves(g_off)
    for a, b in zip(flat_full, flat_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dots_remat_matches_full():
    """remat_policy="dots" (save matmul outputs; backward re-runs only cheap
    elementwise ops — the r4 train-MFU lever, docs/PERF.md) must be a pure
    rematerialization-schedule change: loss AND grads identical to full remat.
    Unknown policies fail loudly, not silently as 'full'."""
    import dataclasses

    cfg = tiny_config(grad_checkpoint=True)
    inputs = tiny_inputs(jax.random.PRNGKey(1))
    model_full = MagicDriveSTDiT3(cfg)
    params = model_full.init(jax.random.PRNGKey(7), **inputs)
    model_dots = MagicDriveSTDiT3(dataclasses.replace(cfg, remat_policy="dots"))

    def loss_fn(model):
        def f(p):
            return (model.apply(p, **inputs) ** 2).mean()
        return jax.jit(jax.value_and_grad(f))

    l_full, g_full = loss_fn(model_full)(params)
    l_dots, g_dots = loss_fn(model_dots)(params)
    np.testing.assert_allclose(float(l_full), float(l_dots), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_dots)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    bad = MagicDriveSTDiT3(dataclasses.replace(cfg, remat_policy="nonsense"))
    with pytest.raises(ValueError, match="remat_policy"):
        bad.init(jax.random.PRNGKey(0), **inputs)


def test_frame_valid_padding_matches_unpadded():
    """Full-length bucket padding (VERDICT r3 item 3, SURVEY §7 hard part 1):
    a clip with 9 valid pixel frames padded with RANDOM GARBAGE to T_img=17
    plus `frame_valid` must produce, on the valid latent frames, the same
    output as the unpadded forward — i.e. temporal attention and the temporal
    embedders leak nothing from the pad region. Pad content is random (not a
    last-frame repeat) so any leak fails loudly."""
    cfg = tiny_config()
    model = MagicDriveSTDiT3(cfg)
    full = tiny_inputs(jax.random.PRNGKey(3), T_img=17)
    params = model.init(jax.random.PRNGKey(42), **full)
    # activate every residual path: zero-init projections (temporal blocks,
    # control skips) would otherwise hide leaks from the no-mask guard below
    leaves, treedef = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
                  if jnp.issubdtype(l.dtype, jnp.floating) else l
                  for l, k in zip(leaves, ks)])
    t_v = 9
    tl_v = (t_v - 1) // 4 + 1  # 3 valid latent frames

    unpadded = dict(full)
    unpadded["x"] = full["x"][:, :, :tl_v]
    unpadded["maps"] = full["maps"][:, :t_v]
    unpadded["bbox"] = {k: v[:, :t_v] for k, v in full["bbox"].items()}
    unpadded["cams"] = full["cams"][:, :t_v]
    unpadded["rel_pos"] = full["rel_pos"][:, :t_v]
    out_ref = model.apply(params, **unpadded)

    fv = jnp.concatenate([jnp.ones((1, t_v)), jnp.zeros((1, 17 - t_v))], axis=1)
    out_pad = model.apply(params, **full, frame_valid=fv)
    assert out_pad.shape[2] == 5
    np.testing.assert_allclose(np.asarray(out_pad[:, :, :tl_v]),
                               np.asarray(out_ref), rtol=2e-4, atol=2e-4)
    # without frame_valid the garbage frames MUST leak (guards against the
    # test passing vacuously, e.g. if conditioning were accidentally ignored)
    out_nomask = model.apply(params, **full)
    assert not np.allclose(np.asarray(out_nomask[:, :, :tl_v]), np.asarray(out_ref),
                           rtol=2e-4, atol=2e-4)


@pytest.mark.heavy
def test_bf16_model_distinguishes_close_timesteps():
    """The sinusoidal timestep embedding must see the EXACT fp32 timestep: a
    bf16 cast before embedding quantizes t with spacing ~4 near 1000, making
    e.g. t=966.67 and t=968.0 condition identically (r4 self-review)."""
    cfg = tiny_config(dtype=jnp.bfloat16)
    model = MagicDriveSTDiT3(cfg)
    inputs = tiny_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), **inputs)

    def run(t):
        ins = {**inputs, "timestep": jnp.full_like(inputs["timestep"], t)}
        return np.asarray(model.apply(params, **ins))

    a, b = run(966.67), run(968.0)  # both round to bf16 968
    assert np.abs(a - b).max() > 0, \
        "timestep was quantized to bf16 before the sinusoidal embedding"
