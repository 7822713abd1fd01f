import jax
import jax.numpy as jnp
import numpy as np

from magicdrive_v2_tpu.schedulers import RFLOW, add_noise, mean_flat, timestep_transform


def test_timestep_transform_formula():
    # new_t = r t / (1 + (r-1) t), r = sqrt(HW/512^2) * sqrt(frames)
    t = jnp.array([500.0])
    out = timestep_transform(t, height=jnp.array([512.0]), width=jnp.array([512.0]),
                             num_frames=jnp.array([1.0]), num_timesteps=1000)
    np.testing.assert_allclose(np.asarray(out), [500.0], rtol=1e-6)

    # cog style frames: T=17 -> 17//4 + 1 = 5
    h, w, T = 424.0, 800.0, 17.0
    r = np.sqrt(h * w / 512**2) * np.sqrt(17 // 4 + 17 % 2)
    tt = 0.5
    expect = r * tt / (1 + (r - 1) * tt) * 1000
    out = timestep_transform(jnp.array([500.0]), height=jnp.array([h]), width=jnp.array([w]),
                             num_frames=jnp.array([T]), num_timesteps=1000, cog_style=True)
    np.testing.assert_allclose(np.asarray(out), [expect], rtol=1e-5)


def test_timestep_transform_single_frame_rule():
    # num_frames == 1 forces the time ratio to 1 regardless of style
    for cog in (False, True):
        out = timestep_transform(
            jnp.array([300.0]), height=jnp.array([512.0]), width=jnp.array([512.0]),
            num_frames=jnp.array([1.0]), num_timesteps=1000, cog_style=cog)
        np.testing.assert_allclose(np.asarray(out), [300.0], rtol=1e-6)


def test_add_noise_endpoints(rng):
    x = jax.random.normal(rng, (2, 4, 3, 8, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    # t=0 -> x ; t=T -> eps
    np.testing.assert_allclose(np.asarray(add_noise(x, eps, jnp.zeros(2))), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(add_noise(x, eps, jnp.full(2, 1000.0))),
                               np.asarray(eps), atol=1e-6)
    mid = add_noise(x, eps, jnp.full(2, 250.0))
    np.testing.assert_allclose(np.asarray(mid), 0.75 * np.asarray(x) + 0.25 * np.asarray(eps),
                               atol=1e-6)


def test_mean_flat_mask():
    x = jnp.ones((2, 3, 4, 2, 2))  # b c t h w
    mask = jnp.array([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.float32)
    out = mean_flat(x, mask)
    np.testing.assert_allclose(np.asarray(out), [1.0, 1.0], atol=1e-6)

    x = x.at[:, :, 2:].set(100.0)
    out = mean_flat(x, mask)
    np.testing.assert_allclose(np.asarray(out), [1.0, (2 * 1 + 2 * 100) / 4], atol=1e-5)


def test_euler_sampler_integrates_constant_velocity():
    # with predict_fn returning constant v, z_final = z0 + v * sum(dt) = z0 + v * t0/T
    sched = RFLOW(num_sampling_steps=10, num_timesteps=1000, use_timestep_transform=False)
    z0 = jnp.ones((1, 2, 3, 4, 4))
    v = 2.0

    z = sched.sample(lambda z, t, m: jnp.full_like(z, v), z0,
                     height=jnp.array([64.0]), width=jnp.array([64.0]),
                     num_frames=jnp.array([3.0]))
    # timesteps are 1000, 900, ..., 100; dts sum to 1.0
    np.testing.assert_allclose(np.asarray(z), np.asarray(z0) + v * 1.0, rtol=1e-5)


def test_euler_sampler_recovers_data_for_exact_velocity(rng):
    # rectified flow: x_t = (1 - t/T) x0 + (t/T) eps, v* = x0 - eps
    # starting from z = eps and stepping with v* exactly reaches x0
    x0 = jax.random.normal(rng, (2, 4, 2, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    v_star = x0 - eps
    sched = RFLOW(num_sampling_steps=30, num_timesteps=1000)
    z = sched.sample(lambda z, t, m: v_star, eps,
                     height=jnp.array([64.0] * 2), width=jnp.array([64.0] * 2),
                     num_frames=jnp.array([2.0] * 2))
    np.testing.assert_allclose(np.asarray(z), np.asarray(x0), atol=1e-4)


def test_training_loss_zero_for_perfect_model(rng):
    sched = RFLOW(num_timesteps=1000)
    x = jax.random.normal(rng, (2, 4, 3, 4, 4))

    # capture the noise by monkeypatching through explicit args
    noise = jax.random.normal(jax.random.PRNGKey(7), x.shape)
    out = sched.training_losses(
        lambda x_t, t, m: x - noise, jax.random.PRNGKey(0), x,
        height=jnp.array([64.0] * 2), width=jnp.array([64.0] * 2),
        num_frames=jnp.array([3.0] * 2), noise=noise)
    np.testing.assert_allclose(np.asarray(out["loss"]), [0.0, 0.0], atol=1e-10)


def test_training_loss_frame_mask_pins_unmasked_frames(rng):
    sched = RFLOW(num_timesteps=1000)
    x = jax.random.normal(rng, (1, 4, 3, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(5), x.shape)
    mask = jnp.array([[1.0, 0.0, 1.0]])
    t = jnp.array([700.0])

    seen = {}

    def model(x_t, tt, m):
        seen["x_t"] = x_t
        return x - noise

    sched.training_losses(model, jax.random.PRNGKey(0), x,
                          height=jnp.array([64.0]), width=jnp.array([64.0]),
                          num_frames=jnp.array([3.0]), noise=noise, mask=mask, t=t)
    x_t = np.asarray(seen["x_t"])
    # frame 1 (mask=0) must be at t=0, i.e. equal to x
    np.testing.assert_allclose(x_t[:, :, 1], np.asarray(x)[:, :, 1], atol=1e-6)
    # frame 0 is the noised mixture
    expect = 0.3 * np.asarray(x)[:, :, 0] + 0.7 * np.asarray(noise)[:, :, 0]
    np.testing.assert_allclose(x_t[:, :, 0], expect, atol=1e-5)


def test_sample_t_range(rng):
    for method in ("uniform", "logit-normal"):
        sched = RFLOW(num_timesteps=1000, sample_method=method)
        t = sched.sample_t(rng, 512)
        assert float(t.min()) >= 0.0 and float(t.max()) <= 1000.0


def test_slice_aliases_actually_slice():
    """'-slice' registry aliases must set slice_cfg=True — previously the
    brushnet aliases mapped to the batched-CFG classes, so 848p + sp configs
    requesting sliced CFG silently doubled peak activations (advisor r4)."""
    from magicdrive_v2_tpu.schedulers.rf import build_scheduler

    for name in ("rflow-slice", "rflow-brushnet-slice",
                  "rflow-sdebrushnet-slice", "rflow-slice-repaint"):
        assert build_scheduler({"type": name}).slice_cfg, name
    for name in ("rflow", "rflow-brushnet", "rflow-sdebrushnet"):
        assert not build_scheduler({"type": name}).slice_cfg, name
