"""Rectified-flow training and sampling.

JAX re-design of the reference scheduler stack (reference:
magicdrivedit/schedulers/rf/rectified_flow.py and rf/__init__.py). The Euler sampling
loop is a `lax.scan` over precomputed (timestep, dt) arrays, so the entire 30-step
denoise (including frame-mask re-noising logic) compiles to one XLA program.

The scheduler is purely numerical: it receives a ``predict_fn(z, t, x_mask) -> v`` that
already folds in conditioning and CFG. How CFG is realised (batched cond/uncond as in
"rflow", rf/__init__.py:96-105, vs. two sequential passes as in "rflow-slice",
rf/__init__.py:485-512) is the pipeline's choice; `slice_cfg` records the registered
variant so pipelines can honor config names.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..registry import SCHEDULERS


def mean_flat(tensor: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean over non-batch dims, optionally frame-masked (reference rectified_flow.py:12-24)."""
    if mask is None:
        return tensor.mean(axis=tuple(range(1, tensor.ndim)))
    assert tensor.ndim == 5 and tensor.shape[2] == mask.shape[1]
    b, c, t, h, w = tensor.shape
    flat = tensor.transpose(0, 2, 1, 3, 4).reshape(b, t, c * h * w)
    denom = mask.sum(axis=1) * flat.shape[-1]
    return (flat * mask[:, :, None]).sum(axis=(1, 2)) / denom


def timestep_transform(t: jnp.ndarray, *, height: jnp.ndarray, width: jnp.ndarray,
                       num_frames: jnp.ndarray, base_resolution: float = 512 * 512,
                       base_num_frames: float = 1.0, scale: float = 1.0,
                       num_timesteps: float = 1.0, cog_style: bool = False) -> jnp.ndarray:
    """Resolution/duration-dependent timestep shift (reference rectified_flow.py:42-77)."""
    height = jnp.asarray(height, jnp.float32)
    width = jnp.asarray(width, jnp.float32)
    num_frames = jnp.asarray(num_frames, jnp.float32)
    t = t / num_timesteps
    ratio_space = jnp.sqrt(height * width / base_resolution)
    if cog_style:
        frames = num_frames // 4 + num_frames % 2
    else:
        frames = num_frames // 17 * 5
    frames = jnp.where(num_frames == 1, jnp.ones_like(num_frames), frames)
    ratio_time = jnp.sqrt(frames / base_num_frames)
    ratio = ratio_space * ratio_time * scale
    new_t = ratio * t / (1 + (ratio - 1) * t)
    return new_t * num_timesteps


def add_noise(x: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray,
              num_timesteps: float = 1000.0) -> jnp.ndarray:
    """Linear interpolation x_t = (1 - t/T) x + (t/T) eps (reference
    rectified_flow.py:157-174; note `timepoints = 1 - t/T` multiplies x)."""
    timepoints = 1.0 - t.astype(jnp.float32) / num_timesteps
    timepoints = timepoints.reshape((-1,) + (1,) * (x.ndim - 1))
    return timepoints * x + (1 - timepoints) * noise


@SCHEDULERS.register_module("rflow")
@dataclasses.dataclass
class RFLOW:
    """Euler rectified-flow sampler + training loss (reference rf/__init__.py:13-118)."""

    num_sampling_steps: int = 10
    num_timesteps: int = 1000
    cfg_scale: float = 4.0
    use_discrete_timesteps: bool = False
    use_timestep_transform: bool = False
    transform_scale: float = 1.0
    cog_style_trans: bool = False
    sample_method: str = "uniform"
    loc: float = 0.0
    scale: float = 1.0
    slice_cfg: bool = False

    # ---------------- sampling ----------------

    def prepare_timesteps(self, batch: int, *, height, width, num_frames
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Return (timesteps, dts), each (num_steps, B)."""
        ts = [(1.0 - i / self.num_sampling_steps) * self.num_timesteps
              for i in range(self.num_sampling_steps)]
        if self.use_discrete_timesteps:
            ts = [int(round(t)) for t in ts]
        ts = jnp.asarray(ts, jnp.float32)[:, None] * jnp.ones((1, batch), jnp.float32)
        if self.use_timestep_transform:
            ts = timestep_transform(ts, height=height, width=width, num_frames=num_frames,
                                    scale=self.transform_scale,
                                    num_timesteps=self.num_timesteps,
                                    cog_style=self.cog_style_trans)
        dts = jnp.concatenate([ts[:-1] - ts[1:], ts[-1:]], axis=0) / self.num_timesteps
        return ts, dts

    def sample(self, predict_fn: Callable, z: jnp.ndarray, *, height, width, num_frames,
               mask: Optional[jnp.ndarray] = None,
               rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Run the Euler loop. predict_fn(z, t, x_mask) -> CFG-combined velocity.

        mask: per-latent-frame float mask (B, T'); frames with mask*T >= t are denoised,
        others pinned to the reference latents (reference rf/__init__.py:77-113).
        """
        B = z.shape[0]
        ts, dts = self.prepare_timesteps(B, height=height, width=width,
                                         num_frames=num_frames)
        if mask is None:
            def step(carry, inp):
                z = carry
                t, dt = inp
                v = predict_fn(z, t, None)
                return z + v * dt.reshape((-1,) + (1,) * (z.ndim - 1)), None

            z, _ = jax.lax.scan(step, z, (ts, dts))
            return z

        if rng is None:
            rng = jax.random.PRNGKey(0)
        keys = jax.random.split(rng, self.num_sampling_steps)
        noise_added0 = mask == 1

        def step(carry, inp):
            z, noise_added = carry
            t, dt, key = inp
            mask_t = mask * self.num_timesteps
            x0 = z
            x_noise = add_noise(x0, jax.random.normal(key, x0.shape, x0.dtype), t,
                                self.num_timesteps)
            mask_t_upper = mask_t >= t[:, None]
            mask_add_noise = mask_t_upper & (~noise_added)
            z = jnp.where(mask_add_noise[:, None, :, None, None], x_noise, x0)
            v = predict_fn(z, t, mask_t_upper)
            z_new = z + v * dt.reshape((-1,) + (1,) * (z.ndim - 1))
            z_new = jnp.where(mask_t_upper[:, None, :, None, None], z_new, x0)
            return (z_new, mask_t_upper), None

        (z, _), _ = jax.lax.scan(step, (z, noise_added0), (ts, dts, keys))
        return z

    # ---------------- training ----------------

    def sample_t(self, rng: jax.Array, batch: int, *, height=None, width=None,
                 num_frames=None) -> jnp.ndarray:
        """Sample training timesteps (reference RFlowScheduler.training_losses,
        rectified_flow.py:120-129)."""
        if self.use_discrete_timesteps:
            t = jax.random.randint(rng, (batch,), 0, self.num_timesteps).astype(jnp.float32)
        elif self.sample_method == "uniform":
            t = jax.random.uniform(rng, (batch,)) * self.num_timesteps
        elif self.sample_method == "logit-normal":
            t = jax.nn.sigmoid(
                jax.random.normal(rng, (batch,)) * self.scale + self.loc) * self.num_timesteps
        else:
            raise ValueError(self.sample_method)
        if self.use_timestep_transform:
            t = timestep_transform(t, height=height, width=width, num_frames=num_frames,
                                   scale=self.transform_scale,
                                   num_timesteps=self.num_timesteps,
                                   cog_style=self.cog_style_trans)
        return t

    def training_losses(self, model_fn: Callable, rng: jax.Array, x_start: jnp.ndarray,
                        *, height, width, num_frames,
                        mask: Optional[jnp.ndarray] = None,
                        noise: Optional[jnp.ndarray] = None,
                        t: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
        """Velocity-matching MSE (reference rectified_flow.py:114-155).

        model_fn(x_t, t, x_mask) -> velocity prediction (same shape as x_start).
        """
        t_key, n_key = jax.random.split(rng)
        if t is None:
            t = self.sample_t(t_key, x_start.shape[0], height=height, width=width,
                              num_frames=num_frames)
        if noise is None:
            noise = jax.random.normal(n_key, x_start.shape, x_start.dtype)
        x_t = add_noise(x_start, noise, t, self.num_timesteps)
        if mask is not None:
            t0 = jnp.zeros_like(t)
            x_t0 = add_noise(x_start, noise, t0, self.num_timesteps)
            x_t = jnp.where(mask[:, None, :, None, None], x_t, x_t0)
            velocity_pred = model_fn(x_t, t, mask)
        else:
            velocity_pred = model_fn(x_t, t, None)
        target = x_start - noise
        loss = mean_flat((velocity_pred.astype(jnp.float32) - target.astype(jnp.float32))**2,
                         mask=mask)
        return {"loss": loss, "t": t}


@SCHEDULERS.register_module("rflow-slice")
@dataclasses.dataclass
class RFLOW_SLICE(RFLOW):
    """Two-pass-CFG variant (reference rf/__init__.py:426-522). Numerics identical to
    RFLOW; pipelines use `slice_cfg=True` to run cond/uncond sequentially and halve peak
    activation memory."""
    slice_cfg: bool = True


@SCHEDULERS.register_module("rflow-brushnet")
@dataclasses.dataclass
class RFLOW_BRUSHNET(RFLOW):
    """BrushNet training/sampling (reference RFlowSchedulerBrushNet,
    rectified_flow.py:177-247; RFLOW_BRUSHNET rf/__init__.py:121-262). Inpaint inputs
    ride inside predict_fn/model_fn closures; at inference `inpaint_noise_scale`
    selects the fixed t_inpaint the pipeline feeds the SDE model."""
    inpaint_noise_scale: float = 0.0


@SCHEDULERS.register_module("rflow-sdebrushnet")
@dataclasses.dataclass
class RFLOW_SDEBRUSHNET(RFLOW_BRUSHNET):
    """SDE-BrushNet: independent inpaint timestep (reference
    RFlowSchedulerSDEBrushNet, rectified_flow.py:250-332)."""

    def training_losses(self, model_fn: Callable, rng: jax.Array,
                        x_start: jnp.ndarray, *, height, width, num_frames,
                        mask: Optional[jnp.ndarray] = None,
                        noise: Optional[jnp.ndarray] = None,
                        t: Optional[jnp.ndarray] = None,
                        t_inpaint: Optional[jnp.ndarray] = None
                        ) -> Dict[str, jnp.ndarray]:
        """model_fn(x_t, t, x_mask, t_inpaint) -> velocity; t_inpaint sampled
        independently of t (reference rectified_flow.py:279-290)."""
        t_key, ti_key, n_key = jax.random.split(rng, 3)
        b = x_start.shape[0]
        if t is None:
            t = self.sample_t(t_key, b, height=height, width=width,
                              num_frames=num_frames)
        if t_inpaint is None:
            t_inpaint = self.sample_t(ti_key, b, height=height, width=width,
                                      num_frames=num_frames)
        if noise is None:
            noise = jax.random.normal(n_key, x_start.shape, x_start.dtype)
        x_t = add_noise(x_start, noise, t, self.num_timesteps)
        if mask is not None:
            x_t0 = add_noise(x_start, noise, jnp.zeros_like(t), self.num_timesteps)
            x_t = jnp.where(mask[:, None, :, None, None], x_t, x_t0)
        velocity_pred = model_fn(x_t, t, mask, t_inpaint)
        target = x_start - noise
        loss = mean_flat(
            (velocity_pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
            mask=mask)
        return {"loss": loss, "t": t, "t_inpaint": t_inpaint}


@SCHEDULERS.register_module("rflow-brushnet-slice")
@dataclasses.dataclass
class RFLOW_BRUSHNET_SLICE(RFLOW_BRUSHNET):
    """Two-pass-CFG BrushNet (reference RFLOW_BRUSHNET_SLICE,
    rf/__init__.py:525-668): slice_cfg=True halves the 30-step scan's peak
    activations — the whole point at 848x1600 + sp (previously this alias
    silently ran batched CFG; advisor r4 finding)."""
    slice_cfg: bool = True


@SCHEDULERS.register_module("rflow-sdebrushnet-slice")
@dataclasses.dataclass
class RFLOW_SDEBRUSHNET_SLICE(RFLOW_SDEBRUSHNET):
    """Two-pass-CFG SDE-BrushNet (same slice contract as RFLOW_SLICE)."""
    slice_cfg: bool = True


@SCHEDULERS.register_module("rflow-slice-repaint")
@dataclasses.dataclass
class RFLOW_SLICE_REPAINT(RFLOW):
    """RePaint-style latent inpainting (reference rf/__init__.py:780-888): after each
    Euler step, while t >= ignore_mask_timestep*T, the masked (known) region is
    re-injected as reference latents noised to the NEXT timestep."""
    slice_cfg: bool = True
    ignore_mask_timestep: float = 0.0

    def sample_repaint(self, predict_fn: Callable, ref_z: jnp.ndarray,
                       mask: jnp.ndarray, *, height, width, num_frames,
                       rng: jax.Array,
                       ignore_mask_timestep: Optional[float] = None) -> jnp.ndarray:
        """mask: same shape as ref_z; 1 = known region pinned to (noised) reference.
        Initial z is fresh noise (reference :829-832)."""
        imt = (self.ignore_mask_timestep if ignore_mask_timestep is None
               else ignore_mask_timestep)
        B = ref_z.shape[0]
        ts, dts = self.prepare_timesteps(B, height=height, width=width,
                                         num_frames=num_frames)
        next_ts = jnp.concatenate([ts[1:], jnp.zeros_like(ts[-1:])], axis=0)
        z_key, rng = jax.random.split(rng)
        z0 = jax.random.normal(z_key, ref_z.shape, ref_z.dtype)
        keys = jax.random.split(rng, self.num_sampling_steps)
        x_mask_all = jnp.ones((B, ref_z.shape[2]), bool)

        def step(z, inp):
            t, dt, next_t, key = inp
            v = predict_fn(z, t, x_mask_all)
            z = z + v * dt.reshape((-1,) + (1,) * (z.ndim - 1))
            x_noise = add_noise(ref_z, jax.random.normal(key, ref_z.shape,
                                                         ref_z.dtype),
                                next_t, self.num_timesteps)
            reinject = (t[0] >= imt * self.num_timesteps)
            z_reinj = x_noise * mask + z * (1 - mask)
            z = jnp.where(reinject, z_reinj, z)
            return z, None

        z, _ = jax.lax.scan(step, z0, (ts, dts, next_ts, keys))
        return z


def build_scheduler(cfg: dict):
    cfg = dict(cfg)
    kind = cfg.pop("type")
    return SCHEDULERS.get(kind)(**cfg)
