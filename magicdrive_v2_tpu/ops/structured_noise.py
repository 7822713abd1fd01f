"""Phase-preserving structured noise for the SDE-BrushNet inpaint branch.

The reference calls `generate_structured_noise_batch_vectorized` from the external
`structured-noise` pip package (reference magicdrive_stdit3.py:2070-2095, installed in
Dockerfile:97; source not vendored). Semantics reconstructed from its call site and
name: produce Gaussian-statistics noise whose LOW spatial frequencies carry the
structure (phase) of the guidance image while HIGH frequencies stay pure noise — a
smooth radial low-pass blend in 2D FFT space:

  out_hat(f) = M(|f|) * x_hat_unit(f) * |n_hat(f)| + (1 - M(|f|)) * n_hat(f)

where x_hat_unit keeps x's phase with the noise's magnitude (so the output keeps
white-noise marginal statistics), and M is a sigmoid mask with `cutoff_radius` and
`transition_width` in frequency-pixel units. Training jitters the cutoff:
r = r0 + Exp(0.1) (reference :2070-2076).

Runs fully in JAX (jnp.fft lowers to XLA FFT on TPU) — the reference pushes this to
CPU in chunks; no need here.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["generate_structured_noise", "sample_cutoff_radius"]


def _radial_mask(h: int, w: int, cutoff_radius: float,
                 transition_width: float) -> jnp.ndarray:
    fy = jnp.fft.fftfreq(h) * h
    fx = jnp.fft.fftfreq(w) * w
    r = jnp.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
    # 1 inside the cutoff, 0 outside, smooth sigmoid transition
    return jax.nn.sigmoid((cutoff_radius - r) / max(transition_width, 1e-6) * 4.0)


def generate_structured_noise(x: jnp.ndarray, rng: Optional[jax.Array] = None,
                              cutoff_radius: float = 4.0,
                              transition_width: float = 2.0,
                              input_noise: Optional[jnp.ndarray] = None
                              ) -> jnp.ndarray:
    """x: (..., H, W) structure guidance. Returns noise of the same shape whose
    low-frequency phase follows x."""
    if input_noise is None:
        assert rng is not None, "need rng or input_noise"
        input_noise = jax.random.normal(rng, x.shape, jnp.float32)
    h, w = x.shape[-2], x.shape[-1]
    mask = _radial_mask(h, w, cutoff_radius, transition_width)

    x_hat = jnp.fft.fft2(x.astype(jnp.float32))
    n_hat = jnp.fft.fft2(input_noise.astype(jnp.float32))
    x_phase = x_hat / (jnp.abs(x_hat) + 1e-8)
    blended = mask * x_phase * jnp.abs(n_hat) + (1.0 - mask) * n_hat
    out = jnp.fft.ifft2(blended).real
    # re-standardize per sample so downstream add_noise sees unit-variance noise
    axes = (-2, -1)
    mean = out.mean(axis=axes, keepdims=True)
    std = out.std(axis=axes, keepdims=True)
    return (out - mean) / (std + 1e-8)


def sample_cutoff_radius(rng: jax.Array, r0: float = 4.0,
                         lam: float = 0.1) -> jnp.ndarray:
    """Training-time jitter r = r0 + Exp(lam) (reference :2070-2076)."""
    u = jax.random.uniform(rng, (), minval=1e-8, maxval=1.0)
    return r0 + (-jnp.log(u) / lam)
