"""Rotary position embedding.

Matches the semantics the reference gets from `rotary_embedding_torch.RotaryEmbedding
(dim=head_dim).rotate_queries_or_keys` (reference magicdrive_stdit3.py:505,588): theta=10000,
frequencies over even channel indices, *interleaved* pair rotation, positions = arange(N)
along the sequence axis (-2).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax.numpy as jnp


def rope_frequencies(dim: int, n: int, theta: float = 10000.0,
                     positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-position angles, shape (n, dim) with each frequency repeated twice
    (interleaved layout)."""
    freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    if positions is None:
        positions = jnp.arange(n, dtype=jnp.float32)
    angles = jnp.einsum("n,d->nd", positions.astype(jnp.float32), freqs)
    return jnp.repeat(angles, 2, axis=-1)  # (n, dim)


def rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    out = jnp.stack([-x2, x1], axis=-1)
    return out.reshape(x.shape)


def apply_rope(x: jnp.ndarray, positions: Optional[jnp.ndarray] = None,
               theta: float = 10000.0) -> jnp.ndarray:
    """Rotate the last dim of x over its sequence axis (-2). x: (..., N, D)."""
    n, d = x.shape[-2], x.shape[-1]
    angles = rope_frequencies(d, n, theta, positions)
    cos = jnp.cos(angles).astype(x.dtype)
    sin = jnp.sin(angles).astype(x.dtype)
    return x * cos + rotate_half_interleaved(x) * sin
