"""FSDP-style parameter sharding over the 'dp' mesh axis.

Replaces the reference's ColossalAI ZeRO-2 plugin (reference acceleration/plugin.py,
patch/low_level_optim.py): instead of gradient/optimizer-state buckets with
reduce-scatter hooks, fp32 params (and therefore optax moments, which follow params'
shardings) are sharded over 'dp' with `NamedSharding`; XLA inserts all-gathers for the
forward and reduce-scatters for the gradients.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import DP_AXIS


def param_spec(shape, mesh: Mesh, axis_name: str = DP_AXIS,
               min_size: int = 2**18) -> P:
    """Shard the largest divisible axis of a parameter over `axis_name`; replicate
    small params."""
    if axis_name not in mesh.axis_names:
        return P()
    n = mesh.shape[axis_name]
    if n <= 1 or int(np.prod(shape)) < min_size:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % n == 0:
            spec = [None] * len(shape)
            spec[i] = axis_name
            return P(*spec)
    return P()


def fsdp_shardings(params, mesh: Mesh, axis_name: str = DP_AXIS):
    """NamedSharding pytree for params (and anything shaped like them)."""
    return jax.tree_util.tree_map(
        lambda p: NamedSharding(mesh, param_spec(p.shape, mesh, axis_name)), params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, axis_name: str = DP_AXIS):
    shardings = fsdp_shardings(params, mesh, axis_name)
    return jax.tree_util.tree_map(jax.device_put, params, shardings), shardings
