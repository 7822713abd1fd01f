"""Functional LoRA: low-rank adapters as a separate param tree merged in weight space.

The reference monkey-patches nn.Linear.forward on the base blocks (reference
magicdrive_stdit3.py:1398-1464: lora_A (r, in) kaiming-init, lora_B (out, r) zero-init,
out += x @ A.T @ B.T * alpha/r). The idiomatic JAX equivalent is weight-space merging:

    W_eff = W + (A.T @ B.T) * alpha/r      (flax kernel layout (in, out))

applied by a pure tree-map inside the loss function, so gradients flow only to the
adapter tree while base weights stay frozen (optimizer masks handle trainability).
Merging before `apply` is mathematically identical to per-layer additive LoRA without
dropout; the reference trains with lora_dropout=0 in its configs.
"""
from __future__ import annotations

import math
import re
from typing import Any, Dict, List, Optional, Pattern, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["init_lora", "merge_lora", "lora_trainable_mask", "DEFAULT_LORA_TARGETS"]

# reference targets (:1398-1420): attn qkv/proj, cross_attn q/kv/proj, mlp fc1/fc2
# on base blocks only
DEFAULT_LORA_TARGETS = (
    r".*base_[st]/attn/qkv/kernel$",
    r".*base_[st]/attn/proj/kernel$",
    r".*base_[st]/cross_attn/q_linear/kernel$",
    r".*base_[st]/cross_attn/kv_linear/kernel$",
    r".*base_[st]/cross_attn/proj/kernel$",
    r".*base_[st]/mlp/fc1/kernel$",
    r".*base_[st]/mlp/fc2/kernel$",
)


def _path_str(path: Tuple) -> str:
    return "/".join(getattr(p, "key", str(p)) for p in path)


def _match(path_s: str, patterns: Sequence[Pattern]) -> bool:
    return any(p.match(path_s) for p in patterns)


def init_lora(params: Any, rank: int, rng: jax.Array,
              targets: Sequence[str] = DEFAULT_LORA_TARGETS) -> Dict:
    """Build the adapter tree: for each matched kernel leaf (possibly scan-stacked
    with a leading layer axis) create {"a": (..., r, in), "b": (..., out, r)} with
    kaiming-uniform a and zero b (reference init, :1439-1441)."""
    pats = [re.compile(p) for p in targets]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out: Dict = {}
    keys = jax.random.split(rng, len(flat))
    for (path, leaf), key in zip(flat, keys):
        ps = _path_str(path)
        if not _match(ps, pats):
            continue
        lead = leaf.shape[:-2]  # scan axes
        d_in, d_out = leaf.shape[-2], leaf.shape[-1]
        # torch kaiming_uniform_(a=sqrt(5)): gain=sqrt(2/(1+5)), bound =
        # gain*sqrt(3/fan_in) = 1/sqrt(fan_in) (NOT the a=0 sqrt(6/fan_in))
        bound = 1.0 / math.sqrt(d_in)
        a = jax.random.uniform(key, lead + (rank, d_in), jnp.float32, -bound, bound)
        b = jnp.zeros(lead + (d_out, rank), jnp.float32)
        node = out
        parts = ps.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = {"a": a, "b": b}
    return out


def merge_lora(params: Any, lora: Dict, alpha: float, rank: int) -> Any:
    """W_eff = W + (a^T b^T) * alpha/rank, batched over any leading scan axes."""
    scale = alpha / rank

    # descend only where the adapter tree has structure
    def rec(p_node, l_node):
        if isinstance(l_node, dict) and set(l_node.keys()) == {"a", "b"}:
            a, b = l_node["a"], l_node["b"]
            delta = jnp.einsum("...ri,...or->...io", a, b) * scale
            return p_node + delta.astype(p_node.dtype)
        if not isinstance(p_node, dict):
            return p_node
        return {k: rec(v, l_node.get(k)) if isinstance(l_node, dict) and k in l_node
                else v for k, v in p_node.items()}

    return rec(params, lora)


def lora_trainable_mask(params: Any, extra_trainable: Sequence[str] = ()) -> Any:
    """only_train_extra_blocks semantics (reference :1380-1395): freeze everything in
    the base tree except patterns in `extra_trainable` (brushnet blocks, shallow
    encoder, x_brushnet_embedder, t_inpaint/t_combine)."""
    pats = [re.compile(p) for p in extra_trainable]

    def mark(path, leaf):
        return _match(_path_str(path), pats)

    return jax.tree_util.tree_map_with_path(mark, params)


BRUSHNET_EXTRA_TRAINABLE = (
    r".*brushnet_[st]/.*",
    r".*shallow_encoder/.*",
    r".*x_brushnet_embedder/.*",
    r".*t_inpaint_block_1/.*",
    r".*t_combine_block_1/.*",
)
