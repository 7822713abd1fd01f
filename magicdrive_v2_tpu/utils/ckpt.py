"""Checkpointing: orbax training state + torch<->flax weight conversion.

Two jobs (SURVEY.md §5 checkpoint/resume + §7 hard part 7):

1. Training checkpoints honoring the reference's resume contract (reference
   magicdrivedit/utils/ckpt_utils.py:159-386): per-step directory with model / ema /
   optimizer state, `running_states.json` (epoch / step / sampler state), and host RNG
   state — saved via orbax (sharded-aware under pjit, since arrays carry shardings).

2. Mechanical conversion between the reference's torch state_dict (e.g. `ema.pt` /
   model shards) and our flax param pytree. Our module tree was designed to mirror the
   reference's (stdit3.py docstring), so conversion is a name rewrite + layout
   transpose; the 28/13 block ModuleLists become nn.scan-stacked leaves
   (base_blocks_s.{0..12} -> ctrl_layers/base_s axis 0, .{13..27} -> plain_layers).

Layout rules (torch -> flax):
  Linear  weight (out, in)            -> kernel (in, out)
  Conv2d  weight (O, I, kh, kw)       -> kernel (kh, kw, I, O)
  Conv3d  weight (O, I, kt, kh, kw)   -> kernel (kt, kh, kw, I, O)
  buffers/tables (scale_shift_table, y_embedding, base_token, ...) unchanged.
Reference `pos_embed` / `rope` buffers are dropped (recomputed on the fly), matching
the reference's own `reparameter` load-time surgery (ckpt_utils.py:33-64).
"""
from __future__ import annotations

import json
import logging
import os
import pickle
import random as pyrandom
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["flax_path_to_torch_key", "convert_torch_state_dict",
           "export_torch_state_dict", "save_checkpoint", "load_checkpoint",
           "find_latest", "save_rng_state", "load_rng_state", "load_torch_file",
           "resolve_pretrained_dir"]


# ---------------------------------------------------------------------------
# torch <-> flax conversion
# ---------------------------------------------------------------------------

_NAME_REWRITES = [
    (re.compile(r"^t_block_1$"), "t_block.1"),
    (re.compile(r"^t_inpaint_block_1$"), "t_inpaint_block.1"),
    (re.compile(r"^t_combine_block_1$"), "t_combine_block.1"),
    (re.compile(r"^mlp_([02])$"), r"mlp.\1"),
    (re.compile(r"^second_linear_([024])$"), r"second_linear.\1"),
    (re.compile(r"^blocks_(\d+)$"), r"blocks.\1"),
    (re.compile(r"^conv_blocks_(\d+)$"), r"conv_blocks.\1"),
    (re.compile(r"^class_tokens$"), "_class_tokens"),
    (re.compile(r"^after_proj_layer$"), "after_proj"),
    (re.compile(r"^qkv_kernel$"), "qkv.weight"),
    (re.compile(r"^qkv_bias$"), "qkv.bias"),
    (re.compile(r"^kernel$"), "weight"),
    # CogVideoX VAE module tree (models/vae/cogvideox.py <-> diffusers naming)
    (re.compile(r"^down_blocks_(\d+)$"), r"down_blocks.\1"),
    (re.compile(r"^up_blocks_(\d+)$"), r"up_blocks.\1"),
    (re.compile(r"^resnets_(\d+)$"), r"resnets.\1"),
    (re.compile(r"^downsamplers_(\d+)$"), r"downsamplers.\1"),
    (re.compile(r"^upsamplers_(\d+)$"), r"upsamplers.\1"),
    (re.compile(r"^scale$"), "weight"),  # flax GroupNorm scale -> torch weight
]

# scanned layer containers: (flax name, torch list name template, index offset key)
_SCAN_SEGMENTS = {
    ("ctrl_layers", "base_s"): ("base_blocks_s", 0),
    ("ctrl_layers", "base_t"): ("base_blocks_t", 0),
    ("ctrl_layers", "control_s"): ("control_blocks_s", 0),
    ("ctrl_layers", "control_t"): ("control_blocks_t", 0),
    ("plain_layers", "base_s"): ("base_blocks_s", "control_depth"),
    ("plain_layers", "base_t"): ("base_blocks_t", "control_depth"),
    # BrushNet variants: base/control/brushnet blocks inside the brushnet scan
    # groups (reference magicdrive_stdit3.py:1323-1346,1691-1842)
    ("brush_ctrl_layers", "base_s"): ("base_blocks_s", 0),
    ("brush_ctrl_layers", "base_t"): ("base_blocks_t", 0),
    ("brush_ctrl_layers", "control_s"): ("control_blocks_s", 0),
    ("brush_ctrl_layers", "control_t"): ("control_blocks_t", 0),
    ("brush_ctrl_layers", "brushnet_s"): ("brushnet_blocks_s", 0),
    ("brush_ctrl_layers", "brushnet_t"): ("brushnet_blocks_t", 0),
    ("brush_plain_layers", "base_s"): ("base_blocks_s", "control_depth"),
    ("brush_plain_layers", "base_t"): ("base_blocks_t", "control_depth"),
    ("brush_plain_layers", "brushnet_s"): ("brushnet_blocks_s", "control_depth"),
    ("brush_plain_layers", "brushnet_t"): ("brushnet_blocks_t", "control_depth"),
}


def _rewrite_segment(seg: str) -> str:
    for pat, repl in _NAME_REWRITES:
        if pat.match(seg):
            return pat.sub(repl, seg)
    return seg


def flax_path_to_torch_key(path: Tuple[str, ...], control_depth: int = 13
                           ) -> Tuple[str, Optional[str]]:
    """Map a flax param path to (torch key, scan segment name or None).

    For scanned segments the torch key contains "{i}" to be filled per layer index.
    The temporal mini-transformer nesting ("temp") is flattened: the reference puts
    attn/mlp/scale_shift_table directly on the embedder (embedder.py:400-433).
    """
    parts = [p for p in path if p != "params"]
    scan = None
    if len(parts) >= 2 and (parts[0], parts[1]) in _SCAN_SEGMENTS:
        torch_list, offset = _SCAN_SEGMENTS[(parts[0], parts[1])]
        base = 0 if offset == 0 else control_depth
        scan = (torch_list, base)
        parts = [torch_list + ".{i}"] + parts[2:]
    parts = [p for p in parts if p != "temp"]
    parts = [_rewrite_segment(p) for p in parts]
    return ".".join(parts), scan


def _to_flax_layout(w: np.ndarray, flax_shape: Tuple[int, ...],
                    key: str) -> np.ndarray:
    """Apply the torch->flax layout transform determined by the key kind.

    Deterministic (no shape inference): square Dense kernels are ambiguous by
    shape alone, so the transform must come from the key name + rank.
    """
    w = np.asarray(w)
    kind = _leaf_kind(key, w)
    if kind == "dense":
        w = w.T
    elif kind == "conv2d":
        w = w.transpose(2, 3, 1, 0)
    elif kind == "conv3d":
        w = w.transpose(2, 3, 4, 1, 0)
    if w.shape == tuple(flax_shape):
        return w
    # rank mismatch via singleton kernel dims only: e.g. the reference
    # ShallowEncoder's temporal Conv3d with kernel (5, 1, 1) maps onto our 2D
    # time-axis conv — torch (5,1,1,4,4) vs flax (5,1,4,4). Safe exactly when
    # dropping size-1 axes leaves the SAME non-singleton dim sequence.
    if (w.size == int(np.prod(flax_shape))
            and [d for d in w.shape if d != 1]
            == [d for d in flax_shape if d != 1]):
        return w.reshape(flax_shape)
    # y_embedding resize rule (reference ckpt_utils.py:45-62): token_num mismatch
    if key.endswith("y_embedding") and w.ndim == 2 and w.shape[1] == flax_shape[1]:
        out = np.zeros(flax_shape, w.dtype)
        n = min(w.shape[0], flax_shape[0])
        out[:n] = w[:n]
        return out
    raise ValueError(
        f"cannot map torch {key} shape {np.asarray(w).shape} to flax {tuple(flax_shape)}")


def _from_flax_layout(w: np.ndarray, kind: str) -> np.ndarray:
    if kind == "dense":
        return np.asarray(w).T
    if kind == "conv2d":
        return np.asarray(w).transpose(3, 2, 0, 1)
    if kind == "conv3d":
        return np.asarray(w).transpose(4, 3, 0, 1, 2)
    return np.asarray(w)


def _leaf_kind(key: str, arr: np.ndarray) -> str:
    if not key.endswith("weight"):
        return "raw"
    if arr.ndim == 2:
        return "dense"
    if arr.ndim == 4:
        return "conv2d"
    if arr.ndim == 5:
        return "conv3d"
    return "raw"


def _iter_tree(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_tree(v, prefix + (k,))
    else:
        yield prefix, tree


def _set_path(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_torch_state_dict(torch_dict: Dict[str, np.ndarray], params: Any,
                             control_depth: int = 13, strict: bool = True) -> Any:
    """Fill our param pytree from a reference torch state_dict.

    `params` provides structure and leaf shapes (real arrays or ShapeDtypeStructs).
    Scanned leaves (leading axis == segment length) are assembled by stacking the
    reference's per-block tensors. Returns a new pytree of np arrays.
    """
    torch_dict = {k: v for k, v in torch_dict.items()
                  if not (k.startswith("pos_embed") or k.startswith("rope")
                          or ".rotary_emb." in k)}
    used = set()
    out: dict = {}
    missing: List[str] = []
    root = params.get("params", params) if isinstance(params, dict) else params
    wrapped = isinstance(params, dict) and "params" in params
    for path, leaf in _iter_tree(root):
        key, scan = flax_path_to_torch_key(path, control_depth)
        shape = tuple(leaf.shape)
        if scan is None:
            if key not in torch_dict:
                missing.append(key)
                continue
            used.add(key)
            arr = _to_flax_layout(torch_dict[key], shape, key)
        else:
            _, base = scan
            length = shape[0]
            per = []
            ok = True
            for i in range(length):
                k_i = key.format(i=base + i)
                if k_i not in torch_dict:
                    missing.append(k_i)
                    ok = False
                    break
                used.add(k_i)
                per.append(_to_flax_layout(torch_dict[k_i], shape[1:], k_i))
            if not ok:
                continue
            arr = np.stack(per)
        # leaf may be a real array or a jax.ShapeDtypeStruct (abstract init)
        _set_path(out, path, arr.astype(getattr(leaf, "dtype", None) or np.float32))
    unused = sorted(set(torch_dict) - used)
    if missing:
        msg = f"convert: {len(missing)} params missing from torch dict, e.g. {missing[:8]}"
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
    if unused:
        logger.info("convert: %d torch keys unused, e.g. %s", len(unused), unused[:8])
    return {"params": out} if wrapped else out


def export_torch_state_dict(params: Any, control_depth: int = 13
                            ) -> Dict[str, np.ndarray]:
    """Inverse of convert_torch_state_dict: our pytree -> reference-named torch-layout
    numpy dict (for interchange and round-trip testing)."""
    root = params.get("params", params) if isinstance(params, dict) else params
    out: Dict[str, np.ndarray] = {}
    for path, leaf in _iter_tree(root):
        key, scan = flax_path_to_torch_key(path, control_depth)
        arr = np.asarray(leaf)
        if scan is None:
            out[key] = _from_flax_layout(arr, _leaf_kind(key, arr))
        else:
            _, base = scan
            for i in range(arr.shape[0]):
                out[key.format(i=base + i)] = _from_flax_layout(
                    arr[i], _leaf_kind(key, arr[i]))
    return out


def resolve_pretrained_dir(path: str, subfolder: Optional[str] = None
                           ) -> Tuple[Optional[dict], Dict[str, np.ndarray]]:
    """Locate a LOCAL diffusers-format checkpoint (reference loads the CogVideoX
    VAE with AutoencoderKLCogVideoX.from_pretrained, vae_cogvideox.py:1326-1331).

    Accepts a directory (optionally with `subfolder`, e.g. "vae") containing
    `config.json` + `diffusion_pytorch_model.{safetensors,bin}`, or a direct
    weights file. Returns (config dict or None, numpy state dict). Hub repo ids
    are not fetchable in this offline build — pass a downloaded snapshot dir.
    """
    if os.path.isfile(path):
        return None, load_torch_file(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"pretrained path {path!r} is not a local file/dir (hub download is "
            "unavailable offline; pass a snapshot directory)")
    d = path
    if subfolder and os.path.isdir(os.path.join(d, subfolder)):
        d = os.path.join(d, subfolder)
    cfg = None
    cfg_path = os.path.join(d, "config.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
    for name in ("diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin", "model.safetensors",
                 "pytorch_model.bin"):
        p = os.path.join(d, name)
        if os.path.isfile(p):
            return cfg, load_torch_file(p)
    # sharded diffusers/transformers snapshot: merge every shard — loading
    # only shard 1 would silently yield a mostly-random model (round-3
    # advisor finding; convert_torch_state_dict only warns on missing keys)
    index = [f for f in sorted(os.listdir(d)) if f.endswith(".index.json")]
    if index:
        with open(os.path.join(d, index[0])) as f:
            weight_map = json.load(f)["weight_map"]
        merged: Dict[str, np.ndarray] = {}
        for shard in sorted(set(weight_map.values())):
            merged.update(load_torch_file(os.path.join(d, shard)))
        return cfg, merged
    cands = [f for f in sorted(os.listdir(d))
             if f.endswith((".safetensors", ".bin", ".pt", ".pth"))]
    if not cands:
        raise FileNotFoundError(f"no weights file under {d!r}")
    shard_re = re.compile(r"-\d{5}-of-(\d{5})\.")
    m = shard_re.search(cands[0])
    if m:
        n = int(m.group(1))
        shards = [f for f in cands if shard_re.search(f)]
        if len(shards) != n:
            raise FileNotFoundError(
                f"{d!r} holds {len(shards)} of {n} weight shards; snapshot "
                "is incomplete")
        merged = {}
        for shard in shards:
            merged.update(load_torch_file(os.path.join(d, shard)))
        return cfg, merged
    return cfg, load_torch_file(os.path.join(d, cands[0]))


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.pth/.safetensors file into numpy (reference
    ckpt_utils.load_checkpoint, :122-143)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


# ---------------------------------------------------------------------------
# training checkpoints (orbax)
# ---------------------------------------------------------------------------


def _ckpt_name(step: int) -> str:
    return f"global_step{step}"


def find_latest(ckpt_dir: str) -> Optional[str]:
    """Latest `global_step*` subdir (reference ckpt_utils.find_latest, :259-264)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"global_step(\d+)", name)
        if m and os.path.isdir(os.path.join(ckpt_dir, name)):
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return os.path.join(ckpt_dir, _ckpt_name(max(steps)))


def save_rng_state(path: str, extra: Optional[dict] = None):
    """Persist host-side RNG (reference RandomStateManager, ckpt_utils.py:271-386)."""
    state = {"python": pyrandom.getstate(), "numpy": np.random.get_state()}
    if extra:
        state.update(extra)
    with open(path, "wb") as f:
        pickle.dump(state, f)


def load_rng_state(path: str) -> dict:
    with open(path, "rb") as f:
        state = pickle.load(f)
    pyrandom.setstate(state["python"])
    np.random.set_state(state["numpy"])
    return state


def save_checkpoint(ckpt_dir: str, step: int, *, params: Any,
                    opt_state: Any = None, ema_params: Any = None,
                    running_states: Optional[dict] = None,
                    sampler_state: Optional[dict] = None,
                    save_rng: bool = True) -> str:
    """Write one resumable checkpoint directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, _ckpt_name(step)))
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, "model"), params, force=True)
    if ema_params is not None:
        ckptr.save(os.path.join(path, "ema"), ema_params, force=True)
    if opt_state is not None:
        ckptr.save(os.path.join(path, "optimizer"), opt_state, force=True)
    running = dict(running_states or {})
    running["step"] = step
    if sampler_state is not None:
        running["sampler"] = sampler_state
    # the orbax saves above are COLLECTIVE (all processes participate); the
    # host-side json/pickle files are written by process 0 only — concurrent
    # writers on a shared filesystem would race and could tear the files
    import jax as _jax
    if _jax.process_index() == 0:
        with open(os.path.join(path, "running_states.json"), "w") as f:
            json.dump(running, f, indent=2, default=str)
        if save_rng:
            save_rng_state(os.path.join(path, "rng_state.pkl"))
    logger.info("saved checkpoint: %s", path)
    return path


def load_checkpoint(path: str, *, params_like: Any = None, opt_state_like: Any = None,
                    load_ema: bool = False, restore_rng: bool = True) -> dict:
    """Restore a checkpoint directory written by save_checkpoint.

    `*_like` trees (with shardings, under pjit) guide orbax restoration; pass real
    abstract trees to restore sharded. Returns dict with params / ema / opt_state /
    running_states.

    NOTE: orbax restore runs cross-process barriers in a multi-process runtime;
    a single controller must not call this on a checkpoint the other controllers
    never touch (deadlock). The broadcast-free validation gather
    (train_magicdrive.py val_gather_mode=checkpoint) therefore restores in a
    clean single-process subprocess instead.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)  # orbax/tensorstore requires absolute paths
    out: dict = {}
    ckptr = ocp.PyTreeCheckpointer()

    def _restore(sub, like):
        target = os.path.join(path, sub)
        if not os.path.isdir(target):
            return None
        if like is not None:
            return ckptr.restore(target, item=like)
        return ckptr.restore(target)

    out["params"] = _restore("model", params_like)
    if load_ema:
        out["ema"] = _restore("ema", params_like)
    if opt_state_like is not None:
        out["opt_state"] = _restore("optimizer", opt_state_like)
    rs = os.path.join(path, "running_states.json")
    out["running_states"] = json.load(open(rs)) if os.path.isfile(rs) else {}
    rng = os.path.join(path, "rng_state.pkl")
    if restore_rng and os.path.isfile(rng):
        load_rng_state(rng)
    return out
