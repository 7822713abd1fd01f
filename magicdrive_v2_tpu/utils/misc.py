"""Runtime utilities (reference: magicdrivedit/utils/misc.py)."""
from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_WARNED = set()


def enable_compile_cache(root: Optional[str] = None) -> None:
    """Turn on JAX's persistent compilation cache for this process.

    Called by every entry app: TPU compiles go through the remote relay
    (10-25 min for the full XL/2 graph), and on CI the CPU smoke apps
    recompile identical tiny programs per subprocess. Cache dirs are split by
    backend (.jaxcache TPU / .jaxcache_cpu CPU — entries are keyed by HLO +
    flags so they'd never collide, but separate dirs keep them prunable).
    MDV2_JAXCACHE_DIR overrides; MDV2_JAXCACHE_DIR="" disables."""
    import os
    override = os.environ.get("MDV2_JAXCACHE_DIR")
    if override == "":
        return
    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    cpu = jax.default_backend() == "cpu"
    path = override or os.path.join(root, ".jaxcache_cpu" if cpu else ".jaxcache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # older jax without the knob: cache is best-effort
        pass


def warn_once(msg: str):
    if msg not in _WARNED:
        _WARNED.add(msg)
        logging.warning(msg)


def to_jnp_dtype(name) -> jnp.dtype:
    """Map the reference's dtype strings (mm-style) to jnp dtypes."""
    if not isinstance(name, str):
        return name
    return {
        "fp32": jnp.float32, "float32": jnp.float32,
        "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
        "fp16": jnp.float16, "half": jnp.float16, "float16": jnp.float16,
    }[name]


def format_numel_str(numel: int) -> str:
    B, M, K = 1024**3, 1024**2, 1024
    if numel >= B:
        return f"{numel / B:.2f} B"
    if numel >= M:
        return f"{numel / M:.2f} M"
    if numel >= K:
        return f"{numel / K:.2f} K"
    return str(numel)


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "shape"))


class Timer:
    """Device-synchronized timer (reference `Timer` cuda-syncs; here we drain
    the device with a tiny blocking round-trip — `effects_barrier` alone only
    waits on ORDERED side-effects, not pending async pure computations)."""

    def __init__(self, name: str, log: bool = False, coordinator=None):
        self.name = name
        self.log = log
        self.elapsed = 0.0

    @staticmethod
    def _sync():
        jax.effects_barrier()
        try:  # a put+fetch serializes behind all queued device work
            np.asarray(jax.device_put(np.zeros((), np.float32)))
        except Exception:
            pass

    def __enter__(self):
        self._sync()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._sync()
        self.elapsed = time.perf_counter() - self._t0
        if self.log:
            logging.info("[timer] %s: %.4fs", self.name, self.elapsed)
        return False


def reset_logger(level=logging.INFO, log_file: Optional[str] = None):
    handlers = [logging.StreamHandler()]
    if log_file:
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=handlers,
        force=True,
    )
    return logging.getLogger()


def collate_bboxes_to_maxlen(bbox_list, max_len: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Pad per-sample bbox dicts to a common box count.

    Mirrors reference `collate_bboxes_to_maxlen` (magicdrivedit/utils/misc.py:276-341):
    output masks use the 3-state convention 0=null/padding, 1=keep, -1=visible-masked.
    Each item: dict(bboxes[T,len,8,3], classes[T,len], masks[T,len]).
    """
    if max_len is None:
        max_len = max(int(b["bboxes"].shape[1]) for b in bbox_list)
    out = {"bboxes": [], "classes": [], "masks": []}
    for b in bbox_list:
        T, L = b["bboxes"].shape[:2]
        pad = max_len - L
        out["bboxes"].append(np.pad(b["bboxes"], ((0, 0), (0, pad), (0, 0), (0, 0))))
        out["classes"].append(np.pad(b["classes"], ((0, 0), (0, pad)), constant_values=0))
        out["masks"].append(np.pad(b["masks"], ((0, 0), (0, pad)), constant_values=0))
        if "box_latent" in b and b["box_latent"] is not None:
            out.setdefault("box_latent", []).append(
                np.pad(b["box_latent"], ((0, 0), (0, pad), (0, 0))))
    if "box_latent" in out and len(out["box_latent"]) != len(bbox_list):
        # a partial batch would silently pair latents with the wrong samples
        raise ValueError(
            f"box_latent present on {len(out['box_latent'])} of "
            f"{len(bbox_list)} items — all or none must carry it")
    return {k: np.stack(v) for k, v in out.items()}


def add_box_latent(bboxes: Dict, b: int, nc: int, t: int, sample_fn) -> Dict:
    """Attach per-instance latents shared across views/time (reference
    magicdrivedit/utils/misc.py add_box_latent)."""
    n_boxes = bboxes["bboxes"].shape[-3]
    latent = sample_fn(b * n_boxes)  # (b*n, D)
    latent = np.asarray(latent).reshape(b, 1, 1, n_boxes, -1)
    latent = np.broadcast_to(latent, (b, nc, t, n_boxes, latent.shape[-1]))
    bboxes = dict(bboxes)
    bboxes["box_latent"] = latent.reshape(b * nc, t, n_boxes, -1)
    return bboxes


def torch_randn_stream(seed: int):
    """Stateful seed-contract stream: successive draws continue ONE generator,
    matching the reference's `torch.manual_seed(s)` followed by multiple
    `torch.randn` calls — z first, then box latents (reference
    inference_magicdrive.py:434-440). Returns `draw(shape) -> np.ndarray`."""
    try:
        import torch
        gen = torch.Generator()
        gen.manual_seed(int(seed))
        return lambda shape: torch_randn(shape, generator=gen)
    except ImportError:
        rng = np.random.default_rng(seed)
        return lambda shape: rng.standard_normal(shape, np.float32)


def torch_randn(shape, seed: Optional[int] = None, generator=None) -> np.ndarray:
    """Bit-compatible replacement for the reference's `torch.manual_seed(s);
    torch.randn(shape)` latent sampling (reference inference_magicdrive.py:434:
    seed 1024+ns per sample). Uses the real torch CPU generator when available so
    frames are bit-comparable at matched seeds (BASELINE.json north star); falls
    back to numpy (same distribution, different bits) without torch."""
    try:
        import torch
    except ImportError:
        rng = np.random.default_rng(seed)
        return rng.standard_normal(shape, np.float32)
    if generator is None:
        generator = torch.Generator()
        if seed is not None:
            generator.manual_seed(int(seed))
    return torch.randn(*shape, generator=generator).numpy()
