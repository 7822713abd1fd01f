"""T5 text encoder wrapper.

JAX counterpart of the reference wrapper (reference:
magicdrivedit/models/text_encoder/t5.py:35-200): HF Flax T5-XXL encoder + tokenizer with
max_len 300, `encode(texts) -> {y: (B, 1, L, 4096), mask: (B, L)}`, and `null(n)` pulling
the DiT's learned null caption embedding (the reference wires `y_embedder` onto the text
encoder at inference, inference_magicdrive.py:294 — we do the same via
`set_null_embedding`).

A deterministic `DummyTextEncoder` ("t5-dummy") with the same API supports tests and
benchmarks on machines without the 11B-parameter T5 weights.
"""
from __future__ import annotations

import hashlib
import html
import re
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...registry import MODELS

try:
    import ftfy
    _HAS_FTFY = True
except ImportError:
    _HAS_FTFY = False

_URL_RE = re.compile(r"(?:https?|ftp):\/\/[^\s]+|www\.[^\s]+")
_BAD_PUNCT_RE = re.compile(r"[#®•©™&@·º½¾¿¡§~\)\(\]\[\}\{\|\\/\*]{1,}")
_WS_RE = re.compile(r"\s+")


def basic_clean(text: str) -> str:
    if _HAS_FTFY:
        text = ftfy.fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def clean_caption(caption: str) -> str:
    """Pragmatic caption cleaning in the spirit of the reference's PixArt-derived
    `clean_caption` (t5.py:200-338): fix encoding, strip urls/html/bad punctuation runs,
    collapse whitespace."""
    caption = basic_clean(caption)
    caption = _URL_RE.sub("", caption)
    try:
        from bs4 import BeautifulSoup
        caption = BeautifulSoup(caption, features="html.parser").text
    except Exception:
        pass
    caption = _BAD_PUNCT_RE.sub(r" ", caption)
    caption = _WS_RE.sub(" ", caption)
    caption = caption.strip()
    return caption


def text_preprocessing(text: str, use_text_preprocessing: bool = True) -> str:
    if use_text_preprocessing:
        return clean_caption(clean_caption(text))
    return text.lower().strip()


@MODELS.register_module("t5")
class T5Encoder:
    def __init__(self, from_pretrained: str, model_max_length: int = 120,
                 dtype=jnp.float32, local_files_only: bool = False, cache_dir=None,
                 shardformer: bool = False, device=None, **kwargs):
        from transformers import AutoTokenizer, FlaxT5EncoderModel
        self.tokenizer = AutoTokenizer.from_pretrained(
            from_pretrained, cache_dir=cache_dir, local_files_only=local_files_only)
        # shardformer in the reference only fuses torch kernels; XLA fuses for us.
        try:
            self.model = FlaxT5EncoderModel.from_pretrained(
                from_pretrained, cache_dir=cache_dir,
                local_files_only=local_files_only, dtype=dtype)
        except (OSError, EnvironmentError):
            # checkpoint has no flax weights (the usual case for the
            # DeepFloyd/t5-v1_1-xxl snapshot the reference uses, t5.py:56-77):
            # convert the torch weights on the fly.
            self.model = FlaxT5EncoderModel.from_pretrained(
                from_pretrained, cache_dir=cache_dir,
                local_files_only=local_files_only, dtype=dtype, from_pt=True)
        self.model_max_length = model_max_length
        self.output_dim = self.model.config.d_model
        self.null_y: Optional[jnp.ndarray] = None
        self._encode = jax.jit(
            lambda ids, mask: self.model(input_ids=ids, attention_mask=mask)[0])

    def encode(self, texts: List[str]):
        texts = [text_preprocessing(t) for t in texts]
        tok = self.tokenizer(texts, max_length=self.model_max_length, padding="max_length",
                             truncation=True, return_attention_mask=True,
                             add_special_tokens=True, return_tensors="np")
        emb = self._encode(jnp.asarray(tok["input_ids"]),
                           jnp.asarray(tok["attention_mask"]))
        return dict(y=emb[:, None], mask=jnp.asarray(tok["attention_mask"]))

    def set_null_embedding(self, y_embedding: jnp.ndarray):
        """y_embedding: the DiT y_embedder's null table (token_num, 4096)."""
        self.null_y = y_embedding

    def null(self, n: int) -> jnp.ndarray:
        assert self.null_y is not None, "call set_null_embedding(y_embedding) first"
        return jnp.broadcast_to(self.null_y[None, None],
                                (n, 1) + tuple(self.null_y.shape))


@MODELS.register_module("t5-dummy")
class DummyTextEncoder:
    """Deterministic stand-in with the T5Encoder API: embeddings are seeded per-token
    from a hash of the text, so runs are reproducible without T5 weights."""

    def __init__(self, model_max_length: int = 120, output_dim: int = 4096, **kwargs):
        self.model_max_length = model_max_length
        self.output_dim = output_dim
        self.null_y: Optional[jnp.ndarray] = None

    def encode(self, texts: List[str]):
        L, D = self.model_max_length, self.output_dim
        ys, masks = [], []
        for t in texts:
            words = text_preprocessing(t).split()[:L]
            seed = int.from_bytes(hashlib.sha256(t.encode()).digest()[:4], "little")
            rng = np.random.default_rng(seed)
            y = rng.standard_normal((L, D), dtype=np.float32) * 0.1
            mask = np.zeros((L,), np.int32)
            mask[: max(1, len(words) + 1)] = 1
            y[len(words) + 1:] = 0.0
            ys.append(y)
            masks.append(mask)
        return dict(y=jnp.asarray(np.stack(ys))[:, None], mask=jnp.asarray(np.stack(masks)))

    def set_null_embedding(self, y_embedding):
        self.null_y = jnp.asarray(y_embedding)

    def null(self, n: int) -> jnp.ndarray:
        if self.null_y is None:
            return jnp.zeros((n, 1, self.model_max_length, self.output_dim))
        return jnp.broadcast_to(self.null_y[None, None],
                                (n, 1) + tuple(self.null_y.shape))
