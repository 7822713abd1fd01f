"""MagicDriveSTDiT3: the multi-view spatiotemporal DiT, TPU-native.

Re-design of the reference model (reference:
magicdrivedit/models/magicdrive/magicdrive_stdit3.py:47-1244). Key departures, all
TPU-motivated:

- Canonical token layout is 4D (B, T, S, C): sequence parallelism is a sharding
  constraint on the S axis (parallel/sharding.py) instead of explicit all_to_all calls.
- The 28-deep layer stack runs as two `nn.scan` segments (13 control layer-groups + 15
  plain layer-groups): one compiled layer body instead of 82 inlined blocks, which keeps
  XLA compile times sane and pairs naturally with per-layer remat.
- Cross-view attention is a single batched attention over a static neighbor gather
  (reference loops per camera and sums, magicdrive_stdit3.py:303-332); semantics are
  identical (per-neighbor softmax, outputs summed) with one kernel launch.
- height/width and all shape-determining inputs are static per bucket; one XLA
  compilation per (T, H, W) bucket is a feature on TPU.

Parameter structure intentionally mirrors the reference module tree so torch checkpoints
convert mechanically (see utils/ckpt.py converter).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.fused_adaln import adaln_modulate
from ...parallel.sharding import DP_AXIS, SP_AXIS, shard_hint, sp_size
from ...registry import MODELS
from ..layers.blocks import (
    CaptionEmbedder,
    CrossAttention,
    CrossViewAttention,
    Mlp,
    PatchEmbed3D,
    SelfAttention,
    SizeEmbedder,
    T2IFinalLayer,
    TimestepEmbedder,
    layer_norm_fp32,
    pos_embedding_2d,
    t2i_modulate,
    xavier_uniform,
    zeros_init,
)
from .embedder import (
    CamEmbedder,
    CamEmbedderTemp,
    ContinuousBBoxWithTextEmbedding,
    ContinuousBBoxWithTextTempEmbedding,
    MapControlEmbedding,
    MapControlTempEmbedding,
)

Dtype = Any

_EMBEDDER_CLASSES = {
    "CamEmbedder": CamEmbedder,
    "CamEmbedderTemp": CamEmbedderTemp,
    "ContinuousBBoxWithTextEmbedding": ContinuousBBoxWithTextEmbedding,
    "ContinuousBBoxWithTextTempEmbedding": ContinuousBBoxWithTextTempEmbedding,
    "MapControlEmbedding": MapControlEmbedding,
}


def resolve_embedder(cls_path: str):
    """Accepts both our and reference-style dotted paths (e.g.
    `magicdrivedit.models.magicdrive.embedder.CamEmbedder`)."""
    name = cls_path.rsplit(".", 1)[-1]
    return _EMBEDDER_CLASSES[name]


DEFAULT_MV_ORDER_MAP = {0: [5, 1], 1: [0, 2], 2: [1, 3], 3: [2, 4], 4: [3, 5], 5: [4, 0]}


def _table_init(hidden):
    return lambda key, shape: jax.random.normal(key, shape, jnp.float32) / hidden**0.5


@dataclasses.dataclass(frozen=True)
class MagicDriveSTDiT3Config:
    """Architecture hyper-parameters (reference MagicDriveSTDiT3Config,
    magicdrive_stdit3.py:361-472; fields that only gate torch-side training flags are
    handled by the trainable-mask utility instead)."""
    input_sq_size: int = 512
    in_channels: int = 4
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    pred_sigma: bool = True
    caption_channels: int = 4096
    model_max_length: int = 300
    qk_norm: bool = True
    with_temp_block: bool = True
    control_depth: int = 13
    use_x_control_embedder: bool = False
    uncond_cam_in_dim: Tuple[int, int] = (3, 7)
    cam_encoder_cls: str = "CamEmbedder"
    cam_encoder_param: Tuple = ()
    bbox_embedder_cls: str = "ContinuousBBoxWithTextTempEmbedding"
    bbox_embedder_param: Tuple = ()
    map_embedder_cls: str = "MapControlEmbedding"
    map_embedder_param: Tuple = ()
    frame_emb_cls: str = "CamEmbedderTemp"
    frame_emb_param: Tuple = ()
    map_embedder_downsample_rate: Any = 4
    micro_frame_size: Optional[int] = 17
    control_skip_cross_view: bool = True
    control_skip_temporal: bool = True
    force_pad_h_for_sp_size: Optional[int] = None
    enable_sequence_parallelism: bool = False
    mv_order_map: Tuple[Tuple[int, ...], ...] = tuple(
        tuple(v) for v in DEFAULT_MV_ORDER_MAP.values())
    grad_checkpoint: bool = True
    # "full": plain per-layer-group remat (recompute everything in the backward).
    # "offload_carry": additionally stash each layer group's carry residual
    # (the stacked (depth, B, T, S, C) activations the backward scan reads) in
    # pinned HOST memory instead of HBM — the single-chip lever for buckets
    # whose full-remat plan exceeds the chip (the reference's equivalent is
    # --cpu-offload, SURVEY §5; e.g. the 424x800x17f train anchor needs ~28 GB
    # on a 16 GB v5e without it). No effect unless grad_checkpoint.
    remat_policy: str = "full"
    dtype: Any = jnp.bfloat16

    @property
    def nc(self) -> int:
        return len(self.mv_order_map)

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.pred_sigma else self.in_channels

    @classmethod
    def from_dict(cls, d: Dict) -> "MagicDriveSTDiT3Config":
        d = dict(d)
        d.pop("type", None)
        d.pop("from_pretrained", None)
        d.pop("force_huggingface", None)
        known = {f.name for f in dataclasses.fields(cls)}
        if "mv_order_map" in d and isinstance(d["mv_order_map"], dict):
            d["mv_order_map"] = tuple(tuple(v) for _, v in sorted(d["mv_order_map"].items()))
        for k in ("cam_encoder_param", "bbox_embedder_param", "map_embedder_param",
                  "frame_emb_param"):
            if k in d and isinstance(d[k], dict):
                d[k] = tuple(sorted(d[k].items()))
        dropped = {k: v for k, v in d.items() if k not in known}
        kept = {k: v for k, v in d.items() if k in known}
        if "patch_size" in kept:
            kept["patch_size"] = tuple(kept["patch_size"])
        if "uncond_cam_in_dim" in kept:
            kept["uncond_cam_in_dim"] = tuple(kept["uncond_cam_in_dim"])
        return cls(**kept)


class MVSTDiTBlock(nn.Module):
    """One transformer block (reference MultiViewSTDiT3Block,
    magicdrive_stdit3.py:47-358): adaLN -> self-attn (spatial or temporal view) ->
    condition cross-attn -> cross-view attn -> MLP, with t/t0 frame-mask switching."""
    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    qk_norm: bool = False
    temporal: bool = False
    is_control_block: bool = False
    skip_cross_attn: bool = False
    skip_cross_view: bool = False
    neighbors: Tuple[Tuple[int, ...], ...] = ()
    zero_out_projs: bool = False  # base temporal blocks: zero-init attn/cross-attn proj
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, y, t, x_mask, t0, pad_mask=None):
        # x: (B, T, S, C) with B = b*NC; y: (B, Ty, L, C); t/t0: (b, 6C); x_mask: (B, T)
        # pad_mask: optional (B, T) bool frame validity — False frames (bucket
        # max-T padding for full-length clips) are excluded as TEMPORAL
        # attention keys so they cannot influence valid frames; spatial /
        # cross-view / cross-attn mix within a frame only, so they need none.
        B, T, S, C = x.shape
        b = t.shape[0]
        NC = B // b
        skip_cross_view = self.skip_cross_view or self.temporal
        proj_init = zeros_init if self.zero_out_projs else xavier_uniform

        table = self.param("scale_shift_table", _table_init(self.hidden_size),
                           (6, self.hidden_size)).astype(x.dtype)
        mods = jnp.repeat(table[None] + t.reshape(b, 6, C), NC, axis=0)  # (B, 6, C)
        m = mods[:, :, None, None, :]  # (B, 6, 1, 1, C)
        if x_mask is not None:
            mods0 = jnp.repeat(table[None] + t0.reshape(b, 6, C), NC, axis=0)
            m0 = mods0[:, :, None, None, :]

        def sel(a, a0):
            if x_mask is None:
                return a
            return jnp.where(x_mask[:, :, None, None], a, a0)

        def norm_mod(inp, idx_shift, idx_scale, mods_, mods0_):
            """adaLN: norm + modulate. The Pallas fused kernel (ops/fused_adaln.py) is
            opt-in via MDV2_FUSED_ADALN=1 — measured on v5e it LOSES to the XLA
            composition in-graph (6.37 vs 5.92 s/step at 424p) because the custom
            call breaks XLA's fusion with neighboring ops; kept for future tuning."""
            import os as _os
            if x_mask is None and _os.environ.get("MDV2_FUSED_ADALN") == "1":
                flat = adaln_modulate(inp.reshape(B, T * S, C),
                                      mods_[:, idx_shift, 0, 0],
                                      mods_[:, idx_scale, 0, 0])
                return flat.reshape(B, T, S, C)
            normed = layer_norm_fp32(inp)
            out = t2i_modulate(normed, mods_[:, idx_shift], mods_[:, idx_scale])
            if x_mask is None:
                return out
            return sel(out, t2i_modulate(normed, mods0_[:, idx_shift],
                                         mods0_[:, idx_scale]))

        # ---- self attention (spatial or temporal view) ----
        x_m = norm_mod(x, 0, 1, m, m0 if x_mask is not None else None)

        attn = SelfAttention(self.hidden_size, self.num_heads, qkv_bias=True,
                             qk_norm=self.qk_norm, use_rope=self.temporal,
                             dtype=self.dtype, proj_init=proj_init, name="attn")
        if self.temporal:
            import os as _os
            if _os.environ.get("MDV2_TEMPORAL_ATTN") == "legacy":
                kvm = None if pad_mask is None else jnp.broadcast_to(
                    pad_mask[:, None], (B, S, T)).reshape(B * S, T)
                xt = attn(x_m.transpose(0, 2, 1, 3).reshape(B * S, T, C),
                          kv_mask=kvm)
                x_m = xt.reshape(B, S, T, C).transpose(0, 2, 1, 3)
            else:
                # (B, T, S, C) einsum layout: no transposes, batched over S
                x_m = attn(x_m, kv_mask=pad_mask)
        else:
            xs = attn(x_m.reshape(B * T, S, C))
            x_m = xs.reshape(B, T, S, C)

        x_m_s = m[:, 2] * x_m
        if x_mask is not None:
            x_m_s = sel(x_m_s, m0[:, 2] * x_m)
        x = x + x_m_s
        x = shard_hint(x, {0: DP_AXIS, 2: SP_AXIS})

        # ---- condition cross attention ----
        if not self.skip_cross_attn:
            cross = CrossAttention(self.hidden_size, self.num_heads, dtype=self.dtype,
                                   proj_init=proj_init, name="cross_attn")
            Ty, L = y.shape[1], y.shape[2]
            if Ty == 1:
                x_c = cross(x.reshape(B, T * S, C), y[:, 0]).reshape(B, T, S, C)
            else:
                x_c = cross(x.reshape(B * T, S, C), y.reshape(B * T, L, C))
                x_c = x_c.reshape(B, T, S, C)
            x = x + x_c
            x = shard_hint(x, {0: DP_AXIS, 2: SP_AXIS})

        # ---- cross-view attention ----
        if not skip_cross_view:
            table_mva = self.param("scale_shift_table_mva", _table_init(self.hidden_size),
                                   (3, self.hidden_size)).astype(x.dtype)
            t3 = t.reshape(b, 6, C)[:, :3]
            mv = jnp.repeat(table_mva[None] + t3, NC, axis=0)[:, :, None, None, :]
            mv0 = None
            if x_mask is not None:
                t30 = t0.reshape(b, 6, C)[:, :3]
                mv0 = jnp.repeat(table_mva[None] + t30, NC, axis=0)[:, :, None, None, :]
            x_v = norm_mod(x, 0, 1, mv, mv0)

            # (b*NC, T, S, C) -> (b*T, NC, S, C)
            x_mv = x_v.reshape(b, NC, T, S, C).transpose(0, 2, 1, 3, 4).reshape(
                b * T, NC, S, C)
            # reference constructs cross_view_attn without qkv bias
            # (magicdrive_stdit3.py:126-133: qkv_bias not passed, default False)
            out = CrossViewAttention(self.hidden_size, self.num_heads, qkv_bias=False,
                                     qk_norm=True, dtype=self.dtype,
                                     name="cross_view_attn")(x_mv, self.neighbors)
            out = out.reshape(b, T, NC, S, C).transpose(0, 2, 1, 3, 4).reshape(
                B, T, S, C)

            x_v_s = mv[:, 2] * out
            if x_mask is not None:
                x_v_s = sel(x_v_s, mv0[:, 2] * out)
            x_v_s = nn.Dense(C, dtype=self.dtype, kernel_init=zeros_init,
                             bias_init=zeros_init, name="mva_proj")(x_v_s)
            x = x + x_v_s
            x = shard_hint(x, {0: DP_AXIS, 2: SP_AXIS})

        # ---- MLP ----
        x_m = norm_mod(x, 3, 4, m, m0 if x_mask is not None else None)
        x_m = Mlp(int(self.hidden_size * self.mlp_ratio), dtype=self.dtype,
                  name="mlp")(x_m)
        x_m_s = m[:, 5] * x_m
        if x_mask is not None:
            x_m_s = sel(x_m_s, m0[:, 5] * x_m)
        x = x + x_m_s
        x = shard_hint(x, {0: DP_AXIS, 2: SP_AXIS})

        if self.is_control_block:
            x_skip = nn.Dense(C, dtype=self.dtype, kernel_init=zeros_init,
                              bias_init=zeros_init, name="after_proj")(x)
            return x, x_skip
        return x


class CtrlLayerGroup(nn.Module):
    """One scanned step of the control segment: base_s -> control_s(+skip) -> base_t ->
    control_t(+skip) (reference forward loop, magicdrive_stdit3.py:1173-1189)."""
    cfg: MagicDriveSTDiT3Config

    @nn.compact
    def __call__(self, carry, _, y, t, x_mask, t0, pad_mask=None):
        cfg = self.cfg
        x, c = carry
        x, c = _name_carry(cfg, x), _name_carry(cfg, c)
        common = dict(hidden_size=cfg.hidden_size, num_heads=cfg.num_heads,
                      mlp_ratio=cfg.mlp_ratio, qk_norm=cfg.qk_norm,
                      neighbors=cfg.mv_order_map, dtype=cfg.dtype)
        x = MVSTDiTBlock(**common, name="base_s")(x, y, t, x_mask, t0)
        c, c_skip = MVSTDiTBlock(**common, is_control_block=True,
                                 skip_cross_view=cfg.control_skip_cross_view,
                                 name="control_s")(c, y, t, x_mask, t0)
        x = x + c_skip
        if cfg.with_temp_block:
            x = MVSTDiTBlock(**common, temporal=True, zero_out_projs=True,
                             name="base_t")(x, y, t, x_mask, t0, pad_mask)
        if not cfg.control_skip_temporal:
            c, c_skip = MVSTDiTBlock(**common, temporal=True, is_control_block=True,
                                     name="control_t")(c, y, t, x_mask, t0, pad_mask)
            x = x + c_skip
        return (x, c), None


class PlainLayerGroup(nn.Module):
    """One scanned step of the plain segment: base_s -> base_t
    (reference magicdrive_stdit3.py:1191-1198)."""
    cfg: MagicDriveSTDiT3Config

    @nn.compact
    def __call__(self, carry, _, y, t, x_mask, t0, pad_mask=None):
        cfg = self.cfg
        x = _name_carry(cfg, carry)
        common = dict(hidden_size=cfg.hidden_size, num_heads=cfg.num_heads,
                      mlp_ratio=cfg.mlp_ratio, qk_norm=cfg.qk_norm,
                      neighbors=cfg.mv_order_map, dtype=cfg.dtype)
        x = MVSTDiTBlock(**common, name="base_s")(x, y, t, x_mask, t0)
        if cfg.with_temp_block:
            x = MVSTDiTBlock(**common, temporal=True, zero_out_projs=True,
                             name="base_t")(x, y, t, x_mask, t0, pad_mask)
        return x, None


_CARRY_NAME = "mdv2_layer_carry"


def _name_carry(cfg, x):
    """Tag a layer group's carry input for the offload_carry remat policy (the
    named residual is what `save_and_offload_only_these_names` moves to host).
    Identity unless the policy is active — jax's `checkpoint_name` is a plain
    hint primitive, but keeping it out of the "full" path keeps those HLOs
    byte-identical to round 2's."""
    if cfg.grad_checkpoint and cfg.remat_policy == "offload_carry":
        return jax.ad_checkpoint.checkpoint_name(x, _CARRY_NAME)
    return x


def _scan(module_cls, cfg, length, name, num_args: int = 6):
    target = module_cls
    if cfg.grad_checkpoint:
        policy = None
        if cfg.remat_policy == "offload_carry":
            policy = jax.checkpoint_policies.save_and_offload_only_these_names(
                names_which_can_be_saved=[],
                names_which_can_be_offloaded=[_CARRY_NAME],
                offload_src="device", offload_dst="pinned_host")
        elif cfg.remat_policy == "dots":
            # keep matmul outputs in HBM; the backward pass re-runs only the
            # cheap elementwise/norm ops. Full remat re-runs the whole forward
            # (fwd+bwd = 4x fwd FLOPs vs the ideal 3x), which is exactly the
            # train-step MFU gap vs inference (docs/PERF.md r4 analysis); this
            # policy restores the 3x bound when the saved dots fit memory.
            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        elif cfg.remat_policy != "full":
            raise ValueError(
                f"unknown remat_policy {cfg.remat_policy!r}: expected "
                "'full' | 'offload_carry' | 'dots'")
        target = nn.remat(target, prevent_cse=False, policy=policy)
    return nn.scan(
        target,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast,) * num_args,
        length=length,
        metadata_params={nn.meta.PARTITION_NAME: None},
    )(cfg=cfg, name=name)


@MODELS.register_module("MagicDriveSTDiT3")
class MagicDriveSTDiT3(nn.Module):
    """Main DiT (reference MagicDriveSTDiT3, magicdrive_stdit3.py:475-1244)."""
    cfg: MagicDriveSTDiT3Config

    def setup(self):
        self._setup_embedders()
        cfg = self.cfg
        self.ctrl_layers = _scan(CtrlLayerGroup, cfg, cfg.control_depth, "ctrl_layers")
        self.plain_layers = _scan(PlainLayerGroup, cfg, cfg.depth - cfg.control_depth,
                                  "plain_layers")
        self._setup_final()

    def _setup_final(self):
        cfg = self.cfg
        self.final_layer = T2IFinalLayer(cfg.hidden_size, int(np.prod(cfg.patch_size)),
                                         cfg.out_channels, dtype=cfg.dtype,
                                         name="final_layer")

    def _setup_embedders(self):
        cfg = self.cfg
        hidden, patch = cfg.hidden_size, cfg.patch_size
        dt = cfg.dtype
        self.x_embedder = PatchEmbed3D(patch, hidden, dtype=dt, name="x_embedder")
        self.t_embedder = TimestepEmbedder(hidden, dtype=dt, name="t_embedder")
        self.t_block = nn.Dense(6 * hidden, dtype=dt, kernel_init=xavier_uniform,
                                name="t_block_1")
        self.y_embedder = CaptionEmbedder(
            in_channels=cfg.caption_channels, hidden_size=hidden,
            uncond_prob=cfg.class_dropout_prob, token_num=cfg.model_max_length,
            dtype=dt, name="y_embedder")
        self.fps_embedder = SizeEmbedder(hidden, dtype=dt, name="fps_embedder")
        if cfg.use_x_control_embedder:
            self.x_control_embedder = PatchEmbed3D(patch, hidden, dtype=dt,
                                                   name="x_control_embedder")
        # non-trainable buffer, overwritten by prepare_text_embedding
        self.base_token = self.param(
            "base_token", lambda key, shape: jax.random.normal(key, shape, jnp.float32),
            (hidden,))
        self.camera_embedder = resolve_embedder(cfg.cam_encoder_cls)(
            out_dim=hidden, dtype=dt, name="camera_embedder",
            **dict(cfg.cam_encoder_param))
        self.frame_embedder = resolve_embedder(cfg.frame_emb_cls)(
            out_dim=hidden, dtype=dt, name="frame_embedder",
            **dict(cfg.frame_emb_param))
        self.bbox_embedder = resolve_embedder(cfg.bbox_embedder_cls)(
            dtype=dt, name="bbox_embedder", **dict(cfg.bbox_embedder_param))
        self.controlnet_cond_embedder = resolve_embedder(cfg.map_embedder_cls)(
            conditioning_embedding_channels=hidden // 2, dtype=dt,
            name="controlnet_cond_embedder", **dict(cfg.map_embedder_param))
        self.controlnet_cond_embedder_temp = MapControlTempEmbedding(
            hidden, cfg.map_embedder_downsample_rate, dtype=dt,
            name="controlnet_cond_embedder_temp")
        self.controlnet_cond_patchifier = PatchEmbed3D(
            patch, hidden, dtype=dt, name="controlnet_cond_patchifier")
        self.before_proj = nn.Dense(hidden, dtype=dt, kernel_init=zeros_init,
                                    bias_init=zeros_init, name="before_proj")

    # ------------------------------------------------------------------
    # embedding helpers (reference magicdrive_stdit3.py:861-1007)
    # ------------------------------------------------------------------

    def encode_text(self, y, drop_cond_mask=None):
        force_drop = None if drop_cond_mask is None else (1 - drop_cond_mask)
        y = self.y_embedder(y, force_drop_ids=force_drop)  # (b, 1, L, C)
        return y[:, 0]

    def encode_box(self, bbox: Dict[str, jnp.ndarray], drop_mask: jnp.ndarray,
                   frame_valid=None):
        """bbox masks use {0: null/pad, 1: keep, -1: visible-masked}; drop_mask
        (B, T_img) 0 -> drop (reference encode_box, magicdrive_stdit3.py:882-907).
        frame_valid: optional (B, T_img) validity for bucket max-T padded clips;
        only the temporal embedder mixes frames, so only it consumes the mask."""
        masks = bbox["masks"]
        B, T, L = masks.shape
        drop = jnp.broadcast_to(drop_mask[:, :, None], (B, T, L))
        null_mask = jnp.where(masks == 0, 0.0, 1.0)
        keep = jnp.ones_like(null_mask)
        keep = jnp.where(masks == -1, 0.0, keep)
        keep = jnp.where((masks == 1) & (drop == 0), 0.0, keep)
        classes = jnp.clip(bbox["classes"].astype(jnp.int32), 0, None)
        kw = {}
        if frame_valid is not None and isinstance(
                self.bbox_embedder, ContinuousBBoxWithTextTempEmbedding):
            kw["frame_valid"] = frame_valid
        return self.bbox_embedder(bbox["bboxes"], classes, null_mask, keep,
                                  bbox.get("box_latent"), **kw)

    def encode_cond_sequence(self, bbox, cams, rel_pos, y, drop_cond_mask,
                             drop_frame_mask, frame_valid=None):
        """Build the per-frame condition sequence [frame, cam, y, boxes]
        (reference magicdrive_stdit3.py:918-961). Returns (B, T_lat, L_cond, C).
        frame_valid: optional (b, T_img) validity mask — full-length clips
        padded to a bucket max-T keep padded frames out of the temporal
        embedders' attention/downsampling."""
        b = y.shape[0]
        NC = cams.shape[0] // b
        T_img = cams.shape[1]
        fv_rep = None if frame_valid is None else jnp.repeat(
            frame_valid.astype(bool), NC, axis=0)  # (B, T_img)

        y_emb = self.encode_text(y, drop_cond_mask)  # (b, L, C)
        y_emb = jnp.repeat(y_emb, NC, axis=0)  # (B, L, C)

        cond_tail = []
        if bbox is not None:
            drop_box = jnp.logical_and(drop_cond_mask[:, None].astype(bool),
                                       drop_frame_mask.astype(bool)).astype(jnp.float32)
            drop_box = jnp.repeat(drop_box, NC, axis=0)  # (B, T_img)
            bbox_emb = self.encode_box(bbox, drop_box, fv_rep)  # (B, T_lat, L_box, C)
            bbox_emb = self.base_token[None, None, None].astype(bbox_emb.dtype) + bbox_emb
            cond_tail.append(bbox_emb)

        # camera token from the first frame only
        S_cam = cams.shape[2]
        cam_flat = cams[:, 0].reshape(b * NC * S_cam, *cams.shape[3:])
        cam_mask = jnp.repeat(drop_cond_mask, NC * S_cam, axis=0)
        cam_tok, _ = self.camera_embedder.embed_cam(cam_flat, cam_mask, T=1, S=S_cam)
        cam_emb = cam_tok.reshape(b * NC, 1, S_cam, -1)  # (B, 1, S, C)

        # ego-motion tokens over all frames, temporally downsampled
        S_f = rel_pos.shape[2]
        rp_flat = rel_pos.reshape(b * NC * T_img * S_f, *rel_pos.shape[3:])
        frame_mask = jnp.repeat(
            jnp.repeat(drop_frame_mask, NC, axis=0).reshape(b * NC, T_img, 1),
            S_f, axis=2).reshape(-1)
        fe_kw = {}
        if fv_rep is not None and isinstance(self.frame_embedder, CamEmbedderTemp):
            fe_kw["frame_valid"] = fv_rep
        frame_emb, _ = self.frame_embedder.embed_cam(rp_flat, frame_mask, T=T_img,
                                                     S=S_f, **fe_kw)
        # frame_emb: (B, T_lat, S_f, C)
        T_lat = frame_emb.shape[1]

        base = self.base_token[None, None, None].astype(cam_emb.dtype)
        cam_emb = base + cam_emb
        frame_emb = base + frame_emb
        cam_emb = jnp.broadcast_to(cam_emb, (cam_emb.shape[0], T_lat) + cam_emb.shape[2:])
        y_rep = jnp.broadcast_to(y_emb[:, None], (y_emb.shape[0], T_lat) + y_emb.shape[1:])
        cond = [frame_emb, cam_emb, y_rep] + cond_tail
        return jnp.concatenate(cond, axis=2)

    def encode_map(self, maps, NC, h_pad_size, x_latent_shape):
        """(reference encode_map, magicdrive_stdit3.py:963-1007)"""
        b, T_img = maps.shape[:2]
        flat = maps.reshape(b * T_img, *maps.shape[2:])
        c = self.controlnet_cond_embedder(flat)  # (b*T, hidden/2, Hm, Wm)
        ch, Hm, Wm = c.shape[1:]
        c = c.reshape(b, T_img, ch, Hm, Wm).transpose(0, 2, 1, 3, 4)
        mfs = self.cfg.micro_frame_size
        if mfs is None:
            c = self.controlnet_cond_embedder_temp(c)
        else:
            zs = [self.controlnet_cond_embedder_temp(c[:, :, i:i + mfs])
                  for i in range(0, T_img, mfs)]
            c = jnp.concatenate(zs, axis=2)
        if tuple(c.shape[-3:]) != tuple(x_latent_shape):
            c = jax.image.resize(c, c.shape[:2] + tuple(x_latent_shape), method="nearest")
        if h_pad_size > 0:
            hx = h_pad_size * self.cfg.patch_size[1]
            c = jnp.pad(c, ((0, 0),) * 3 + ((0, hx), (0, 0)))
        c = self.controlnet_cond_patchifier(c)  # (b, T*H'*W', hidden)
        return jnp.repeat(c, NC, axis=0)

    def get_dynamic_size(self, latent_shape) -> Tuple[int, int, int]:
        T, H, W = latent_shape
        pt, ph, pw = self.cfg.patch_size
        return (-(-T // pt), -(-H // ph), -(-W // pw))

    def _latent_pad_mask(self, frame_valid, T_img: int, T: int, NC: int):
        """(b, T_img) pixel-frame validity -> (B, T) latent/token frame validity.

        Latent frame i is decoded by the causal VAE from pixel frames <= 4i, so
        it is valid iff pixel frame 4i is (T' = (T_img-1)//4 + 1; valid lengths
        are 8n+1 by the dataset's micro_frame trim). Temporal patching would
        mix latent frames before the mask applies, hence the patch_size[0]==1
        requirement (all reference configs use (1, 2, 2))."""
        if frame_valid is None:
            return None
        lat_valid = frame_valid.astype(bool)[:, ::4]
        assert self.cfg.patch_size[0] == 1 and lat_valid.shape[1] == T, (
            "frame_valid requires temporal patch 1 and T_img == 4*(T'-1)+1",
            frame_valid.shape, T_img, T)
        return jnp.repeat(lat_valid, NC, axis=0)

    # ------------------------------------------------------------------

    def encode_conditions(self, x_shape, y, maps, bbox, cams, rel_pos,
                          drop_cond_mask=None, drop_frame_mask=None,
                          frame_valid=None):
        """Precompute the step-independent conditioning (y_cond, c_map) for sampling:
        the Euler loop calls the model 30x (x2 CFG) with identical conditions, and the
        reference re-embeds them every call (magicdrive_stdit3.py:1115-1157). Cache
        them once per sample and pass via `cond_cache`. x_shape: the (b, C*NC, T', H',
        W') latent shape the denoiser will be called with."""
        cfg = self.cfg
        NC = cfg.nc
        dt = cfg.dtype
        b = x_shape[0]
        B = b * NC
        T_img = rel_pos.shape[1]
        if drop_cond_mask is None:
            drop_cond_mask = jnp.ones((b,), jnp.float32)
        if drop_frame_mask is None:
            drop_frame_mask = jnp.ones((b, T_img), jnp.float32)
        Tx, Hx, Wx = x_shape[-3:]
        T, H, W = self.get_dynamic_size((Tx, Hx, Wx))
        h_pad_size = self._h_pad_size(H, W)
        if h_pad_size:
            H += h_pad_size
        S = H * W
        y_cond = self.encode_cond_sequence(bbox, cams, rel_pos, y.astype(dt),
                                           drop_cond_mask, drop_frame_mask,
                                           frame_valid)
        if y_cond.shape[1] != T and y_cond.shape[1] > 1:
            y_cond = jax.image.resize(
                y_cond, (y_cond.shape[0], T) + y_cond.shape[2:], method="nearest")
        c_map = self.encode_map(maps.astype(dt), NC, h_pad_size, (Tx, Hx, Wx))
        return y_cond, c_map.reshape(B, T, S, -1)

    def _h_pad_size(self, H: int, W: int, simulate_sp: Optional[int] = None) -> int:
        """H padding so S=H*W divides the (real or simulated) sp size.

        Priority mirrors the reference (magicdrive_stdit3.py:1054-1110):
        force_pad_h_for_sp_size > simulate_sp (training-time random pick from
        `simulate_sp_size`, chosen host-side per step so each pad variant is its
        own compiled program) > the actual mesh sp size.
        """
        cfg = self.cfg
        pad_to = cfg.force_pad_h_for_sp_size
        if pad_to is None and simulate_sp:
            pad_to = simulate_sp
        if pad_to is None and cfg.enable_sequence_parallelism:
            pad_to = sp_size()
        if pad_to and (H * W) % pad_to != 0:
            return pad_to - H % pad_to
        return 0

    def __call__(self, x, timestep, y, maps, bbox, cams, rel_pos, fps,
                 height: float, width: float, drop_cond_mask=None,
                 drop_frame_mask=None, x_mask=None, cond_cache=None,
                 simulate_sp: Optional[int] = None, frame_valid=None):
        """Forward (reference magicdrive_stdit3.py:1021-1218).

        x: (b, C*NC, T', H', W') latents; timestep: (b,); y: (b, 1, L, 4096);
        maps: (b, T_img, C_map, Hm, Wm); bbox: dict or None; cams: (b*NC, T_img, 1, 3, 7);
        rel_pos: (b*NC, T_img, 1, 4, 4); fps: (b,) or (1,);
        height/width: python numbers (static). cond_cache: optional
        (y_cond, c_map) from encode_conditions. frame_valid: optional
        (b, T_img) bool — full-length clips are padded (by repeating the last
        frame) to one bucket max-T so every scene length shares ONE compiled
        program (SURVEY.md §7 hard part 1; reference runs each length eagerly,
        nuscenes_t_dataset.py:843-894); padded frames are excluded from all
        temporal attention/pooling, so outputs on valid frames match the
        unpadded run exactly (tests/test_stdit3.py). Returns fp32, same shape
        as x (out_channels folded like in_channels).
        """
        cfg = self.cfg
        NC = cfg.nc
        dt = cfg.dtype
        b = x.shape[0]
        B = b * NC
        T_img = rel_pos.shape[1]
        if drop_cond_mask is None:
            drop_cond_mask = jnp.ones((b,), jnp.float32)
        if drop_frame_mask is None:
            drop_frame_mask = jnp.ones((b, T_img), jnp.float32)

        # (b, C*NC, T, H, W) -> (B, C, T, H, W); channels are C-major over (C, NC)
        C_in = cfg.in_channels
        _, _, Tx, Hx, Wx = x.shape
        x = x.reshape(b, C_in, NC, Tx, Hx, Wx).transpose(0, 2, 1, 3, 4, 5)
        x = x.reshape(B, C_in, Tx, Hx, Wx).astype(dt)

        T, H, W = self.get_dynamic_size((Tx, Hx, Wx))

        # H padding for SP divisibility (reference magicdrive_stdit3.py:1054-1110)
        h_pad_size = self._h_pad_size(H, W, simulate_sp)
        if h_pad_size > 0:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, h_pad_size * cfg.patch_size[1]),
                            (0, 0)))
            H += h_pad_size
        S = H * W

        base_size = round(S**0.5)
        scale = math.sqrt(height * width) / cfg.input_sq_size
        pos_emb = pos_embedding_2d(cfg.hidden_size, H, W, scale=scale,
                                   base_size=base_size).astype(dt)

        # timestep embedding
        t_emb = self.t_embedder(timestep.astype(jnp.float32))  # (b, C)
        fps_emb = self.fps_embedder(jnp.asarray(fps).reshape(-1, 1).astype(dt), b)
        t_emb = t_emb + fps_emb
        t_mlp = self.t_block(jax.nn.silu(t_emb))
        t0_emb = t0_mlp = None
        if x_mask is not None:
            t0_emb = self.t_embedder(jnp.zeros_like(timestep, jnp.float32)) + fps_emb
            t0_mlp = self.t_block(jax.nn.silu(t0_emb))

        # condition sequence + map control (cached across sampler steps when given)
        if cond_cache is not None:
            y_cond, c_map = cond_cache
        else:
            y_cond = self.encode_cond_sequence(bbox, cams, rel_pos, y.astype(dt),
                                               drop_cond_mask, drop_frame_mask,
                                               frame_valid)
            if y_cond.shape[1] != T and y_cond.shape[1] > 1:
                y_cond = jax.image.resize(
                    y_cond, (y_cond.shape[0], T) + y_cond.shape[2:], method="nearest")
            c_map = self.encode_map(maps.astype(dt), NC, h_pad_size, (Tx, Hx, Wx))
            c_map = c_map.reshape(B, T, S, -1)

        # x embedding
        x_b = self.x_embedder(x).reshape(B, T, S, -1)
        x_b = x_b + pos_emb.reshape(1, 1, S, -1)
        if cfg.use_x_control_embedder:
            x_c = self.x_control_embedder(x).reshape(B, T, S, -1)
            x_c = x_c + pos_emb.reshape(1, 1, S, -1)
        else:
            x_c = x_b
        c = x_c + self.before_proj(c_map)
        x = x_b

        x = shard_hint(x, {0: DP_AXIS, 2: SP_AXIS})
        c = shard_hint(c, {0: DP_AXIS, 2: SP_AXIS})

        x_mask_rep = None
        if x_mask is not None:
            x_mask_rep = jnp.repeat(x_mask.astype(bool), NC, axis=0)  # (B, T)
        pad_mask_rep = self._latent_pad_mask(frame_valid, T_img, T, NC)

        (x, c), _ = self.ctrl_layers((x, c), None, y_cond, t_mlp, x_mask_rep,
                                     t0_mlp, pad_mask_rep)
        x, _ = self.plain_layers(x, None, y_cond, t_mlp, x_mask_rep, t0_mlp,
                                 pad_mask_rep)

        # final layer + unpatchify
        x = x.reshape(B, T * S, -1)
        t_fin = jnp.repeat(t_emb, NC, axis=0)
        t0_fin = None if t0_emb is None else jnp.repeat(t0_emb, NC, axis=0)
        x = self.final_layer(x, t_fin, x_mask_rep, t0_fin, T, S)
        x = self.unpatchify(x, T, H, W, Tx, Hx, Wx)

        x = x.astype(jnp.float32)
        C_out = cfg.out_channels
        x = x.reshape(b, NC, C_out, Tx, Hx, Wx).transpose(0, 2, 1, 3, 4, 5)
        return x.reshape(b, C_out * NC, Tx, Hx, Wx)

    def unpatchify(self, x, N_t, N_h, N_w, R_t, R_h, R_w):
        """(reference magicdrive_stdit3.py:1220-1244)"""
        pt, ph, pw = self.cfg.patch_size
        C_out = self.cfg.out_channels
        B = x.shape[0]
        x = x.reshape(B, N_t, N_h, N_w, pt, ph, pw, C_out)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)  # B C_out N_t pt N_h ph N_w pw
        x = x.reshape(B, C_out, N_t * pt, N_h * ph, N_w * pw)
        return x[:, :, :R_t, :R_h, :R_w]


def build_model_config(model_cfg: Dict, vae_out_channels: int = 16,
                       mv_order_map: Optional[Dict] = None,
                       dtype=jnp.bfloat16, **overrides) -> MagicDriveSTDiT3Config:
    """Translate a reference-style experiment `model = dict(...)` into our config.
    XL/2 presets (reference MagicDriveSTDiT3_XL_2 factory, magicdrive_stdit3.py:2590+):
    depth=28, hidden=1152, patch=(1,2,2), heads=16."""
    d = dict(model_cfg)
    kind = d.pop("type", "MagicDriveSTDiT3-XL/2")
    if "XL/2" in kind or "XL-2" in kind:
        d.setdefault("depth", 28)
        d.setdefault("hidden_size", 1152)
        d.setdefault("patch_size", (1, 2, 2))
        d.setdefault("num_heads", 16)
    d.setdefault("in_channels", vae_out_channels)
    if mv_order_map is not None:
        d["mv_order_map"] = mv_order_map
    # torch-runtime-only flags with no JAX equivalent
    for k in ("enable_flash_attn", "enable_layernorm_kernel", "enable_xformers",
              "freeze_y_embedder", "freeze_x_embedder", "freeze_old_embedder",
              "freeze_temporal_blocks", "freeze_old_params", "zero_and_train_embedder",
              "only_train_base_blocks", "only_train_temp_blocks",
              "only_train_extra_blocks", "qk_norm_trainable", "use_st_cross_attn",
              "sequence_parallelism_temporal", "input_size",
              "drop_path", "class_dropout_prob"):
        d.pop(k, None)
    # simulate_sp_size is a TRAINING feature (random H-pad so one checkpoint runs
    # at any sp in the list, reference magicdrive_stdit3.py:1056-1089); it is
    # consumed by the train app (per-step static pad -> per-variant compiled step),
    # not stored on the model config.
    d.pop("simulate_sp_size", None)
    d.update(overrides)
    d["dtype"] = dtype
    return MagicDriveSTDiT3Config.from_dict(d)
