"""End-to-end generation pipeline.

Plays the role of the reference's scripts/inference_magicdrive.py:334-539 inner loop,
re-structured for XLA: condition encoding + the full 30-step CFG Euler loop compile into
one program per shape bucket; the VAE decode is a second program.

CFG realisations (SURVEY.md §2.6):
- "rflow": batched — cond and null conditions concatenated on batch, one model call per
  step (reference rf/__init__.py:96-105).
- "rflow-slice": two sequential model calls per step to halve activation memory
  (reference rf/__init__.py:485-512).
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import models  # noqa: F401  (populate the MODELS registry)
from ..models.magicdrive.stdit3 import MagicDriveSTDiT3, build_model_config
from ..models.vae.cogvideox import CogVAEConfig, VideoAutoencoderKLCogVideoX
from ..registry import MODELS, build_module
from ..schedulers.rf import RFLOW, build_scheduler
from ..utils.inference_utils import add_null_condition, replace_with_null_condition
from ..parallel.sharding import get_current_mesh, shard_hint, use_mesh


class MagicDrivePipeline:
    def __init__(self, model: MagicDriveSTDiT3, params, vae: VideoAutoencoderKLCogVideoX,
                 text_encoder, scheduler: RFLOW, cfg=None, mesh=None):
        self.model = model
        self.params = params
        self.vae = vae
        self.text_encoder = text_encoder
        self.scheduler = scheduler
        self.cfg = cfg
        # sequence-parallel inference (reference --sp_size N inference runs,
        # doc/FAQ.md memory tables are per-sp): a (dp=1, sp=N) mesh; the
        # sample programs trace under it so the model's GSPMD hints shard the
        # token axis, and VAE decode batch-scatters over it (sp_vae)
        self.mesh = mesh
        self._sample_fns: Dict[Any, Any] = {}

    # ------------------------------------------------------------------
    @classmethod
    def from_config(cls, cfg, rng: Optional[jax.Array] = None, init_params: bool = True,
                    example_batch: Optional[Dict] = None):
        """Build model/vae/text-encoder/scheduler from a reference-style experiment
        config (see configs/magicdrive/*)."""
        import jax.numpy as jnp

        rng = rng if rng is not None else jax.random.PRNGKey(cfg.get("seed", 42))
        dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}.get(cfg.get("dtype", "bf16"),
                                                                jnp.bfloat16)
        vae_cfg = CogVAEConfig(dtype=dtype)
        vae_dict = dict(cfg.get("vae", {}))
        vae_dict.pop("type", None)
        for k in ("cache_dir", "local_files_only"):
            vae_dict.pop(k, None)
        # vae_tiling=N (reference --vae_tiling 384): tiled decode with N-pixel tiles
        tiling_px = cfg.get("vae_tiling")
        if tiling_px and "tiling" not in vae_dict:
            vae_dict["tiling"] = dict(tile_sample_min_height=int(tiling_px),
                                      tile_sample_min_width=int(tiling_px))
        vae = VideoAutoencoderKLCogVideoX(vae_cfg, **vae_dict)
        # honor from_pretrained (reference vae_cogvideox.py:1326-1331): a local
        # diffusers snapshot dir loads real CogVideoX-VAE weights; anything else
        # falls back to random init with a LOUD warning — decoded pixels are
        # meaningless until real weights are provided.
        if vae.from_pretrained:
            try:
                vae.load_pretrained()
                logging.info("VAE: loaded pretrained weights from %s",
                             vae.from_pretrained)
            except (FileNotFoundError, ValueError) as e:
                logging.warning(
                    "VAE pretrained weights unavailable (%s) — USING RANDOM "
                    "INIT; decoded videos will be noise. Download the "
                    "CogVideoX VAE snapshot and point vae.from_pretrained at "
                    "the local directory.", e)

        sp = int(cfg.get("sp_size", 1) or 1)
        mesh = None
        if sp > 1:
            from ..parallel.sharding import make_mesh
            n_dev = len(jax.devices())
            if n_dev >= sp:
                mesh = make_mesh(dp=1, sp=sp)
            else:
                logging.warning("sp_size=%d but only %d device(s); running "
                                "unsharded", sp, n_dev)
                sp = 1
        model_cfg = build_model_config(
            cfg.model, vae_out_channels=cfg.get("vae_out_channels", 16),
            mv_order_map=cfg.get("mv_order_map"), dtype=dtype,
            enable_sequence_parallelism=sp > 1,
            grad_checkpoint=cfg.get("grad_checkpoint", False))
        model_type = str(cfg.get("model", {}).get("type", ""))
        if "BrushNet" in model_type:
            import dataclasses as _dc

            from ..models.magicdrive.brushnet import (BrushNetConfig,
                                                      MagicDriveSTDiT3BrushNet)
            model_cfg = BrushNetConfig(
                **{**_dc.asdict(model_cfg), "sde_inpaint": "SDE" in model_type})
            model = MagicDriveSTDiT3BrushNet(model_cfg)
        else:
            model = MagicDriveSTDiT3(model_cfg)

        te_cfg = dict(cfg.get("text_encoder", {"type": "t5-dummy"}))
        te_kind = te_cfg.pop("type", "t5-dummy")
        try:
            text_encoder = MODELS.get(te_kind)(**te_cfg)
        except (OSError, ImportError, ValueError) as e:
            # ONLY environment gaps (missing T5 snapshot / transformers) may
            # fall back to the deterministic dummy — a typo'd type or bad
            # kwargs (KeyError/TypeError) must fail loudly, not silently
            # render prompt-ignoring videos (r4 self-review)
            logging.warning("text encoder %r unavailable (%s); using t5-dummy",
                            te_kind, e)
            text_encoder = MODELS.get("t5-dummy")(
                model_max_length=te_cfg.get("model_max_length", 300))

        scheduler = build_scheduler(cfg.scheduler)
        params = None
        if init_params:
            k1, k2 = jax.random.split(rng)
            if example_batch is None:
                example_batch = synthetic_batch(model_cfg, num_frames=9, height=224,
                                                width=400,
                                                l_txt=text_encoder.model_max_length,
                                                caption_channels=model_cfg.caption_channels)
            if "BrushNet" in model_type and "x_inpaint" not in example_batch:
                nc_ = model_cfg.nc
                t_, h_, w_ = 9, int(example_batch["height"]), int(example_batch["width"])
                rng_np = np.random.default_rng(0)
                example_batch = dict(example_batch)
                example_batch["x_inpaint"] = jnp.asarray(rng_np.standard_normal(
                    (1, 3 * nc_, t_, h_, w_)).astype(np.float32))
                example_batch["mask_inpaint"] = jnp.asarray(rng_np.integers(
                    0, 2, (1, nc_, t_, h_, w_)).astype(np.float32))
                if getattr(model_cfg, "sde_inpaint", False):
                    example_batch["t_inpaint"] = jnp.full((1,), 300.0)
                    example_batch["rngs_key"] = jax.random.PRNGKey(0)
            params = model.init(k1, **example_batch)
            if vae.params is None:  # keep load_pretrained weights if present
                vae.init(k2)
        pipe = cls(model, params, vae, text_encoder, scheduler, cfg, mesh=mesh)
        return pipe

    # ------------------------------------------------------------------
    def model_param(self, *path):
        node = self.params["params"]
        for p in path:
            node = node[p]
        return node

    @property
    def uncond_cam(self):
        return self.model_param("camera_embedder", "uncond_cam")

    @property
    def uncond_rel_pos(self):
        return self.model_param("frame_embedder", "uncond_cam")

    def null_y(self, n: int):
        y_embedding = self.model_param("y_embedder", "y_embedding")
        self.text_encoder.set_null_embedding(y_embedding)
        return self.text_encoder.null(n)

    def prepare_text_embedding(self):
        """Initialize bbox class tokens + base_token from the text encoder (reference
        prepare_text_embedding, magicdrive_stdit3.py:1009-1019). Mutates params."""
        classes = list(getattr(self.text_encoder, "class_names", None) or [
            "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
            "motorcycle", "bicycle", "pedestrian", "traffic_cone"])

        def embed(text):
            ret = self.text_encoder.encode([text])
            y = self.model.apply(self.params, ret["y"],
                                 method=lambda m, y: m.encode_text(y))
            n_tok = int(np.asarray(ret["mask"]).sum())
            return np.asarray(y)[0, :n_tok]

        # functionally replace ONLY the two touched leaves: round-tripping the
        # whole ~2B-param tree through numpy would drop committed shardings
        # (and crash on non-addressable multi-host arrays)
        old = self.params["params"]["bbox_embedder"]["class_tokens"]
        tokens = np.array(old)
        for i, name in enumerate(classes):
            tokens[i] = embed(name).mean(axis=0)
        inner = dict(self.params["params"])
        be = dict(inner["bbox_embedder"])
        be["class_tokens"] = jnp.asarray(tokens, old.dtype)
        inner["bbox_embedder"] = be
        base_old = inner.get("base_token")
        inner["base_token"] = jnp.asarray(
            embed("")[0], None if base_old is None else base_old.dtype)
        self.params = {**self.params, "params": inner}

    # ------------------------------------------------------------------
    def _build_predict_fn(self, model_args: Dict, guidance_scale, slice_cfg: bool,
                          z_shape=None, null_y=None, params=None,
                          use_map0: bool = False):
        """Returns predict(z, t, x_mask) -> CFG-combined velocity; model_args hold the
        conditioning (already doubled for batched CFG). z_shape (the latent shape)
        enables the per-sample condition cache. null_y overrides the y_embedder null
        embedding in CFG (reference neg_prompts, rf/__init__.py:58-59). use_map0:
        the uncond half sees a ZEROED map instead of the conditional one
        (reference add_null_condition use_map0, inference_utils.py:273-280).

        Pure in (params, model_args, null_y, guidance_scale): safe to call under
        jit with tracers for all of them (the jit-cached sample path does)."""
        scale = guidance_scale
        apply = self.model.apply
        params = self.params if params is None else params
        uncond_cam = params["params"]["camera_embedder"]["uncond_cam"]
        uncond_rel_pos = params["params"]["frame_embedder"]["uncond_cam"]
        if null_y is None:
            null_y = self.null_y(model_args["y"].shape[0])

        def cond_cache_for(args, z_shape):
            """Precompute step-independent conditioning once per sample (the
            reference re-embeds every Euler step, magicdrive_stdit3.py:1115-1157).
            BrushNet variants inherit encode_conditions, so they cache too.
            No blanket try/except here: a broken encode_conditions must fail
            loudly, not silently re-embed conditions every Euler step."""
            return apply(params, tuple(z_shape), args["y"], args["maps"],
                         args.get("bbox"), args["cams"], args["rel_pos"],
                         frame_valid=args.get("frame_valid"),
                         method=type(self.model).encode_conditions)

        if not slice_cfg:
            args2 = add_null_condition(model_args, uncond_cam, uncond_rel_pos,
                                       use_map0=use_map0)
            args2["y"] = jnp.concatenate([model_args["y"], null_y], axis=0)
            # computed HERE (outside the sampler's lax.scan) so the 30-step loop
            # reuses the same embedded conditions
            cache2 = cond_cache_for(args2, (2 * z_shape[0],) + tuple(z_shape[1:])) \
                if z_shape is not None else None

            def predict(z, t, x_mask):
                z_in = jnp.concatenate([z, z], axis=0)
                t_in = jnp.concatenate([t, t], axis=0)
                xm = None if x_mask is None else jnp.concatenate([x_mask, x_mask], 0)
                pred = apply(params, z_in, t_in, **args2, x_mask=xm,
                             cond_cache=cache2)
                if pred.shape[1] == z_in.shape[1] * 2:
                    pred = jnp.split(pred, 2, axis=1)[0]
                cond, uncond = jnp.split(pred, 2, axis=0)
                return uncond + scale * (cond - uncond)

            return predict

        null_args = replace_with_null_condition(
            model_args, uncond_cam, uncond_rel_pos, null_y,
            ["y", "bbox", "cams", "rel_pos"] + (["maps"] if use_map0 else []))
        cache_c = cond_cache_for(model_args, z_shape) if z_shape is not None else None
        cache_n = cond_cache_for(null_args, z_shape) if z_shape is not None else None

        def predict(z, t, x_mask):
            def run(args, cache):
                pred = apply(params, z, t, **args, x_mask=x_mask, cond_cache=cache)
                if pred.shape[1] == z.shape[1] * 2:
                    pred = jnp.split(pred, 2, axis=1)[0]
                return pred
            all_pred = run(model_args, cache_c)
            null_pred = run(null_args, cache_n)
            return null_pred + scale * (all_pred - null_pred)

        return predict

    def _cached_jit(self, kind, sched, height, width, num_frames, extra, build):
        """Per-(program kind, scheduler identity+state, pixel shape, extra
        statics) jit cache. Without it every `sample`/`sample_repaint` call
        re-traces the 30-step loop (~30 s host time at the tiny-test shape
        alone); with it, repeat calls at a shape bucket reuse the executable —
        the reference keeps torch modules resident instead (inference loop,
        scripts/inference_magicdrive.py:334-539). jit's own signature cache
        handles z/conditioning shape and mask-None variation under each key."""
        import dataclasses as _dc

        key = (kind, type(sched).__name__, float(height), float(width),
               int(num_frames), _dc.astuple(sched), extra)
        fn = self._sample_fns.get(key)
        if fn is None:
            core = build()
            if self.mesh is not None:
                mesh, inner = self.mesh, core

                def core(*a, **k):
                    # mesh context is read at TRACE time by the model's
                    # shard_hint constraints; GSPMD shards the token axis
                    with use_mesh(mesh):
                        return inner(*a, **k)
            fn = jax.jit(core)
            self._sample_fns[key] = fn
        return fn

    def _jit_sample_fn(self, sched, height, width, num_frames,
                       use_map0: bool = False):
        """Jit-compiled whole-sample program (condition embed + CFG + Euler
        scan), cached per (scheduler, pixel shape, use_map0)."""
        hf, wf, nf = float(height), float(width), float(num_frames)
        slice_cfg = sched.slice_cfg

        def build():
            def core(params, z, rng, model_args, null_y, mask, scale):
                model_args = dict(model_args)
                # full-length bucket padding: timestep_transform sees the
                # VALID clip length (dynamic, so one compile serves them all)
                nf_valid = model_args.pop("num_frames_valid", None)
                predict = self._build_predict_fn(
                    {**model_args, "height": hf, "width": wf}, scale, slice_cfg,
                    z_shape=tuple(z.shape), null_y=null_y, params=params,
                    use_map0=use_map0)
                bsz = z.shape[0]
                hw = dict(height=jnp.full((bsz,), hf), width=jnp.full((bsz,), wf),
                          num_frames=jnp.full((bsz,), nf) if nf_valid is None
                          else jnp.asarray(nf_valid, jnp.float32))
                return sched.sample(predict, z, mask=mask, rng=rng, **hw)

            return core

        return self._cached_jit("sample", sched, height, width, num_frames,
                                bool(use_map0), build)

    def sample(self, batch: Dict, *, num_frames: int, height: int, width: int,
               rng: Optional[jax.Array] = None, z: Optional[jnp.ndarray] = None,
               mask: Optional[jnp.ndarray] = None, guidance_scale: Optional[float] = None,
               decode: bool = True, torch_seed: Optional[int] = None,
               neg_prompts: Optional[list] = None, use_map0: bool = False):
        """Generate a sample.

        batch: dict with y (B,1,L,4096) [or 'captions' strings], maps, bbox, cams,
        rel_pos, fps. num_frames/height/width: pixel-space target (static).
        """
        sched = self.scheduler
        guidance_scale = guidance_scale if guidance_scale is not None else sched.cfg_scale
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if "y" not in batch and "captions" in batch:
            enc = self.text_encoder.encode(batch["captions"])
            batch = {k: v for k, v in batch.items() if k != "captions"}
            batch["y"] = enc["y"]

        model_cfg = self.model.cfg
        nc = model_cfg.nc
        b = batch["y"].shape[0]
        lat_t, lat_h, lat_w = self.vae.get_latent_size([num_frames, height, width])
        if z is None:
            z_shape = (b, model_cfg.in_channels * nc, lat_t, lat_h, lat_w)
            if torch_seed is not None:
                # reference seed contract: torch.manual_seed(1024+ns); torch.randn
                from ..utils.misc import torch_randn
                z = jnp.asarray(torch_randn(z_shape, seed=torch_seed))
            else:
                zk, rng = jax.random.split(rng)
                z = jax.random.normal(zk, z_shape, jnp.float32)

        model_args = {k: batch[k] for k in ("y", "maps", "bbox", "cams", "rel_pos",
                                            "fps", "x_inpaint", "mask_inpaint",
                                            "t_inpaint", "rngs_key", "num_timesteps",
                                            "frame_valid", "num_frames_valid")
                      if k in batch}
        if neg_prompts is not None:
            ny = self.text_encoder.encode(list(neg_prompts))["y"]
            null_y = jnp.broadcast_to(ny, (b,) + tuple(ny.shape[1:])) \
                if ny.shape[0] != b else ny
        else:
            null_y = self.null_y(b)  # host-side text-encoder read, cheap

        samples = self._jit_sample_fn(sched, height, width, num_frames,
                                      use_map0=use_map0)(
            self.params, z, rng, model_args, null_y, mask,
            jnp.float32(guidance_scale))
        if not decode:
            return samples
        # (b, C*NC, T', H', W') -> (b*NC, C, T', H', W') for VAE decode
        C = model_cfg.in_channels
        lat = samples.reshape(b, C, nc, lat_t, lat_h, lat_w).transpose(0, 2, 1, 3, 4, 5)
        lat = lat.reshape(b * nc, C, lat_t, lat_h, lat_w)
        if self.mesh is not None:
            # batch-scatter the 6-camera decode over the sp devices
            # (reference sp_vae, train_utils.py:640-683)
            from ..parallel.sharding import sp_vae
            vids = sp_vae(lat.astype(self.vae.cfg.dtype), self.vae.decode,
                          self.mesh)
        else:
            vids = self.vae.decode(lat.astype(self.vae.cfg.dtype))
        return np.asarray(vids.astype(jnp.float32)).reshape(
            b, nc, *vids.shape[1:])

    def sample_repaint(self, batch: Dict, ref_z, lat_mask, *, num_frames: int,
                       height: int, width: int, rng: jax.Array,
                       guidance_scale: Optional[float] = None, scheduler=None,
                       use_map0: bool = False):
        """RePaint latent inpainting (reference rf/__init__.py:780-888), jit-cached
        like `sample`. ref_z: (B, C*NC, T', H', W') reference latents; lat_mask same
        shape, 1 = region kept from the (noised) reference."""
        sched = scheduler if scheduler is not None else self.scheduler
        if guidance_scale is None:
            guidance_scale = sched.cfg_scale
        model_args = {k: batch[k] for k in ("y", "maps", "bbox", "cams", "rel_pos",
                                            "fps", "frame_valid",
                                            "num_frames_valid") if k in batch}
        null_y = self.null_y(model_args["y"].shape[0])
        hf, wf, nf = float(height), float(width), float(num_frames)

        def build():
            def core(params, ref_z, mask, rng, model_args, null_y, scale):
                model_args = dict(model_args)
                # padded full-length repaint: timestep_transform sees each
                # sample's TRUE length; frame_valid rides into the model
                nf_valid = model_args.pop("num_frames_valid", None)
                predict = self._build_predict_fn(
                    {**model_args, "height": hf, "width": wf}, scale, True,
                    z_shape=tuple(ref_z.shape), null_y=null_y, params=params,
                    use_map0=use_map0)
                bsz = ref_z.shape[0]
                hw = dict(height=jnp.full((bsz,), hf),
                          width=jnp.full((bsz,), wf),
                          num_frames=jnp.full((bsz,), nf) if nf_valid is None
                          else jnp.asarray(nf_valid, jnp.float32))
                return sched.sample_repaint(predict, ref_z, mask, rng=rng, **hw)

            return core

        fn = self._cached_jit("repaint", sched, height, width, num_frames,
                              bool(use_map0), build)
        return fn(self.params, jnp.asarray(ref_z), jnp.asarray(lat_mask), rng,
                  model_args, null_y, jnp.float32(guidance_scale))


def synthetic_batch(model_cfg, num_frames: int, height: int, width: int,
                    l_box: int = 10, l_txt: int = 300, caption_channels: int = 4096,
                    b: int = 1, map_size=(8, 400, 400), seed: int = 0) -> Dict:
    """Shape-correct synthetic conditioning for tests/benchmarks (stands in for the
    nuScenes loader output contract, SURVEY.md L0->L6 interface)."""
    rng = np.random.default_rng(seed)
    nc = model_cfg.nc
    vae_t = 1 if num_frames == 1 else (num_frames - 1) // 4 + 1
    x = rng.standard_normal((b, model_cfg.in_channels * nc, vae_t, height // 8,
                             width // 8), np.float32)
    bbox_cls = model_cfg.bbox_embedder_cls
    bbox_param = dict(model_cfg.bbox_embedder_param)
    batch = dict(
        x=jnp.asarray(x),
        timestep=jnp.full((b,), 500.0),
        y=jnp.asarray(rng.standard_normal((b, 1, l_txt, caption_channels), np.float32)),
        maps=jnp.asarray(rng.random((b, num_frames) + tuple(map_size), np.float32)),
        bbox=dict(
            bboxes=jnp.asarray(rng.standard_normal(
                (b * nc, num_frames, l_box, 8, 3), np.float32) * 10),
            classes=jnp.asarray(rng.integers(0, bbox_param.get("n_classes", 10),
                                             (b * nc, num_frames, l_box)), jnp.int32),
            masks=jnp.asarray(rng.integers(0, 2, (b * nc, num_frames, l_box)),
                              jnp.int32),
        ),
        cams=jnp.asarray(rng.standard_normal((b * nc, num_frames, 1, 3, 7), np.float32)),
        rel_pos=jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32),
                                            (b * nc, num_frames, 1, 4, 4)).copy()),
        fps=jnp.full((b,), 12.0),
        height=float(height),
        width=float(width),
    )
    if bbox_param.get("sample_id"):
        dim = bbox_param.get("class_token_dim", 1152)
        batch["bbox"]["box_latent"] = jnp.asarray(
            rng.standard_normal((b * nc, num_frames, l_box, dim), np.float32))
    return batch
