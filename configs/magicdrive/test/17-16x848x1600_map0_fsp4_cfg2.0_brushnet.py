# W-CODA Track2 generation with the BrushNet pedestrian-inpainting model
# (reference configs/magicdrive/test/..._map0_fsp4_cfg2.0_brushnet.py): like the
# base test config but the scheduler is rflow-brushnet and the model carries the
# full-depth brushnet branch; pedestrian grid videos come from --ped-video-dir.
_base_ = "./17-16x848x1600_map0_fsp4_cfg2.0.py"

outputs = "outputs/test/848_map0_fsp4_brushnet"

from magicdrive_v2_tpu.config.presets import rflow  # noqa: E402

scheduler = rflow(num_sampling_steps=30, cfg_scale=2.0)
scheduler["type"] = "rflow-brushnet-slice"

model = dict(type="MagicDriveSTDiT3-XL/2-BrushNet")
