# 65-frame 848x1600 SDE-BrushNet (reference:
# configs/magicdrive/inference/65x848x1600_..._sde_brushnet.py)
from magicdrive_v2_tpu.config.presets import (
    MV_ORDER_MAP, cogvae, img_collate_param, rflow, t5_xxl, xl2_model)

fps = 12
save_fps = 12
validation_index = list(range(150))
num_sample = 1
batch_size = 1
dtype = "bf16"
seed = 42
outputs = "outputs/test/CogVAE-848-sde-brushnet"

num_frames = 65
image_size = (848, 1600)
data_cfg_name = "Nuscenes_400_map_cache_box_t_with_n2t_12Hz_848x1600"
bbox_mode = "all-xyz"
img_collate_param_train = img_collate_param(bbox_mode)
dataset_cfg_overrides = ()

sp_size = 4  # fsp4 (force_pad_h_for_sp_size)
mv_order_map = MV_ORDER_MAP
vae_out_channels = 16
micro_frame_size = None

scheduler = rflow(num_sampling_steps=30, cfg_scale=2.0,
                  type="rflow-sdebrushnet-slice", inpaint_noise_scale=0.2)
model = xl2_model(bbox_mode=bbox_mode, control_skip_temporal=False, sp_size=sp_size,
                  force_pad_h_for_sp_size=4, from_pretrained="???")
model["type"] = "MagicDriveSTDiT3-XL/2-SDEBrushNet"
vae = cogvae(micro_frame_size=micro_frame_size, micro_batch_size=1)
text_encoder = t5_xxl()
vae_tiling = 384
