# W-CODA2024 Track2 benchmark generation, base model (reference:
# configs/magicdrive/test/17-16x848x1600_stdit3_CogVAE_boxTDS_wCT_xCE_wSST_map0_fsp4_cfg2.0.py):
# generate 17 frames at 848x1600 on the track2 eval split, back-transform to
# 848x1600 + 52px top pad (-> 900x1600 nuScenes native), cut to 16 frames.
from magicdrive_v2_tpu.config.presets import (
    MV_ORDER_MAP, cogvae, img_collate_param, rflow, t5_xxl, xl2_model)

fps = 12
frame_interval = 1
save_fps = 12
validation_index = "all"
num_sample = 4
batch_size = 1
dtype = "bf16"
seed = 42
outputs = "outputs/test/848_map0_fsp4"

num_frames = 17
image_size = (848, 1600)
data_cfg_name = "Nuscenes_400_map_cache_box_t_with_n2t_12Hz_848x1600"
bbox_mode = "all-xyz"
img_collate_param_train = img_collate_param(bbox_mode)
dataset_cfg_overrides = (
    ("dataset.data.val.ann_file",
     "./data/nuscenes_mmdet3d-12Hz/nuscenes_interp_12Hz_infos_track2_eval_with_bid.pkl"),
    ("+dataset.data.val.start_on_firstframe", True),
)

post = dict(resize=[848, 1600], padding=[0, 52, 0, 0], cut_length=16)
save_mode = "image_filename"
use_map0 = True

sp_size = 4
mv_order_map = MV_ORDER_MAP
t_order_map = None
vae_out_channels = 16
micro_frame_size = None

scheduler = rflow(num_sampling_steps=30, cfg_scale=2.0)
scheduler["type"] = "rflow-slice"
model = xl2_model(bbox_mode=bbox_mode, control_skip_temporal=False, sp_size=sp_size,
                  force_pad_h_for_sp_size=4, from_pretrained="???")
vae = cogvae(micro_frame_size=8, micro_batch_size=1)
text_encoder = t5_xxl()

vae_tiling = 384
cpu_offload = False
