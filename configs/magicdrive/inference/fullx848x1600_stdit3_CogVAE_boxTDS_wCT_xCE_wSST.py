# Full-length 6-view 848x1600 generation with sequence parallelism (reference:
# configs/magicdrive/inference/fullx848x1600_stdit3_CogVAE_boxTDS_wCT_xCE_wSST.py)
from magicdrive_v2_tpu.config.presets import (
    MV_ORDER_MAP, cogvae, img_collate_param, rflow, t5_xxl, xl2_model)

fps = 12
frame_interval = 1
save_fps = 12
validation_index = list(range(150))
num_sample = 1
batch_size = 1
dtype = "bf16"
seed = 42
outputs = "outputs/test/CogVAE-848"

num_frames = "full"
# bucket max-T: every scene pads to ONE compiled length (reference anchors ~232
# frames / T'=58, doc/FAQ.md:94-101; 233 is the nearest 8n+1 grid). Scenes longer
# than this raise; the decoded video is trimmed to each scene's true length.
full_bucket_t = 233
image_size = (848, 1600)
data_cfg_name = "Nuscenes_400_map_cache_box_t_with_n2t_12Hz_848x1600"
bbox_mode = "all-xyz"
img_collate_param_train = img_collate_param(bbox_mode)
dataset_cfg_overrides = (
    ("dataset.data.val.ann_file",
     "./data/nuscenes_mmdet3d-12Hz/nuscenes_interp_12Hz_infos_val_with_bid.pkl"),
    ("+dataset.data.val.start_on_firstframe", True),
    ("+dataset.data.val.micro_frame_size", 8),
)

sp_size = 8
mv_order_map = MV_ORDER_MAP
t_order_map = None
vae_out_channels = 16
micro_frame_size = None

# two-pass CFG to halve activation memory at this resolution
scheduler = rflow(num_sampling_steps=30, cfg_scale=2.0)
scheduler["type"] = "rflow-slice"
model = xl2_model(bbox_mode=bbox_mode, control_skip_temporal=False, sp_size=sp_size,
                  force_pad_h_for_sp_size=8, from_pretrained="???")
vae = cogvae(micro_frame_size=micro_frame_size, micro_batch_size=1)
text_encoder = t5_xxl()

vae_tiling = 384
cpu_offload = False
