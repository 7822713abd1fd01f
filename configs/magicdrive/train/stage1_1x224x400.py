# Stage 1: single-frame (image) 6-view 224x400, no temporal blocks
# (reference configs/magicdrive/train/stage1: 1x224x400 image pretraining)
from magicdrive_v2_tpu.config.presets import (
    MV_ORDER_MAP, cogvae, default_mask_ratios, img_collate_param, rflow, t5_xxl,
    xl2_model)

dtype = "bf16"
seed = 42
outputs = "outputs/train/stage1"

num_frames = 1
image_size = (224, 400)
fps = 12
bbox_mode = "all-xyz"
img_collate_param_train = img_collate_param(bbox_mode)

sp_size = 1
mv_order_map = MV_ORDER_MAP
vae_out_channels = 16

model = xl2_model(bbox_mode=bbox_mode, with_temp_block=False,
                  control_skip_temporal=True, sp_size=sp_size)
vae = cogvae(micro_frame_size=None, micro_batch_size=4)
text_encoder = t5_xxl()
scheduler = rflow(sample_method="logit-normal")

# optimizer / runtime (reference stage configs: HybridAdam eps 1e-15, wd 1e-2)
lr = 8e-5
weight_decay = 1e-2
adam_eps = 1e-15
grad_clip = 1.0
warmup_steps = 1000
ema_decay = 0.99
grad_checkpoint = True
batch_size = 32
epochs = 10
ckpt_every = 1000
log_every = 10
mask_ratios = {}
drop_cond_ratio = 0.15
drop_cond_ratio_t = 0.4
