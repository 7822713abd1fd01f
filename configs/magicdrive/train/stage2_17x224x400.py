# Stage 2: short-video 6-view 224x400 at 12 Hz with temporal blocks
# (reference configs/magicdrive/train/stage2: 1-33 frames x 224x400)
from magicdrive_v2_tpu.config.presets import (
    MV_ORDER_MAP, cogvae, default_mask_ratios, img_collate_param, rflow, t5_xxl,
    xl2_model)

dtype = "bf16"
seed = 42
outputs = "outputs/train/stage2"

num_frames = 17
image_size = (224, 400)
fps = 12
bbox_mode = "all-xyz"
img_collate_param_train = img_collate_param(bbox_mode)

sp_size = 1
mv_order_map = MV_ORDER_MAP
vae_out_channels = 16

model = xl2_model(bbox_mode=bbox_mode, control_skip_temporal=False, sp_size=sp_size)
vae = cogvae(micro_frame_size=17, micro_batch_size=1)
text_encoder = t5_xxl()
scheduler = rflow(sample_method="logit-normal")

lr = 8e-5
weight_decay = 1e-2
adam_eps = 1e-15
grad_clip = 1.0
warmup_steps = 1000
ema_decay = 0.99
grad_checkpoint = True
batch_size = 4
epochs = 4
ckpt_every = 1000
log_every = 10
mask_ratios = default_mask_ratios()
drop_cond_ratio = 0.15
drop_cond_ratio_t = 0.4
