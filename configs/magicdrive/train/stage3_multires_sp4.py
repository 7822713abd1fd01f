# Stage 3: multi-resolution 224/424/848, sequence parallel 4, bucketed batches
# (reference configs/magicdrive/train/stage3_...sp4.py:85-102 bucket_config;
#  iter-time comments quoted in BASELINE.md)
from magicdrive_v2_tpu.config.presets import (
    MV_ORDER_MAP, cogvae, default_mask_ratios, img_collate_param, rflow, t5_xxl,
    xl2_model)

dtype = "bf16"
seed = 42
outputs = "outputs/train/stage3"

fps = 12
bbox_mode = "all-xyz"
img_collate_param_train = img_collate_param(bbox_mode)

sp_size = 4
# reference sp4simu8 recipe: random train-time H-pad for sp in {4, 8} so the
# checkpoint runs at either without the grid effect (ref stage3 ...sp4simu8.py:166)
simulate_sp_size = [4, 8]
force_pad_h_for_sp_size = None
mv_order_map = MV_ORDER_MAP
vae_out_channels = 16

model = xl2_model(bbox_mode=bbox_mode, control_skip_temporal=False, sp_size=sp_size,
                  force_pad_h_for_sp_size=force_pad_h_for_sp_size)
# micro_frame_size=8 like the reference stage3 (vae streams encode in 8-frame
# chunks with carried conv caches; 8n/8n+1 clip lengths)
vae = cogvae(micro_frame_size=8, micro_batch_size=1)
text_encoder = t5_xxl()
scheduler = rflow(sample_method="logit-normal")

# per-bucket device batch size, key "H-W-fps-T" (reference stage3 bucket_config).
# Each bucket is one static XLA compilation.
bucket_config = {
    "224-400-12-full": 1,
    "224-400-12-33": 4,
    "424-800-12-17": 6,
    "424-800-12-129": 1,
    "424-800-12-full": 1,
    "848-1600-12-9": 2,
    "848-1600-12-33": 1,
}

lr = 1e-5
weight_decay = 1e-2
adam_eps = 1e-15
grad_clip = 1.0
warmup_steps = 500
ema_decay = 0.99
grad_checkpoint = True
epochs = 4
ckpt_every = 500
log_every = 10
mask_ratios = default_mask_ratios()
drop_cond_ratio = 0.15
drop_cond_ratio_t = 0.4
