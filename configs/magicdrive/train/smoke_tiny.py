# Tiny smoke config: reduced-depth model, synthetic data, a few steps on CPU.
# Used by tests and the verify flow; not a reference config.
from magicdrive_v2_tpu.config.presets import (
    MV_ORDER_MAP, img_collate_param, rflow, xl2_model)

dtype = "fp32"
seed = 0
outputs = "outputs/train/smoke"

num_frames = 9
image_size = (64, 80)
bbox_mode = "all-xyz"

sp_size = 1
mv_order_map = MV_ORDER_MAP
vae_out_channels = 16

model = xl2_model(bbox_mode=bbox_mode, control_skip_temporal=False)
model.update(depth=2, control_depth=1, hidden_size=64, num_heads=4)
model["bbox_embedder_param"].update(class_token_dim=64, proj_dims=[64, 32, 32, 64],
                                    num_heads=4)
model["frame_emb_param"].update(num_heads=4)
model["map_embedder_param"].update(block_out_channels=[8, 16, 24, 32])
model.pop("from_pretrained", None)

scheduler = rflow()

lr = 1e-4
grad_checkpoint = False
# in-training validation (reference report_every; tiny 2-step sampler on CPU)
report_every = 4
num_validation = 1
val_scheduler = rflow(num_sampling_steps=2)
val_guidance_scale = 2.0
batch_size = 1
epochs = 1
ckpt_every = 4
log_every = 1
synthetic_steps = 6
synthetic_buckets = [(9, 64, 80)]
mask_ratios = {}
drop_cond_ratio = 0.15
drop_cond_ratio_t = 0.4
