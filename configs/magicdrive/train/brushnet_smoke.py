# Tiny BrushNet smoke config (CPU synthetic).
from magicdrive_v2_tpu.config.presets import MV_ORDER_MAP, rflow, xl2_model

dtype = "fp32"
seed = 0
outputs = "outputs/train/brushnet_smoke"
num_frames = 9
image_size = (64, 80)
bbox_mode = "all-xyz"
mv_order_map = MV_ORDER_MAP
vae_out_channels = 16

model = xl2_model(bbox_mode=bbox_mode, control_skip_temporal=False)
model.update(depth=2, control_depth=1, hidden_size=64, num_heads=4)
model["bbox_embedder_param"].update(class_token_dim=64, proj_dims=[64, 32, 32, 64],
                                    num_heads=4)
model["frame_emb_param"].update(num_heads=4)
model["map_embedder_param"].update(block_out_channels=[8, 16, 24, 32])
model["model_max_length"] = 32
model.pop("from_pretrained", None)

scheduler = rflow()
lr = 1e-4
grad_checkpoint = False
batch_size = 1
synthetic_steps = 3
