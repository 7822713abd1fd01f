# Tiny smoke inference config (CPU): reduced-depth model, synthetic conditioning.
from magicdrive_v2_tpu.config.presets import MV_ORDER_MAP, rflow, xl2_model

dtype = "fp32"
seed = 42
outputs = "outputs/inference/brushnet_smoke"
num_sample = 1
num_frames = 9
image_size = (64, 80)
save_fps = 12

bbox_mode = "all-xyz"
mv_order_map = MV_ORDER_MAP
vae_out_channels = 16

model = xl2_model(bbox_mode=bbox_mode, control_skip_temporal=False)
model["type"] = "MagicDriveSTDiT3-XL/2-SDEBrushNet"
model.update(depth=2, control_depth=1, hidden_size=64, num_heads=4)
model["bbox_embedder_param"].update(class_token_dim=64, proj_dims=[64, 32, 32, 64],
                                    num_heads=4)
model["frame_emb_param"].update(num_heads=4)
model["map_embedder_param"].update(block_out_channels=[8, 16, 24, 32])
model["model_max_length"] = 32
model.pop("from_pretrained", None)

scheduler = rflow(num_sampling_steps=4, cfg_scale=2.0, type="rflow-sdebrushnet", inpaint_noise_scale=0.2)
vae = dict(micro_frame_size=None, micro_batch_size=None)
text_encoder = dict(type="t5-dummy", model_max_length=32)
