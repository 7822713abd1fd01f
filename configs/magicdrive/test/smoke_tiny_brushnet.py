# Tiny smoke config for the BrushNet/SDE W-CODA test apps (CPU).
_base_ = "../inference/brushnet_smoke.py"

outputs = "outputs/test/smoke_brushnet"
post = dict(resize=[128, 160], padding=[0, 4, 0, 0], cut_length=8)
save_mode = "all-in-one"
use_map0 = True
