# Tiny smoke config for the W-CODA test apps (CPU): reduced-depth model,
# synthetic conditioning, small back-transform target.
_base_ = "../inference/smoke_tiny.py"

outputs = "outputs/test/smoke"
post = dict(resize=[128, 160], padding=[0, 4, 0, 0], cut_length=8)
save_mode = "all-in-one"
use_map0 = True
