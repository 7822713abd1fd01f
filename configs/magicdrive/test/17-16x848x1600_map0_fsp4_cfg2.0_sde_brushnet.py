# W-CODA Track2 generation with the SDE-BrushNet model (reference
# configs/magicdrive/test/..._map0_fsp4_cfg2.0_sde_brushnet.py): independent
# inpaint timestep t_inpaint = inpaint_noise_scale * num_timesteps and
# structured (phase-preserving FFT) noise on the shallow-encoded inpaint branch.
_base_ = "./17-16x848x1600_map0_fsp4_cfg2.0.py"

outputs = "outputs/test/848_map0_fsp4_sde_brushnet"

scheduler = dict(type="rflow-sdebrushnet-slice", inpaint_noise_scale=0.2)

model = dict(type="MagicDriveSTDiT3-XL/2-SDEBrushNet")
