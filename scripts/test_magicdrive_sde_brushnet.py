"""W-CODA Track2 generation with the SDE-BrushNet inpainting model (reference
scripts/test_magicdrive_sde_brushnet.py, 672 LoC).

Thin CLI-parity wrapper over scripts/test_magicdrive.py with --sde forced
(fixed t_inpaint = inpaint_noise_scale * num_timesteps, structured noise in
the model's add_noise path).
"""
import sys

from test_magicdrive import main, parse_args  # noqa: F401

if __name__ == "__main__":
    if "--sde" not in sys.argv:
        sys.argv.append("--sde")
    main()
