"""W-CODA Track2 generation with the BrushNet inpainting model (reference
scripts/test_magicdrive_brushnet.py, 669 LoC).

Thin CLI-parity wrapper: all machinery (grid-video pedestrian inputs,
back-transform, save modes, use_map0) lives in scripts/test_magicdrive.py,
which this invokes with --brushnet forced.
"""
import sys

from test_magicdrive import main, parse_args  # noqa: F401

if __name__ == "__main__":
    if "--brushnet" not in sys.argv:
        sys.argv.append("--brushnet")
    main()
