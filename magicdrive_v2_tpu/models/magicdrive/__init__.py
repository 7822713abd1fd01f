from .stdit3 import (
    MagicDriveSTDiT3,
    MagicDriveSTDiT3Config,
    MVSTDiTBlock,
    build_model_config,
)

__all__ = ["MagicDriveSTDiT3", "MagicDriveSTDiT3Config", "MVSTDiTBlock",
           "build_model_config"]
