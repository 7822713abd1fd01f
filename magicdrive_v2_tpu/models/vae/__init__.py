from .cogvideox import (
    AutoencoderKLCogVideoX,
    CogVAEConfig,
    DiagonalGaussian,
    VideoAutoencoderKLCogVideoX,
)

__all__ = ["AutoencoderKLCogVideoX", "CogVAEConfig", "DiagonalGaussian",
           "VideoAutoencoderKLCogVideoX"]
