from .magicdrive import MagicDrivePipeline

__all__ = ["MagicDrivePipeline"]
