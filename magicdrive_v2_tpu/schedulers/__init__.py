from .rf import RFLOW, RFLOW_SLICE, add_noise, build_scheduler, mean_flat, timestep_transform

__all__ = ["RFLOW", "RFLOW_SLICE", "add_noise", "build_scheduler", "mean_flat",
           "timestep_transform"]
