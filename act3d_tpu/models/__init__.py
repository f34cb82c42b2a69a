"""Model library: Act3D keypose predictor + ChainedDiffuser trajectory DDPM.

Mirrors the reference's public surface (reference: model/__init__.py:1-2).
"""

from .act3d import Act3D
from .diffusion_head import DiffusionHead
from .diffusion_planner import DiffusionPlanner, compute_trajectory

__all__ = ["Act3D", "DiffusionHead", "DiffusionPlanner", "compute_trajectory"]
