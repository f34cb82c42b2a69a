"""act3d_tpu — TPU-native Act3D + ChainedDiffuser framework.

See README.md for the architecture map and SURVEY.md for the reference
analysis this framework re-implements TPU-first.
"""

__version__ = "0.1.0"

from .models import Act3D, DiffusionHead, DiffusionPlanner, compute_trajectory

__all__ = [
    "Act3D",
    "DiffusionHead",
    "DiffusionPlanner",
    "compute_trajectory",
    "__version__",
]
