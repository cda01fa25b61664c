"""TPU-native point-cloud segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
DJacquemont/pointcloud_segmentation: streaming ToF point clouds -> persistent
3D wireframe map of steel structures (window/voxel pre-processing, iterative
3D Hough line extraction, PCA gating, drone->world transform, weighted
segment fusion, pairwise intersections), with reference-compatible YAML
config and CSV outputs.
"""

from .config import PipelineConfig, StaticShapes, default_config, NUM_DIRECTIONS

__version__ = "0.1.0"

__all__ = [
    "PipelineConfig",
    "StaticShapes",
    "default_config",
    "NUM_DIRECTIONS",
    "__version__",
]
