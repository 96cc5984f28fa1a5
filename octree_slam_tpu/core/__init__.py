from octree_slam_tpu.core.types import (
    BoundingBox,
    Camera,
    Frame,
    Mesh,
    PyramidLevel,
    Texture,
    VoxelGrid,
)
from octree_slam_tpu.core import packing, se3, camera

__all__ = [
    "BoundingBox",
    "Camera",
    "Frame",
    "Mesh",
    "PyramidLevel",
    "Texture",
    "VoxelGrid",
    "packing",
    "se3",
    "camera",
]
