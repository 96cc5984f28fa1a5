"""octree-slam-tpu: a TPU-native dense RGB-D SLAM and voxel rendering engine.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the CUDA/OpenGL
reference implementation dkotfis/Octree-SLAM (see SURVEY.md): point-to-plane ICP
camera tracking over an image pyramid, fusion of colored depth frames into a
sparse voxel octree (SVO) world map, voxel cone-traced raycast rendering,
triangle-mesh voxelization, and point-cloud / voxel-cube / software-raster
display paths.

Design stance (TPU-first, not a port):
  * The pointer octree + dynamic cudaMalloc of the reference becomes a
    static-shape, Morton-keyed linear node pool with prefix-sum batch
    allocation (map/svo.py).
  * thrust sort/unique/remove_if/copy_if stream compaction becomes
    lax.sort + first-occurrence masks + cumsum ranks + masked scatter.
  * The per-frame track -> fuse -> render loop is a single jitted program
    with no host round-trips (pipeline.py).
  * Rendering returns plain HxWx4 framebuffer arrays (no GL interop).
"""

__version__ = "0.1.0"

from octree_slam_tpu.config import SLAMConfig

__all__ = ["SLAMConfig"]
