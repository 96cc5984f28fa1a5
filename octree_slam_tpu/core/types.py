"""Core array types.

TPU-native analogs of the reference's POD structs in
include/octree_slam/common_types.h:8-79 (BoundingBox, Mesh, bmp_texture,
Camera, Color256, VoxelGrid, RawFrame, SVO). All are NamedTuples of jnp
arrays, i.e. pytrees that pass through jit/vmap/shard_map. GPU-pointer
ownership semantics (common_types.cu:36-52) are irrelevant: arrays are
device-resident values.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class BoundingBox(NamedTuple):
    """Axis-aligned box. Mirrors common_types.h:8-14 (bbox0=min, bbox1=max)."""

    bbox0: jnp.ndarray  # f32[3] min corner
    bbox1: jnp.ndarray  # f32[3] max corner

    def contains(self, other: "BoundingBox") -> jnp.ndarray:
        """True if `other` is fully inside self (common_types.cu:8-18)."""
        return jnp.all(other.bbox0 >= self.bbox0) & jnp.all(other.bbox1 <= self.bbox1)

    def distance_outside(self, other: "BoundingBox") -> jnp.ndarray:
        """Max per-axis distance `other` pokes outside self
        (common_types.cu:20-34)."""
        lo = jnp.maximum(self.bbox0 - other.bbox0, 0.0)
        hi = jnp.maximum(other.bbox1 - self.bbox1, 0.0)
        return jnp.max(jnp.maximum(lo, hi))

    @property
    def center(self) -> jnp.ndarray:
        return 0.5 * (self.bbox0 + self.bbox1)


def bbox_of_points(points: jnp.ndarray, valid: jnp.ndarray | None = None) -> BoundingBox:
    """Bounding box of a point cloud, ignoring non-finite points.

    Replaces the thrust::reduce min/max functors (image_kernels.cu:60-102)
    with XLA tree reductions.
    """
    finite = jnp.all(jnp.isfinite(points), axis=-1)
    if valid is not None:
        finite = finite & valid
    big = jnp.float32(3.0e38)
    lo = jnp.min(jnp.where(finite[:, None], points, big), axis=0)
    hi = jnp.max(jnp.where(finite[:, None], points, -big), axis=0)
    return BoundingBox(bbox0=lo, bbox1=hi)


class Camera(NamedTuple):
    """Camera matrices (common_types.h Camera: model/view/projection/mvp/fov)."""

    model: jnp.ndarray       # f32[4,4]
    view: jnp.ndarray        # f32[4,4]
    projection: jnp.ndarray  # f32[4,4]
    fov: jnp.ndarray         # f32[] vertical fov (degrees)

    @property
    def modelview(self) -> jnp.ndarray:
        return self.view @ self.model

    @property
    def mvp(self) -> jnp.ndarray:
        return self.projection @ self.modelview


class Frame(NamedTuple):
    """Raw sensor frame (RawFrame, common_types.h + common_types.cu:36-45).

    depth is uint16 millimeters, color is uint8 RGB; host->HBM transfer via
    jax.device_put replaces the cudaMemcpy H2D at openni_device.cpp:122,144.
    """

    depth: jnp.ndarray      # u16[H, W] millimeters
    color: jnp.ndarray      # u8[H, W, 3]
    timestamp: jnp.ndarray  # f32[] seconds


class PyramidLevel(NamedTuple):
    """Per-level ICP data (ICPFrame + RGBDFrame, localization_kernels.h:17-33)."""

    vertex: jnp.ndarray     # f32[h, w, 3] camera/world-frame points (INF invalid)
    normal: jnp.ndarray     # f32[h, w, 3] unit normals (INF invalid)
    intensity: jnp.ndarray  # f32[h, w]


class VoxelGrid(NamedTuple):
    """Compacted occupied-voxel list (common_types.h VoxelGrid).

    Static-capacity: `centers`/`colors` are padded to a fixed size with
    `count` live entries — the TPU replacement for thrust::copy_if output.
    """

    centers: jnp.ndarray  # f32[cap, 3]
    colors: jnp.ndarray   # f32[cap, 4] rgba in [0,1]
    count: jnp.ndarray    # i32[] number of valid voxels
    scale: jnp.ndarray    # f32[] half voxel edge (voxelization.cu:78-80)
    bbox: BoundingBox


class Mesh(NamedTuple):
    """Triangle mesh (common_types.h Mesh: vbo/nbo/cbo/ibo/tbo + bbox)."""

    vertices: jnp.ndarray   # f32[V, 3]
    normals: jnp.ndarray    # f32[V, 3]
    colors: jnp.ndarray     # f32[V, 3]
    faces: jnp.ndarray      # i32[F, 3]
    texcoords: jnp.ndarray  # f32[F, 3, 2] per-corner uv (tbo layout)
    bbox: BoundingBox

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]


class Texture(NamedTuple):
    """RGB texture (bmp_texture, common_types.h)."""

    data: jnp.ndarray  # f32[h, w, 3] in [0,1]


def make_empty_mesh() -> Mesh:
    z3 = jnp.zeros((0, 3), jnp.float32)
    return Mesh(
        vertices=z3,
        normals=z3,
        colors=z3,
        faces=jnp.zeros((0, 3), jnp.int32),
        texcoords=jnp.zeros((0, 3, 2), jnp.float32),
        bbox=BoundingBox(jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32)),
    )


def np_bbox(lo, hi) -> BoundingBox:
    return BoundingBox(
        bbox0=jnp.asarray(np.asarray(lo), jnp.float32),
        bbox1=jnp.asarray(np.asarray(hi), jnp.float32),
    )
