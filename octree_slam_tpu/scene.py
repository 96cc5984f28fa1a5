"""Scene facade: the reference's world-state API (scene.h:30-53).

Holds loaded meshes/textures, the octree world map, and the latest extracted
voxel grid; mirrors Scene's method surface with array-native types:

  loadObjFile      -> load_obj_file (io/obj.py parser)
  loadBMP          -> load_texture (io/bmp.py, also PNG/JPG via PIL)
  voxelizeMeshes   -> voxelize_meshes (VoxelPipe replacement)
  extractVoxelGridFromOctree -> extract_voxel_grid_from_octree
  addPointCloudToOctree      -> add_point_cloud_to_octree (auto-create at
                                first cloud, expand when the bbox escapes;
                                scene.cpp:98-113)
  meshes()/textures()/voxel_grid()/svo(bbox) -> properties/methods
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core.types import (BoundingBox, Mesh, Texture, VoxelGrid,
                                        bbox_of_points)
from octree_slam_tpu.io import bmp as bmp_io
from octree_slam_tpu.io import obj as obj_io
from octree_slam_tpu.map import voxelization
from octree_slam_tpu.map.octree import Octree
from octree_slam_tpu.map.svo import SVONodePool


class Scene:
    def __init__(self, cfg: SLAMConfig | None = None):
        self.cfg = cfg or SLAMConfig()
        self.meshes: List[Mesh] = []
        self.textures: List[Texture] = []
        self.tree: Optional[Octree] = None
        self.voxel_grid: Optional[VoxelGrid] = None

    # --- assets ---

    def load_obj_file(self, filename: str) -> Mesh:
        mesh = obj_io.load_obj(filename)
        self.meshes.append(mesh)
        return mesh

    def load_texture(self, filename: str) -> Texture:
        """Loads a texture and pairs it with the MOST RECENTLY loaded mesh
        (slot len(meshes)-1, earlier slots padded with None), so the
        natural load-obj-then-texture call order associates correctly even
        when an earlier mesh is untextured. The reference pairs purely by
        list index (textures_[0] with meshes_[0], scene.cpp:70)."""
        if filename.lower().endswith(".bmp"):
            tex = bmp_io.load_bmp(filename)
        else:
            from PIL import Image
            arr = np.asarray(Image.open(filename).convert("RGB"), np.float32) / 255.0
            tex = Texture(data=jnp.asarray(arr))
        slot = max(0, len(self.meshes) - 1)
        while len(self.textures) < slot:
            self.textures.append(None)
        if len(self.textures) == slot:
            self.textures.append(tex)
        else:
            self.textures[slot] = tex
        return tex

    # --- voxelization (Scene::voxelizeMeshes, scene.cpp:64-85) ---

    def voxelize_meshes(self, octree: bool = False,
                        conservative: bool = False) -> VoxelGrid:
        if not self.meshes:
            raise ValueError("no meshes loaded")
        if len(self.meshes) == 1:
            grid = voxelization.mesh_to_voxel_grid(
                self.meshes[0],
                self.textures[0] if self.textures else None,
                log_n=self.cfg.vox_log_n,
                tri_budget=self.cfg.vox_tri_budget,
                capacity=self.cfg.extract_capacity,
                conservative=conservative)
        else:
            # ALL loaded meshes, one shared grid over the union bbox —
            # the reference's unimplemented TODO (scene.cpp:65)
            grid = voxelization.meshes_to_voxel_grid(
                self.meshes, self.textures, log_n=self.cfg.vox_log_n,
                tri_budget=self.cfg.vox_tri_budget,
                capacity=self.cfg.extract_capacity,
                conservative=conservative)
        if octree:
            scale = float(grid.scale)
            if self.tree is None:
                center = 0.5 * (np.asarray(grid.bbox.bbox0)
                                + np.asarray(grid.bbox.bbox1))
                half = float(np.max(np.asarray(grid.bbox.bbox1) - center))
                self.tree = Octree(scale, center, half,
                                   capacity=self.cfg.node_capacity,
                                   extract_capacity=self.cfg.extract_capacity)
            self.tree.add_voxel_grid(grid)
            # mesh voxels carry alpha=127 (not yet "occupied"); re-observe
            # once so extraction sees them (fusion alpha dynamics)
            self.tree.add_voxel_grid(grid)
            self.voxel_grid = self.tree.extract_voxel_grid()
        else:
            self.voxel_grid = grid
        return self.voxel_grid

    def extract_voxel_grid_from_octree(self) -> VoxelGrid:
        if self.tree is None:
            raise ValueError("no octree")
        self.voxel_grid = self.tree.extract_voxel_grid()
        return self.voxel_grid

    # --- SLAM fusion (Scene::addPointCloudToOctree, scene.cpp:98-113) ---

    def add_point_cloud_to_octree(self, origin, points, colors,
                                  bbox: BoundingBox | None = None,
                                  valid=None) -> None:
        if bbox is None:
            bbox = bbox_of_points(points, valid)
        if self.tree is None:
            center = 0.5 * (np.asarray(bbox.bbox0) + np.asarray(bbox.bbox1))
            half = float(np.max(np.asarray(bbox.bbox1) - center)) + 1e-3
            self.tree = Octree(self.cfg.voxel_resolution, center, half,
                               capacity=self.cfg.node_capacity,
                               extract_capacity=self.cfg.extract_capacity)
        elif not self.tree.contains(bbox):
            outside = float(np.asarray(
                self.tree.bounding_box().distance_outside(bbox)))
            self.tree.expand_by_size(outside)
        self.tree.add_cloud(points, colors, valid)

    # --- accessors ---

    def svo(self, bbox: BoundingBox | None = None) -> SVONodePool:
        """Scene::svo (scene.h:53): the renderable SVO."""
        if self.tree is None:
            raise ValueError("no octree")
        return self.tree.extract_svo()
