"""Renderer facade: the reference's presentation API over array outputs.

Mirrors CUDARenderer (cuda_renderer.h:22-26: rasterize / pixelPassthrough /
coneTraceSVO) and OpenGLRenderer (opengl_renderer.h:22-26: rasterize /
rasterizeVoxels / renderPoints) as one class. Where the reference maps a GL
PBO, runs CUDA, and blits a fullscreen quad (cuda_renderer.cpp:116-171),
every method here simply returns an f32[H, W, 4] framebuffer; callers save
or stream it (io/bmp.save_image).
"""

from __future__ import annotations

import jax.numpy as jnp

from octree_slam_tpu.core.types import Camera, Mesh, Texture, VoxelGrid
from octree_slam_tpu.map.svo import SVONodePool
from octree_slam_tpu.render import points as points_mod
from octree_slam_tpu.render import raster, raycast
from octree_slam_tpu.render.splat import LeafList, render_splat


class Renderer:
    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height

    # --- CUDARenderer surface ---

    def rasterize(self, mesh: Mesh, camera: Camera, texture: Texture | None = None,
                  light_pos=(10.0, 10.0, 10.0), shading: str = "phong",
                  frag_budget: int | None = None) -> jnp.ndarray:
        """Software triangle pipeline (CUDARenderer::rasterize ->
        rasterizeMesh, rasterize_kernels.cu:484-613)."""
        return raster.rasterize_mesh(
            mesh, camera, width=self.width, height=self.height,
            frag_budget=frag_budget,
            texture=texture.data if texture is not None else None,
            shading=shading, light_pos=light_pos)

    def rasterize_wireframe(self, mesh: Mesh, camera: Camera,
                            samples: int = 64) -> jnp.ndarray:
        """Debug edge view (rasterizationKernelWire path,
        rasterize_kernels.cu:340-377)."""
        return raster.rasterize_wireframe(
            raster.assemble(mesh), camera.mvp,
            width=self.width, height=self.height, samples=samples)

    def rasterize_vertices(self, mesh: Mesh, camera: Camera) -> jnp.ndarray:
        """Debug vertex-cloud view (rasterize_kernels.cu:380-410)."""
        return raster.rasterize_vertices(
            raster.assemble(mesh), camera.mvp,
            width=self.width, height=self.height)

    def pixel_passthrough(self, color: jnp.ndarray) -> jnp.ndarray:
        """Display the raw camera stream (writeColorToPBO,
        rasterize_kernels.cu:626-649; DRAW_CAMERA_COLOR mode)."""
        rgb = color.astype(jnp.float32) / 255.0
        a = jnp.ones(rgb.shape[:-1] + (1,), jnp.float32)
        return jnp.concatenate([rgb, a], axis=-1)

    def cone_trace_svo(self, pool: SVONodePool, camera_pose: jnp.ndarray,
                       fx, fy, max_depth: int, **kw) -> jnp.ndarray:
        """Voxel cone tracing (CUDARenderer::coneTraceSVO,
        cuda_renderer.cpp:158-171)."""
        return raycast.cone_trace(pool, camera_pose, fx, fy,
                                  width=self.width, height=self.height,
                                  max_depth=max_depth, **kw)

    # --- OpenGLRenderer surface ---

    def rasterize_voxels(self, grid: VoxelGrid, camera: Camera,
                         use_cubes: bool = False,
                         frag_budget: int = 64) -> jnp.ndarray:
        """Voxel display (OpenGLRenderer::rasterizeVoxels,
        opengl_renderer.cpp:101-172). use_cubes=True instances a cube mesh
        per voxel through the triangle rasterizer (the GL instancing
        analog); False uses footprint splats (fast)."""
        if use_cubes:
            from octree_slam_tpu.map.voxelization import voxel_grid_to_mesh
            mesh = voxel_grid_to_mesh(grid)
            return raster.rasterize_mesh(
                mesh, camera, width=self.width, height=self.height,
                frag_budget=frag_budget, shading="diffuse",
                cull_backfaces=False)
        live = jnp.arange(grid.centers.shape[0]) < grid.count
        return points_mod.render_voxels(
            grid.centers, grid.colors, grid.scale, live, camera.view,
            camera.mvp, width=self.width, height=self.height,
            proj_focal=camera.projection[1, 1])

    def render_points(self, vertex_map: jnp.ndarray, color: jnp.ndarray,
                      camera: Camera) -> jnp.ndarray:
        """Point-cloud display (OpenGLRenderer::renderPoints,
        opengl_renderer.cpp:174-221)."""
        pts = vertex_map.reshape(-1, 3)
        scale = 255.0 if color.dtype == jnp.uint8 else 1.0
        cols = jnp.clip(color.reshape(-1, 3).astype(jnp.float32) / scale, 0, 1)
        return points_mod.render_points(pts, cols, camera.mvp,
                                        width=self.width, height=self.height)

    # --- fast SLAM map view ---

    def splat_map(self, pool: SVONodePool, leaves: LeafList,
                  camera_pose: jnp.ndarray, fx, fy, depth: int,
                  **kw) -> jnp.ndarray:
        return render_splat(pool, leaves, camera_pose, fx, fy,
                            width=self.width, height=self.height,
                            depth=depth, **kw)
