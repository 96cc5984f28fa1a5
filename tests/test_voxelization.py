"""Mesh voxelization tests: known shapes, budget subdivision, SVO handoff."""

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.core.types import BoundingBox, Mesh, Texture
from octree_slam_tpu.core import packing
from octree_slam_tpu.map import svo, voxelization


def quad_mesh(z=0.0, extent=0.9):
    """Axis-aligned square in the z=const plane, two triangles."""
    v = np.array(
        [[-extent, -extent, z], [extent, -extent, z],
         [extent, extent, z], [-extent, extent, z]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.array([[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]], np.float32)
    return Mesh(
        vertices=jnp.asarray(v),
        normals=jnp.zeros_like(jnp.asarray(v)),
        colors=jnp.zeros_like(jnp.asarray(v)),
        faces=jnp.asarray(f),
        texcoords=jnp.asarray(uv),
        bbox=BoundingBox(jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0])),
    )


def cube_mesh(half=0.6):
    corners = np.array(
        [[x, y, z] for z in (-half, half) for y in (-half, half) for x in (-half, half)],
        np.float32)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    tris = []
    for q in quads:
        tris.append((q[0], q[1], q[2]))
        tris.append((q[0], q[2], q[3]))
    f = np.array(tris, np.int32)
    return Mesh(
        vertices=jnp.asarray(corners),
        normals=jnp.zeros_like(jnp.asarray(corners)),
        colors=jnp.zeros_like(jnp.asarray(corners)),
        faces=jnp.asarray(f),
        texcoords=jnp.zeros((12, 3, 2), jnp.float32),
        bbox=BoundingBox(jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0])),
    )


class TestVoxelize:
    def test_flat_quad_single_slab(self):
        """A z=0 quad in a 16^3 grid occupies exactly one z-slab (THIN /
        6-separating semantics) over the quad's footprint."""
        mesh = quad_mesh(z=0.0625)  # center of z-slab index 8 (cell=0.125)
        grid = voxelization.mesh_to_voxel_grid(mesh, None, log_n=4,
                                               tri_budget=512, capacity=4096)
        count = int(grid.count)
        centers = np.asarray(grid.centers)[:count]
        zs = np.unique(np.round(centers[:, 2], 4))
        assert len(zs) == 1            # one slab thick
        # footprint: quad spans [-0.9,0.9] -> 16 of 16 cells in x/y? cells
        # whose centers lie inside; extent 0.9/0.125 = 14.4 -> 16 columns hit
        assert count >= 14 * 14
        assert count <= 16 * 16

    def test_cube_surface_hollow(self):
        """Cube surface voxelizes to a hollow shell: interior cells empty."""
        mesh = cube_mesh(half=0.6)
        grid = voxelization.mesh_to_voxel_grid(mesh, None, log_n=4,
                                               tri_budget=512, capacity=8192)
        count = int(grid.count)
        centers = np.asarray(grid.centers)[:count]
        assert count > 0
        # no voxel center strictly inside the cube (margin one cell = 0.125)
        inside = np.all(np.abs(centers) < 0.6 - 0.13, axis=1)
        assert not np.any(inside)
        # shell voxels hug the surface
        assert np.all(np.max(np.abs(centers), axis=1) > 0.6 - 0.13)

    def test_untextured_green(self):
        mesh = quad_mesh()
        grid = voxelization.mesh_to_voxel_grid(mesh, None, log_n=3,
                                               tri_budget=512, capacity=1024)
        cols = np.asarray(grid.colors)[: int(grid.count)]
        assert np.all(cols[:, 1] > 0.9)  # green (ColorShader no-texture path)
        assert np.all(cols[:, 0] < 0.1)
        assert np.allclose(cols[:, 3], 127 / 255.0, atol=1e-3)

    def test_textured_color_sampling(self):
        mesh = quad_mesh()
        # texture: left half red, right half blue
        tex = np.zeros((8, 8, 3), np.float32)
        tex[:, :4] = [1, 0, 0]
        tex[:, 4:] = [0, 0, 1]
        grid = voxelization.mesh_to_voxel_grid(mesh, Texture(jnp.asarray(tex)),
                                               log_n=4, tri_budget=512,
                                               capacity=4096)
        count = int(grid.count)
        centers = np.asarray(grid.centers)[:count]
        cols = np.asarray(grid.colors)[:count]
        left = centers[:, 0] < -0.2   # u < ~0.4
        right = centers[:, 0] > 0.2
        assert cols[left, 0].mean() > 0.9   # red side
        assert cols[right, 2].mean() > 0.9  # blue side

    def test_budget_subdivision(self):
        """A huge triangle gets bisected host-side until it fits."""
        mesh = quad_mesh()
        soup = voxelization.prepare_mesh(mesh, mesh.bbox, log_n=6,
                                         tri_budget=64)
        assert soup.v0.shape[0] > 2  # subdivided
        # voxelization still covers the quad
        grid = voxelization.mesh_to_voxel_grid(mesh, None, log_n=6,
                                               tri_budget=64, capacity=1 << 14)
        assert int(grid.count) > 50 * 50

    def test_grid_to_svo_roundtrip(self):
        """VoxelGrid -> SVO insert -> extraction reproduces occupancy
        (Scene::voxelizeMeshes -> addVoxelGrid -> extractVoxelGrid flow,
        scene.cpp:64-85)."""
        mesh = cube_mesh(half=0.6)
        grid = voxelization.mesh_to_voxel_grid(mesh, None, log_n=4,
                                               tri_budget=512, capacity=8192)
        count = int(grid.count)
        pool = svo.create(1 << 15, jnp.zeros(3), 1.0)
        live = jnp.arange(grid.centers.shape[0]) < grid.count
        # bump alpha over the occupancy threshold like repeated observations
        for _ in range(2):
            pool, _ = svo.insert(pool, grid.centers, grid.colors[:, :3],
                                 valid=live, depth=4)
        out = svo.extract_voxels(pool, depth=4, capacity=1 << 12)
        assert int(out.count) == count
