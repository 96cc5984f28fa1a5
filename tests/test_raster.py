"""Software rasterizer tests."""

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.core import camera as cam_mod
from octree_slam_tpu.core.types import BoundingBox, Mesh
from octree_slam_tpu.render import raster


def tri_mesh(verts, faces, colors=None):
    v = jnp.asarray(np.asarray(verts, np.float32))
    f = jnp.asarray(np.asarray(faces, np.int32))
    c = (jnp.asarray(np.asarray(colors, np.float32)) if colors is not None
         else jnp.ones_like(v))
    # flat normals toward +z for the simple test geometry
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (v.shape[0], 1))
    return Mesh(vertices=v, normals=n, colors=c, faces=f,
                texcoords=jnp.zeros((f.shape[0], 3, 2), jnp.float32),
                bbox=BoundingBox(jnp.min(v, 0), jnp.max(v, 0)))


def front_cam():
    return cam_mod.make_camera([0, 0, 3.0], [0, 0, 0], [0, 1, 0], 60.0, 4 / 3)


class TestRasterize:
    def test_triangle_covers_center(self):
        # CCW when viewed from +z
        mesh = tri_mesh([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], [[0, 1, 2]],
                        [[1, 0, 0], [0, 1, 0], [0, 0, 1]])
        cam = front_cam()
        fb = np.asarray(raster.rasterize_mesh(
            mesh, cam, width=64, height=48, frag_budget=2048, shading="color"))
        assert fb[24, 32, 3] == 1.0  # center covered
        assert fb[2, 2, 3] == 0.0    # corner not
        # interpolated colors sum to ~1 everywhere inside
        inside = fb[..., 3] > 0
        s = fb[..., :3].sum(-1)[inside]
        np.testing.assert_allclose(s, 1.0, atol=1e-3)

    def test_backface_culled(self):
        mesh = tri_mesh([[-1, -1, 0], [0, 1, 0], [1, -1, 0]], [[0, 1, 2]])  # CW
        cam = front_cam()
        fb = np.asarray(raster.rasterize_mesh(
            mesh, cam, width=32, height=24, frag_budget=1024))
        assert fb[..., 3].max() == 0.0
        fb2 = np.asarray(raster.rasterize_mesh(
            mesh, cam, width=32, height=24, frag_budget=1024,
            cull_backfaces=False))
        assert fb2[..., 3].max() == 1.0

    def test_depth_order(self):
        """Nearer triangle occludes farther one."""
        verts = [[-1, -1, 0.5], [1, -1, 0.5], [0, 1, 0.5],   # near, red
                 [-1, -1, -0.5], [1, -1, -0.5], [0, 1, -0.5]]  # far, blue
        cols = [[1, 0, 0]] * 3 + [[0, 0, 1]] * 3
        mesh = tri_mesh(verts, [[0, 1, 2], [3, 4, 5]], cols)
        cam = front_cam()
        fb = np.asarray(raster.rasterize_mesh(
            mesh, cam, width=64, height=48, frag_budget=2048, shading="color"))
        assert fb[24, 32, 0] > 0.9 and fb[24, 32, 2] < 0.1

    def test_texture_sampling(self):
        mesh = tri_mesh([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], [[0, 1, 2]])
        mesh = mesh._replace(texcoords=jnp.asarray(
            [[[0.0, 0.0], [1.0, 0.0], [0.5, 1.0]]], jnp.float32))
        tex = np.zeros((4, 4, 3), np.float32)
        tex[:, :2] = [1, 1, 0]
        tex[:, 2:] = [0, 1, 1]
        cam = front_cam()
        fb = np.asarray(raster.rasterize_mesh(
            mesh, cam, width=64, height=48, frag_budget=2048,
            texture=jnp.asarray(tex), shading="color"))
        inside = fb[..., 3] > 0
        assert inside.any()
        assert fb[..., 1][inside].mean() > 0.9  # both texels are green-ish

    def test_shading_modes_differ(self):
        mesh = tri_mesh([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], [[0, 1, 2]])
        cam = front_cam()
        kw = dict(width=32, height=24, frag_budget=1024)
        f_color = np.asarray(raster.rasterize_mesh(mesh, cam, shading="color", **kw))
        f_diff = np.asarray(raster.rasterize_mesh(mesh, cam, shading="diffuse", **kw))
        f_phong = np.asarray(raster.rasterize_mesh(mesh, cam, shading="phong", **kw))
        inside = f_color[..., 3] > 0
        assert not np.allclose(f_color[inside], f_diff[inside])
        assert not np.allclose(f_diff[inside], f_phong[inside])

    def test_voxel_cube_mesh_renders(self):
        """Voxel-cube display path: grid -> cube mesh -> rasterizer
        (replaces instanced GL cubes, opengl_renderer.cpp:101-172)."""
        from octree_slam_tpu.core.types import VoxelGrid
        from octree_slam_tpu.map.voxelization import voxel_grid_to_mesh
        centers = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]], jnp.float32)
        colors = jnp.asarray([[1, 0, 0, 1], [0, 1, 0, 1]], jnp.float32)
        grid = VoxelGrid(centers=centers, colors=colors,
                         count=jnp.int32(2), scale=jnp.float32(0.1),
                         bbox=BoundingBox(jnp.asarray([-1.0, -1, -1]),
                                          jnp.asarray([1.0, 1, 1])))
        mesh = voxel_grid_to_mesh(grid)
        assert mesh.faces.shape[0] == 24  # 12 per cube
        cam = front_cam()
        fb = np.asarray(raster.rasterize_mesh(
            mesh, cam, width=64, height=48, frag_budget=512,
            cull_backfaces=False))
        assert (fb[..., 3] > 0).sum() > 10


class TestDebugPipelines:
    def test_wireframe_draws_edges_not_interior(self):
        mesh = tri_mesh([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], [[0, 1, 2]])
        cam = front_cam()
        rm = raster.assemble(mesh)
        fb = np.asarray(raster.rasterize_wireframe(
            rm, cam.mvp, width=64, height=48, samples=128))
        assert fb[..., 3].sum() > 10          # edges present
        # triangle centroid should NOT be covered (edges only)
        assert fb[26, 32, 3] == 0.0
        # the bottom edge y=-1 spans the screen bottom half: some coverage
        ys, xs = np.nonzero(fb[..., 3])
        assert ys.max() > 30

    def test_vertices_pipeline_marks_corners(self):
        mesh = tri_mesh([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], [[0, 1, 2]])
        cam = front_cam()
        rm = raster.assemble(mesh)
        fb = np.asarray(raster.rasterize_vertices(
            rm, cam.mvp, width=64, height=48))
        n_lit = int((fb[..., 3] > 0).sum())
        assert 1 <= n_lit <= 3
