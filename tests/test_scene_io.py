"""Scene facade, octree growth/checkpoint, and IO tests."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core.types import BoundingBox
from octree_slam_tpu.io import bmp as bmp_io
from octree_slam_tpu.io import obj as obj_io
from octree_slam_tpu.map.octree import Octree
from octree_slam_tpu.scene import Scene

CUBE_OBJ = """
# simple cube
v -1 -1 -1
v 1 -1 -1
v 1 1 -1
v -1 1 -1
v -1 -1 1
v 1 -1 1
v 1 1 1
v -1 1 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1 2/2 3/3 4/4
f 5/1 8/4 7/3 6/2
f 1/1 5/2 6/3 2/4
f 2/1 6/2 7/3 3/4
f 3/1 7/2 8/3 4/4
f 4/1 8/2 5/3 1/4
"""


@pytest.fixture
def cube_path(tmp_path):
    p = tmp_path / "cube.obj"
    p.write_text(CUBE_OBJ)
    return str(p)


class TestObjLoader:
    def test_cube(self, cube_path):
        mesh = obj_io.load_obj(cube_path)
        assert mesh.vertices.shape == (8, 3)
        assert mesh.faces.shape == (12, 3)  # 6 quads -> 12 tris (fan)
        assert mesh.texcoords.shape == (12, 3, 2)
        np.testing.assert_allclose(np.asarray(mesh.bbox.bbox0), [-1, -1, -1])
        np.testing.assert_allclose(np.asarray(mesh.bbox.bbox1), [1, 1, 1])
        # normals unit length
        n = np.asarray(mesh.normals)
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)

    def test_negative_indices_and_vn(self, tmp_path):
        p = tmp_path / "t.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\nf -3//1 -2//1 -1//1\n")
        mesh = obj_io.load_obj(str(p))
        assert mesh.faces.shape == (1, 3)
        np.testing.assert_allclose(np.asarray(mesh.normals)[0], [0, 0, 1])


class TestBMP:
    def test_roundtrip(self, tmp_path):
        from PIL import Image
        arr = (np.random.default_rng(0).uniform(0, 255, (5, 7, 3))).astype(np.uint8)
        p = str(tmp_path / "t.bmp")
        Image.fromarray(arr).save(p)
        tex = bmp_io.load_bmp(p)
        np.testing.assert_allclose(
            np.asarray(tex.data), arr.astype(np.float32) / 255.0, atol=1e-6)

    def test_32bit_bgra(self, tmp_path):
        """32-bit BMPs (e.g. the reference's textures/cow.bmp) load with
        the alpha byte dropped; the reference's loadBMP (scene.cpp:35-61)
        assumes 24-bit and would misread these."""
        from PIL import Image
        rgb = (np.random.default_rng(1).uniform(0, 255, (6, 5, 3))).astype(np.uint8)
        rgba = np.concatenate(
            [rgb, np.full((6, 5, 1), 200, np.uint8)], axis=-1)
        p = str(tmp_path / "t32.bmp")
        Image.fromarray(rgba).save(p, format="BMP")
        bpp = np.fromfile(p, np.uint8)[28]
        assert bpp == 32  # PIL writes RGBA as a 32-bit BMP
        tex = bmp_io.load_bmp(p)
        np.testing.assert_allclose(
            np.asarray(tex.data), rgb.astype(np.float32) / 255.0, atol=1e-6)

    def test_save_image(self, tmp_path):
        p = str(tmp_path / "fb.png")
        fb = np.zeros((4, 6, 4), np.float32)
        fb[..., 0] = 1.0
        bmp_io.save_image(p, fb)
        assert os.path.exists(p)


class TestOctreeFacade:
    def test_add_and_extract(self):
        tree = Octree(0.05, [0, 0, 0], 1.0, capacity=1 << 14,
                      extract_capacity=1 << 10)
        pts = jnp.asarray(np.random.default_rng(0).uniform(-0.9, 0.9, (100, 3)),
                          jnp.float32)
        cols = jnp.ones((100, 3), jnp.float32) * 0.5
        tree.add_cloud(pts, cols)
        grid = tree.extract_voxel_grid()
        assert int(grid.count) > 0

    def test_expand_preserves_content(self):
        """Property test (SURVEY.md section 4): tree expansion preserves
        occupied content."""
        tree = Octree(0.05, [0, 0, 0], 1.0, capacity=1 << 15,
                      extract_capacity=1 << 10)
        pts = jnp.asarray([[0.5, 0.5, 0.5], [-0.4, -0.3, 0.2]], jnp.float32)
        cols = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
        tree.add_cloud(pts, cols)
        g1 = tree.extract_voxel_grid()
        c1 = np.asarray(g1.centers)[: int(g1.count)]
        old_size = tree.size

        tree.expand_by_size(1.5)
        assert tree.size >= old_size * 2
        g2 = tree.extract_voxel_grid()
        c2 = np.asarray(g2.centers)[: int(g2.count)]
        assert int(g2.count) >= int(g1.count)
        # every old occupied voxel has a nearby voxel in the new tree
        for c in c1:
            d = np.min(np.linalg.norm(c2 - c, axis=1))
            assert d < 0.2, (c, d)

    def test_checkpoint_roundtrip(self, tmp_path):
        tree = Octree(0.05, [0, 0, 0], 1.0, capacity=1 << 14,
                      extract_capacity=1 << 10)
        pts = jnp.asarray([[0.3, 0.3, 0.3]], jnp.float32)
        tree.add_cloud(pts, jnp.ones((1, 3), jnp.float32))
        p = str(tmp_path / "map.npz")
        tree.save(p)
        tree2 = Octree.load(p)
        assert tree2.max_depth == tree.max_depth
        np.testing.assert_array_equal(np.asarray(tree2.pool.child),
                                      np.asarray(tree.pool.child))
        np.testing.assert_array_equal(np.asarray(tree2.pool.value),
                                      np.asarray(tree.pool.value))


class TestScene:
    def test_voxelize_obj_to_octree(self, cube_path):
        """Config-1 shape: cube.obj -> voxelize -> octree -> extract
        (BASELINE.json configs[0])."""
        cfg = SLAMConfig(vox_log_n=4, vox_tri_budget=256,
                         node_capacity=1 << 15, extract_capacity=1 << 12)
        scene = Scene(cfg)
        scene.load_obj_file(cube_path)
        grid = scene.voxelize_meshes(octree=True)
        assert int(grid.count) > 0
        pool = scene.svo()
        assert int(pool.n_nodes) > 8

    def test_point_cloud_auto_create_and_expand(self):
        cfg = SLAMConfig(voxel_resolution=0.05, node_capacity=1 << 15,
                         extract_capacity=1 << 10)
        scene = Scene(cfg)
        pts = jnp.asarray([[0.1, 0.1, 0.1], [0.4, 0.2, 0.3]], jnp.float32)
        cols = jnp.ones((2, 3), jnp.float32)
        scene.add_point_cloud_to_octree(jnp.zeros(3), pts, cols)
        assert scene.tree is not None
        size1 = scene.tree.size
        # now a far-away cloud forces expansion
        far = jnp.asarray([[3.0, 3.0, 3.0]], jnp.float32)
        scene.add_point_cloud_to_octree(jnp.zeros(3), far,
                                        jnp.ones((1, 3), jnp.float32))
        assert scene.tree.size > size1


class TestMultiMeshVoxelize:
    """Scene.voxelize_meshes covers EVERY loaded mesh (the reference's
    unimplemented TODO at scene.cpp:65) over the union bbox, with
    per-mesh textures."""

    CUBE = """\
v {x0} -0.5 -0.5
v {x1} -0.5 -0.5
v {x1} 0.5 -0.5
v {x0} 0.5 -0.5
v {x0} -0.5 0.5
v {x1} -0.5 0.5
v {x1} 0.5 0.5
v {x0} 0.5 0.5
f 1 2 3
f 1 3 4
f 5 7 6
f 5 8 7
f 1 5 6
f 1 6 2
f 2 6 7
f 2 7 3
f 3 7 8
f 3 8 4
f 4 8 5
f 4 5 1
"""

    def test_two_meshes_both_voxelized(self, tmp_path):
        import dataclasses
        from octree_slam_tpu.config import SLAMConfig
        from octree_slam_tpu.scene import Scene

        a = tmp_path / "a.obj"
        b = tmp_path / "b.obj"
        a.write_text(self.CUBE.format(x0=-2.0, x1=-1.0))
        b.write_text(self.CUBE.format(x0=1.0, x1=2.0))
        cfg = SLAMConfig(vox_log_n=5, extract_capacity=1 << 14)
        scene = Scene(cfg)
        scene.load_obj_file(str(a))
        scene.load_obj_file(str(b))
        grid = scene.voxelize_meshes(octree=False)

        n = int(grid.count)
        assert n > 0
        c = np.asarray(grid.centers)[:n]
        # both x-regions are populated; the union bbox spans [-2, 2]
        assert (c[:, 0] < -0.9).any() and (c[:, 0] > 0.9).any()
        assert not ((c[:, 0] > -0.5) & (c[:, 0] < 0.5)).any()  # gap empty
        # single-mesh path unchanged: only the first cube's region
        solo = Scene(cfg)
        solo.load_obj_file(str(a))
        g1 = solo.voxel_grid = solo.voxelize_meshes(octree=False)
        c1 = np.asarray(g1.centers)[: int(g1.count)]
        assert (c1[:, 0] <= -0.9).all()

    def test_per_mesh_textures(self, tmp_path):
        from octree_slam_tpu.config import SLAMConfig
        from octree_slam_tpu.core.types import Texture
        from octree_slam_tpu.scene import Scene

        a = tmp_path / "a.obj"
        b = tmp_path / "b.obj"
        a.write_text(self.CUBE.format(x0=-2.0, x1=-1.0))
        b.write_text(self.CUBE.format(x0=1.0, x1=2.0))
        cfg = SLAMConfig(vox_log_n=5, extract_capacity=1 << 14)
        scene = Scene(cfg)
        scene.load_obj_file(str(a))
        scene.load_obj_file(str(b))
        scene.textures = [
            Texture(data=jnp.full((1, 1, 3),
                                  jnp.asarray([1.0, 0.0, 0.0]))),
            Texture(data=jnp.full((1, 1, 3),
                                  jnp.asarray([0.0, 0.0, 1.0]))),
        ]
        grid = scene.voxelize_meshes(octree=False)
        n = int(grid.count)
        c = np.asarray(grid.centers)[:n]
        col = np.asarray(grid.colors)[:n]
        left = c[:, 0] < 0
        assert (col[left, 0] > 0.9).all() and (col[left, 2] < 0.1).all()
        assert (col[~left, 2] > 0.9).all() and (col[~left, 0] < 0.1).all()


class TestTrajectoryExport:
    def test_quat_roundtrip_through_parser(self, tmp_path):
        """write_trajectory -> _read_groundtruth reproduces every pose:
        the export is the exact inverse of the TUM parser."""
        from octree_slam_tpu.io import tum as tum_io
        rng = np.random.default_rng(5)
        poses = []
        for _ in range(24):
            # random rotation via QR (sign-fixed) + random translation
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            if np.linalg.det(q) < 0:
                q[:, 0] = -q[:, 0]
            T = np.eye(4)
            T[:3, :3] = q
            T[:3, 3] = rng.uniform(-5, 5, 3)
            poses.append(T)
        p = str(tmp_path / "traj.txt")
        tum_io.write_trajectory(p, poses)
        parsed = tum_io._read_groundtruth(p)
        assert len(parsed) == len(poses)
        for i, (t, T) in enumerate(parsed):
            assert t == float(i)
            np.testing.assert_allclose(T, poses[i], atol=1e-5)

    def test_cli_save_trajectory(self, tmp_path, capsys):
        from octree_slam_tpu import app
        out = str(tmp_path / "est.txt")
        app.main(["--source", "orbit", "--frames", "2", "--width", "64",
                  "--height", "48", "--max-depth", "6",
                  "--resolution", "0.08", "--render-every", "0",
                  "--log-every", "0", "--save-trajectory", out])
        capsys.readouterr()
        from octree_slam_tpu.io import tum as tum_io
        est = tum_io._read_groundtruth(out)
        gt = tum_io._read_groundtruth(out + ".gt.txt")
        assert len(est) == len(gt) == 2


class TestObjExport:
    def test_save_load_roundtrip_with_colors(self, tmp_path):
        from octree_slam_tpu.io import obj as obj_mod
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                         np.float32)
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        cols = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]],
                        np.float32)
        from octree_slam_tpu.core.types import Mesh, BoundingBox
        norms = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
        mesh = Mesh(vertices=jnp.asarray(verts), normals=jnp.asarray(norms),
                    colors=jnp.asarray(cols), faces=jnp.asarray(faces),
                    texcoords=jnp.zeros((2, 3, 2), jnp.float32),
                    bbox=BoundingBox(jnp.zeros(3), jnp.ones(3)))
        p = str(tmp_path / "m.obj")
        obj_mod.save_obj(p, mesh)
        # the pure-Python parser reads the vertex-color extension back
        back = obj_mod._load_obj_py(p)
        np.testing.assert_allclose(np.asarray(back.vertices), verts,
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(back.faces), faces)
        np.testing.assert_allclose(np.asarray(back.colors), cols, atol=1e-3)
        # the dispatching loader (native or python) must at least not
        # choke on the color-extended 'v' lines
        back2 = obj_mod.load_obj(p)
        np.testing.assert_allclose(np.asarray(back2.vertices), verts,
                                   atol=1e-5)

    def test_cli_save_mesh(self, tmp_path, capsys):
        from octree_slam_tpu import app
        from octree_slam_tpu.io import obj as obj_mod
        out = str(tmp_path / "map.obj")
        app.main(["--source", "orbit", "--frames", "2", "--width", "64",
                  "--height", "48", "--max-depth", "6",
                  "--resolution", "0.08", "--render-every", "0",
                  "--log-every", "0", "--save-mesh", out])
        capsys.readouterr()
        mesh = obj_mod._load_obj_py(out)
        assert mesh.faces.shape[0] > 0
        assert mesh.faces.shape[0] % 12 == 0  # 12 tris per voxel cube
