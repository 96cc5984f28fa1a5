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

    def test_axis_dominant_quads_fully_covered(self):
        """A full-footprint quad normal to EACH axis rasterizes to the
        complete 16x16 slab. Regression: the dominant-axis 2D projection
        used an anti-cyclic (u,v) pair for dom=y, inverting the winding
        sign — y-facing triangle interiors were rejected entirely."""
        for axis in range(3):
            u = np.zeros(3, np.float32)
            v = np.zeros(3, np.float32)
            p = np.zeros(3, np.float32)
            u[(axis + 1) % 3] = 0.9
            v[(axis + 2) % 3] = 0.9
            p[axis] = 0.0625  # a cell-center plane (cell = 0.125)
            verts = np.array([p - u - v, p + u - v, p + u + v, p - u + v],
                             np.float32)
            f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
            mesh = Mesh(
                vertices=jnp.asarray(verts),
                normals=jnp.zeros((4, 3), jnp.float32),
                colors=jnp.zeros((4, 3), jnp.float32), faces=jnp.asarray(f),
                texcoords=jnp.zeros((2, 3, 2), jnp.float32),
                bbox=BoundingBox(jnp.asarray([-1.0, -1.0, -1.0]),
                                 jnp.asarray([1.0, 1.0, 1.0])))
            for cons in (False, True):
                grid = voxelization.mesh_to_voxel_grid(
                    mesh, None, log_n=4, tri_budget=512, capacity=4096,
                    conservative=cons)
                assert int(grid.count) == 16 * 16, (
                    f"axis {axis} conservative={cons}: {int(grid.count)}")

    def _sat_margin(self, center, half, a, b, c):
        """Signed separation margin of the classic 13-axis triangle/box SAT
        (float64 oracle): > 0 overlap, < 0 separated, ~0 tangent."""
        tri = np.stack([a, b, c])
        edges = [b - a, c - b, a - c]
        axes = [np.eye(3)[k] for k in range(3)]
        axes.append(np.cross(b - a, c - a))
        for k in range(3):
            for e in edges:
                axes.append(np.cross(np.eye(3)[k], e))
        margin = np.inf
        for L in axes:
            ln = np.linalg.norm(L)
            if ln < 1e-12:
                continue
            L = L / ln
            t = tri @ L
            p0 = center @ L
            r = np.abs(L) @ half
            margin = min(margin,
                         min(t.max(), p0 + r) - max(t.min(), p0 - r))
        return margin

    def _random_small_mesh(self, seed, n_tris=8, edge=0.3):
        rng = np.random.default_rng(seed)
        base = rng.uniform(-0.8, 0.8, (n_tris, 3)).astype(np.float32)
        v = np.concatenate(
            [base + rng.uniform(-edge, edge, (n_tris, 3)).astype(np.float32)
             for _ in range(3)])
        f = np.arange(3 * n_tris, dtype=np.int32).reshape(3, n_tris).T
        return Mesh(
            vertices=jnp.asarray(v), normals=jnp.zeros_like(jnp.asarray(v)),
            colors=jnp.zeros_like(jnp.asarray(v)), faces=jnp.asarray(f),
            texcoords=jnp.zeros((n_tris, 3, 2), jnp.float32),
            bbox=BoundingBox(jnp.asarray([-1.0, -1.0, -1.0]),
                             jnp.asarray([1.0, 1.0, 1.0])))

    def test_conservative_matches_sat_oracle(self):
        """CONSERVATIVE (26-separating) marks exactly the cells whose box
        intersects a triangle: sandwiched by the float64 13-axis SAT oracle
        evaluated at +/-1e-4 margin (tolerance absorbs the f32 epsilons)."""
        mesh = self._random_small_mesh(seed=3)
        n = 16
        lo = np.array([-1.0, -1.0, -1.0])
        cell = np.full(3, 2.0 / n)
        half = cell / 2
        soup = voxelization.prepare_mesh(mesh, mesh.bbox, 4, 512)
        grid = voxelization.voxelize(
            soup, jnp.ones((1, 1, 3), jnp.float32), mesh.bbox.bbox0,
            mesh.bbox.bbox1, log_n=4, tri_budget=512, conservative=True)
        got = np.asarray(packing.alpha_of(np.asarray(grid).reshape(-1)) > 0
                         ).reshape(n, n, n)

        verts = np.asarray(mesh.vertices, np.float64)
        faces = np.asarray(mesh.faces)
        strict = np.zeros((n, n, n), bool)
        loose = np.zeros((n, n, n), bool)
        for fi in range(faces.shape[0]):
            a, b, c = (verts[faces[fi, j]] for j in range(3))
            tmin = np.floor((np.minimum(np.minimum(a, b), c) - lo) / cell)
            tmax = np.floor((np.maximum(np.maximum(a, b), c) - lo) / cell)
            i0 = np.clip(tmin, 0, n - 1).astype(int)
            i1 = np.clip(tmax, 0, n - 1).astype(int)
            for iz in range(i0[2], i1[2] + 1):
                for iy in range(i0[1], i1[1] + 1):
                    for ix in range(i0[0], i1[0] + 1):
                        ctr = lo + (np.array([ix, iy, iz]) + 0.5) * cell
                        m = self._sat_margin(ctr, half, a, b, c)
                        if m > 1e-4:
                            strict[iz, iy, ix] = True
                        if m > -1e-4:
                            loose[iz, iy, ix] = True
        assert np.all(got[strict]), "missed a definitely-overlapping cell"
        assert not np.any(got & ~loose), "marked a definitely-separated cell"

    def _thin_margin(self, center, half, a, b, c):
        """Signed margin of the 6-separating THIN criterion in float64:
        min over {thin-plane slack, dominant-axis 2D edge slacks}."""
        n = np.cross(b - a, c - a)
        n = n / np.linalg.norm(n)
        margin = np.max(np.abs(n) * half) - abs((center - a) @ n)
        dom = int(np.argmax(np.abs(n)))
        u, v = (dom + 1) % 3, (dom + 2) % 3
        sgn = 1.0 if n[dom] >= 0 else -1.0
        for p0, p1 in ((a, b), (b, c), (c, a)):
            e = p1 - p0
            ne = np.array([-e[v], e[u]]) * sgn
            ln = np.linalg.norm(ne)
            if ln < 1e-12:
                continue
            ofs = abs(ne[0]) * half[u] + abs(ne[1]) * half[v]
            d = (center[u] - p0[u]) * ne[0] + (center[v] - p0[v]) * ne[1]
            margin = min(margin, (d + ofs) / ln)
        return margin

    def test_thin_matches_oracle(self):
        """THIN marks exactly the cells passing the 6-separating criterion:
        sandwiched by the float64 oracle at +/-1e-4 margin, over random
        triangles (regression guard for projection/winding errors on
        arbitrary orientations)."""
        mesh = self._random_small_mesh(seed=11)
        n = 16
        lo = np.array([-1.0, -1.0, -1.0])
        cell = np.full(3, 2.0 / n)
        half = cell / 2
        soup = voxelization.prepare_mesh(mesh, mesh.bbox, 4, 512)
        grid = voxelization.voxelize(
            soup, jnp.ones((1, 1, 3), jnp.float32), mesh.bbox.bbox0,
            mesh.bbox.bbox1, log_n=4, tri_budget=512)
        got = np.asarray(packing.alpha_of(np.asarray(grid).reshape(-1)) > 0
                         ).reshape(n, n, n)

        verts = np.asarray(mesh.vertices, np.float64)
        faces = np.asarray(mesh.faces)
        strict = np.zeros((n, n, n), bool)
        loose = np.zeros((n, n, n), bool)
        for fi in range(faces.shape[0]):
            a, b, c = (verts[faces[fi, j]] for j in range(3))
            tmin = np.floor((np.minimum(np.minimum(a, b), c) - lo) / cell)
            tmax = np.floor((np.maximum(np.maximum(a, b), c) - lo) / cell)
            i0 = np.clip(tmin, 0, n - 1).astype(int)
            i1 = np.clip(tmax, 0, n - 1).astype(int)
            for iz in range(i0[2], i1[2] + 1):
                for iy in range(i0[1], i1[1] + 1):
                    for ix in range(i0[0], i1[0] + 1):
                        ctr = lo + (np.array([ix, iy, iz]) + 0.5) * cell
                        m = self._thin_margin(ctr, half, a, b, c)
                        if m > 1e-4:
                            strict[iz, iy, ix] = True
                        if m > -1e-4:
                            loose[iz, iy, ix] = True
        assert np.all(got[strict]), "missed a cell the thin criterion keeps"
        assert not np.any(got & ~loose), "marked a cell thin rejects"

    def test_conservative_superset_of_thin(self):
        """A tilted-plane quad (normal (1,2,0)/sqrt5): cell centers land at
        plane distances between the thin criterion's max-offset (2h/sqrt5)
        and the conservative sum-offset (3h/sqrt5), so CONSERVATIVE is a
        strict superset of THIN."""
        nrm = np.array([1.0, 2.0, 0.0]) / np.sqrt(5.0)
        u1 = np.array([2.0, -1.0, 0.0]) / np.sqrt(5.0)
        u2 = np.array([0.0, 0.0, 1.0])
        p0 = np.array([0.12, 0.0, 0.0])  # on the plane x + 2y = 0.12
        v = np.array([p0 - 0.7 * u1 - 0.8 * u2, p0 + 0.7 * u1 - 0.8 * u2,
                      p0 + 0.7 * u1 + 0.8 * u2, p0 - 0.7 * u1 + 0.8 * u2],
                     np.float32)
        assert np.allclose(v @ nrm, 0.12 / np.sqrt(5.0), atol=1e-6)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        mesh = Mesh(
            vertices=jnp.asarray(v), normals=jnp.zeros_like(jnp.asarray(v)),
            colors=jnp.zeros_like(jnp.asarray(v)), faces=jnp.asarray(f),
            texcoords=jnp.zeros((2, 3, 2), jnp.float32),
            bbox=BoundingBox(jnp.asarray([-1.0, -1.0, -1.0]),
                             jnp.asarray([1.0, 1.0, 1.0])))
        thin = voxelization.mesh_to_voxel_grid(mesh, None, log_n=4,
                                               tri_budget=512, capacity=4096)
        cons = voxelization.mesh_to_voxel_grid(mesh, None, log_n=4,
                                               tri_budget=512, capacity=4096,
                                               conservative=True)
        tset = {tuple(np.round(p, 4))
                for p in np.asarray(thin.centers)[: int(thin.count)]}
        cset = {tuple(np.round(p, 4))
                for p in np.asarray(cons.centers)[: int(cons.count)]}
        assert tset <= cset
        assert len(cset) > len(tset)

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
