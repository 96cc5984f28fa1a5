"""A-buffer voxelization (map/voxelization.py voxelize_abuffer).

VoxelPipe's second rasterization mode (voxelpipe.h:151-213, abuffer.h):
per-(triangle, voxel) fragment records sorted by voxel id, instead of
one blended value per voxel. The reference app never calls it
(voxelization.cu:297 uses fine_raster THIN only); it is covered here for
completeness of the vendored-library surface.

The oracle is `voxelize` itself run on the same soup: both paths share
one candidate enumeration + overlap predicate (_tri_fragments), so the
set of distinct fragment voxels must equal the dense grid's occupied
cells exactly — a structural invariant, not a reimplementation.
"""

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.core import packing
from octree_slam_tpu.core.types import BoundingBox, Mesh
from octree_slam_tpu.map import voxelization as vox

LOG_N = 4  # 16^3 grid
N = 1 << LOG_N


def make_mesh(tris, uv=None):
    """tris: list of (3, 3) float vertex triples."""
    verts = np.concatenate([np.asarray(t, np.float32) for t in tris])
    faces = np.arange(verts.shape[0], dtype=np.int32).reshape(-1, 3)
    return Mesh(
        vertices=jnp.asarray(verts),
        normals=jnp.zeros_like(jnp.asarray(verts)),
        colors=jnp.zeros_like(jnp.asarray(verts)),
        faces=jnp.asarray(faces),
        texcoords=jnp.zeros((faces.shape[0], 3, 2), jnp.float32),
        bbox=BoundingBox(bbox0=jnp.asarray([0.0, 0.0, 0.0]),
                         bbox1=jnp.asarray([1.0, 1.0, 1.0])),
    )


def abuffer_for(tris, capacity=1 << 12, conservative=False):
    mesh = make_mesh(tris)
    soup = vox.prepare_mesh(mesh, mesh.bbox, LOG_N, tri_budget=256)
    ab = vox.voxelize_abuffer(soup, mesh.bbox.bbox0, mesh.bbox.bbox1,
                              log_n=LOG_N, tri_budget=256,
                              capacity=capacity,
                              conservative=conservative)
    grid = vox.voxelize(soup, jnp.full((1, 1, 3), 0.5), mesh.bbox.bbox0,
                        mesh.bbox.bbox1, log_n=LOG_N, tri_budget=256,
                        conservative=conservative)
    return ab, grid


BIG_TRI = [[0.05, 0.05, 0.31], [0.95, 0.05, 0.31], [0.05, 0.95, 0.31]]
SMALL_TRI = [[0.40, 0.40, 0.31], [0.45, 0.40, 0.31], [0.40, 0.45, 0.31]]


class TestABuffer:
    def test_matches_dense_grid_occupancy(self):
        """Distinct fragment voxels == occupied cells of the dense
        rasterizer (shared predicate, different aggregation)."""
        ab, grid = abuffer_for([BIG_TRI, SMALL_TRI])
        cnt = int(ab.count)
        assert cnt > 0 and not bool(ab.overflowed)
        frag_vox = set(np.asarray(ab.frag_voxel[:cnt]).tolist())
        occ = np.nonzero(
            np.asarray(packing.alpha_of(grid.reshape(-1))) > 0)[0]
        assert frag_vox == set(occ.tolist())

    def test_sorted_by_voxel_then_triangle(self):
        ab, _ = abuffer_for([BIG_TRI, SMALL_TRI])
        cnt = int(ab.count)
        v = np.asarray(ab.frag_voxel[:cnt])
        t = np.asarray(ab.frag_tri[:cnt])
        assert np.all(np.diff(v) >= 0)
        # within a voxel run, triangle ids ascend (stable sort over
        # triangle-major emission)
        same = np.diff(v) == 0
        assert np.all(np.diff(t)[same] > 0)  # strict: one record per pair

    def test_overlapping_triangles_emit_both_fragments(self):
        """The small triangle sits inside the big one's plane: its cells
        must carry BOTH triangle ids — the record the dense NO_BLENDING
        raster collapses to one winner."""
        ab, _ = abuffer_for([BIG_TRI, SMALL_TRI])
        cnt = int(ab.count)
        v = np.asarray(ab.frag_voxel[:cnt])
        t = np.asarray(ab.frag_tri[:cnt])
        # prepare_mesh pops from a stack: triangle order may invert; map
        # ids by fragment count (big covers more cells)
        ids, counts = np.unique(t, return_counts=True)
        small_id = ids[np.argmin(counts)]
        small_cells = set(v[t == small_id].tolist())
        big_cells = set(v[t != small_id].tolist())
        assert small_cells, "small triangle emitted no fragments"
        assert small_cells <= big_cells

    def test_pair_count_exceeds_occupied_count(self):
        ab, grid = abuffer_for([BIG_TRI, SMALL_TRI])
        occ = int((np.asarray(packing.alpha_of(grid.reshape(-1))) > 0).sum())
        assert int(ab.count) > occ  # overlapped cells hold 2 records

    def test_overflow_flag_and_drop(self):
        ab, _ = abuffer_for([BIG_TRI, SMALL_TRI], capacity=8)
        assert bool(ab.overflowed)
        assert int(ab.count) == 8
        v = np.asarray(ab.frag_voxel)
        assert np.all(np.diff(v) >= 0)  # still sorted

    def test_conservative_matches_dense_occupancy(self):
        """CONSERVATIVE mode shares the predicate with the dense raster
        too (the thin-vs-conservative relation itself is covered by
        test_voxelization.test_conservative_superset_of_thin)."""
        tri = [[0.05, 0.05, 0.05], [0.95, 0.35, 0.55], [0.15, 0.95, 0.95]]
        ab, grid = abuffer_for([tri], conservative=True)
        cnt = int(ab.count)
        assert cnt > 0 and not bool(ab.overflowed)
        frag_vox = set(np.asarray(ab.frag_voxel[:cnt]).tolist())
        occ = np.nonzero(
            np.asarray(packing.alpha_of(grid.reshape(-1))) > 0)[0]
        assert frag_vox == set(occ.tolist())
