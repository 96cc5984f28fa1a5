"""Triangle-mesh voxelization: data-parallel triangle -> voxel scatter.

Replaces the vendored VoxelPipe pipeline (external/include/voxelpipe/: coarse
tile binning -> b40c radix sort -> per-tile shared-memory fine raster,
~11k LoC of CUDA) and its wrapper (src/world/voxelization/voxelization.cu)
with a TPU-native design (SURVEY.md section 2.2 row 1): every triangle
enumerates a static budget of candidate voxels from its AABB, candidates are
tested with 6-separating (THIN, the app default) or 26-separating
(CONSERVATIVE, common.h:78-82) triangle/box overlap as vectorized masks, and
surviving fragments scatter their shaded color into a dense grid; occupied
cells are compacted by prefix sum. No tiles, no shared memory, no sort.

Grid semantics match the wrapper: per-axis cell size cell = (bbox1-bbox0)/N
with centers at bbox0 + (i+0.5)*cell (getCenterFromIndex,
voxelization.cu:59-76), scale = x-extent/N/2 (computeScale, :78-80), written
alpha = 127 (ColorShader, :135), occupied iff alpha > 0 (getOccupiedVoxels,
:155). GRID_RES=8 -> N=256 default (:24).

Documented divergences:
  * Fragment colors interpolate texcoords barycentrically; the reference
    samples the first vertex's texel only (TODO at voxelization.cu:126).
  * Colliding fragments in one cell resolve by max packed value
    (deterministic); the reference's NO_BLENDING winner is scheduling-
    dependent.
  * Triangles whose AABB exceeds the static candidate budget are bisected
    host-side in prepare_mesh (the reference reserves 16M fragments and
    fails past that, voxelization.cu:269).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from octree_slam_tpu.core import packing
from octree_slam_tpu.core.types import BoundingBox, Mesh, Texture, VoxelGrid
from octree_slam_tpu.utils import compaction


class TriangleSoup(NamedTuple):
    """Flat per-triangle arrays ready for the voxelizer."""

    v0: jnp.ndarray  # f32[T, 3]
    v1: jnp.ndarray  # f32[T, 3]
    v2: jnp.ndarray  # f32[T, 3]
    uv: jnp.ndarray  # f32[T, 3, 2] per-corner texcoords
    valid: jnp.ndarray  # bool[T]


def prepare_mesh(mesh: Mesh, bbox: BoundingBox, log_n: int,
                 tri_budget: int, pad_to: int | None = None) -> TriangleSoup:
    """Host-side preprocessing: gather triangle corners and bisect any
    triangle whose voxel-space AABB exceeds the static candidate budget.
    Runs in NumPy (outside jit), once per mesh."""
    verts = np.asarray(mesh.vertices, np.float32)
    faces = np.asarray(mesh.faces, np.int64)
    uv = np.asarray(mesh.texcoords, np.float32)
    if uv.size == 0:
        uv = np.zeros((faces.shape[0], 3, 2), np.float32)
    n = 1 << log_n
    lo = np.asarray(bbox.bbox0, np.float32)
    hi = np.asarray(bbox.bbox1, np.float32)
    cell = np.maximum((hi - lo) / n, 1e-12)

    tris = [(verts[faces[i, 0]], verts[faces[i, 1]], verts[faces[i, 2]],
             uv[i, 0], uv[i, 1], uv[i, 2]) for i in range(faces.shape[0])]
    out = []
    while tris:
        a, b, c, ua, ub, uc = tris.pop()
        tmin = np.minimum(np.minimum(a, b), c)
        tmax = np.maximum(np.maximum(a, b), c)
        # must be the exact expression the kernel uses (floor((t-lo)/cell),
        # see voxelize) — a different rounding path can under-estimate dims
        # and let a triangle exceed tri_budget in-kernel (ADVICE r1)
        dims = np.floor((tmax - lo) / cell).astype(np.int64) - \
            np.floor((tmin - lo) / cell).astype(np.int64) + 1
        if int(np.prod(np.clip(dims, 1, n))) <= tri_budget:
            out.append((a, b, c, ua, ub, uc))
            continue
        # bisect the longest edge
        e = [np.linalg.norm(b - a), np.linalg.norm(c - b), np.linalg.norm(a - c)]
        k = int(np.argmax(e))
        if k == 0:
            m, um = (a + b) / 2, (ua + ub) / 2
            tris.append((a, m, c, ua, um, uc))
            tris.append((m, b, c, um, ub, uc))
        elif k == 1:
            m, um = (b + c) / 2, (ub + uc) / 2
            tris.append((a, b, m, ua, ub, um))
            tris.append((a, m, c, ua, um, uc))
        else:
            m, um = (c + a) / 2, (uc + ua) / 2
            tris.append((a, b, m, ua, ub, um))
            tris.append((m, b, c, um, ub, uc))

    t = len(out)
    size = pad_to if pad_to is not None else t
    assert size >= t, f"pad_to={size} < {t} triangles after subdivision"
    v0 = np.zeros((size, 3), np.float32)
    v1 = np.zeros((size, 3), np.float32)
    v2 = np.zeros((size, 3), np.float32)
    uvs = np.zeros((size, 3, 2), np.float32)
    valid = np.zeros((size,), bool)
    for i, (a, b, c, ua, ub, uc) in enumerate(out):
        v0[i], v1[i], v2[i] = a, b, c
        uvs[i] = np.stack([ua, ub, uc])
        valid[i] = True
    return TriangleSoup(
        v0=jnp.asarray(v0), v1=jnp.asarray(v1), v2=jnp.asarray(v2),
        uv=jnp.asarray(uvs), valid=jnp.asarray(valid))


def _tri_box_overlap_thin(c, half, a, b, cc, n_hat):
    """6-separating triangle/voxel overlap (THIN_RASTER semantics,
    voxelpipe common.h:78-82): plane within the thin criterion + 2D
    footprint overlap in the dominant-axis projection.

    c f32[...,3] voxel centers; half f32[3]; a/b/cc f32[3] corners."""
    # plane test: |n.(c-a)| <= max_k |n_k| * half_k  (6-separating)
    dist = jnp.abs(jnp.sum((c - a) * n_hat, axis=-1))
    thin = jnp.max(jnp.abs(n_hat) * half)
    plane_ok = dist <= thin + 1e-7

    # dominant axis; (u, v) must be the CYCLIC pair ((k+1)%3, (k+2)%3) so
    # the 2D cross product in (u, v) order equals +n_hat[dom] — an
    # anti-cyclic pair (e.g. (x, z) for dom=y) inverts the winding sign and
    # rejects every interior cell of dom-axis-facing triangles
    dom = jnp.argmax(jnp.abs(n_hat))
    axes = jnp.array([[1, 2], [2, 0], [0, 1]], jnp.int32)[dom]
    u, v = axes[0], axes[1]
    sgn = jnp.sign(n_hat[dom])
    sgn = jnp.where(sgn == 0, 1.0, sgn)

    def edge_ok(p0, p1):
        # 2D edge function with conservative box offset in the (u,v) plane
        e = p1 - p0
        ne = jnp.stack([-e[v], e[u]]) * sgn
        ofs = jnp.abs(ne[0]) * half[u] + jnp.abs(ne[1]) * half[v]
        d = (c[..., u] - p0[u]) * ne[0] + (c[..., v] - p0[v]) * ne[1]
        return d + ofs >= -1e-7

    proj_ok = edge_ok(a, b) & edge_ok(b, cc) & edge_ok(cc, a)
    return plane_ok & proj_ok


def _tri_box_overlap_conservative(c, half, a, b, cc, n_hat):
    """26-separating triangle/voxel overlap (CONSERVATIVE_RASTER semantics,
    voxelpipe common.h:78-82): marks every voxel whose box intersects the
    triangle at all. Equivalent to the classic 13-axis SAT restricted to the
    triangle's AABB cells: the plane-cuts-box test (offset = SUM_k |n_k|*h_k,
    vs the thin criterion's max) plus 2D edge tests in ALL THREE axis
    projections (the 9 edge-cross separating axes).

    c f32[...,3] voxel centers; half f32[3]; a/b/cc f32[3] corners."""
    dist = jnp.abs(jnp.sum((c - a) * n_hat, axis=-1))
    plane_ok = dist <= jnp.sum(jnp.abs(n_hat) * half) + 1e-7

    ok = plane_ok
    # cyclic (u, v) pairs per projection axis k — see the winding note in
    # _tri_box_overlap_thin
    for u, v, k in ((1, 2, 0), (2, 0, 1), (0, 1, 2)):
        sgn = jnp.where(n_hat[k] >= 0, 1.0, -1.0)
        for p0, p1 in ((a, b), (b, cc), (cc, a)):
            e = p1 - p0
            ne_u = -e[v] * sgn
            ne_v = e[u] * sgn
            ofs = jnp.abs(ne_u) * half[u] + jnp.abs(ne_v) * half[v]
            d = (c[..., u] - p0[u]) * ne_u + (c[..., v] - p0[v]) * ne_v
            ok = ok & (d + ofs >= -1e-7)
    return ok


def _barycentric(p, a, b, c):
    """Barycentric coords of p (projected onto the triangle plane)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d00 = jnp.sum(ab * ab, -1)
    d01 = jnp.sum(ab * ac, -1)
    d11 = jnp.sum(ac * ac, -1)
    d20 = jnp.sum(ap * ab, -1)
    d21 = jnp.sum(ap * ac, -1)
    denom = d00 * d11 - d01 * d01
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    w1 = (d11 * d20 - d01 * d21) / denom
    w2 = (d00 * d21 - d01 * d20) / denom
    w0 = 1.0 - w1 - w2
    return jnp.clip(jnp.stack([w0, w1, w2], -1), 0.0, 1.0)


def _tri_fragments(v0, v1, v2, valid, lo, cell, half, n, tri_budget,
                   conservative):
    """Candidate enumeration + overlap for ONE triangle (vmapped by both
    the dense rasterizer and the A-buffer emitter): walk the triangle's
    voxel-space AABB up to tri_budget cells and test each against the
    selected separating criterion. Returns (flat_idx i32[budget],
    hit bool[budget], centers f32[budget, 3])."""
    tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
    tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
    i_lo = jnp.clip(jnp.floor((tmin - lo) / cell).astype(jnp.int32), 0, n - 1)
    i_hi = jnp.clip(jnp.floor((tmax - lo) / cell).astype(jnp.int32), 0, n - 1)
    dims = i_hi - i_lo + 1

    k = jnp.arange(tri_budget, dtype=jnp.int32)
    kx = k % dims[0]
    ky = (k // dims[0]) % dims[1]
    kz = k // (dims[0] * dims[1])
    in_budget = k < dims[0] * dims[1] * dims[2]
    ix = i_lo[0] + kx
    iy = i_lo[1] + ky
    iz = i_lo[2] + kz
    centers = lo + (jnp.stack([ix, iy, iz], -1).astype(jnp.float32) + 0.5) * cell

    nrm = jnp.cross(v1 - v0, v2 - v0)
    nl = jnp.linalg.norm(nrm)
    n_hat = nrm / jnp.where(nl < 1e-12, 1.0, nl)
    overlap = (_tri_box_overlap_conservative if conservative
               else _tri_box_overlap_thin)
    hit = (
        valid & in_budget & (nl > 1e-12)
        & overlap(centers, half, v0, v1, v2, n_hat)
    )
    flat = (iz * n + iy) * n + ix
    return flat, hit, centers


@functools.partial(jax.jit,
                   static_argnames=("log_n", "tri_budget", "conservative"))
def voxelize(soup: TriangleSoup, texture: jnp.ndarray, bbox_lo: jnp.ndarray,
             bbox_hi: jnp.ndarray, *, log_n: int, tri_budget: int,
             conservative: bool = False) -> jnp.ndarray:
    """Rasterize triangles into a dense voxel grid of packed RGBA8 words.

    texture: f32[th, tw, 3] (a 1x1 texel for untextured meshes). Returns
    u32[N, N, N] indexed [z, y, x]; empty cells are 0 (alpha 0).
    conservative selects the 26-separating overlap test (VoxelPipe's
    CONSERVATIVE_RASTER; the reference app only ever uses THIN,
    voxelization.cu:297).
    """
    n = 1 << log_n
    lo = bbox_lo
    cell = jnp.maximum((bbox_hi - bbox_lo) / n, 1e-12)
    half = cell * 0.5
    th, tw = texture.shape[0], texture.shape[1]

    def per_triangle(v0, v1, v2, uv, valid):
        flat, hit, centers = _tri_fragments(
            v0, v1, v2, valid, lo, cell, half, n, tri_budget, conservative)

        w = _barycentric(centers, v0, v1, v2)
        uvp = w @ uv  # [budget, 2]
        tx = jnp.clip((uvp[:, 0] * tw).astype(jnp.int32), 0, tw - 1)
        ty = jnp.clip((uvp[:, 1] * th).astype(jnp.int32), 0, th - 1)
        rgb = texture[ty, tx]
        val = packing.pack_rgba8(
            (rgb[:, 0] * 255).astype(jnp.int32),
            (rgb[:, 1] * 255).astype(jnp.int32),
            (rgb[:, 2] * 255).astype(jnp.int32),
            jnp.full((tri_budget,), 127, jnp.int32),
        )
        return jnp.where(hit, flat, n * n * n), jnp.where(hit, val, 0)

    idx, val = jax.vmap(per_triangle)(soup.v0, soup.v1, soup.v2, soup.uv,
                                      soup.valid)
    grid = jnp.zeros((n * n * n,), jnp.uint32)
    grid = grid.at[idx.reshape(-1)].max(val.reshape(-1), mode="drop")
    return grid.reshape(n, n, n)


class ABuffer(NamedTuple):
    """Fragment-list voxelization output (VoxelPipe's A-buffer mode,
    external/include/voxelpipe/voxelpipe.h:151-213 + abuffer.h): one
    record per overlapping (triangle, voxel) pair instead of one blended
    value per voxel, sorted by voxel id so consumers can walk each
    voxel's fragment run (get_fragment_ids / get_fragment_tris)."""

    frag_voxel: jnp.ndarray  # i32[cap] flat voxel id (z*N + y)*N + x,
                             # ascending; n^3 past `count`
    frag_tri: jnp.ndarray    # i32[cap] emitting triangle index (soup
                             # order), ascending within a voxel run
    count: jnp.ndarray       # i32[] valid fragments
    overflowed: jnp.ndarray  # bool[] capacity exceeded (fragments past
                             # `capacity` were dropped; the reference
                             # fails outright when its reserve is small,
                             # voxelpipe_inline.h via reserve())


@functools.partial(jax.jit, static_argnames=("log_n", "tri_budget",
                                             "capacity", "conservative"))
def voxelize_abuffer(soup: TriangleSoup, bbox_lo: jnp.ndarray,
                     bbox_hi: jnp.ndarray, *, log_n: int, tri_budget: int,
                     capacity: int, conservative: bool = False) -> ABuffer:
    """A-buffer voxelization: emit every overlapping (triangle, voxel)
    pair as a fragment record (ABufferContext::run semantics,
    voxelpipe.h:179-196). Same candidate enumeration and overlap tests
    as `voxelize`; instead of scatter-blending into a dense grid, live
    pairs are prefix-sum-compacted and sorted by voxel id (the
    reference's b40c fragment sort). The sort is stable and emission is
    triangle-major, so fragments within one voxel come out in ascending
    triangle order — deterministic where the reference's intra-voxel
    order is scheduling-dependent."""
    n = 1 << log_n
    lo = bbox_lo
    cell = jnp.maximum((bbox_hi - bbox_lo) / n, 1e-12)
    half = cell * 0.5

    def per_triangle(v0, v1, v2, valid):
        flat, hit, _ = _tri_fragments(
            v0, v1, v2, valid, lo, cell, half, n, tri_budget, conservative)
        return flat, hit

    flat, hit = jax.vmap(per_triangle)(soup.v0, soup.v1, soup.v2,
                                       soup.valid)
    t = soup.v0.shape[0]
    tri_ids = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32)[:, None], (t, tri_budget))
    (vox_c, tri_c), count = compaction.compact_multi(
        [flat.reshape(-1), tri_ids.reshape(-1)], hit.reshape(-1), capacity)
    total = jnp.minimum(jnp.sum(hit.astype(jnp.int32)), jnp.int32(2**31 - 1))
    overflowed = total > capacity
    # sort by voxel id with dead lanes pushed to the end (key n^3); the
    # compaction is order-preserving (triangle-major), so a stable sort
    # leaves each voxel's fragments in ascending triangle order
    lanes = jnp.arange(capacity, dtype=jnp.int32)
    key = jnp.where(lanes < count, vox_c, jnp.int32(n * n * n))
    key_s, tri_s = jax.lax.sort_key_val(key, tri_c, is_stable=True)
    return ABuffer(frag_voxel=key_s, frag_tri=tri_s, count=count,
                   overflowed=overflowed)


@functools.partial(jax.jit, static_argnames=("log_n", "capacity"))
def grid_to_voxel_list(grid: jnp.ndarray, bbox_lo: jnp.ndarray,
                       bbox_hi: jnp.ndarray, *, log_n: int,
                       capacity: int):
    """Compact occupied cells (alpha > 0, getOccupiedVoxels semantics) into
    (centers f32[cap,3], colors f32[cap,4], count) — the thrust::copy_if at
    voxelization.cu:312 as prefix-sum compaction."""
    n = 1 << log_n
    flat = grid.reshape(-1)
    occupied = packing.alpha_of(flat) > 0
    cell = jnp.maximum((bbox_hi - bbox_lo) / n, 1e-12)
    lin = jnp.arange(n * n * n, dtype=jnp.int32)
    ix = lin % n
    iy = (lin // n) % n
    iz = lin // (n * n)
    centers = bbox_lo + (jnp.stack([ix, iy, iz], -1).astype(jnp.float32) + 0.5) * cell
    colors = packing.unpack_rgba_unit(flat)
    (c_out, col_out), count = compaction.compact_multi(
        [centers, colors], occupied, capacity)
    return c_out, col_out, count


def mesh_to_voxel_grid(mesh: Mesh, texture: Texture | None, *, log_n: int = 8,
                       tri_budget: int = 512, capacity: int = 1 << 18,
                       conservative: bool = False) -> VoxelGrid:
    """meshToVoxelGrid (voxelization.cu:381-405): voxelize into the mesh's
    bbox and return the compacted VoxelGrid. conservative=True switches the
    overlap test from THIN (6-separating) to CONSERVATIVE (26-separating)."""
    bbox = mesh.bbox
    soup = prepare_mesh(mesh, bbox, log_n, tri_budget)
    tex = (texture.data if texture is not None
           else jnp.full((1, 1, 3), jnp.asarray([0.0, 1.0, 0.0]), jnp.float32))
    grid = voxelize(soup, tex, bbox.bbox0, bbox.bbox1,
                    log_n=log_n, tri_budget=tri_budget,
                    conservative=conservative)
    centers, colors, count = grid_to_voxel_list(
        grid, bbox.bbox0, bbox.bbox1, log_n=log_n, capacity=capacity)
    n = 1 << log_n
    scale = (bbox.bbox1[0] - bbox.bbox0[0]) / n / 2.0
    return VoxelGrid(centers=centers, colors=colors, count=count,
                     scale=scale, bbox=bbox)


def meshes_to_voxel_grid(meshes, textures, *, log_n: int = 8,
                         tri_budget: int = 512, capacity: int = 1 << 18,
                         conservative: bool = False) -> VoxelGrid:
    """Voxelize EVERY loaded mesh into one shared CUBIC grid over the
    union of their bboxes — the reference never implemented this ("TODO:
    Voxelize all meshes, not just the first one", scene.cpp:65). Mesh i
    samples textures[i] (a flat green texel past the list or at a None
    slot, matching the untextured default). Overlapping fragments from
    different meshes resolve by max packed value, the same deterministic
    rule used within one mesh.

    Unlike the single-mesh path (which keeps the reference's per-axis
    cells over the raw mesh bbox, computeScale voxelization.cu:78-80),
    the union bbox is padded to a CUBE around its center: a union of
    disjoint meshes is arbitrarily anisotropic, and non-cubic cells would
    disagree with the scalar `scale` every octree/render consumer uses."""
    assert meshes, "no meshes"
    lo = np.min([np.asarray(m.bbox.bbox0) for m in meshes], axis=0)
    hi = np.max([np.asarray(m.bbox.bbox1) for m in meshes], axis=0)
    c = 0.5 * (lo + hi)
    half = float(np.max(hi - lo)) * 0.5
    bbox = BoundingBox(bbox0=jnp.asarray(c - half, jnp.float32),
                       bbox1=jnp.asarray(c + half, jnp.float32))
    n = 1 << log_n
    grid = jnp.zeros((n, n, n), jnp.uint32)
    default_tex = jnp.full((1, 1, 3), jnp.asarray([0.0, 1.0, 0.0]),
                           jnp.float32)
    for i, mesh in enumerate(meshes):
        soup = prepare_mesh(mesh, bbox, log_n, tri_budget)
        tex = (textures[i].data if i < len(textures)
               and textures[i] is not None else default_tex)
        g = voxelize(soup, tex, bbox.bbox0, bbox.bbox1, log_n=log_n,
                     tri_budget=tri_budget, conservative=conservative)
        grid = jnp.maximum(grid, g)
    centers, colors, count = grid_to_voxel_list(
        grid, bbox.bbox0, bbox.bbox1, log_n=log_n, capacity=capacity)
    scale = (bbox.bbox1[0] - bbox.bbox0[0]) / n / 2.0
    return VoxelGrid(centers=centers, colors=colors, count=count,
                     scale=scale, bbox=bbox)


def voxel_grid_to_mesh(grid: VoxelGrid, cube_scale: float = 1.0) -> Mesh:
    """Instantiate a cube mesh per occupied voxel (voxelGridToMesh +
    createCubeMesh, voxelization.cu:184-217,325-379). Host-side; intended
    for the voxel-cube display path through the triangle rasterizer."""
    centers = np.asarray(grid.centers)[: int(grid.count)]
    colors = np.asarray(grid.colors)[: int(grid.count), :3]
    s = float(grid.scale) * cube_scale
    # unit cube corners / 12 triangles
    corners = np.array(
        [[x, y, z] for z in (-1, 1) for y in (-1, 1) for x in (-1, 1)],
        np.float32) * s
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),  # z- z+
        (0, 4, 5, 1), (2, 3, 7, 6),  # y- y+
        (0, 2, 6, 4), (1, 5, 7, 3),  # x- x+
    ]
    tris = []
    for q in quads:
        tris.append((q[0], q[1], q[2]))
        tris.append((q[0], q[2], q[3]))
    tris = np.array(tris, np.int32)
    k = centers.shape[0]
    verts = (centers[:, None, :] + corners[None]).reshape(-1, 3)
    faces = (tris[None] + 8 * np.arange(k)[:, None, None]).reshape(-1, 3)
    vcols = np.repeat(colors, 8, axis=0)
    # per-vertex normals: radial from voxel center (good enough for shading)
    nrm = np.tile(corners / (np.linalg.norm(corners, axis=1, keepdims=True)), (k, 1))
    lo = centers.min(0) - s if k else np.zeros(3, np.float32)
    hi = centers.max(0) + s if k else np.zeros(3, np.float32)
    return Mesh(
        vertices=jnp.asarray(verts),
        normals=jnp.asarray(nrm.astype(np.float32)),
        colors=jnp.asarray(vcols.astype(np.float32)),
        faces=jnp.asarray(faces.astype(np.int32)),
        texcoords=jnp.zeros((faces.shape[0], 3, 2), jnp.float32),
        bbox=BoundingBox(jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32)),
    )
