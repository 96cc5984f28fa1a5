"""Wavefront OBJ loader.

Replaces the vendored objUtil parser (external objloader.cpp:14-129 +
obj::buildVBOs, obj.cpp:33-135): handles v/vt/vn lines, f faces with any of
the v, v/vt, v//vn, v/vt/vn index combos (including negative indices),
polygon-fan triangulation, computes smooth vertex normals when absent, and
returns a core.types.Mesh with per-corner texcoords and the mesh bbox.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.core.types import BoundingBox, Mesh


def _parse_index(tok: str, count: int) -> int:
    i = int(tok)
    return i - 1 if i > 0 else count + i


def _has_vertex_colors(path: str) -> bool:
    """Sniff the first 'v ' line for the 7-field vertex-color extension."""
    try:
        with open(path, "r") as f:
            for line in f:
                s = line.strip()
                if s.startswith("v "):
                    return len(s.split()) >= 7
                if s.startswith("f "):
                    return False
    except OSError:
        pass
    return False


def load_obj(path: str) -> Mesh:
    """Parse `path` into a Mesh; uses the native C++ parser when built
    (same semantics, ~20x faster on large meshes — tests/test_native.py
    keeps the two in lockstep), else the pure-Python path below."""
    try:
        from octree_slam_tpu.io import native
        if native.available() and not _has_vertex_colors(path):
            # the native parser reads 'v x y z' only; color-extended files
            # (save_obj's 'v x y z r g b') take the Python path so the
            # colors survive a round trip
            v, n, f, uv, lo, hi = native.load_obj_arrays(path)
            return Mesh(
                vertices=jnp.asarray(v), normals=jnp.asarray(n),
                colors=jnp.ones_like(jnp.asarray(v)),
                faces=jnp.asarray(f), texcoords=jnp.asarray(uv),
                bbox=BoundingBox(jnp.asarray(lo), jnp.asarray(hi)),
            )
    except (ImportError, OSError):
        pass
    return _load_obj_py(path)


def _load_obj_py(path: str) -> Mesh:
    positions = []
    vcolors = []
    texcoords = []
    normals = []
    faces = []       # list of [(vi, ti, ni)] per corner
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v":
                positions.append([float(x) for x in parts[1:4]])
                # 'v x y z r g b' vertex-color extension (save_obj emits it)
                vcolors.append([float(x) for x in parts[4:7]]
                               if len(parts) >= 7 else None)
            elif tag == "vt":
                u = float(parts[1])
                v = float(parts[2]) if len(parts) > 2 else 0.0
                texcoords.append([u, v])
            elif tag == "vn":
                normals.append([float(x) for x in parts[1:4]])
            elif tag == "f":
                corners = []
                for tok in parts[1:]:
                    comps = tok.split("/")
                    vi = _parse_index(comps[0], len(positions))
                    ti = (_parse_index(comps[1], len(texcoords))
                          if len(comps) > 1 and comps[1] else -1)
                    ni = (_parse_index(comps[2], len(normals))
                          if len(comps) > 2 and comps[2] else -1)
                    corners.append((vi, ti, ni))
                for k in range(1, len(corners) - 1):  # fan triangulation
                    faces.append([corners[0], corners[k], corners[k + 1]])

    v = np.asarray(positions, np.float32)
    vt = (np.asarray(texcoords, np.float32)
          if texcoords else np.zeros((0, 2), np.float32))
    vn = (np.asarray(normals, np.float32)
          if normals else np.zeros((0, 3), np.float32))

    fidx = np.array([[c[0] for c in tri] for tri in faces], np.int32)
    if fidx.size == 0:
        fidx = fidx.reshape(0, 3)

    # per-corner texcoords [F, 3, 2]
    fuv = np.zeros((fidx.shape[0], 3, 2), np.float32)
    for i, tri in enumerate(faces):
        for j, (_, ti, _) in enumerate(tri):
            if 0 <= ti < vt.shape[0]:
                fuv[i, j] = vt[ti]

    # smooth vertex normals: area-weighted face-normal accumulation when the
    # file carries none (obj.cpp computes flat normals per corner)
    vnorm = np.zeros_like(v)
    if vn.shape[0]:
        counts = np.zeros((v.shape[0], 1), np.float32)
        for tri in faces:
            for (vi, _, ni) in tri:
                if ni >= 0:
                    vnorm[vi] += vn[ni]
                    counts[vi] += 1
        vnorm = np.where(counts > 0, vnorm / np.maximum(counts, 1), vnorm)
    if not vn.shape[0] or not np.any(np.abs(vnorm) > 0):
        for tri in fidx:
            a, b, c = v[tri[0]], v[tri[1]], v[tri[2]]
            n = np.cross(b - a, c - a)
            for vi in tri:
                vnorm[vi] += n
    lens = np.linalg.norm(vnorm, axis=1, keepdims=True)
    vnorm = vnorm / np.maximum(lens, 1e-12)

    lo = v.min(0) if v.size else np.zeros(3, np.float32)
    hi = v.max(0) if v.size else np.zeros(3, np.float32)
    return Mesh(
        vertices=jnp.asarray(v),
        normals=jnp.asarray(vnorm.astype(np.float32)),
        colors=jnp.asarray(
            np.asarray([c if c is not None else [1.0, 1.0, 1.0]
                        for c in vcolors], np.float32)
            if vcolors else np.ones_like(v)),
        faces=jnp.asarray(fidx),
        texcoords=jnp.asarray(fuv),
        bbox=BoundingBox(jnp.asarray(lo), jnp.asarray(hi)),
    )


def save_obj(path: str, mesh: Mesh) -> None:
    """Write a Mesh as Wavefront OBJ. Vertex colors use the widespread
    'v x y z r g b' extension (read back by this module's own loader and
    by MeshLab/Blender); normals are per-vertex 'vn' lines referenced by
    the faces. The reference can display voxel-cube meshes
    (voxelGridToMesh, voxelization.cu:325-379) but never export them."""
    v = np.asarray(mesh.vertices, np.float64)
    n = np.asarray(mesh.normals, np.float64)
    c = np.asarray(mesh.colors, np.float64)
    f1 = np.asarray(mesh.faces, np.int64) + 1  # OBJ is 1-indexed
    has_n = n.size == v.size
    has_c = c.size == v.size
    # chunked row formatting: voxel-cube exports reach millions of lines;
    # tolist() converts a chunk to Python floats in C and '%'-formatting
    # each row is then ~1-2 us (np.savetxt and per-element writes are an
    # order of magnitude slower at this scale)
    def rows(out, fmt, arr, chunk=1 << 18):
        for i in range(0, arr.shape[0], chunk):
            block = arr[i:i + chunk].tolist()
            out.write("\n".join(fmt % tuple(r) for r in block))
            out.write("\n")

    with open(path, "w") as out:
        out.write("# octree-slam-tpu mesh export: %d verts, %d tris\n"
                  % (v.shape[0], f1.shape[0]))
        if has_c:
            rows(out, "v %.6f %.6f %.6f %.4f %.4f %.4f",
                 np.concatenate([v, c], axis=1))
        else:
            rows(out, "v %.6f %.6f %.6f", v)
        if has_n:
            rows(out, "vn %.6f %.6f %.6f", n)
            rows(out, "f %d//%d %d//%d %d//%d", f1[:, [0, 0, 1, 1, 2, 2]])
        else:
            rows(out, "f %d %d %d", f1)
