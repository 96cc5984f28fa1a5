"""Software triangle rasterizer.

TPU-native rebuild of the full-CUDA triangle pipeline
(src/rendering/rasterize_kernels.cu): vertex shade (projection + viewport,
:152-180), primitive assembly (:182-213), backface culling (:216-233),
barycentric rasterization with depth test (:292-336), and the two fragment
shaders (bilinear texture + diffuse :412-433, Blinn-Phong :441-469).

The TPU design replaces the scanline-over-AABB loop per CUDA thread with a
static per-triangle fragment budget (like the voxelizer): each triangle
emits up to `frag_budget` candidate pixels from its screen AABB, inside
tests and attribute interpolation run as vectorized masks, and the depth
test is a deterministic two-pass scatter-min (the reference's depth test is
a documented non-atomic race, rasterize_kernels.cu:327-330).

Backface culling keeps triangles with counter-clockwise screen winding
(positive signed area), matching the reference's calculateSignedArea
convention (rasterize_tools.h + cull at :216-233).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from octree_slam_tpu.core.types import Mesh
from octree_slam_tpu.render.points import (DEPTH_INF, _DEPTH_SCALE,
                                           project, project_clipless)


class RasterMesh(NamedTuple):
    """Per-face corner attributes (primitive assembly output)."""

    pos: jnp.ndarray   # f32[F, 3, 3] world-space corners
    nrm: jnp.ndarray   # f32[F, 3, 3]
    col: jnp.ndarray   # f32[F, 3, 3]
    uv: jnp.ndarray    # f32[F, 3, 2]
    valid: jnp.ndarray  # bool[F]


def assemble(mesh: Mesh) -> RasterMesh:
    """Primitive assembly: gather corner attributes per face
    (primitiveAssemblyKernel, rasterize_kernels.cu:182-213)."""
    f = mesh.faces
    uv = mesh.texcoords
    if uv.shape[0] != f.shape[0]:
        uv = jnp.zeros((f.shape[0], 3, 2), jnp.float32)
    return RasterMesh(
        pos=mesh.vertices[f],
        nrm=mesh.normals[f] if mesh.normals.shape[0] else jnp.zeros((f.shape[0], 3, 3)),
        col=mesh.colors[f] if mesh.colors.shape[0] else jnp.full((f.shape[0], 3, 3), 0.8),
        uv=uv,
        valid=jnp.ones((f.shape[0],), bool),
    )


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "frag_budget", "shading", "cull_backfaces"))
def rasterize(rm: RasterMesh, mvp: jnp.ndarray, *, width: int, height: int,
              frag_budget: int = 256, texture: jnp.ndarray | None = None,
              light_pos=(10.0, 10.0, 10.0), eye_pos=(0.0, 0.0, 0.0),
              shading: str = "diffuse",
              cull_backfaces: bool = True) -> jnp.ndarray:
    """Render a triangle mesh to f32[height, width, 4] (rgb + coverage).

    shading: 'color' (interpolated vertex color), 'diffuse' (lambertian,
    fragmentShadeKernel), or 'phong' (Blinn-Phong, fragmentShadePhongKernel).
    If `texture` f32[th,tw,3] is given, base color is bilinear-sampled.
    """
    F = rm.pos.shape[0]
    num_pix = width * height
    light = jnp.asarray(light_pos, jnp.float32)
    eye = jnp.asarray(eye_pos, jnp.float32)

    # --- vertex shade: project all corners (clipless: partially
    # off-screen triangles still draw their on-screen part) ---
    xy, z, ok = project_clipless(rm.pos.reshape(-1, 3), mvp, width, height)
    xy = xy.reshape(F, 3, 2)
    z = z.reshape(F, 3)
    ok = ok.reshape(F, 3)
    tri_ok = rm.valid & jnp.all(ok, axis=1)

    # --- backface cull on signed screen area (:216-233) ---
    e1 = xy[:, 1] - xy[:, 0]
    e2 = xy[:, 2] - xy[:, 0]
    area2 = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    if cull_backfaces:
        tri_ok = tri_ok & (area2 < 0.0)  # y grows downward: CCW-world flips
    tri_ok = tri_ok & (jnp.abs(area2) > 1e-12)

    def per_tri(xy3, z3, pos3, nrm3, col3, uv3, alive):
        lo = jnp.floor(jnp.min(xy3, axis=0)).astype(jnp.int32)
        hi = jnp.ceil(jnp.max(xy3, axis=0)).astype(jnp.int32)
        lo = jnp.clip(lo, 0, jnp.array([width - 1, height - 1]))
        hi = jnp.clip(hi, 0, jnp.array([width - 1, height - 1]))
        dims = hi - lo + 1

        k = jnp.arange(frag_budget, dtype=jnp.int32)
        px = lo[0] + k % dims[0]
        py = lo[1] + k // dims[0]
        in_box = (k < dims[0] * dims[1]) & (py <= hi[1])
        p = jnp.stack([px.astype(jnp.float32) + 0.5,
                       py.astype(jnp.float32) + 0.5], -1)

        # barycentric via 2D edge functions
        d = xy3[1:] - xy3[0]
        det = d[0, 0] * d[1, 1] - d[0, 1] * d[1, 0]
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        rel = p - xy3[0]
        w1 = (rel[:, 0] * d[1, 1] - rel[:, 1] * d[1, 0]) / det
        w2 = (-rel[:, 0] * d[0, 1] + rel[:, 1] * d[0, 0]) / det
        w0 = 1.0 - w1 - w2
        bary = jnp.stack([w0, w1, w2], -1)
        inside = jnp.all(bary >= -1e-6, axis=-1)

        depth = bary @ z3
        hit = alive & in_box & inside & (depth >= -1.0) & (depth <= 1.0)
        frag_pos = bary @ pos3
        frag_nrm = bary @ nrm3
        frag_col = bary @ col3
        frag_uv = bary @ uv3
        idx = jnp.where(hit, py * width + px, num_pix)
        return idx, depth, frag_pos, frag_nrm, frag_col, frag_uv, hit

    idx, depth, fpos, fnrm, fcol, fuv, hit = jax.vmap(per_tri)(
        xy, z, rm.pos, rm.nrm, rm.col, rm.uv, tri_ok)
    idx = idx.reshape(-1)
    q = jnp.round(depth.reshape(-1) * _DEPTH_SCALE).astype(jnp.int32)
    hit = hit.reshape(-1)
    fpos = fpos.reshape(-1, 3)
    fnrm = fnrm.reshape(-1, 3)
    fcol = fcol.reshape(-1, 3)
    fuv = fuv.reshape(-1, 2)

    # --- fragment shade ---
    base = fcol
    if texture is not None:
        th, tw = texture.shape[0], texture.shape[1]
        u = jnp.clip(fuv[:, 0], 0.0, 1.0) * (tw - 1)
        v = jnp.clip(fuv[:, 1], 0.0, 1.0) * (th - 1)
        u0 = jnp.floor(u).astype(jnp.int32)
        v0 = jnp.floor(v).astype(jnp.int32)
        u1 = jnp.minimum(u0 + 1, tw - 1)
        v1 = jnp.minimum(v0 + 1, th - 1)
        fu = (u - u0)[:, None]
        fv = (v - v0)[:, None]
        base = (
            texture[v0, u0] * (1 - fu) * (1 - fv)
            + texture[v0, u1] * fu * (1 - fv)
            + texture[v1, u0] * (1 - fu) * fv
            + texture[v1, u1] * fu * fv
        )

    if shading in ("diffuse", "phong"):
        n = fnrm / jnp.maximum(jnp.linalg.norm(fnrm, axis=-1, keepdims=True), 1e-9)
        l = light - fpos
        l = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-9)
        lam = jnp.clip(jnp.sum(n * l, axis=-1), 0.0, 1.0)
        shade = 0.2 + 0.8 * lam
        rgb = base * shade[:, None]
        if shading == "phong":
            v = eye - fpos
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
            h = l + v
            h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
            spec = jnp.clip(jnp.sum(n * h, axis=-1), 0.0, 1.0) ** 32
            rgb = rgb + 0.4 * spec[:, None]
    else:
        rgb = base
    rgb = jnp.clip(rgb, 0.0, 1.0)

    # --- deterministic two-pass depth resolve ---
    idx_safe = jnp.where(hit, idx, num_pix)
    zbuf = jnp.full((num_pix,), DEPTH_INF, jnp.int32)
    zbuf = zbuf.at[idx_safe].min(jnp.where(hit, q, DEPTH_INF), mode="drop")
    won = hit & (zbuf[jnp.minimum(idx_safe, num_pix - 1)] == q)
    fb = jnp.zeros((num_pix, 3), jnp.float32)
    fb = fb.at[jnp.where(won, idx, num_pix)].set(rgb, mode="drop")
    cov = jnp.zeros((num_pix,), jnp.float32)
    cov = cov.at[jnp.where(won, idx, num_pix)].set(1.0, mode="drop")
    out = jnp.concatenate([fb, cov[:, None]], axis=-1)
    return out.reshape(height, width, 4)


@functools.partial(jax.jit, static_argnames=("width", "height", "samples"))
def rasterize_wireframe(rm: RasterMesh, mvp: jnp.ndarray, *, width: int,
                        height: int, samples: int = 64) -> jnp.ndarray:
    """Debug wireframe pipeline (rasterizationKernelWire,
    rasterize_kernels.cu:340-377): each triangle edge is sampled at
    `samples` points and scattered with the same two-pass depth resolve as
    the solid rasterizer. White lines on black, coverage in alpha."""
    F = rm.pos.shape[0]
    num_pix = width * height
    xy, z, ok = project_clipless(rm.pos.reshape(-1, 3), mvp, width, height)
    xy = xy.reshape(F, 3, 2)
    z = z.reshape(F, 3)
    tri_ok = rm.valid & jnp.all(ok.reshape(F, 3), axis=1)

    t = jnp.linspace(0.0, 1.0, samples)[:, None]          # [S,1]
    # edges (0,1), (1,2), (2,0): [F, 3, S, 2]
    p0 = xy
    p1 = xy[:, jnp.array([1, 2, 0])]
    z0 = z
    z1 = z[:, jnp.array([1, 2, 0])]
    pts = p0[:, :, None, :] * (1 - t) + p1[:, :, None, :] * t
    zs = z0[:, :, None] * (1 - t[:, 0]) + z1[:, :, None] * t[:, 0]
    px = jnp.round(pts[..., 0] - 0.5).astype(jnp.int32)
    py = jnp.round(pts[..., 1] - 0.5).astype(jnp.int32)
    hit = (tri_ok[:, None, None] & (px >= 0) & (px < width)
           & (py >= 0) & (py < height) & (zs >= -1.0) & (zs <= 1.0))
    idx = jnp.where(hit, py * width + px, num_pix).reshape(-1)
    q = jnp.round(zs.reshape(-1) * _DEPTH_SCALE).astype(jnp.int32)
    hitf = hit.reshape(-1)

    zbuf = jnp.full((num_pix,), DEPTH_INF, jnp.int32)
    zbuf = zbuf.at[idx].min(jnp.where(hitf, q, DEPTH_INF), mode="drop")
    won = hitf & (zbuf[jnp.minimum(idx, num_pix - 1)] == q)
    fb = jnp.zeros((num_pix, 4), jnp.float32)
    fb = fb.at[jnp.where(won, idx, num_pix)].set(
        jnp.ones(4, jnp.float32), mode="drop")
    return fb.reshape(height, width, 4)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def rasterize_vertices(rm: RasterMesh, mvp: jnp.ndarray, *, width: int,
                       height: int) -> jnp.ndarray:
    """Debug vertex-cloud pipeline (rasterizationKernelVertices,
    rasterize_kernels.cu:380-410): projected corners as single white
    pixels with depth resolve."""
    F = rm.pos.shape[0]
    num_pix = width * height
    xy, z, ok = project(rm.pos.reshape(-1, 3), mvp, width, height)
    ok = ok & jnp.repeat(rm.valid, 3)
    px = jnp.round(xy[:, 0] - 0.5).astype(jnp.int32)
    py = jnp.round(xy[:, 1] - 0.5).astype(jnp.int32)
    hit = ok & (px >= 0) & (px < width) & (py >= 0) & (py < height)
    idx = jnp.where(hit, py * width + px, num_pix)
    q = jnp.round(z * _DEPTH_SCALE).astype(jnp.int32)
    zbuf = jnp.full((num_pix,), DEPTH_INF, jnp.int32)
    zbuf = zbuf.at[idx].min(jnp.where(hit, q, DEPTH_INF), mode="drop")
    won = hit & (zbuf[jnp.minimum(idx, num_pix - 1)] == q)
    fb = jnp.zeros((num_pix, 4), jnp.float32)
    fb = fb.at[jnp.where(won, idx, num_pix)].set(
        jnp.ones(4, jnp.float32), mode="drop")
    return fb.reshape(height, width, 4)


def rasterize_mesh(mesh: Mesh, camera, *, width: int, height: int,
                   frag_budget: int | None = None, texture=None,
                   shading: str = "diffuse", light_pos=(10.0, 10.0, 10.0),
                   cull_backfaces: bool = True) -> jnp.ndarray:
    """Convenience wrapper: assemble + rasterize with a core.types.Camera
    (host API of CUDARenderer::rasterize, cuda_renderer.cpp:116-135).

    frag_budget=None picks a per-triangle budget that keeps total candidate
    fragments near 4x the pixel count: few big triangles get enough pixels
    to cover the screen; dense meshes get small budgets. Too-small budgets
    silently truncate large on-screen triangles."""
    rm = assemble(mesh)
    if frag_budget is None:
        f = max(int(mesh.faces.shape[0]), 1)
        frag_budget = int(min(max(256, 4 * width * height // f), 65536))
    eye = -camera.view[:3, :3].T @ camera.view[:3, 3]
    return rasterize(rm, camera.mvp, width=width, height=height,
                     frag_budget=frag_budget, texture=texture,
                     light_pos=light_pos, eye_pos=tuple(float(x) for x in eye),
                     shading=shading, cull_backfaces=cull_backfaces)
