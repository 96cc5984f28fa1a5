"""Point-cloud and voxel-splat rendering to a framebuffer array.

Replaces the OpenGL presentation paths of the reference — GL_POINTS drawing
of the vertex map (OpenGLRenderer::renderPoints, opengl_renderer.cpp:174-221
+ the CUDA->VBO copy in gl_interop_kernels.cu:11-37) and instanced voxel
cubes (rasterizeVoxels, opengl_renderer.cpp:101-172, shaders/voxels.vert) —
with pure array programs: project, then depth-resolve by scatter-min.

The GPU depth-test race of the reference's software rasterizer
(rasterize_kernels.cu:327-330, non-atomic) is replaced by a deterministic
single-pass resolve: ONE scatter-min of a packed (quantized NDC depth << 16
| rgb565) word per pixel — scatters are latency-bound on this TPU (~1.4 ms
per 307k lanes regardless of payload), so packing depth and color into one
word is half the cost of a depth pass plus a color pass, and the footprint
splats in render_voxels drop from 3 scatters per offset to 1. Depth keeps
15 bits over NDC [-1, 1] (finer than the previous 1e4-scale quantization);
colors quantize to 5-6-5 like the map splat path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

DEPTH_INF = np.int32(0x7FFFFFFF)
_DEPTH_SCALE = 1.0e4  # depth quantization (0.1 mm in eye units)


def project(points: jnp.ndarray, mvp: jnp.ndarray, width: int, height: int):
    """Clip-space projection + viewport transform (vertexShadeKernel,
    rasterize_kernels.cu:152-180). Returns (xy f32[N,2], depth f32[N],
    valid bool[N])."""
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    hom = jnp.concatenate([points, ones], axis=-1)
    clip = hom @ mvp.T
    w = clip[..., 3]
    ok = (w > 1e-8) & jnp.all(jnp.isfinite(clip), axis=-1)
    ndc = clip[..., :3] / jnp.where(ok, w, 1.0)[..., None]
    inside = ok & jnp.all(jnp.abs(ndc) <= 1.0, axis=-1)
    px = (ndc[..., 0] * 0.5 + 0.5) * width
    py = (1.0 - (ndc[..., 1] * 0.5 + 0.5)) * height
    return jnp.stack([px, py], axis=-1), ndc[..., 2], inside


def project_clipless(points: jnp.ndarray, mvp: jnp.ndarray, width: int,
                     height: int):
    """Like project() but valid only requires the vertex to be in front of
    the camera (w > 0), not inside the frustum. Triangle pipelines use this
    so primitives partially off-screen still rasterize their on-screen part
    (the reference clamps the scan AABB to the viewport instead,
    rasterize_kernels.cu:300-310); fragments are bounds- and depth-checked
    individually."""
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    hom = jnp.concatenate([points, ones], axis=-1)
    clip = hom @ mvp.T
    w = clip[..., 3]
    ok = (w > 1e-8) & jnp.all(jnp.isfinite(clip), axis=-1)
    ndc = clip[..., :3] / jnp.where(ok, w, 1.0)[..., None]
    px = (ndc[..., 0] * 0.5 + 0.5) * width
    py = (1.0 - (ndc[..., 1] * 0.5 + 0.5)) * height
    return jnp.stack([px, py], axis=-1), ndc[..., 2], ok


def pack_rgb565(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray):
    """8-bit channels -> one 5-6-5 16-bit word (shared by every packed
    z-buffer in the render package — splat.py imports these)."""
    return ((r >> 3) << 11) | ((g >> 2) << 5) | (b >> 3)


def unpack_rgb565(v: jnp.ndarray):
    """5-6-5 word -> 8-bit channels, replicating the top bits into the low
    ones so full-scale values round-trip exactly (255 -> 255, not 248)."""
    r5 = (v >> 11) & 0x1F
    g6 = (v >> 5) & 0x3F
    b5 = v & 0x1F
    return (r5 << 3) | (r5 >> 2), (g6 << 2) | (g6 >> 4), (b5 << 3) | (b5 >> 2)


def _pack_zrgb(ndc_z: jnp.ndarray, colors: jnp.ndarray) -> jnp.ndarray:
    """(q15 depth << 16) | rgb565 — one int32 per fragment for scatter-min."""
    q = jnp.clip(jnp.round((ndc_z + 1.0) * 16383.0), 0, 32766).astype(jnp.int32)
    c8 = jnp.clip(jnp.round(colors[..., :3] * 255.0), 0, 255).astype(jnp.int32)
    return (q << 16) | pack_rgb565(c8[..., 0], c8[..., 1], c8[..., 2])


def _unpack_fb(buf: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Packed z-buffer -> f32[H, W, 4] (alpha = hit mask)."""
    occ = buf != DEPTH_INF
    rr, gg, bb = unpack_rgb565(buf & 0xFFFF)
    rgb = jnp.stack([rr, gg, bb], axis=-1).astype(jnp.float32)
    rgb = jnp.where(occ[..., None], rgb / 255.0, 0.0)
    out = jnp.concatenate([rgb, occ[..., None].astype(jnp.float32)], axis=-1)
    return out.reshape(height, width, 4)


def _resolve(idx: jnp.ndarray, ndc_z: jnp.ndarray, colors: jnp.ndarray,
             valid: jnp.ndarray, num_pix: int):
    """Single-pass packed z-buffer resolve (see module docstring)."""
    word = _pack_zrgb(ndc_z, colors)
    buf = jnp.full((num_pix,), DEPTH_INF, jnp.int32)
    buf = buf.at[jnp.where(valid, idx, num_pix)].min(
        jnp.where(valid, word, DEPTH_INF), mode="drop")
    return buf


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render_points(points: jnp.ndarray, colors: jnp.ndarray,
                  mvp: jnp.ndarray, *, width: int, height: int) -> jnp.ndarray:
    """1-pixel point splats with depth test. points f32[N,3], colors
    f32[N,3] in [0,1]. Returns f32[height, width, 4]."""
    xy, z, valid = project(points, mvp, width, height)
    xi = jnp.floor(xy[:, 0]).astype(jnp.int32)
    yi = jnp.floor(xy[:, 1]).astype(jnp.int32)
    inb = valid & (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
    idx = yi * width + xi
    buf = _resolve(idx, z, colors, inb, width * height)
    return _unpack_fb(buf, height, width)


@functools.partial(jax.jit, static_argnames=("width", "height", "max_splat"))
def render_voxels(centers: jnp.ndarray, colors: jnp.ndarray, scale,
                  live: jnp.ndarray, view: jnp.ndarray, mvp: jnp.ndarray, *,
                  width: int, height: int, max_splat: int = 4,
                  proj_focal=None) -> jnp.ndarray:
    """Voxel-cube view as depth-tested square splats sized by the projected
    voxel footprint (the TPU stand-in for instanced cube rasterization,
    opengl_renderer.cpp:101-172; exact cubes come from the triangle
    rasterizer via voxel_grid_to_mesh).

    centers f32[N,3]; colors f32[N,3-4]; scale = half voxel edge; live
    bool[N]. max_splat bounds the splat radius in pixels (static).
    """
    xy, z, valid = project(centers, mvp, width, height)
    valid = valid & live
    cam = centers @ view[:3, :3].T + view[:3, 3]
    dist = jnp.maximum(-cam[..., 2], 1e-4)  # camera looks down -z in GL view
    # projected half-size in pixels: scale/dist * (half screen / tan(fov/2)).
    # P[1,1] = 1/tan(fov/2) must come from the PROJECTION matrix — mvp[1,1]
    # folds in view rotation and collapses for pitched cameras.
    focal_px = mvp[1, 1] if proj_focal is None else proj_focal
    r_px = jnp.clip(scale / dist * jnp.abs(focal_px) * (height / 2.0),
                    0.0, float(max_splat))
    xi = jnp.floor(xy[:, 0]).astype(jnp.int32)
    yi = jnp.floor(xy[:, 1]).astype(jnp.int32)
    word = _pack_zrgb(z, colors)

    num_pix = width * height
    buf = jnp.full((num_pix,), DEPTH_INF, jnp.int32)
    offs = range(-max_splat, max_splat + 1)
    # one packed scatter-min per footprint offset resolves depth AND color
    for dy in offs:
        for dx in offs:
            covered = (jnp.maximum(jnp.abs(dx), jnp.abs(dy)) <= r_px + 0.5)
            x2 = xi + dx
            y2 = yi + dy
            ok = valid & covered & (x2 >= 0) & (x2 < width) & (y2 >= 0) & (y2 < height)
            idx = jnp.where(ok, y2 * width + x2, num_pix)
            buf = buf.at[idx].min(jnp.where(ok, word, DEPTH_INF), mode="drop")
    return _unpack_fb(buf, height, width)
