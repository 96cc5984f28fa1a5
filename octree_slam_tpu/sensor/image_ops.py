"""Depth/color frame preprocessing.

TPU-native equivalents of the CUDA image kernels in
src/sensor/image_kernels.cu. Each kernel's 256-thread 1-D pixel grid becomes
a vectorized jnp op over [H, W] images, fusing under jit. Images are
row-major [H, W(, C)]; invalid vertices/normals are INF like the reference.

Documented divergences from the reference:
  * colorToIntensity uses the correct (r, g, b) channels; the reference reads
    `.b` for both the G and B terms (image_kernels.cu:196-197).
  * Window ops (bilateral, depth-aware subsample) use the full symmetric
    window clipped to the image; the reference's exclusive upper bound
    `min(x - k/2 + k, dim - 1)` silently drops the last row/column
    (image_kernels.cu:155-156, 252-253).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

INVALID_DEPTH_MAX_MM = 15000  # image_kernels.cu:40


def generate_vertex_map(depth_mm: jnp.ndarray, fx, fy,
                        img_size: Tuple[int, int]) -> jnp.ndarray:
    """Pinhole backprojection of a (possibly pyramid-subsampled) depth image.

    depth_mm: u16/i32[h, w] millimeters; img_size: (full_W, full_H) — the
    native sensor size, so pyramid levels scale pixel coords back up exactly
    like generateVertexMapKernel (image_kernels.cu:24-53).
    Returns f32[h, w, 3] with INF for invalid depth.
    """
    h, w = depth_mm.shape
    img_w, img_h = img_size
    d = depth_mm.astype(jnp.float32)
    x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    milli = 1e-3
    vx = ((img_w / w) * x - img_w / 2.0) * d / fx * milli
    vy = (img_h / 2.0 - (img_h / h) * y) * d / fy * milli
    vz = d * milli
    v = jnp.stack([vx, vy, vz], axis=-1)
    invalid = (depth_mm == 0) | (depth_mm > INVALID_DEPTH_MAX_MM)
    return jnp.where(invalid[..., None], jnp.inf, v)


def generate_normal_map(vertex: jnp.ndarray) -> jnp.ndarray:
    """n = normalize(-cross(v[x+1]-v, v[y+1]-v)); right/bottom edges invalid
    (generateNormalMapKernel, image_kernels.cu:104-134)."""
    h, w, _ = vertex.shape
    v1 = jnp.roll(vertex, -1, axis=1) - vertex  # v[x+1] - v
    v2 = jnp.roll(vertex, -1, axis=0) - vertex  # v[y+1] - v
    n = -jnp.cross(v1, v2)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / norm
    x = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    y = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    edge = (x == w - 1) | (y == h - 1)
    bad = edge | ~jnp.all(jnp.isfinite(n), axis=-1)
    return jnp.where(bad[..., None], jnp.inf, n)


@functools.partial(jax.jit,
                   static_argnames=("kernel_size", "sigma_spatial",
                                    "sigma_depth", "allow_pallas"))
def bilateral_filter(depth_mm: jnp.ndarray, kernel_size: int = 7,
                     sigma_spatial: float = 4.5,
                     sigma_depth: float = 40.0,
                     allow_pallas: bool = True) -> jnp.ndarray:
    """Depth-preserving smoothing (bilateralKernel, image_kernels.cu:142-177).

    weight = exp(-(space2 * 0.5/sig_s^2 + diff2 * 0.5/sig_d^2)); output is the
    rounded weighted mean over the window. Depth in u16 millimeters.

    On TPU with tile-compatible shapes the 7x7 window runs as one fused
    Pallas VMEM kernel (sensor/pallas_ops.py; bit-identical, 3.06 -> 2.29
    ms at 640x480 on v5e); everything else takes the XLA path below.
    """
    # allow_pallas=False for BATCHED callers: lowering a vmapped
    # pallas_call through the axon remote-compile path hangs (measured);
    # relocalize's K-candidate vmap opts out and takes the XLA stencil
    if allow_pallas and kernel_size == 7:
        from octree_slam_tpu.sensor import pallas_ops
        if pallas_ops.on_tpu() and pallas_ops.compatible(depth_mm.shape):
            return pallas_ops.bilateral(depth_mm, sigma_spatial, sigma_depth)
    h, w = depth_mm.shape
    half = kernel_size // 2
    sig_s = 0.5 / (sigma_spatial * sigma_spatial)
    sig_d = 0.5 / (sigma_depth * sigma_depth)
    d = depth_mm.astype(jnp.float32)
    pad = jnp.pad(d, half)
    inb = jnp.pad(jnp.ones((h, w), jnp.float32), half)
    s1 = jnp.zeros((h, w), jnp.float32)
    s2 = jnp.zeros((h, w), jnp.float32)
    for dy in range(-half, half + 1):
        for dx in range(-half, half + 1):
            nb = jax.lax.dynamic_slice(pad, (half + dy, half + dx), (h, w))
            m = jax.lax.dynamic_slice(inb, (half + dy, half + dx), (h, w))
            space2 = float(dx * dx + dy * dy)
            diff = d - nb
            wgt = m * jnp.exp(-(space2 * sig_s + diff * diff * sig_d))
            s1 = s1 + nb * wgt
            s2 = s2 + wgt
    out = jnp.round(s1 / s2)
    return out.astype(depth_mm.dtype)


def color_to_intensity(color: jnp.ndarray,
                       ratio=(0.299, 0.587, 0.114)) -> jnp.ndarray:
    """u8[h,w,3] -> f32[h,w] luminance (colorToIntensityKernel,
    image_kernels.cu:188-198, with the channel bug fixed)."""
    c = color.astype(jnp.float32) / 255.0
    return c[..., 0] * ratio[0] + c[..., 1] * ratio[1] + c[..., 2] * ratio[2]


def subsample_depth(depth_mm: jnp.ndarray,
                    sigma_depth: float = 40.0,
                    allow_pallas: bool = True) -> jnp.ndarray:
    """Depth-aware 2x downsample (subsampleDepthKernel,
    image_kernels.cu:237-269): average of the 5x5 window around (2x, 2y)
    gated to +-3*sigma of the center sample."""
    h, w = depth_mm.shape
    oh, ow = h // 2, w // 2
    gate = 3.0 * sigma_depth
    if allow_pallas:
        from octree_slam_tpu.sensor import pallas_ops
        if pallas_ops.on_tpu() and pallas_ops.compatible(depth_mm.shape):
            out = pallas_ops.gated_window_mean(depth_mm, gate)
            return decimate2(out)[:oh, :ow].astype(depth_mm.dtype)
    d = depth_mm.astype(jnp.float32)
    pad = jnp.pad(d, 2)
    inb = jnp.pad(jnp.ones((h, w), jnp.float32), 2)
    # Accumulate the gated window at FULL resolution with contiguous shifts
    # and decimate once at the end: strided slices relayout lanes on TPU
    # (~0.7 ms each; the original 50-slice formulation measured 35 ms on
    # v5e), while the redundant full-res elementwise work is nearly free.
    s = jnp.zeros((h, w), jnp.float32)
    cnt = jnp.zeros((h, w), jnp.float32)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            nb = jax.lax.dynamic_slice(pad, (2 + dy, 2 + dx), (h, w))
            m = jax.lax.dynamic_slice(inb, (2 + dy, 2 + dx), (h, w))
            ok = m * (jnp.abs(nb - d) < gate).astype(jnp.float32)
            s = s + nb * ok
            cnt = cnt + ok
    out = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0)
    return decimate2(out)[:oh, :ow].astype(depth_mm.dtype)


def decimate2(img: jnp.ndarray) -> jnp.ndarray:
    """img[::2, ::2(, :)] expressed as a 1x1-window stride-2 reduce_window.

    Bit-identical to the strided slice (the single-element add returns the
    element at (2i, 2j)), but XLA lowers a stride-2 slice on TPU as a full
    lane relayout (~4.7 ms for 1080p f32 on v5e) while the equivalent
    reduce_window is ~free (0.1 ms measured) — it was the single largest
    cost of the 1080p pyramid before this."""
    dims = (1,) * img.ndim
    strides = (2, 2) + (1,) * (img.ndim - 2)
    return jax.lax.reduce_window(img, jnp.zeros((), img.dtype),
                                 jax.lax.add, dims, strides, "VALID")


def subsample(img: jnp.ndarray) -> jnp.ndarray:
    """Plain 2x decimation (subsampleKernel, image_kernels.cu:291-306)."""
    return decimate2(img)


def transform_vertex_map(vertex: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform with w=1 (transformVertexMapKernel,
    image_kernels.cu:206-215). INF rows propagate to non-finite."""
    return vertex @ T[:3, :3].T + T[:3, 3]


def transform_normal_map(normal: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform with w=0 (transformNormalMapKernel,
    image_kernels.cu:221-230)."""
    return normal @ T[:3, :3].T
