"""Pallas TPU kernels for the sensor stencils.

The map-side hot ops (insert/splat/cone) are gather/scatter-bound, where
Mosaic has no per-lane dynamic indexing advantage over XLA (see
docs/ARCHITECTURE.md). The sensor image stencils are the opposite shape:
dense windows with static offsets. The 7x7 bilateral filter
(bilateralKernel, image_kernels.cu:142-177) is the costliest pyramid stage
(3.06 ms of the ~5.4 ms preprocessing at 640x480 on v5e); as ONE Pallas
kernel — whole padded image in VMEM, 49 `pltpu.roll` shifts, fused
exp/accumulate — it runs 2.29 ms and is BIT-IDENTICAL to the XLA path
(same operation order, verified maxdiff 0 mm on random frames).

Alignment: Mosaic cannot slice at unaligned lane offsets, so the image is
laid out at origin (8, 0) of a (H+16, ceil((W+3)/128)*128) padded plane —
sublane offset 8 is tile-aligned and the lane dimension never shifts;
window offsets become circular rolls whose wrapped-in values land in the
sentinel pad (< 0), which the weight mask zeroes exactly like the XLA
path's in-bounds mask.

Dispatch: `bilateral` is used automatically by image_ops.bilateral_filter
when running on TPU with tile-compatible shapes (H % 8 == 0,
W % 128 == 0); anything else (CPU tests, odd oracle shapes) takes the XLA
path. Force interpret mode off-TPU for the dedicated equivalence test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALF = 3  # 7x7 window (image_kernels.cu:18)


def compatible(shape) -> bool:
    """Tile-compatible image shape for the whole-plane VMEM kernel.

    The size bound is VMEM stack pressure, not array size: the kernel
    keeps ~10 live full-plane f32 temporaries (padded input, rolled
    copies, center, accumulators), so 1080p (2.07 Mpx) compiles to a
    40 MB scoped allocation against the 16 MB limit (measured OOM).
    640x480 (~6-8 MB live) is the target shape; cap a little above it."""
    h, w = shape
    return h % 8 == 0 and w % 128 == 0 and h * w <= 360_000


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _bilateral_call(h: int, w: int, sigma_spatial: float,
                    sigma_depth: float, interpret: bool):
    ph = h + 16
    pw = -(-(w + _HALF) // 128) * 128  # right pad >= HALF for the dx rolls
    oy = 8
    sig_s = 0.5 / (sigma_spatial * sigma_spatial)
    sig_d = 0.5 / (sigma_depth * sigma_depth)

    def kernel(pad_ref, out_ref):
        x = pad_ref[:]
        c = jax.lax.slice(x, (oy, 0), (oy + h, w))
        s1 = jnp.zeros((h, w), jnp.float32)
        s2 = jnp.zeros((h, w), jnp.float32)
        for dy in range(-_HALF, _HALF + 1):
            ry = pltpu.roll(x, (-dy) % ph, axis=0)
            for dx in range(-_HALF, _HALF + 1):
                nbf = pltpu.roll(ry, (-dx) % pw, axis=1)
                nb = jax.lax.slice(nbf, (oy, 0), (oy + h, w))
                space2 = float(dx * dx + dy * dy)
                diff = c - nb
                wgt = jnp.exp(-(space2 * sig_s + diff * diff * sig_d))
                wgt = jnp.where(nb < 0, 0.0, wgt)  # sentinel = out of image
                s1 = s1 + jnp.where(nb < 0, 0.0, nb) * wgt
                s2 = s2 + wgt
        out_ref[:] = jnp.round(s1 / s2)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    def run(depth_mm):
        d = depth_mm.astype(jnp.float32)
        pad = jnp.full((ph, pw), -1.0, jnp.float32)
        pad = jax.lax.dynamic_update_slice(pad, d, (oy, 0))
        return call(pad).astype(depth_mm.dtype)

    return run


def bilateral(depth_mm: jnp.ndarray, sigma_spatial: float,
              sigma_depth: float, *, interpret: bool = False) -> jnp.ndarray:
    """7x7 bilateral filter as one fused VMEM kernel (see module doc)."""
    h, w = depth_mm.shape
    return _bilateral_call(h, w, float(sigma_spatial), float(sigma_depth),
                           interpret)(depth_mm)


@functools.lru_cache(maxsize=None)
def _gated_window_call(h: int, w: int, gate: float, interpret: bool):
    """5x5 depth-gated window mean at FULL resolution (the decimation to
    half res stays outside: Mosaic cannot stride lanes, and the redundant
    full-res elementwise work is nearly free — same layout reasoning as
    image_ops.subsample_depth's XLA path)."""
    half = 2
    ph = h + 16
    pw = -(-(w + half) // 128) * 128
    oy = 8

    def kernel(pad_ref, out_ref):
        x = pad_ref[:]
        c = jax.lax.slice(x, (oy, 0), (oy + h, w))
        s = jnp.zeros((h, w), jnp.float32)
        cnt = jnp.zeros((h, w), jnp.float32)
        for dy in range(-half, half + 1):
            ry = pltpu.roll(x, (-dy) % ph, axis=0)
            for dx in range(-half, half + 1):
                nbf = pltpu.roll(ry, (-dx) % pw, axis=1)
                nb = jax.lax.slice(nbf, (oy, 0), (oy + h, w))
                # the sentinel (-1e9) always fails the gate, exactly like
                # the XLA path's out-of-image mask
                ok = (jnp.abs(nb - c) < gate).astype(jnp.float32)
                s = s + nb * ok
                cnt = cnt + ok
        out_ref[:] = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    def run(depth_mm):
        d = depth_mm.astype(jnp.float32)
        pad = jnp.full((ph, pw), -1e9, jnp.float32)
        pad = jax.lax.dynamic_update_slice(pad, d, (oy, 0))
        return call(pad)

    return run


def gated_window_mean(depth_mm: jnp.ndarray, gate: float, *,
                      interpret: bool = False) -> jnp.ndarray:
    """Full-res 5x5 mean of neighbors within `gate` mm of the center
    (subsampleDepthKernel's window rule, image_kernels.cu:237-269); the
    caller decimates. Returns f32[h, w]."""
    h, w = depth_mm.shape
    return _gated_window_call(h, w, float(gate), interpret)(depth_mm)
