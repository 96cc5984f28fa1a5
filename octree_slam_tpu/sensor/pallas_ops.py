"""Pallas TPU kernels for the sensor stencils.

The map-side hot ops (insert/splat/cone) are gather/scatter-bound, where
Mosaic has no per-lane dynamic indexing advantage over XLA (see
docs/ARCHITECTURE.md). The sensor image stencils are the opposite shape:
dense windows with static offsets. Two run here:

  * the 7x7 bilateral filter (bilateralKernel, image_kernels.cu:142-177)
    — the costliest pyramid stage, 3.06 -> 2.29 ms at 640x480 on v5e;
  * the 5x5 depth-gated window mean behind the depth-aware subsample
    (subsampleDepthKernel, image_kernels.cu:237-269).

Both are BIT-IDENTICAL to their XLA paths (same operation order).

Kernel shape: the whole processing window lives in VMEM; window offsets
are `pltpu.roll` shifts at a tile-aligned origin (Mosaic cannot slice
unaligned lane offsets), and wrapped-in values land in a sentinel pad the
weight/gate masks reject exactly like the XLA paths' bounds masks.

VMEM budget: the kernel keeps ~10 live window-sized f32 temporaries, so a
single whole-image window OOMs past ~0.36 Mpx (1080p measured a 40 MB
scoped allocation against the 16 MB limit). Larger frames are processed
in ROW STRIPES at the host level: each stripe's padded window carries up
to 8 REAL halo rows from its neighbors (sentinel only at true image
borders), so stitching is exact and every stripe reuses one compiled
kernel shape.

Dispatch: automatic on TPU for tile-compatible shapes (H % 8 == 0,
W % 128 == 0); anything else (CPU tests, odd oracle shapes) takes the XLA
path. Batched callers must pass allow_pallas=False upstream: a vmapped
pallas_call hangs the axon remote compile (measured).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OY = 8            # tile-aligned image origin inside the padded window
_MAX_WINDOW_PX = 360_000  # VMEM stack bound (see module doc)


def compatible(shape) -> bool:
    """Tile-compatible image shape. Big frames run striped, but only when
    a reasonable stripe exists: heights with no multiple-of-8 divisor
    under the window budget (e.g. 1096 = 8 x 137) would degenerate to
    8-row stripes — dozens of kernel launches at ~0.5 ms flat each is far
    slower than the XLA path, so such shapes fall back."""
    h, w = shape
    if h % 8 or w % 128:
        return False
    return (h * w <= _MAX_WINDOW_PX
            or _stripe_height(h, w, _MAX_WINDOW_PX) >= 32)


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _window_call(kind: str, h: int, w: int, p1: float, p2: float,
                 interpret: bool):
    """Compiled stencil over one (h, w) output window.

    kind "bilateral": p1 = sigma_spatial, p2 = sigma_depth, 7x7,
    output rounded. kind "gated": p1 = gate (mm), 5x5 mean of neighbors
    within the gate of the center. Input: padded (h+16, pw) plane with the
    image at (_OY, 0) and sentinel (-1e9) elsewhere."""
    half = 3 if kind == "bilateral" else 2
    ph = h + 2 * _OY
    pw = -(-(w + half) // 128) * 128
    if kind == "bilateral":
        sig_s = 0.5 / (p1 * p1)
        sig_d = 0.5 / (p2 * p2)

    def kernel(pad_ref, out_ref):
        x = pad_ref[:]
        c = jax.lax.slice(x, (_OY, 0), (_OY + h, w))
        s = jnp.zeros((h, w), jnp.float32)
        cnt = jnp.zeros((h, w), jnp.float32)
        for dy in range(-half, half + 1):
            ry = pltpu.roll(x, (-dy) % ph, axis=0)
            for dx in range(-half, half + 1):
                nbf = pltpu.roll(ry, (-dx) % pw, axis=1)
                nb = jax.lax.slice(nbf, (_OY, 0), (_OY + h, w))
                if kind == "bilateral":
                    space2 = float(dx * dx + dy * dy)
                    diff = c - nb
                    wgt = jnp.exp(-(space2 * sig_s + diff * diff * sig_d))
                    # sentinel (< 0) = out of image, weight 0
                    wgt = jnp.where(nb < 0, 0.0, wgt)
                    s = s + jnp.where(nb < 0, 0.0, nb) * wgt
                    cnt = cnt + wgt
                else:
                    # the sentinel always fails the gate, exactly like the
                    # XLA path's out-of-image mask
                    ok = (jnp.abs(nb - c) < p1).astype(jnp.float32)
                    s = s + nb * ok
                    cnt = cnt + ok
        if kind == "bilateral":
            out_ref[:] = jnp.round(s / cnt)
        else:
            out_ref[:] = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1.0), 0.0)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return call, ph, pw


def _stripe_height(h: int, w: int, max_px: int) -> int:
    """Largest multiple-of-8 divisor of h whose window fits the budget."""
    for cand in range(min(h, max(8, max_px // max(w, 1)) // 8 * 8), 7, -8):
        if h % cand == 0:
            return cand
    return 8


def _run_stencil(kind: str, depth_f32: jnp.ndarray, p1: float, p2: float,
                 interpret: bool, max_px: int) -> jnp.ndarray:
    h, w = depth_f32.shape
    sh = h if h * w <= max_px else _stripe_height(h, w, max_px)
    call, ph, pw = _window_call(kind, sh, w, p1, p2, interpret)
    outs = []
    for y0 in range(0, h, sh):
        # up to _OY REAL halo rows from the neighbors; sentinel only at
        # true image borders, so stripe stitching is exact
        top = max(0, y0 - _OY)
        bot = min(h, y0 + sh + _OY)
        pad = jnp.full((ph, pw), -1e9, jnp.float32)
        pad = jax.lax.dynamic_update_slice(
            pad, jax.lax.slice(depth_f32, (top, 0), (bot, w)),
            (_OY - (y0 - top), 0))
        outs.append(call(pad))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def bilateral(depth_mm: jnp.ndarray, sigma_spatial: float,
              sigma_depth: float, *, interpret: bool = False,
              max_px: int = _MAX_WINDOW_PX) -> jnp.ndarray:
    """7x7 bilateral filter as fused VMEM stencil windows (see module
    doc). Bit-identical to image_ops.bilateral_filter's XLA path."""
    out = _run_stencil("bilateral", depth_mm.astype(jnp.float32),
                       float(sigma_spatial), float(sigma_depth),
                       interpret, max_px)
    return out.astype(depth_mm.dtype)


def gated_window_mean(depth_mm: jnp.ndarray, gate: float, *,
                      interpret: bool = False,
                      max_px: int = _MAX_WINDOW_PX) -> jnp.ndarray:
    """Full-res 5x5 mean of neighbors within `gate` mm of the center
    (subsampleDepthKernel's window rule); the caller decimates.
    Returns f32[h, w]."""
    return _run_stencil("gated", depth_mm.astype(jnp.float32),
                        float(gate), 0.0, interpret, max_px)
