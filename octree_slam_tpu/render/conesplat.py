"""Cone-traced map rendering as slab-volume splatting (gather-free).

The reference's cone tracer is a per-ray march: sample the SVO at the cone's
LOD, accumulate front-to-back with alpha = max(node_alpha - 127, 0),
terminate on saturation (w >= 127) or max range, and rescale the color by
127/w for rays that exit unsaturated (coneTrace,
src/rendering/cone_tracing_kernels.cu:53-146 + the live-ray relaunch loop
at :157-198). Marching is the wrong shape for a TPU: measured on v5e, every
while-loop trip costs ~7 ms (two 307k-lane random gathers + a flat ~0.5 ms
per unfused kernel) and the bench scene needs a p99 of ~87 trips
(examples/profile_cone.py) — ~700 ms/frame.

This module computes the same accumulation by scattering instead of
marching: the per-ray work is re-grouped per *leaf voxel*, of which the
pipeline already keeps a persistent registry (render/splat.py).

  1. Project every occupied leaf once (one matmul + fused math).
  2. Bin it into a geometric depth slab k (z in [z0 r^k, z0 r^(k+1))) and
     scatter-MIN a packed (slab-relative depth | alpha | rgb555) word into
     that slab's raster — the nearest leaf per slab cell wins, which is
     the scatter-space analog of "the march samples each surface crossing
     once". ONE 1-D scatter-min kernel total, independent of scene size or
     ray count (scatters are the whole render cost on this TPU: a device
     trace showed the earlier two-word variant spending 9.0 of 9.5 ms in
     its two scatters).
  3. Each slab's raster is decimated by a power-of-two scale matched to the
     projected leaf footprint at the slab's depth (fx * leaf / z pixels,
     rounded UP so a contiguous surface puts >= 1 leaf center per cell):
     the cone footprint rule (cone_tracing_kernels.cu:68-69) expressed as
     raster resolution instead of sampling LOD.
  4. Composite the K slabs front-to-back per pixel (a fused, unrolled
     elementwise chain) with the march's exact per-sample rule: while
     unsaturated, add the full (alpha/127) * rgb contribution (the
     reference adds the final sample uncapped, :106-121), then apply the
     127/w exit rescale to unsaturated pixels (:131-139).

Two accumulation modes (static `accumulate` flag), A/B'd exhaustively in
round 3 (examples/cone_error_analysis.py, 22 variants vs one exact march):
  * accumulate=False (DEFAULT): packed scatter-min,
    nearest-confident-leaf-per-cell resolve. Measured BEST: at SLAM
    ranges the march's cone footprint is SMALLER than a leaf
    (fx*leaf = 10.6 m on the Kinect intrinsics), so the march samples
    SINGLE leaves — nearest-leaf is the right color model.
  * accumulate=True: scatter-ADD `[w, w*r, w*g, w*b]` into an f32
    (cells, 4) buffer (one scatter; the 4-wide window is contiguous);
    cell color = confidence-weighted mean, capped at ONE march sample's
    weight (alpha-127 <= 128, cone_tracing_kernels.cu:106-122). Measured
    3 dB WORSE than min (24.4 vs 27.3 dB) — the mean blurs the march's
    single-leaf samples; kept for A/B and for future >10 m regimes where
    footprints do exceed a leaf. `blend` in (0,1] mixes the two fields
    (runs BOTH scatters; +0.1 dB at 0.25 — measured not worth the cost).

`dilate` rounds of empty-cell borrowing (see _borrow_empty) reproduce
the march's full-color grazing halo one footprint past every silhouette
— without it the slab limb cuts off at the leaf centers and a dark
scalloped ring appears (edge band = 55-62% of slab-vs-march MSE in every
round-3 measurement). `bilinear` (tent upsampling of the premultiplied
fields) measured WORSE than nearest everywhere — the march's own images
are leaf-blocky — and stays available for display polish. Measured knee:
min + dilate=1 + cone_max_scale=4 = 28.0 dB vs min/no-dilate/s8's 27.3
(and the headline-map mix: see BASELINE.md).

Divergences from the march (documented; the exact marchers remain in
render/raycast.py and tests compare the two):
  * a leaf contributes to the pixel(s) its center projects into rather than
    to every ray crossing its cell — thin surfaces cannot be "tunneled
    through" the way the march's node-sized steps can skip them (the slab
    image is arguably the more correct one; see tests/test_conesplat.py);
  * within one slab the march orders samples front-to-back and can
    saturate mid-slab; the additive cell mean has no intra-slab order —
    two distinct surfaces in the SAME slab cell blend into one mean
    sample (the min path dropped the farther one entirely).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from octree_slam_tpu.core import packing
from octree_slam_tpu.map import morton
from octree_slam_tpu.render.splat import LeafList

# A host scalar, NOT jnp.int32: a module-level device array would be a
# COMMITTED device-0 constant baked into every program that captures it —
# on a multi-device mesh the second executable built around it dies with
# INVALID_ARGUMENT parameter-binding errors (measured: rebuilding the
# sharded cone step with an identical config failed until this changed;
# core/packing.py documents the same rule for EMPTY_VALUE).
import numpy as _np

EMPTY = _np.int32(0x7FFFFFFF)


class SlabSpec(NamedTuple):
    """Static geometry of the slab pyramid (hashable: jit-static)."""

    z_near: float
    z_far: float
    n_slabs: int
    scales: tuple          # int per slab: raster decimation (power of two)
    offsets: tuple         # int per slab: start cell in the flat buffer
    total_cells: int
    width: int
    height: int

    @property
    def ratio(self) -> float:
        return (self.z_far / self.z_near) ** (1.0 / self.n_slabs)


def make_slab_spec(*, width: int, height: int, fx: float, leaf_size: float,
                   z_near: float = 0.25, z_far: float = 10.0,
                   n_slabs: int = 16, max_scale: int = 8) -> SlabSpec:
    """Choose per-slab raster scales so one grid cell >= one projected leaf.

    scale_k = 2^ceil(log2(fx * leaf / z_mid)) clamped to [1, max_scale]:
    the projected footprint of a leaf at the slab's mid depth, in pixels,
    rounded UP to a power of two so a contiguous surface leaves no empty
    cells (each cell then receives ~1-4 leaf centers; scatter-min keeps the
    nearest, matching the march's one sample per crossing).
    """
    r = (z_far / z_near) ** (1.0 / n_slabs)
    scales = []
    offsets = []
    total = 0
    for k in range(n_slabs):
        z_mid = z_near * (r ** (k + 0.5))
        fp = fx * leaf_size / z_mid
        s = 1 << max(0, math.ceil(math.log2(max(fp, 1.0))))
        s = max(1, min(max_scale, s))
        while width % s or height % s:
            s //= 2
        scales.append(s)
        offsets.append(total)
        total += (width // s) * (height // s)
    return SlabSpec(z_near=z_near, z_far=z_far, n_slabs=n_slabs,
                    scales=tuple(scales), offsets=tuple(offsets),
                    total_cells=total, width=width, height=height)


def _per_slab_select(k: jnp.ndarray, table: Sequence[int]) -> jnp.ndarray:
    """table[k] as a fused where-chain (tiny static table, no gather)."""
    out = jnp.full_like(k, table[0])
    for i in range(1, len(table)):
        out = jnp.where(k == i, jnp.int32(table[i]), out)
    return out


def _double_bilinear(img: jnp.ndarray, axis: int) -> jnp.ndarray:
    """2x upsample along `axis` with half-pixel-centered linear weights.

    out[2i] = 0.75*in[i] + 0.25*in[i-1]; out[2i+1] = 0.75*in[i] +
    0.25*in[i+1] (edges clamped) — the standard align_corners=False tent.
    Elementwise + interleave only, so the per-slab chain stays fusable.
    """
    n = img.shape[axis]
    first = jax.lax.slice_in_dim(img, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(img, n - 1, n, axis=axis)
    prev = jnp.concatenate(
        [first, jax.lax.slice_in_dim(img, 0, n - 1, axis=axis)], axis=axis)
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(img, 1, n, axis=axis), last], axis=axis)
    even = 0.75 * img + 0.25 * prev
    odd = 0.75 * img + 0.25 * nxt
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(img.shape)
    shape[axis] *= 2
    return out.reshape(shape)


def _borrow_empty(sl: jnp.ndarray) -> jnp.ndarray:
    """Empty slab cells adopt their tent-filtered 3x3 neighborhood.

    The march paints a full-color halo ~1 leaf footprint past every
    silhouette: a ray that merely GRAZES a shell leaf accumulates its
    sample, and the 127/w exit rescale brings any nonzero accumulation to
    full strength (cone_tracing_kernels.cu:106-139). Leaf-center binning
    stops at the silhouette instead, leaving a dark scalloped ring where
    the march shows color (round-3 error analysis: the edge band carried
    62% of slab-vs-march MSE). Borrowing into EMPTY cells only extends
    coverage by one cell — one projected footprint, the march's grazing
    reach — while occupied interior cells keep their own mean untouched.
    Separable [0.25, 0.5, 0.25] tent on the premultiplied fields."""
    def tent(img, axis):
        n = img.shape[axis]
        first = jax.lax.slice_in_dim(img, 0, 1, axis=axis)
        last = jax.lax.slice_in_dim(img, n - 1, n, axis=axis)
        prev = jnp.concatenate(
            [first, jax.lax.slice_in_dim(img, 0, n - 1, axis=axis)],
            axis=axis)
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(img, 1, n, axis=axis), last], axis=axis)
        return 0.5 * img + 0.25 * (prev + nxt)

    t = tent(tent(sl, 0), 1)
    empty = sl[..., :1] <= 0.0
    return jnp.where(empty, t, sl)


def _upsample(img: jnp.ndarray, scale: int, bilinear: bool) -> jnp.ndarray:
    """(h, w, c) -> (h*scale, w*scale, c), power-of-two scale."""
    if scale == 1:
        return img
    if not bilinear:
        return jnp.repeat(jnp.repeat(img, scale, axis=0), scale, axis=1)
    while scale > 1:
        img = _double_bilinear(img, 0)
        img = _double_bilinear(img, 1)
        scale //= 2
    return img


def slab_scatter_min(vals: jnp.ndarray, keys: jnp.ndarray,
                     live: jnp.ndarray, center: jnp.ndarray, half_size,
                     world_T_cam: jnp.ndarray, fx, fy, *,
                     spec: SlabSpec, depth: int) -> jnp.ndarray:
    """The scatter half of the min-mode slab render, over RAW leaf arrays:
    project every live leaf, bin it into its depth slab, scatter-MIN the
    packed (prio9 | inv_alpha7 | rgb555) word. Returns the i32[total_cells]
    word buffer (EMPTY where nothing landed).

    Exposed separately so the MULTI-CHIP renderer can run it per map shard
    and composite with ONE `pmin` of the word buffers over ICI
    (parallel/distributed.render_sharded_cone): min-per-shard then
    min-across-shards is bit-identical to the global scatter-min, the same
    associativity `splat_sharded` exploits for the z-buffer words."""
    _, _, buf = _slab_bins_and_words(vals, keys, live, center, half_size,
                                     world_T_cam, fx, fy, spec=spec,
                                     depth=depth)
    return buf


def composite_min_words(buf: jnp.ndarray, *, spec: SlabSpec,
                        bilinear: bool = False, dilate: int = 1,
                        want_aux: bool = False):
    """The composite half of the min-mode slab render: decode a packed
    word buffer (slab_scatter_min) into per-slab premultiplied fields and
    composite front-to-back. Shared by the single-chip render_cone_splat
    (blend == 0 path) and the multi-chip compositor."""
    def field_of_slab(o, hh, ww):
        return _decode_min_field(buf, o, hh, ww)

    return _composite_fields(field_of_slab, spec, bilinear, dilate,
                             want_aux=want_aux)


def _decode_min_field(buf, o, hh, ww):
    """Packed word -> premultiplied [alpha, alpha*r, alpha*g, alpha*b]
    (empty cells all-zero); weight = alpha - 127 = (127 - inv_a7) + 1."""
    w = jax.lax.dynamic_slice(buf, (o,), (hh * ww,)).reshape(hh, ww)
    occ = (w != EMPTY).astype(jnp.float32)
    alpha = occ * (128 - ((w >> 15) & 0x7F)).astype(jnp.float32)
    # expand 5-bit channels to 8-bit (replicate top bits into the low 3)
    rr = ((w >> 10) & 0x1F)
    gg = ((w >> 5) & 0x1F)
    bb = (w & 0x1F)
    rgb_s = jnp.stack([(rr << 3) | (rr >> 2), (gg << 3) | (gg >> 2),
                       (bb << 3) | (bb >> 2)],
                      axis=-1).astype(jnp.float32)
    return jnp.concatenate([alpha[..., None], alpha[..., None] * rgb_s],
                           axis=-1)


def _slab_bins_and_words(vals, keys, live, center, half_size, world_T_cam,
                         fx, fy, *, spec: SlabSpec, depth: int):
    """Shared projection + binning + packed-word scatter-min. Returns
    (bins, unpacked, buf) where bins = (idx, ok, k, z) and unpacked =
    (r8, g8, b8, a8, w_leaf) serve the accumulate/blend scatter."""
    W, H = spec.width, spec.height
    K = spec.n_slabs

    keys = jnp.where(live, keys, 0)
    centers = morton.decode_centers(keys, center, half_size, depth)
    r8, g8, b8, a8 = packing.unpack_rgba8(vals)
    w_leaf = jnp.maximum(a8.astype(jnp.int32) - 127, 0)

    R = world_T_cam[:3, :3]
    t = world_T_cam[:3, 3]
    cam = (centers - t) @ R
    z = cam[:, 2]
    ok = live & (w_leaf > 0) & (z > 1e-3) & (z < spec.z_far)
    zc = jnp.clip(z, spec.z_near * 1.0001, spec.z_far * 0.9999)

    zs = jnp.where(ok, z, 1.0)
    px = jnp.floor(fx * cam[:, 0] / zs + W / 2.0).astype(jnp.int32)
    py = jnp.floor(H / 2.0 - fy * cam[:, 1] / zs).astype(jnp.int32)
    ok = ok & (px >= 0) & (px < W) & (py >= 0) & (py < H)

    log_r = math.log(spec.ratio)
    k = jnp.floor(jnp.log(zc / spec.z_near) / log_r).astype(jnp.int32)
    k = jnp.clip(k, 0, K - 1)

    s = _per_slab_select(k, spec.scales)
    off = _per_slab_select(k, spec.offsets)
    sw = _per_slab_select(k, [W // sc for sc in spec.scales])

    cell = off + (py // s) * sw + (px // s)
    idx = jnp.where(ok, cell, spec.total_cells)

    # Nearest-leaf-per-cell resolve in ONE packed scatter-min word (the two
    # scatter kernels were 95% of the render's device time — a profiler
    # trace showed 9.0 of 9.5 ms):
    #   bit 22..30  prio9 — z quantized RELATIVE TO THE LEAF'S SLAB (each
    #               slab spans a ~1.2x depth ratio, so 9 bits resolve
    #               ~0.05% of depth — ordering within a slab cell is all
    #               the min needs), biased by the alpha deficit: a freshly
    #               observed speck (alpha ~129, color still half-blended)
    #               must not shadow the mature surface just behind it (the
    #               march composites both; a min keeps one — keep the
    #               confident one). Bias ~1.2 mm per deficit step, as the
    #               old absolute-z key used.
    #   bit 15..21  127 - (alpha - 128): INVERTED so prio ties (the clip at
    #               510 saturates for near slabs, where the deficit bias
    #               can exceed the slab width) resolve toward the HIGHEST
    #               alpha — storing alpha directly would make the min pick
    #               the least-confident leaf, the exact inversion of the
    #               keep-the-confident-one rule above
    #   bit  0..14  rgb555 (5-6-5 -> 5-5-5 costs one green bit, ~0.4% of
    #               the channel — invisible next to the 23 dB slab-vs-march
    #               PSNR)
    # prio9 caps at 510 so the max word stays below EMPTY (0x7FFFFFFF).
    z0k = spec.z_near * jnp.exp(k.astype(jnp.float32) * log_r)
    slab_w = z0k * (spec.ratio - 1.0)
    zrel = jnp.clip((z - z0k) / jnp.maximum(slab_w, 1e-6), 0.0, 1.0)
    deficit_m = (255 - a8.astype(jnp.float32)) * (4.0 * spec.z_far / 32766.0)
    prio = jnp.clip((zrel * 511.0 + deficit_m * 512.0 /
                     jnp.maximum(slab_w, 1e-6)).astype(jnp.int32), 0, 510)
    inv_a7 = 127 - jnp.clip(a8.astype(jnp.int32) - 128, 0, 127)
    rgb555 = ((r8.astype(jnp.int32) >> 3) << 10) | \
        ((g8.astype(jnp.int32) >> 3) << 5) | (b8.astype(jnp.int32) >> 3)
    word = (prio << 22) | (inv_a7 << 15) | rgb555
    buf = jnp.full((spec.total_cells,), EMPTY, jnp.int32).at[idx].min(
        jnp.where(ok, word, EMPTY), mode="drop")
    return (idx, ok, k, z), (r8, g8, b8, a8, w_leaf), buf


@functools.partial(jax.jit, static_argnames=("spec", "depth", "accumulate",
                                             "bilinear", "dilate", "blend",
                                             "want_aux"))
def render_cone_splat(leaves: LeafList, center: jnp.ndarray, half_size,
                      world_T_cam: jnp.ndarray, fx, fy, *,
                      spec: SlabSpec, depth: int, accumulate: bool = False,
                      bilinear: bool = False, dilate: int = 1,
                      blend: float = 0.0, want_aux: bool = False):
    """Cone-composite the occupied leaf set to f32[H, W, 4].

    Output convention matches raycast.cone_trace: rgb in [0, 1] accumulated
    front-to-back in (alpha/127)*rgb8 units then /255, alpha = 1 for
    finished rays (every ray finishes: saturation or range exit).

    want_aux=True additionally returns (w_acc, z_first): the per-pixel
    accumulated march weight BEFORE the image-space hole repair, and the
    NEAR boundary (camera-space z, meters) of the first slab that
    contributed — inf where nothing did. The hybrid renderer
    (render/hybrid.py) uses these to seed its exact-march refinement of
    the edge band at a conservative depth: z_first is the slab's lower
    bound, so the contributing leaf's center lies at z >= z_first by
    construction.
    """
    lc = leaves.keys.shape[0]
    live = (jnp.arange(lc) < leaves.count) & (leaves.keys >= 0)
    (idx, ok, k, z), (r8, g8, b8, a8, w_leaf), buf = _slab_bins_and_words(
        leaves.vals, leaves.keys, live, center, half_size, world_T_cam,
        fx, fy, spec=spec, depth=depth)

    if accumulate or blend > 0.0:
        # ONE f32 scatter-ADD of [w, w*r, w*g, w*b] (contiguous 4-window):
        # per-cell confidence-weighted color mean of every leaf landing in
        # the cell — the scatter-space analog of the march's along-ray
        # blend of the several leaves an oblique ray crosses in one slab.
        wf = jnp.where(ok, w_leaf.astype(jnp.float32), 0.0)
        vals = jnp.stack([
            wf,
            wf * r8.astype(jnp.float32),
            wf * g8.astype(jnp.float32),
            wf * b8.astype(jnp.float32),
        ], axis=-1)
        abuf = jnp.zeros((spec.total_cells, 4), jnp.float32).at[idx].add(
            vals, mode="drop")

        def add_field(o, hh, ww):
            sl = jax.lax.dynamic_slice(
                abuf, (o, 0), (hh * ww, 4)).reshape(hh, ww, 4)
            # one-sample cap (cell = one march footprint sample; see
            # _composite_fields) applied here so the blend mixes two
            # comparable per-sample fields
            cap = jnp.minimum(sl[..., :1], 128.0) / jnp.maximum(
                sl[..., :1], 1e-6)
            return sl * cap

    if accumulate:
        return _composite_fields(add_field, spec, bilinear, dilate,
                                 want_aux=want_aux)

    # Nearest-leaf-per-cell resolve in ONE packed scatter-min word (the two
    # scatter kernels were 95% of the render's device time — a profiler
    # trace showed 9.0 of 9.5 ms):
    #   bit 22..30  prio9 — z quantized RELATIVE TO THE LEAF'S SLAB (each
    #               slab spans a ~1.2x depth ratio, so 9 bits resolve
    #               ~0.05% of depth — ordering within a slab cell is all
    #               the min needs), biased by the alpha deficit: a freshly
    #               observed speck (alpha ~129, color still half-blended)
    #               must not shadow the mature surface just behind it (the
    #               march composites both; a min keeps one — keep the
    #               confident one). Bias ~1.2 mm per deficit step, as the
    #               old absolute-z key used.
    #   bit 15..21  127 - (alpha - 128): INVERTED so prio ties (the clip at
    #               510 saturates for near slabs, where the deficit bias
    #               can exceed the slab width) resolve toward the HIGHEST
    #               alpha — storing alpha directly would make the min pick
    #               the least-confident leaf, the exact inversion of the
    #               keep-the-confident-one rule above
    #   bit  0..14  rgb555 (5-6-5 -> 5-5-5 costs one green bit, ~0.4% of
    #               the channel — invisible next to the 23 dB slab-vs-march
    #               PSNR)
    # prio9 caps at 510 so the max word stays below EMPTY (0x7FFFFFFF).
    log_ratio = math.log(spec.ratio)
    z0k = spec.z_near * jnp.exp(k.astype(jnp.float32) * log_ratio)
    slab_w = z0k * (spec.ratio - 1.0)
    zrel = jnp.clip((z - z0k) / jnp.maximum(slab_w, 1e-6), 0.0, 1.0)
    deficit_m = (255 - a8.astype(jnp.float32)) * (4.0 * spec.z_far / 32766.0)
    prio = jnp.clip((zrel * 511.0 + deficit_m * 512.0 /
                     jnp.maximum(slab_w, 1e-6)).astype(jnp.int32), 0, 510)
    inv_a7 = 127 - jnp.clip(a8.astype(jnp.int32) - 128, 0, 127)
    rgb555 = ((r8.astype(jnp.int32) >> 3) << 10) | \
        ((g8.astype(jnp.int32) >> 3) << 5) | (b8.astype(jnp.int32) >> 3)
    word = (prio << 22) | (inv_a7 << 15) | rgb555
    buf = jnp.full((spec.total_cells,), EMPTY, jnp.int32).at[idx].min(
        jnp.where(ok, word, EMPTY), mode="drop")

    def field_of_slab(o, hh, ww):
        # decode the packed word into premultiplied fields
        # [alpha, alpha*r, alpha*g, alpha*b] (empty cells all-zero);
        # weight = alpha - 127 = (127 - inv_a7) + 1
        w = jax.lax.dynamic_slice(buf, (o,), (hh * ww,)).reshape(hh, ww)
        occ = (w != EMPTY).astype(jnp.float32)
        alpha = occ * (128 - ((w >> 15) & 0x7F)).astype(jnp.float32)
        # expand 5-bit channels to 8-bit (replicate top bits into the low 3)
        rr = ((w >> 10) & 0x1F)
        gg = ((w >> 5) & 0x1F)
        bb = (w & 0x1F)
        rgb_s = jnp.stack([(rr << 3) | (rr >> 2), (gg << 3) | (gg >> 2),
                           (bb << 3) | (bb >> 2)],
                          axis=-1).astype(jnp.float32)
        sl = jnp.concatenate([alpha[..., None], alpha[..., None] * rgb_s],
                             axis=-1)
        if blend > 0.0:
            # mix the nearest-leaf sample with the cell's weighted mean:
            # the march samples ONE leaf per step but an oblique ray
            # crosses SEVERAL per slab and blends them across steps —
            # pure nearest is speckly exactly where leaf colors are noisy
            # (young, few-observation regions)
            sl = (1.0 - blend) * sl + blend * add_field(o, hh, ww)
        return sl

    return _composite_fields(field_of_slab, spec, bilinear, dilate,
                             want_aux=want_aux)


def _composite_fields(field_of_slab, spec: SlabSpec,
                      bilinear: bool, dilate: int, want_aux: bool = False):
    """Front-to-back composite of per-slab premultiplied fields.

    field_of_slab(offset, hh, ww) -> f32[hh, ww, 4] of
    [w, w*r8, w*g8, w*b8] per cell (zero when empty) — the nearest-leaf
    decode for the scatter-min word, or the stacked sums for the
    scatter-add buffer.

    Per-slab rule mirrors coneTrace (cone_tracing_kernels.cu:106-122): add
    while w_acc < 127. A cell's contribution is capped at ONE march
    sample's weight (alpha-127 <= 128): the cell IS the footprint the
    march samples once, however many leaf centers stack inside it (without
    the cap, the additive mode's saturated-wall cells summed their 2-4x128
    stack and over-brightened unsaturated channels ~2x — caught by
    test_conesplat.TestOracle::test_saturation_caps_accumulation; the cap
    is a no-op for the min word, whose alpha is <= 128 by construction).
    """
    H, W = spec.height, spec.width
    w_acc = jnp.zeros((H, W), jnp.float32)
    rgb_acc = jnp.zeros((H, W, 3), jnp.float32)
    if want_aux:
        z_first = jnp.full((H, W), jnp.inf, jnp.float32)
    for kk in range(spec.n_slabs):
        sc = spec.scales[kk]
        o = spec.offsets[kk]
        hh, ww = H // sc, W // sc
        sl = field_of_slab(o, hh, ww)
        for _ in range(dilate):
            sl = _borrow_empty(sl)
        # one-sample cap BEFORE upsampling (cell = one march footprint
        # sample): rescale the whole premultiplied vector so the color
        # stays the cell's and the field stays linear for the tent
        cap = jnp.minimum(sl[..., :1], 128.0) / jnp.maximum(sl[..., :1],
                                                            1e-6)
        sl = _upsample(sl * cap, sc, bilinear)
        w = sl[..., 0]
        wrgb = sl[..., 1:]
        gate = jnp.where((w > 0.0) & (w_acc < 127.0), 1.0, 0.0)
        if want_aux:
            # near boundary of this pixel's FIRST contributing slab:
            # a conservative lower bound on the depth of everything the
            # slab image shows here (leaf centers in slab k have
            # z >= z_near * ratio^k)
            z0k = spec.z_near * (spec.ratio ** kk)
            z_first = jnp.where((w_acc == 0.0) & (w > 0.0),
                                jnp.float32(z0k), z_first)
        rgb_acc = rgb_acc + gate[..., None] * wrgb
        w_acc = w_acc + gate * w
    if want_aux:
        return _finish(w_acc, rgb_acc, H, W), w_acc, z_first
    return _finish(w_acc, rgb_acc, H, W)


def _finish(w_acc: jnp.ndarray, rgb_acc: jnp.ndarray, H: int,
            W: int) -> jnp.ndarray:
    """Shared composite tail: hole repair + exit rescale -> f32[H, W, 4]."""
    # --- image-space hole repair. A curved surface spreads adjacent leaves
    # across slabs, so a slab cell on a sphere limb can stay empty and the
    # ray "tunnels" (black speckles). Borrow accumulation from the
    # strongest 3x3 neighbor when this pixel is far weaker — the same
    # image-space dilation idea as splat.finish_zbuffer, in alpha space. ---
    for _ in range(2):
        pw = jnp.pad(w_acc, 1)
        pr = jnp.pad(rgb_acc, ((1, 1), (1, 1), (0, 0)))
        best_w = w_acc
        best_rgb = rgb_acc
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                nw = jax.lax.dynamic_slice(pw, (1 + dy, 1 + dx), (H, W))
                nr = jax.lax.dynamic_slice(pr, (1 + dy, 1 + dx, 0),
                                           (H, W, 3))
                better = nw > best_w
                best_w = jnp.where(better, nw, best_w)
                best_rgb = jnp.where(better[..., None], nr, best_rgb)
        hole = (best_w > 8.0) & (w_acc * 4.0 < best_w)
        w_acc = jnp.where(hole, best_w, w_acc)
        rgb_acc = jnp.where(hole[..., None], best_rgb, rgb_acc)

    # exit rescale for unsaturated rays (cone_tracing_kernels.cu:131-139):
    # rgb was accumulated in (alpha * rgb8) units; the march divides each
    # contribution by 127 — fold that in here, then /255 for the [0,1] fb.
    saturated = w_acc >= 127.0
    scale = jnp.where(saturated, 1.0, 127.0 / jnp.maximum(w_acc, 1.0))
    rgb = jnp.clip(rgb_acc * scale[..., None] / 127.0, 0.0, 255.0) / 255.0
    alpha_out = jnp.ones((H, W, 1), jnp.float32)
    return jnp.concatenate([rgb, alpha_out], axis=-1)
