"""Dense value-mip render cache + empty-space distance field.

TPU-first acceleration structure for the cone tracer. The reference descends
its pointer SVO per ray step (coneTrace, cone_tracing_kernels.cu:76-103) —
a chain of dependent random gathers, the slowest primitive on TPU (~2.4 ms
per 307k-lane gather on v5e, and ~0.5 ms fixed cost per unfused kernel). This
module trades HBM (plentiful on TPU: 16 GB) for gathers (scarce):

  * `values`: ONE flat u32 buffer concatenating dense morton-ordered RGBA8
    mip grids for octree levels 1..max_depth — the dense mirror of the SVO's
    interior + leaf values (same mipmap rule, svo.cu:417-439). Because
    level l starts at offset (8^l - 8)/7 and a morton key prefix IS the
    level-l cell index, sampling ANY level-of-detail is a single gather at
      flat_idx = ((1 << 3l) - 8) / 7 + (key >> 3(max_depth - l)).
    This is the GigaVoxels brick-pool idea (scaffolded but disabled in the
    reference, svo.h:8, svo.cu:467-496) re-shaped for a vector machine:
    no pointers, no bricks, no per-level indirection.
  * `dist`: a Chebyshev distance-to-occupied field (in cells, saturated at
    `max_skip`) over the level `dist_level` grid, xyz-ordered so it can be
    built with 3D min-pool windows. Rays step `dist - 0.5` cells through
    empty space instead of marching node-by-node — replacing the
    reference's live-ray stream compaction (cone_tracing_kernels.cu:188)
    with O(log) skips.

Updates ride the SVO insert: insert already computes every touched
node's blended/mipmapped value; it emits (flat_idx, value) pairs
(InsertStats.mip_idx/mip_val) and `apply_updates` scatters them here —
one kernel per frame.

Memory: sum_{l=1..D} 8^l u32 words = 613 MB at D=9 (512^3 leaves), 9.6 MB
at D=7. Gate with SLAMConfig.use_dense_mips for deeper trees.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from octree_slam_tpu.core import packing


def level_offset(level: int) -> int:
    """Start of the level-`level` grid in the flat values buffer (host)."""
    return ((1 << (3 * level)) - 8) // 7


def total_cells(max_depth: int) -> int:
    return level_offset(max_depth + 1)


def flat_index(keys: jnp.ndarray, key_depth: int, level) -> jnp.ndarray:
    """Flat values-buffer index for morton keys of depth `key_depth` sampled
    at `level` (traced or static). All fused integer math — no gathers."""
    lvl = jnp.asarray(level, jnp.int32)
    offset = (((jnp.int32(1) << (3 * lvl)) - 8) // 7)
    return offset + (keys >> (3 * (key_depth - lvl)))


class RenderCache(NamedTuple):
    """Dense mips + distance field (the SLAMState render acceleration)."""

    values: jnp.ndarray  # u32[total_cells(D)] RGBA8, EMPTY_VALUE = untouched
    occ: jnp.ndarray     # bool[G^3] xyz-ordered occupancy at dist_level
    dist: jnp.ndarray    # i32[G^3] xyz-ordered chebyshev distance in cells


@functools.partial(jax.jit,
                   static_argnames=("max_depth", "dist_level", "max_skip"))
def create(*, max_depth: int, dist_level: int,
           max_skip: int = 15) -> RenderCache:
    g = 1 << dist_level
    return RenderCache(
        values=jnp.full((total_cells(max_depth),), packing.EMPTY_VALUE,
                        jnp.uint32),
        occ=jnp.zeros((g * g * g,), bool),
        dist=jnp.full((g * g * g,), max_skip, jnp.int32),
    )


def apply_updates(values: jnp.ndarray, mip_idx: jnp.ndarray,
                  mip_val: jnp.ndarray) -> jnp.ndarray:
    """Scatter an insert's touched (flat_idx, value) pairs — one kernel.
    Invalid entries carry idx == len(values) and drop."""
    return values.at[mip_idx].set(mip_val, mode="drop")


def deinterleave3(m: jnp.ndarray, bits: int):
    """Inverse of interleave3: morton code -> (x, y, z) integer coords."""
    x = jnp.zeros_like(m)
    y = jnp.zeros_like(m)
    z = jnp.zeros_like(m)
    for b in range(bits):
        x = x | (((m >> (3 * b)) & 1) << b)
        y = y | (((m >> (3 * b + 1)) & 1) << b)
        z = z | (((m >> (3 * b + 2)) & 1) << b)
    return x, y, z


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "dist_level", "max_skip", "with_dist"))
def update(cache: RenderCache, mip_idx: jnp.ndarray, mip_val: jnp.ndarray,
           *, max_depth: int, dist_level: int,
           max_skip: int = 15, with_dist: bool = True) -> RenderCache:
    """Per-frame cache refresh from an insert's (flat_idx, value) pairs:
    one value scatter, one occupancy scatter (xyz-ordered, avoiding the
    morton->xyz permutation gather every frame), and — when with_dist —
    the log-round distance transform over the updated occupancy. Only the
    cone tracer reads `dist`, so non-cone frames pass with_dist=False and
    skip its reduce_window kernels (dist is then stale; every cone frame
    refreshes it itself)."""
    g = 1 << dist_level
    values = apply_updates(cache.values, mip_idx, mip_val)

    lo = level_offset(dist_level)
    hi = level_offset(dist_level + 1)
    in_level = (mip_idx >= lo) & (mip_idx < hi)
    x, y, z = deinterleave3(jnp.where(in_level, mip_idx - lo, 0), dist_level)
    xyz = (z << (2 * dist_level)) | (y << dist_level) | x
    occ = cache.occ.at[jnp.where(in_level, xyz, g * g * g)].set(
        packing.is_occupied(mip_val), mode="drop")

    dist = (_dist_from_occ(occ.reshape(g, g, g), max_skip).reshape(-1)
            if with_dist else cache.dist)
    return RenderCache(values=values, occ=occ, dist=dist)


def refresh_dist(cache: RenderCache, *, dist_level: int,
                 max_skip: int = 15) -> RenderCache:
    """Recompute only the empty-space distance field from the current
    occupancy (used when occupancy was updated with with_dist=False and a
    marcher needs dist NOW, e.g. after in-step remainder pages)."""
    g = 1 << dist_level
    return cache._replace(
        dist=_dist_from_occ(cache.occ.reshape(g, g, g), max_skip).reshape(-1))


def _dist_from_occ(occ3d: jnp.ndarray, max_skip: int) -> jnp.ndarray:
    """Log-round Chebyshev distance transform: round j min-pools a 3^3
    window with dilation 2^j and adds 2^j, extending exact distances from
    2^j - 1 to 2^(j+1) - 1."""
    dist = jnp.where(occ3d, 0, max_skip).astype(jnp.int32)
    j = 0
    while (1 << j) <= max_skip:
        w = 1 << j
        pooled = jax.lax.reduce_window(
            dist, np.int32(max_skip), jax.lax.min, (3, 3, 3), (1, 1, 1),
            "SAME", window_dilation=(w, w, w))
        dist = jnp.minimum(dist, pooled + w)
        j += 1
    return jnp.minimum(dist, max_skip)


@functools.lru_cache(maxsize=4)
def _xyz_of_morton_perm(level: int) -> np.ndarray:
    """Permutation q with morton_ordered[m] = xyz_linear[q[m]] for a
    2^level grid. Host-side constant (embedded in the jit program)."""
    g = 1 << level
    m = np.arange(g * g * g, dtype=np.int64)
    x = np.zeros_like(m)
    y = np.zeros_like(m)
    z = np.zeros_like(m)
    for b in range(level):
        x |= ((m >> (3 * b)) & 1) << b
        y |= ((m >> (3 * b + 1)) & 1) << b
        z |= ((m >> (3 * b + 2)) & 1) << b
    return (z * g * g + y * g + x).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("max_depth", "dist_level"))
def encode_free_dist(cache: RenderCache, *, max_depth: int,
                     dist_level: int) -> RenderCache:
    """Stamp each FREE leaf cell of the dense mirror with the Chebyshev
    distance of its covering dist cell — the single-gather band-march
    contract (render/hybrid.py fused_dist).

    Jitted: host callers (tiering._rebuild_derived) would otherwise
    dispatch ~5 eager ops on the up-to-600 MB values buffer, at the
    platform's ~100-500 ms per eager large-array op through the tunnel;
    in-pipeline callers are already traced so this only gates the host
    path.

    A free cell's word becomes the plain u32 distance (<= max_skip < 256,
    so it lives in the low byte and the alpha byte is 0): every
    alpha/occupancy reader still sees the cell as unoccupied (alpha 0 vs
    EMPTY_VALUE's 127 — both <= OCCUPIED_ALPHA, svo.cu:528), and a
    renderer's color contribution is alpha-weighted so the payload bits
    are never displayed. Occupied cells keep their RGBA8 value verbatim.

    Each dist cell's 8^(D-dist_level) leaf children are CONTIGUOUS in the
    morton-ordered leaf level, so the stamp is one reshape-broadcast
    select over the leaf region — no scatter, no per-cell gather. Re-run
    whenever `dist` is recomputed (pipeline.step's cone_hybrid branch);
    between refreshes leaf-value scatters only touch occupied cells, so
    the stamps stay current. Interior mip levels are never stamped.
    """
    g = 1 << dist_level
    lo = level_offset(max_depth)
    n_leaf_cells = 1 << (3 * max_depth)
    per_cell = 1 << (3 * (max_depth - dist_level))
    leaf_vals = jax.lax.dynamic_slice(cache.values, (lo,), (n_leaf_cells,))
    ip = jnp.asarray(_xyz_of_morton_perm(dist_level))
    dist_m = cache.dist[ip].astype(jnp.uint32)  # morton-ordered dist
    lv = leaf_vals.reshape(g * g * g, per_cell)
    enc = jnp.where(packing.is_occupied(lv), lv, dist_m[:, None])
    values = jax.lax.dynamic_update_slice(cache.values, enc.reshape(-1),
                                          (lo,))
    return cache._replace(values=values)


@functools.lru_cache(maxsize=4)
def _morton_to_xyz_perm(level: int) -> np.ndarray:
    """Permutation p with xyz_linear[i] = morton[p[i]] for a 2^level grid.
    Host-side constant (embedded in the jit program)."""
    g = 1 << level
    lin = np.arange(g * g * g, dtype=np.int64)
    x = lin % g
    y = (lin // g) % g
    z = lin // (g * g)
    m = np.zeros_like(lin)
    for b in range(level):
        m |= ((x >> b) & 1) << (3 * b)
        m |= ((y >> b) & 1) << (3 * b + 1)
        m |= ((z >> b) & 1) << (3 * b + 2)
    return m.astype(np.int32)


def interleave3(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray,
                bits: int) -> jnp.ndarray:
    """Morton code from integer coords: z gets bit 2, y bit 1, x bit 0 per
    level — matching morton.encode's octant = x + 2y + 4z (svo.cu:50-57)."""
    m = jnp.zeros_like(x)
    for b in range(bits):
        m = m | (((x >> b) & 1) << (3 * b))
        m = m | (((y >> b) & 1) << (3 * b + 1))
        m = m | (((z >> b) & 1) << (3 * b + 2))
    return m


@functools.partial(jax.jit,
                   static_argnames=("max_depth", "dist_level", "max_skip"))
def rebuild_from_pool(pool, *, max_depth: int, dist_level: int,
                      max_skip: int = 15) -> RenderCache:
    """Reconstruct the ENTIRE dense mirror (values + occupancy + distance
    field) from the node pool — the one-shot companion of the lazy
    interior mode (svo.insert(update_interior=False) skips per-frame
    mirror updates; this rebuilds everything when the exact marcher or an
    extraction next needs it).

    One inverse-topology pass gives every allocated node its (level, key)
    (svo.tile_topology), so the whole mirror is ONE pool-sized scatter at
    flat = (8^level - 8)/7 + key."""
    from octree_slam_tpu.map import svo as svo_mod

    cap = pool.capacity
    nt = cap // 8
    _, level, tkey = svo_mod.tile_topology(pool, depth=max_depth)
    node_lvl = jnp.repeat(level, 8)
    node_key = ((tkey[:, None] << 3)
                | jnp.arange(8, dtype=jnp.int32)[None, :]).reshape(-1)
    total = total_cells(max_depth)
    offset = ((jnp.int32(1) << (3 * node_lvl)) - 8) // 7
    flat = jnp.where(node_lvl > 0, offset + node_key, total)
    values = jnp.full((total,), packing.EMPTY_VALUE, jnp.uint32)
    values = values.at[flat].set(pool.value, mode="drop")

    g = 1 << dist_level
    lo = level_offset(dist_level)
    level_vals = jax.lax.dynamic_slice(values, (lo,), (g * g * g,))
    perm = jnp.asarray(_morton_to_xyz_perm(dist_level))
    occ = packing.is_occupied(level_vals)[perm]
    dist = _dist_from_occ(occ.reshape(g, g, g), max_skip).reshape(-1)
    return RenderCache(values=values, occ=occ, dist=dist)


@functools.partial(jax.jit,
                   static_argnames=("max_depth", "dist_level", "max_skip"))
def rebuild_dist(values: jnp.ndarray, *, max_depth: int, dist_level: int,
                 max_skip: int = 7) -> jnp.ndarray:
    """Chebyshev distance (cells, saturated at max_skip) to the nearest
    occupied level-`dist_level` cell, xyz-ordered flat.

    Occupancy reads the dense mip at dist_level (alpha is a subtree max,
    svo.cu:436-438, so alpha > 127 <=> subtree contains occupied leaves).
    Built with a logarithmic distance transform: round j takes a 3^3
    min-pool with window dilation 2^j and adds 2^j, which extends exact
    Chebyshev distances from 2^j - 1 to 2^(j+1) - 1 — ceil(log2(max_skip+1))
    kernels total instead of max_skip.
    """
    g = 1 << dist_level
    lo = level_offset(dist_level)
    level_vals = jax.lax.dynamic_slice(values, (lo,), (g * g * g,))
    perm = jnp.asarray(_morton_to_xyz_perm(dist_level))
    occ = packing.is_occupied(level_vals)[perm].reshape(g, g, g)
    return _dist_from_occ(occ, max_skip).reshape(-1)
