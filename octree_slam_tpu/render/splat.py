"""Fast map view: z-resolved voxel splatting from a persistent leaf list.

The production render path for the real-time SLAM loop. Exact cone tracing
(render/raycast.py) costs O(rays x steps) random gathers — the one operation
TPUs do slowly (~100M/s measured on v5e) — while splatting is
O(leaf voxels) with exactly ONE gather (colors) and ONE scatter (z-resolve):

  * the pipeline maintains a persistent list of every leaf voxel ever
    written (insert reports first-seen leaves; child pointers and leaf
    identities are write-once, so appends never need deduplication);
  * per frame: decode centers from Morton keys (elementwise), project
    (matmul), pack quantized-depth<<16 | RGB565 into one int32, scatter-min
    — the nearest voxel per pixel wins carrying its color — then unpack and
    fill 1-2 pixel holes with an image-space min-depth dilation.

In the reference's terms this is the DRAW_POINT_CLOUD / voxel-cube display
path (opengl_renderer.cpp:101-221) made deterministic; for well-observed
maps (node alpha saturated, so a cone-traced ray terminates on first hit —
cone_tracing_kernels.cu:115-121) it converges to the same image as the
cone tracer up to its alpha-blending of freshly observed voxels.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from octree_slam_tpu.core import packing
from octree_slam_tpu.map import morton
from octree_slam_tpu.map.svo import SVONodePool, InsertStats
# points.py owns the canonical packed-z-buffer bit math (the replicating
# unpack round-trips 255 exactly)
from octree_slam_tpu.render.points import DEPTH_INF
from octree_slam_tpu.render.points import pack_rgb565 as _pack_rgb565
from octree_slam_tpu.render.points import unpack_rgb565 as _unpack_rgb565

EMPTY = DEPTH_INF  # no-hit sentinel: sorts after every packed depth word


class LeafList(NamedTuple):
    """Persistent append-only registry of written leaf voxels.

    `vals` mirrors every registered leaf's current packed value and
    `node2pos` maps node index -> registry position, so the per-frame splat
    render reads values sequentially instead of a 262k-lane random gather
    from the node pool (~3.7 ms on v5e); insert's touched-leaf values keep
    the mirror fresh through append_new_leaves."""

    keys: jnp.ndarray    # i32[LC] morton keys at map depth
    nodes: jnp.ndarray   # i32[LC] node-pool indices
    vals: jnp.ndarray    # u32[LC] current packed leaf values
    node2pos: jnp.ndarray  # i32[node_capacity] node -> registry position
    count: jnp.ndarray   # i32[]
    overflowed: jnp.ndarray  # bool[]


def create_leaf_list(capacity: int, node_capacity: int) -> LeafList:
    return LeafList(
        keys=jnp.full((capacity,), -1, jnp.int32),
        nodes=jnp.zeros((capacity,), jnp.int32),
        vals=jnp.zeros((capacity,), jnp.uint32),
        node2pos=jnp.full((node_capacity,), -1, jnp.int32),
        count=jnp.int32(0),
        overflowed=jnp.bool_(False),
    )


def leaf_list_from_extraction(ex, pool_value: jnp.ndarray, *,
                              node_capacity: int) -> LeafList:
    """Rebuild a full registry from an svo.extract_all_leaves result: the
    shared path for growth-with-overflow, tiering rebuilds, and boundary
    reallocation (node indices changed or appends were dropped, so the
    append-only registry is reconstructed from the pool itself)."""
    capacity = ex.keys.shape[0]
    live = jnp.asarray(ex.nodes) >= 0
    nodes = jnp.where(live, ex.nodes, 0)
    node2pos = jnp.full((node_capacity,), -1, jnp.int32)
    pos = jnp.arange(capacity, dtype=jnp.int32)
    node2pos = node2pos.at[
        jnp.where(live, nodes, node_capacity)].set(pos, mode="drop")
    return LeafList(
        keys=ex.keys, nodes=nodes,
        vals=jnp.where(live, pool_value[nodes], 0),
        node2pos=node2pos, count=ex.count,
        overflowed=ex.count >= capacity)


def append_new_leaves(leaves: LeafList, stats: InsertStats) -> LeafList:
    """Append this insert's first-seen leaves at the cursor and refresh the
    value mirror for every leaf this insert touched."""
    return _append_new_leaves(leaves, stats, 0)[0]


def append_new_leaves_cached(leaves: LeafList, stats: InsertStats,
                             miss_cap: int):
    """append_new_leaves + the directory-cache contract: rows whose
    registry position is already known (stats.hit_aux, carried through
    svo.insert's dir_aux) skip the U-wide node2pos gather — only the
    misses (first-seen keys + keys absent from last frame's directory)
    gather, at miss_cap lanes, with a lax.cond full-gather fallback when
    they overflow. Returns (leaves, tpos) where tpos[U] is every touched
    row's registry position (-1 when untouched or dropped) — the
    pipeline stores it as next frame's dir position payload."""
    return _append_new_leaves(leaves, stats, miss_cap)


def _append_new_leaves(leaves: LeafList, stats: InsertStats,
                       miss_cap: int):
    lc = leaves.keys.shape[0]
    nc = leaves.node2pos.shape[0]
    u = stats.new_leaf_keys.shape[0]
    pos = leaves.count + jnp.arange(u, dtype=jnp.int32)
    ok = (jnp.arange(u) < stats.new_leaf_count) & (pos < lc)
    idx = jnp.where(ok, pos, lc)
    keys = leaves.keys.at[idx].set(stats.new_leaf_keys, mode="drop")
    nodes = leaves.nodes.at[idx].set(stats.new_leaf_nodes, mode="drop")
    node2pos = leaves.node2pos.at[
        jnp.where(ok, stats.new_leaf_nodes, nc)].set(pos, mode="drop")

    tn = stats.touched_leaf_nodes
    if miss_cap > 0:
        known = stats.hit_aux
        U = tn.shape[0]
        need = (tn >= 0) & (known < 0)
        n_need = jnp.sum(need.astype(jnp.int32))
        ranks = jnp.cumsum(need.astype(jnp.int32)) - need.astype(jnp.int32)
        rows = jnp.full((miss_cap,), U, jnp.int32).at[
            jnp.where(need, ranks, miss_cap)].set(
            jnp.arange(U, dtype=jnp.int32), mode="drop")

        def _full(n2p):
            return n2p[jnp.clip(tn, 0, nc - 1)]

        def _sparse(n2p):
            tn_m = tn[jnp.clip(rows, 0, U - 1)]
            g = n2p[jnp.clip(tn_m, 0, nc - 1)]
            tp = jnp.where(known >= 0, known, -1)
            return tp.at[rows].set(g, mode="drop")

        tpos = jax.lax.cond(n_need > miss_cap, _full, _sparse, node2pos)
    else:
        tpos = node2pos[jnp.clip(tn, 0, nc - 1)]
    t_ok = (tn >= 0) & (tn < nc) & (tpos >= 0)
    vals = leaves.vals.at[jnp.where(t_ok, tpos, lc)].set(
        stats.touched_leaf_vals, mode="drop")

    new_count = jnp.minimum(leaves.count + stats.new_leaf_count, lc)
    overflowed = leaves.overflowed | (
        leaves.count + stats.new_leaf_count > lc)
    return LeafList(keys=keys, nodes=nodes, vals=vals, node2pos=node2pos,
                    count=new_count, overflowed=overflowed), \
        jnp.where(t_ok, tpos, -1)


def splat_zbuffer(vals: jnp.ndarray, keys: jnp.ndarray,
                  live: jnp.ndarray,
                  center: jnp.ndarray, half_size, world_T_cam: jnp.ndarray,
                  fx, fy, *, width: int, height: int, depth: int,
                  max_range: float = 10.0) -> jnp.ndarray:
    """Project a (possibly sharded) leaf set into a packed z-buffer:
    i32[H*W] words of quantized-depth<<16 | RGB565, EMPTY where nothing
    landed. The packed word orders by depth, so buffers from disjoint leaf
    shards composite exactly with an elementwise/collective MIN
    (parallel.distributed.splat_sharded uses pmin over ICI)."""
    keys = jnp.where(live, keys, 0)
    centers = morton.decode_centers(keys, center, half_size, depth)

    r, g, b, _ = packing.unpack_rgba8(vals)
    occupied = live & packing.is_occupied(vals)

    # world -> camera (camera looks down +z; pinhole matches the sensor
    # model, image_kernels.cu:49-51)
    R = world_T_cam[:3, :3]
    t = world_T_cam[:3, 3]
    cam = (centers - t) @ R  # == R^T (p - t) row-wise
    z = cam[:, 2]
    in_front = occupied & (z > 1e-3) & (z < max_range)
    zs = jnp.where(in_front, z, 1.0)
    px = jnp.round(fx * cam[:, 0] / zs + width / 2.0).astype(jnp.int32)
    py = jnp.round(height / 2.0 - fy * cam[:, 1] / zs).astype(jnp.int32)
    inb = in_front & (px >= 0) & (px < width) & (py >= 0) & (py < height)

    qz = jnp.clip((z * (32766.0 / max_range)), 0, 32766).astype(jnp.int32)
    word = (qz << 16) | _pack_rgb565(r, g, b)  # 15+16 bits, sign-safe
    num_pix = width * height
    idx = jnp.where(inb, py * width + px, num_pix)
    buf = jnp.full((num_pix,), EMPTY, jnp.int32)
    return buf.at[idx].min(jnp.where(inb, word, EMPTY), mode="drop")


def dilate_zbuffer(buf: jnp.ndarray, *, width: int, height: int,
                   rounds: int = 2) -> jnp.ndarray:
    """Image-space hole filling on a packed z-buffer: EMPTY pixels take the
    min (= nearest) packed word of their 3x3 neighborhood, `rounds` times.
    Leaf centers project one point each, so sub-leaf-footprint holes are
    expected; display and the frame-to-model tracker both close them."""
    img = buf.reshape(height, width)
    for _ in range(rounds):
        # min over the 3x3 window as ONE reduce_window (identity EMPTY =
        # i32 max, so out-of-image padding never wins) -- bit-identical to
        # the 9-tap pad/slice/minimum chain it replaces, at a fraction of
        # the kernel count
        best = jax.lax.reduce_window(img, EMPTY, jax.lax.min,
                                     (3, 3), (1, 1), "SAME")
        img = jnp.where(img == EMPTY, best, img)
    return img


def finish_zbuffer(buf: jnp.ndarray, *, width: int, height: int,
                   dilate: int = 2) -> jnp.ndarray:
    """Packed z-buffer -> f32[H, W, 4] framebuffer with hole dilation."""
    img = dilate_zbuffer(buf, width=width, height=height, rounds=dilate)

    hit = img != EMPTY
    rr, gg, bb = _unpack_rgb565(jnp.where(hit, img, 0) & 0xFFFF)
    rgb = jnp.stack([rr, gg, bb], axis=-1).astype(jnp.float32) / 255.0
    a = hit.astype(jnp.float32)
    return jnp.concatenate([rgb * a[..., None], a[..., None]], axis=-1)


@functools.partial(jax.jit, static_argnames=("width", "height", "depth",
                                             "dilate"))
def render_splat(pool: SVONodePool, leaves: LeafList,
                 world_T_cam: jnp.ndarray, fx, fy, *, width: int, height: int,
                 depth: int, max_range: float = 10.0,
                 dilate: int = 2) -> jnp.ndarray:
    """Render occupied leaf voxels to f32[height, width, 4].

    One packed scatter-min resolves visibility and color together; `dilate`
    rounds of 3x3 min-depth dilation close sub-pixel holes.
    """
    lc = leaves.keys.shape[0]
    live = (jnp.arange(lc) < leaves.count) & (leaves.keys >= 0)
    buf = splat_zbuffer(leaves.vals, leaves.keys, live,
                        pool.center, pool.half_size, world_T_cam, fx, fy,
                        width=width, height=height, depth=depth,
                        max_range=max_range)
    return finish_zbuffer(buf, width=width, height=height, dilate=dilate)
