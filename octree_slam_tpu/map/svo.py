"""Sparse voxel octree as a static-shape, Morton-keyed linear node pool.

TPU-native re-design of the reference's SVO kernel module
(src/world/svo/svo.cu) and the linear GPU layout of the host octree
(octree.cpp:130-169):

  * Node layout parity: nodes live in a flat pool; a node tile is 8
    consecutive slots; `child[i]` holds the child-tile base index (0 = leaf;
    the reference packs a bit-30 flag + 30-bit index into word0,
    octree.cpp:134, svo.cu:269). `value[i]` is the packed RGBA8 word
    (word1, svo.cu:332). The root is the tile at base 0 (initOctree,
    svo.cu:24-31).
  * Insertion (svoFromPointCloud/svoFromVoxelGrid, svo.cu:584-696) becomes
    ONE lax.sort of Morton keys + a static per-level sweep: first-occurrence
    masks replace thrust sort/unique-per-level (prepassCheckResize,
    svo.cu:179-237), prefix-sum ranks batch-allocate child tiles from an
    allocation cursor (replacing the realloc-per-frame at svo.cu:609-614 and
    splitNodes at svo.cu:239-276), and masked scatters write the tree.
  * Duplicate leaf keys — an acknowledged race in the reference (TODO at
    svo.cu:631,684) — are resolved deterministically by a segment-mean over
    each key's samples before the alpha-blend (fillNodes rule, svo.cu:326-332),
    with alpha incremented once per unique leaf per insert.
  * Mipmapping (mipmapNodes/averageChildren, svo.cu:384-465) runs bottom-up
    over the recorded descent paths: parent rgb = mean of occupied children,
    alpha = max over children. (The reference's occupancy test in
    averageChildren is dead code due to a precedence bug at svo.cu:419; we
    implement the intended semantics: only children with alpha > 127
    contribute color.)
  * Extraction (extractVoxelGridFromSVO, svo.cu:699-745) is a level-by-level
    frontier BFS with prefix-sum compaction replacing thrust::remove_if.

Everything is jit-compatible: static capacities, static depth loops, no host
synchronization (the reference syncs per kernel, e.g. svo.cu:656,683,688).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from octree_slam_tpu.core import packing
from octree_slam_tpu.map import morton
from octree_slam_tpu.utils import compaction


class SVONodePool(NamedTuple):
    """Static-capacity linear octree. A pytree; capacity is its array shape."""

    child: jnp.ndarray      # i32[cap] child tile base index; 0 = no children
    value: jnp.ndarray      # u32[cap] packed RGBA8 (alpha = confidence)
    n_nodes: jnp.ndarray    # i32[]   allocation cursor (multiple of 8)
    center: jnp.ndarray     # f32[3]  octree center in world coords
    half_size: jnp.ndarray  # f32[]   half edge length of the root cell
    overflowed: jnp.ndarray  # bool[] capacity exhausted at some insert

    @property
    def capacity(self) -> int:
        return self.child.shape[0]


def create(capacity: int, center, half_size) -> SVONodePool:
    """Fresh pool with an empty root tile (initOctree, svo.cu:24-31).

    Values are pre-initialized to the fresh-node word (rgb=0, alpha=127,
    svo.cu:274); since tiles are allocated monotonically and never freed this
    is equivalent to the reference's init-at-split and saves a scatter.
    """
    return SVONodePool(
        child=jnp.zeros((capacity,), jnp.int32),
        value=jnp.full((capacity,), packing.EMPTY_VALUE, jnp.uint32),
        n_nodes=jnp.int32(8),
        center=jnp.asarray(center, jnp.float32),
        half_size=jnp.asarray(half_size, jnp.float32),
        overflowed=jnp.bool_(False),
    )


class InsertStats(NamedTuple):
    new_nodes: jnp.ndarray   # i32[] nodes allocated by this insert
    n_valid: jnp.ndarray     # i32[] valid input points
    overflowed: jnp.ndarray  # bool[]


@functools.partial(jax.jit, static_argnames=("depth",))
def insert(pool: SVONodePool, points: jnp.ndarray, colors: jnp.ndarray,
           valid: jnp.ndarray | None = None, *,
           depth: int) -> Tuple[SVONodePool, InsertStats]:
    """Fuse a colored point set into the octree at a static depth.

    points: f32[N,3] world coords; colors: f32[N,3] in [0,1];
    valid: optional bool[N] extra validity gate.
    Semantics follow svoFromPointCloud (svo.cu:642-696): allocate missing
    interior tiles along each key path, alpha-blend leaf colors, re-mipmap
    interior values along the touched paths.
    """
    cap = pool.capacity
    n = points.shape[0]

    keys, key_valid = morton.encode(points, pool.center, pool.half_size, depth)
    if valid is not None:
        key_valid = key_valid & valid
    keys = jnp.where(key_valid, keys, morton.INVALID_KEY)

    # One global sort groups every level's prefixes (replaces the per-level
    # thrust::sort/unique loop at svo.cu:200-229).
    order = jnp.argsort(keys)
    skeys = keys[order]
    scolors = colors[order]
    svalid = skeys != morton.INVALID_KEY

    child = pool.child
    value = pool.value
    n_nodes = pool.n_nodes

    # --- Top-down descent: allocate + record the node path per level. ---
    cur = morton.octant_at(skeys, depth, 1)  # level-1 node = root-tile octant
    paths = [cur]                            # paths[l-1] = node idx at level l
    reached = svalid                         # row's level-l node exists
    reached_per_level = [reached]
    total_new = jnp.int32(0)

    for level in range(1, depth):
        prefix = morton.level_prefix(skeys, depth, level)
        first = compaction.first_occurrence(prefix, svalid) & reached

        # Allocate a child tile for first-seen nodes that lack one.
        need0 = first & (child[cur] == 0)
        ranks, _ = compaction.exclusive_ranks(need0)
        tile_base = n_nodes + 8 * ranks
        ok = tile_base + 8 <= cap
        need = need0 & ok
        scatter_idx = jnp.where(need, cur, cap)
        child = child.at[scatter_idx].set(tile_base, mode="drop")
        n_new = jnp.sum(need.astype(jnp.int32))
        n_nodes = n_nodes + 8 * n_new
        total_new = total_new + n_new

        # Descend. Rows whose tile allocation was dropped go dead.
        tile = child[cur]
        reached = reached & (tile > 0)
        octant = morton.octant_at(skeys, depth, level + 1)
        cur = jnp.where(reached, tile + octant, 0)
        paths.append(cur)
        reached_per_level.append(reached)

    # --- Leaf update: segment-mean duplicate resolution + alpha blend. ---
    leaf_first = compaction.first_occurrence(skeys, svalid) & reached
    seg_id = jnp.cumsum(leaf_first.astype(jnp.int32)) - 1
    seg_id = jnp.maximum(seg_id, 0)
    w = svalid.astype(jnp.float32)
    seg_rgb = jax.ops.segment_sum(scolors * w[:, None], seg_id, num_segments=n)
    seg_cnt = jax.ops.segment_sum(w, seg_id, num_segments=n)
    mean_rgb = seg_rgb[seg_id] / jnp.maximum(seg_cnt[seg_id], 1.0)[:, None]
    blended = packing.blend_value(value[cur], mean_rgb)
    leaf_idx = jnp.where(leaf_first, cur, cap)
    value = value.at[leaf_idx].set(blended, mode="drop")

    # --- Bottom-up mipmap along touched paths (svo.cu:450-465). ---
    for level in range(depth - 1, 0, -1):
        node = paths[level - 1]
        prefix = morton.level_prefix(skeys, depth, level)
        mask = (
            compaction.first_occurrence(prefix, svalid)
            & reached_per_level[level - 1]
            & (child[node] > 0)
        )
        tile = child[node]
        kid_idx = tile[:, None] + jnp.arange(8, dtype=jnp.int32)[None, :]
        kid_val = value[kid_idx]  # u32[N, 8]
        r, g, b, a = packing.unpack_rgba8(kid_val)
        occ = (a > packing.OCCUPIED_ALPHA).astype(jnp.float32)
        n_occ = jnp.sum(occ, axis=1)
        safe = jnp.maximum(n_occ, 1.0)
        avg_r = jnp.sum(r.astype(jnp.float32) * occ, axis=1) / safe
        avg_g = jnp.sum(g.astype(jnp.float32) * occ, axis=1) / safe
        avg_b = jnp.sum(b.astype(jnp.float32) * occ, axis=1) / safe
        max_a = jnp.max(a, axis=1)
        packed = packing.pack_rgba8(
            avg_r.astype(jnp.int32), avg_g.astype(jnp.int32),
            avg_b.astype(jnp.int32), max_a)
        idx = jnp.where(mask, node, cap)
        value = value.at[idx].set(packed, mode="drop")

    overflowed = pool.overflowed | (n_nodes + 8 > cap)
    new_pool = pool._replace(child=child, value=value, n_nodes=n_nodes,
                             overflowed=overflowed)
    stats = InsertStats(
        new_nodes=8 * total_new,
        n_valid=jnp.sum(svalid.astype(jnp.int32)),
        overflowed=overflowed,
    )
    return new_pool, stats


class ExtractedVoxels(NamedTuple):
    keys: jnp.ndarray     # i32[cap] leaf morton keys (depth = extraction depth)
    nodes: jnp.ndarray    # i32[cap] node-pool indices
    centers: jnp.ndarray  # f32[cap, 3] world-space cell centers
    colors: jnp.ndarray   # f32[cap, 4] rgba in [0,1]
    count: jnp.ndarray    # i32[] live entries


@functools.partial(jax.jit, static_argnames=("depth", "capacity"))
def extract_voxels(pool: SVONodePool, *, depth: int,
                   capacity: int) -> ExtractedVoxels:
    """Enumerate occupied (alpha>127) cells at `depth` by frontier BFS.

    Replaces extractVoxelGridFromSVO's per-level getOccupiedChildren +
    thrust::remove_if loop (svo.cu:699-745) with masked expansion +
    prefix-sum compaction at a static capacity.
    """
    cap = pool.capacity

    # Level-1 frontier: occupied root-tile children (the reference's first
    # getOccupiedChildren pass on the sentinel root key, svo.cu:704-716).
    node = jnp.full((capacity,), cap, jnp.int32)
    key = jnp.zeros((capacity,), jnp.int32)
    node = node.at[:8].set(jnp.arange(8, dtype=jnp.int32))
    key = key.at[:8].set(jnp.arange(8, dtype=jnp.int32))
    live = jnp.zeros((capacity,), bool)
    live = live.at[:8].set(packing.is_occupied(pool.value[:8]))

    for _ in range(depth - 1):
        tile = jnp.where(live, pool.child[jnp.minimum(node, cap - 1)], 0)
        has_kids = live & (tile > 0)
        kid_nodes = (tile[:, None] + jnp.arange(8, dtype=jnp.int32)).reshape(-1)
        kid_keys = ((key[:, None] << 3) | jnp.arange(8, dtype=jnp.int32)).reshape(-1)
        kid_occ = packing.is_occupied(pool.value[jnp.minimum(kid_nodes, cap - 1)])
        mask = jnp.repeat(has_kids, 8) & kid_occ
        (node, key), count = compaction.compact_multi(
            [kid_nodes, kid_keys], mask, capacity)
        live = jnp.arange(capacity) < count

    node_safe = jnp.where(live, node, 0)
    centers = morton.decode_centers(key, pool.center, pool.half_size, depth)
    colors = packing.unpack_rgba_unit(pool.value[node_safe])
    count = jnp.sum(live.astype(jnp.int32))
    return ExtractedVoxels(
        keys=jnp.where(live, key, -1),
        nodes=jnp.where(live, node, -1),
        centers=jnp.where(live[:, None], centers, 0.0),
        colors=jnp.where(live[:, None], colors, 0.0),
        count=count,
    )


@functools.partial(jax.jit, static_argnames=("depth",))
def query_points(pool: SVONodePool, points: jnp.ndarray, *,
                 depth: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Look up the deepest existing node containing each point (descent
    semantics of fillNodes' tree walk, svo.cu:352-364, without mutation).

    Returns (value u32[N], reached_depth i32[N]).
    """
    keys, valid = morton.encode(points, pool.center, pool.half_size, depth)
    cur = morton.octant_at(keys, depth, 1)
    cur = jnp.where(valid, cur, 0)
    reached = jnp.where(valid, 1, 0)
    for level in range(1, depth):
        tile = pool.child[cur]
        go = valid & (tile > 0)
        octant = morton.octant_at(keys, depth, level + 1)
        cur = jnp.where(go, tile + octant, cur)
        reached = jnp.where(go, level + 1, reached)
    return pool.value[cur], reached
