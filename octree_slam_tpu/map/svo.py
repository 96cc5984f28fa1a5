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
    ONE lax.sort of Morton keys + compaction to the UNIQUE voxel set +
    a static per-level sweep over uniques: first-occurrence masks replace
    thrust sort/unique-per-level (prepassCheckResize, svo.cu:179-237),
    prefix-sum ranks batch-allocate child tiles from an allocation cursor
    (replacing the realloc-per-frame at svo.cu:609-614 and splitNodes at
    svo.cu:239-276), and masked scatters write the tree.

    Perf note (v5e measured): random gather/scatter runs ~100M elem/s while
    sort/cumsum/elementwise are orders faster — so every gatherish phase
    runs on the compacted unique array (typically 10-60k per 640x480 frame,
    not 307k), segment means come from cumsum differences (no segment_sum
    scatter), and the mipmap walks level lists whose static caps shrink 4x
    per level.
  * Duplicate leaf keys — an acknowledged race in the reference (TODO at
    svo.cu:631,684) — are resolved deterministically by a segment-mean over
    each key's samples before the alpha-blend (fillNodes rule, svo.cu:326-332),
    with alpha incremented once per unique leaf per insert.
  * Mipmapping (mipmapNodes/averageChildren, svo.cu:384-465) runs bottom-up
    over the touched unique parents: parent rgb = mean of occupied children,
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


def prealloc_levels(capacity: int) -> int:
    """Number of fully-preallocated shallow levels for a pool of this
    capacity (see create). Every dense level removes one round of the
    insert descend's dependent-gather chain (~0.8 ms/frame on v5e), so
    big pools extend the dense region as deep as the budget allows:
    level 6 (299,592 slots) is worth dedicating up to 1/3 of the pool —
    the gather it deletes is pure latency while the slots only matter if
    the sparse region actually fills (growth/tiering absorb that); level 5
    and below keep the original 1/8 (resp. 1/2) schedules."""
    # Level 7 (2.4M dense slots for pools >= ~3.6M) was measured and
    # REJECTED in round 3: swapping one descend gather for the bigger
    # dense region was a wash at fuse-level-1 lane counts (16.6 vs
    # 16.0 ms) and a regression at full-res (22.4 vs 26.4 FPS, depth-9
    # 1 cm) — the 4M-slot tables make every other gather/scatter slower.
    # A new tier would also silently slow pools that GROW past its
    # threshold.
    if 3 * _LEVEL_BASE[7] <= capacity:   # level 6: pools >= ~900k nodes
        return 6
    if 8 * _LEVEL_BASE[6] <= capacity:   # level 5: pools >= ~300k nodes
        return 5
    for pre in (4, 3, 2, 1):
        if 2 * _LEVEL_BASE[pre + 1] <= capacity:
            return pre
    return 1


def prealloc_levels_legacy(capacity: int) -> int:
    """The schedule BEFORE level 6 was allowed at 1/3 headroom (both
    levels gated at 1/8). Checkpoints written without a prealloc stamp
    were laid out under this rule — loaders compare it against
    prealloc_levels to reject pools whose dense layout no longer matches
    (a silent mismatch misindexes every shallow level)."""
    for pre in (6, 5):
        if 8 * _LEVEL_BASE[pre + 1] <= capacity:
            return pre
    for pre in (4, 3, 2, 1):
        if 2 * _LEVEL_BASE[pre + 1] <= capacity:
            return pre
    return 1


# node index of (level l, morton cell m) in the dense-preallocated region:
# _LEVEL_BASE[l] + m — the same (8^l - 8)/7 layout as the value mips.
_LEVEL_BASE = [0] + [((1 << (3 * l)) - 8) // 7 for l in range(1, 12)]


def create(capacity: int, center, half_size) -> SVONodePool:
    """Fresh pool with the shallow levels fully preallocated.

    The reference starts from an empty root tile (initOctree, svo.cu:24-31)
    and splits lazily. Here the top `prealloc_levels` levels are dense with
    a fixed breadth-first layout (node of cell m at level l sits at
    (8^l - 8)/7 + m, child tile = base(l+1) + 8m): any shallow node's index
    is pure bit math, so insert's existing-tree descent starts below them
    (fewer dependent gathers — the one irreducible pointer chase) and no
    insert ever allocates there. Costs 4680 of `capacity` slots at the
    default 4 levels. Values are pre-initialized to the fresh-node word
    (rgb=0, alpha=127, svo.cu:274), equivalent to init-at-split.
    """
    pre = prealloc_levels(capacity)
    import numpy as np
    child_np = np.zeros((capacity,), np.int32)
    for l in range(1, pre):
        base, nxt = _LEVEL_BASE[l], _LEVEL_BASE[l + 1]
        m = np.arange(nxt - base, dtype=np.int32)
        child_np[base + m] = nxt + 8 * m
    return SVONodePool(
        child=jnp.asarray(child_np),
        value=jnp.full((capacity,), packing.EMPTY_VALUE, jnp.uint32),
        n_nodes=jnp.int32(_LEVEL_BASE[pre + 1]),
        center=jnp.asarray(center, jnp.float32),
        half_size=jnp.asarray(half_size, jnp.float32),
        overflowed=jnp.bool_(False),
    )


class InsertStats(NamedTuple):
    new_nodes: jnp.ndarray        # i32[] nodes allocated by this insert
    n_valid: jnp.ndarray          # i32[] valid input points
    n_unique: jnp.ndarray        # i32[] unique leaf voxels touched
    overflowed: jnp.ndarray       # bool[] any capacity exceeded (union)
    unique_overflow: jnp.ndarray  # bool[] frame had > unique_cap distinct
                                  #        leaves: re-insert with
                                  #        min_key=last_key for the rest
    last_key: jnp.ndarray         # i32[] largest unique key processed
    shallow_allocs: jnp.ndarray   # i32[] new tiles at levels <= 6 (entry-grid
                                  #       invalidation signal for the renderer)
    dir_hits: jnp.ndarray         # i32[] directory-cache hits (-1 when the
                                  #       cache was not consulted)
    hit_aux: jnp.ndarray          # i32[U] the dir_aux payload for hit rows
                                  #        (-1 elsewhere / when uncached) —
                                  #        the pipeline carries registry
                                  #        positions here
    new_leaf_keys: jnp.ndarray    # i32[U] morton keys of first-seen leaves, -1 pad
    new_leaf_nodes: jnp.ndarray   # i32[U] node indices of those leaves
    new_leaf_count: jnp.ndarray   # i32[]
    touched_leaf_nodes: jnp.ndarray  # i32[U] node idx of every leaf this
                                     #        insert blended (-1 pad)
    touched_leaf_keys: jnp.ndarray   # i32[U] their morton keys (INVALID_KEY
                                     #        pad) — with touched_leaf_nodes,
                                     #        next frame's directory cache
    touched_leaf_vals: jnp.ndarray   # u32[U] their post-blend values
    sat_transition: jnp.ndarray      # bool[U] rows whose alpha crossed INTO
                                     #         saturation (old < 255, new ==
                                     #         255) THIS insert — exactly
                                     #         once per leaf lifetime, so the
                                     #         saturation-gate bitmask can
                                     #         scatter-ADD each leaf's bit
                                     #         (pipeline.SLAMState.sat_mask)
    # Dense-mip mirror updates (map/mips.py): every touched (cell, value) at
    # every level, ready for one scatter into RenderCache.values. Shape (1,)
    # dummies when emit_mips=False.
    mip_idx: jnp.ndarray          # i32[M] flat mip indices (invalid = huge)
    mip_val: jnp.ndarray          # u32[M]


def _unique_compact(skeys, svalid, scolors_u8, unique_cap: int):
    """Compact sorted keys to uniques with exact per-key color means.

    Means use cumulative-sum differences over the sorted color array —
    no segment_sum scatter, only two [U]-sized gathers.
    Returns (ukeys i32[U], mean_rgb f32[U,3] in [0,1], ulive bool[U],
    u_count i32)."""
    n = skeys.shape[0]
    first = compaction.first_occurrence(skeys, svalid)
    ranks, u_count = compaction.exclusive_ranks(first)

    # Compact the first-occurrence rows by ONE rank sort: first-rows carry
    # their rank, everything else sorts after, so positions 0..count-1 of
    # the sorted payloads ARE the compacted uniques. (The obvious pair of
    # 307k-lane scatters into the U-sized buffers costs ~1.4 ms EACH on
    # v5e while this sort is ~1 ms total; a (U,2) pair scatter was worse
    # still, 2.5 ms — the (8,128)-tiled 2-D layout defeats scatters.)
    rank_key = jnp.where(first, ranks, n)
    _, upos_s, ukeys_s = jax.lax.sort(
        (rank_key, jnp.arange(n, dtype=jnp.int32), skeys), num_keys=1)
    if unique_cap > n:  # tiny inputs (tests): pad up to the static cap
        pad_p = jnp.full((unique_cap - n,), n, jnp.int32)
        pad_k = jnp.full((unique_cap - n,), morton.INVALID_KEY, jnp.int32)
        upos_s = jnp.concatenate([upos_s, pad_p])
        ukeys_s = jnp.concatenate([ukeys_s, pad_k])
    row = jnp.arange(unique_cap, dtype=jnp.int32)
    live_row = row < jnp.minimum(u_count, unique_cap)
    upos = jnp.where(live_row, upos_s[:unique_cap], n)
    ukeys = jnp.where(live_row, ukeys_s[:unique_cap], morton.INVALID_KEY)

    w = svalid.astype(jnp.int32)
    # ONE i32[N,4] running sum (rgb + count): the segment reduction below
    # then needs 2 row gathers instead of 4 (each [U]-row gather from a
    # 307k table is ~0.85 ms on v5e — latency-, not bandwidth-, bound).
    # int32 is EXACT here (sums bounded by 307200*255 < 2^31); an f32
    # cumsum reaches ~7.8e7 where ULP=8 and cost late-sorted keys up to
    # ±1.5 color levels (round-2 verdict probe).
    csum = jnp.cumsum(
        jnp.concatenate(
            [scolors_u8.astype(jnp.int32) * w[:, None], w[:, None]], axis=1),
        axis=0)

    # the LAST processed unique's segment must stop where the first
    # unprocessed unique (rank == unique_cap) begins — otherwise, on a
    # unique-cap overflow, its mean absorbs every remaining valid sample
    pos_cut = jnp.min(jnp.where(first & (ranks == unique_cap),
                                jnp.arange(n, dtype=jnp.int32), n))
    nstart = jnp.concatenate([upos[1:], pos_cut[None]])
    end = jnp.clip(nstart - 1, 0, n - 1)
    start_prev = upos - 1  # -1 means "sum from zero"

    def at(c, i):
        v = c[jnp.clip(i, 0, n - 1)]
        return jnp.where((i >= 0)[..., None], v, 0)

    seg = at(csum, end) - at(csum, start_prev)   # i32[U, 4] (exact)
    sum_rgb = seg[:, :3].astype(jnp.float32)
    cnt = seg[:, 3].astype(jnp.float32)
    mean_rgb = sum_rgb / jnp.maximum(cnt, 1.0)[:, None] / 255.0

    ulive = (jnp.arange(unique_cap) < jnp.minimum(u_count, unique_cap)) \
        & (ukeys != morton.INVALID_KEY)
    return ukeys, mean_rgb, ulive, u_count


class _AllocOut(NamedTuple):
    """Result of the shared descend+allocate phases (see _descend_alloc)."""

    child: jnp.ndarray            # i32[cap] updated child-pointer array
    n_nodes: jnp.ndarray          # i32[]   updated allocation cursor
    paths: tuple                  # i32[U] node index at level 1..depth
    reached: tuple                # bool[U] path valid down to that level
    n_new_tiles: jnp.ndarray      # i32[]  tiles allocated
    shallow_allocs: jnp.ndarray   # i32[]  new tiles at levels <= shallow_level


def _descend_alloc(child: jnp.ndarray, n_nodes: jnp.ndarray,
                   ukeys: jnp.ndarray, ulive: jnp.ndarray, *, cap: int,
                   depth: int, shallow_level: int) -> _AllocOut:
    """Phases 1-2 of insertion, shared by `insert` and `insert_exact`:
    descend the existing tree once per unique sorted key, then batch-allocate
    every missing interior tile across all levels with one cumsum (the
    TPU-native prepassCheckResize + expandTreeAtKeys, svo.cu:179-289).
    See the phase comments inline."""
    # --- Phase 1: descend the EXISTING tree once per unique (the only
    # irreducible pointer chase: dependent gathers). The shallow levels are
    # dense-preallocated with a fixed layout (create), so their node
    # indices are pure bit math and the gather chain starts below them.
    # Unlike the per-level allocate-then-step loop this touches no
    # interleaved scatters, so phase 2 can batch all levels into single
    # kernels (v5e: ~0.5 ms fixed cost per unfused kernel). ---
    pre = min(prealloc_levels(cap), depth)
    path_old = [
        jnp.where(ulive, jnp.int32(_LEVEL_BASE[l])
                  + morton.level_prefix(ukeys, depth, l), 0)
        for l in range(1, pre + 1)
    ]
    cur = path_old[-1]
    exist_level = jnp.where(ulive, pre, 0)
    exists = ulive
    for level in range(pre, depth):
        tile = child[cur]
        has = exists & (tile > 0)
        cur = jnp.where(has, tile + morton.octant_at(ukeys, depth, level + 1),
                        cur)
        exists = has
        exist_level = jnp.where(has, level + 1, exist_level)
        path_old.append(cur)

    # --- Phase 2: batched allocation over all levels at once. ---
    # first_occurrence at EVERY level from one divergence computation:
    # two sorted uniques share prefix_l iff their keys agree above bit
    # 3*(depth-l); div_level = the shallowest level where they differ.
    x = ukeys ^ jnp.concatenate([ukeys[:1] ^ jnp.int32(-1), ukeys[:-1]])
    sm = x
    for s in (1, 2, 4, 8, 16):
        sm = sm | (sm >> s)
    sm = sm & jnp.int32(0x7FFFFFFF)        # drop sign bit from the -1 row
    h = jax.lax.population_count(sm.astype(jnp.uint32)).astype(jnp.int32) - 1
    div_level = depth - h // 3             # first level where prefix differs

    # rows cover only the non-preallocated levels mat_lo..depth-1 (tiles
    # can never hang off levels < pre, so those rows would be all-False
    # work; when depth <= pre the single remaining row degenerates to
    # no-allocation correctly)
    mat_lo = min(pre, depth - 1)
    levels = jnp.arange(mat_lo, depth, dtype=jnp.int32)[:, None]  # [L', 1]
    first_all = ulive[None, :] & (div_level[None, :] <= levels)  # [L', U]
    # a new tile hangs off the level-l node iff the path stops at or above l
    need = first_all & (exist_level[None, :] <= levels)

    # flat allocation ranks in (level, unique) order -> tile bases. ONE
    # inclusive cumsum gives every row its segment's rank: `need` is true
    # only at segment-start rows, and between a row and its own segment's
    # start there are no other starts, so cumsum(need)[u] is exactly
    # rank(start)+1 — a free segment broadcast, no forward-fill scan.
    flat = need.reshape(-1).astype(jnp.int32)
    inc = jnp.cumsum(flat).reshape(need.shape)
    tile_base = n_nodes + 8 * (inc - 1)
    fits = tile_base + 8 <= cap
    alloc = need & fits
    n_new = jnp.sum(alloc.astype(jnp.int32))
    shallow = jnp.sum(
        (alloc & (levels <= shallow_level)).astype(jnp.int32))

    # every row's view of its segment's new tile (-1 = segment has none):
    # the segment needed a tile iff this row's own path stops at or above l
    # (identical for all rows of a segment)
    seg_needed = ulive[None, :] & (exist_level[None, :] <= levels)
    seg_tile = jnp.where(seg_needed & fits, tile_base, -1)

    # node index at every level for every unique, old or new:
    # level l+1 node = (existing path) or (parent segment's new tile + octant)
    octants = jnp.stack(
        [morton.octant_at(ukeys, depth, l + 1) for l in range(mat_lo, depth)])
    path_old_m = jnp.stack(path_old[mat_lo:])               # [L', U] level l+1
    new_node = jnp.maximum(seg_tile, 0) + octants
    node_at = jnp.where(exist_level[None, :] >= levels + 1,
                        path_old_m, new_node)               # [L', U]
    # reached: the whole path down to level l+1 exists pre-insert or its
    # tile was allocated (capacity may truncate) — monotone AND along levels
    ok_lvl = (exist_level[None, :] >= levels + 1) | (seg_tile >= 0)
    reached_m = jnp.cumprod(ok_lvl.astype(jnp.int32), axis=0).astype(bool) \
        & ulive[None, :]

    # ONE child-pointer scatter for every allocated tile across all levels:
    # parent node = level-l node (row l-1 of the path matrix; level-1 nodes
    # are the root tile itself)
    parent_idx = jnp.concatenate(
        [path_old[mat_lo - 1][None, :], node_at[:-1]])
    # capacity truncation can break the chain mid-path: only write tiles
    # whose parent node itself was reached (otherwise seg_tile would carry
    # a stale neighbor segment's tile into the scatter); the level-pre
    # parents always exist (preallocated)
    parent_ok = jnp.concatenate([ulive[None, :], reached_m[:-1]])
    scatter_idx = jnp.where(alloc & parent_ok, parent_idx, cap).reshape(-1)
    child = child.at[scatter_idx].set(tile_base.reshape(-1), mode="drop")
    n_nodes = n_nodes + 8 * n_new

    paths = tuple(path_old[:mat_lo]) \
        + tuple(node_at[i] for i in range(depth - mat_lo))
    reached = (ulive,) * mat_lo \
        + tuple(reached_m[i] for i in range(depth - mat_lo))
    return _AllocOut(child=child, n_nodes=n_nodes, paths=paths,
                     reached=reached, n_new_tiles=n_new,
                     shallow_allocs=shallow)


def _dir_lookup(dkeys: jnp.ndarray, qkeys: jnp.ndarray) -> jnp.ndarray:
    """Directory-cache lookup: for each query key, the DIRECTORY ROW index
    holding that key, or -1 when absent (callers gather whatever per-row
    payloads they carry — node index, cached value, registry position).

    The directory is last frame's touched_leaf_keys: unique keys with
    INVALID_KEY on dead rows, any row order. One variadic `lax.sort` over
    the concatenation (keys primary, a directory-before-query tag
    secondary) lines each query up immediately after its matching
    directory row — a merge in one fused sort instead of a binary-search
    gather chain (log2(C) dependent gathers of the kind the cache exists
    to delete)."""
    C = dkeys.shape[0]
    U = qkeys.shape[0]
    keys = jnp.concatenate([dkeys, qkeys])
    # one payload column does double duty: directory rows carry their row
    # index (>= 0), query rows carry -(pos+1) (< 0) — a 2-operand
    # sort_key_val instead of a 4-operand variadic sort. The STABLE sort
    # keeps directory rows (concatenated first) ahead of their equal-key
    # query row.
    payload = jnp.concatenate([jnp.arange(C, dtype=jnp.int32),
                               -1 - jnp.arange(U, dtype=jnp.int32)])
    sk, sp = jax.lax.sort_key_val(keys, payload, is_stable=True)
    prev_k = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sk[:-1]])
    prev_p = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sp[:-1]])
    # a query row hits iff the row before it is a directory row with the
    # same key (both sides' keys are unique, so the match — if any — is
    # adjacent; dead directory rows carry INVALID_KEY)
    is_q = sp < 0
    hit_r = jnp.where(is_q & (prev_k == sk) & (prev_p >= 0)
                      & (sk != morton.INVALID_KEY), prev_p, -1)
    out = jnp.full((U,), -1, jnp.int32)
    return out.at[jnp.where(is_q, -1 - sp, U)].set(hit_r, mode="drop")


@functools.partial(
    jax.jit,
    static_argnames=("depth", "unique_cap", "emit_mips", "shallow_level",
                     "update_interior", "miss_cap"))
def insert(pool: SVONodePool, points: jnp.ndarray, colors: jnp.ndarray,
           valid: jnp.ndarray | None = None, *, depth: int,
           unique_cap: int = 1 << 16,
           emit_mips: bool = False,
           shallow_level: int = 6,
           min_key: jnp.ndarray | None = None,
           update_interior: bool = True,
           dir_keys: jnp.ndarray | None = None,
           dir_nodes: jnp.ndarray | None = None,
           dir_vals: jnp.ndarray | None = None,
           dir_aux: jnp.ndarray | None = None,
           miss_cap: int = 0,
           ) -> Tuple[SVONodePool, InsertStats]:
    """Fuse a colored point set into the octree at a static depth.

    points: f32[N,3] world coords; colors: f32[N,3] in [0,1];
    valid: optional bool[N] extra validity gate. unique_cap bounds the
    distinct leaf voxels per insert; because uniques are processed in
    sorted key order, a frame with more is handled EXACTLY by re-running
    with min_key = the previous pass's stats.last_key (a dynamic scalar:
    no recompile) until unique_overflow clears — each leaf still blends
    once (the reference's fillNodes handles all points in one kernel,
    svo.cu:642-696; here capacity is static so the tail pages through).
    Semantics follow svoFromPointCloud: allocate missing interior tiles
    along each key path, alpha-blend leaf colors, re-mipmap interior
    values along the touched paths.

    dir_keys/dir_nodes + miss_cap > 0 enable the DIRECTORY CACHE fast
    path (lazy frames only: update_interior=False, emit_mips=False):
    last insert's (touched_leaf_keys, touched_leaf_nodes) resolve repeat
    keys without the phase-1 descent; only first-seen keys descend, at
    miss_cap lanes. Falls back to the full descent in one lax.cond when
    a frame's misses exceed miss_cap. dir_vals (the keys' post-blend
    values = touched_leaf_vals) additionally skips the U-wide pool-value
    gather for hits; dir_aux is an OPAQUE i32 per-row payload carried
    back for hits as stats.hit_aux (the pipeline stores registry
    positions there so the leaf-registry refresh skips its node2pos
    gather too). Bit-identical to the uncached insert as long as the
    directory is CURRENT — callers must clear it whenever keys, node
    indices, registry positions, or leaf values change under the map
    (reroot, growth across a prealloc boundary, tiering spill/restore,
    registry rebuilds).
    """
    cap = pool.capacity
    U = unique_cap

    keys, key_valid = morton.encode(points, pool.center, pool.half_size, depth)
    if valid is not None:
        key_valid = key_valid & valid
    if min_key is not None:
        key_valid = key_valid & (keys > min_key)
    keys = jnp.where(key_valid, keys, morton.INVALID_KEY)

    # One sort carries the color payload packed into an int32 (colors are
    # blended at 8-bit anyway, svo.cu:318-332).
    c8 = jnp.clip(jnp.round(colors * 255.0), 0, 255).astype(jnp.int32)
    packed = c8[:, 0] | (c8[:, 1] << 8) | (c8[:, 2] << 16)
    skeys, spacked = jax.lax.sort_key_val(keys, packed)
    svalid = skeys != morton.INVALID_KEY
    sc = jnp.stack(
        [spacked & 0xFF, (spacked >> 8) & 0xFF, (spacked >> 16) & 0xFF],
        axis=-1)  # i32 — _unique_compact accumulates exactly in int32

    ukeys, mean_rgb, ulive, u_count = _unique_compact(skeys, svalid, sc, U)

    value = pool.value

    use_cache = dir_keys is not None and miss_cap > 0
    if use_cache and (update_interior or emit_mips):
        raise ValueError(
            "the directory cache serves only the lazy leaf path: the "
            "interior mipmap / dense-mip emission need full per-level "
            "paths, which cache hits skip (pass dir_keys=None on eager "
            "frames)")

    if use_cache:
        # --- Directory fast path: last frame's key -> (leaf node, value,
        # registry position) map answers most uniques without the phase-1
        # dependent-gather descent, the U-wide pool-value gather, and (via
        # hit_aux) the registry's node2pos gather — the three biggest
        # U-sized random-access terms of a full-res 1 cm frame. Only the
        # MISSES — first-seen-this-frame keys, typically a few percent
        # under frame-to-frame camera motion — descend and gather, at
        # miss_cap lanes. The cache holds only keys whose leaf node
        # EXISTED after last frame's insert, so a hit needs no allocation
        # and its reached flag is True by construction; the cached value
        # stays current because every other leaf writer either touches
        # disjoint keys (remainder pages: keys > last_key; tiering restore:
        # overwrite=False skips non-EMPTY leaves, and cached keys are
        # never EMPTY) or resets the cache (pool rebuilds) — see
        # pipeline.reset_dircache.
        #
        # Miss OVERFLOW defers instead of branching: when a frame has more
        # than miss_cap first-seen keys (a cold or just-invalidated cache,
        # a fast pan), every unique at or past the first DROPPED miss —
        # uniques are processed in sorted key order — is deferred to the
        # existing unique-cap paging machinery (unique_overflow +
        # last_key), whose pages re-insert uncached. A lax.cond fallback
        # was measured and REJECTED: the conditional walled off XLA fusion
        # and its branch ran as ~38 unfused kernels = 19 ms at the ~0.5 ms
        # flat kernel cost, erasing the cache's entire win. ---
        j = _dir_lookup(dir_keys, ukeys)
        js = jnp.clip(j, 0, dir_keys.shape[0] - 1)
        hit = ulive & (j >= 0)
        if dir_vals is not None and dir_aux is not None:
            # one (C,3) row gather instead of three table gathers
            dir_t = jnp.stack(
                [dir_nodes,
                 jax.lax.bitcast_convert_type(dir_vals, jnp.int32),
                 dir_aux], axis=1)
            rows_t = dir_t[js]
            hit_nodes = jnp.where(hit, rows_t[:, 0], 0)
            hit_vals = jax.lax.bitcast_convert_type(rows_t[:, 1],
                                                    jnp.uint32)
            hit_aux = jnp.where(hit, rows_t[:, 2], -1)
        else:
            hit_nodes = jnp.where(hit, dir_nodes[js], 0)
            hit_vals = None
            hit_aux = jnp.full((U,), -1, jnp.int32)

        miss = ulive & ~hit
        miss_ranks, m_total = compaction.exclusive_ranks(miss)
        m_over = m_total > miss_cap
        # first dropped miss's row: every unique from there on (hits
        # included — key order must stay contiguous for the pager) defers
        first_drop = jnp.min(jnp.where(miss & (miss_ranks >= miss_cap),
                                       jnp.arange(U, dtype=jnp.int32), U))
        keep = ulive & (jnp.arange(U) < first_drop)
        hit = hit & keep
        miss = miss & keep

        mrow = jnp.arange(miss_cap, dtype=jnp.int32)
        (mkeys, mpos), m_count = compaction.compact_multi(
            [ukeys, jnp.arange(U, dtype=jnp.int32)], miss, miss_cap,
            fill=0)
        mkeys = jnp.where(mrow < m_count, mkeys, morton.INVALID_KEY)
        mlive = mrow < m_count

        o = _descend_alloc(pool.child, pool.n_nodes, mkeys, mlive,
                           cap=cap, depth=depth,
                           shallow_level=shallow_level)
        child, n_nodes = o.child, o.n_nodes
        total_new, shallow = o.n_new_tiles, o.shallow_allocs
        scat = jnp.where(mlive, mpos, U)
        # -1 = unreached sentinel folds (cur, reached) into ONE scatter
        mcur = jnp.where(o.reached[-1], o.paths[-1], -1)
        cur = jnp.where(hit, hit_nodes, -1).at[scat].set(mcur, mode="drop")
        reached = cur >= 0
        cur = jnp.maximum(cur, 0)
        if hit_vals is not None:
            # hits read their old value from the directory; only the
            # misses touch the pool-value table, at miss_cap lanes
            om = value[jnp.clip(o.paths[-1], 0, cap - 1)]
            old = jnp.where(hit, hit_vals,
                            jnp.uint32(packing.EMPTY_VALUE))
            old = old.at[scat].set(om, mode="drop")
        else:
            old = value[cur]
        # ulive drives the blend/touched masks below: deferred rows must
        # not blend this pass (the pager re-inserts them)
        ulive = keep
        paths = None
        reached_per_level = None
    else:
        out = _descend_alloc(pool.child, pool.n_nodes, ukeys, ulive,
                             cap=cap, depth=depth,
                             shallow_level=shallow_level)
        child, n_nodes = out.child, out.n_nodes
        total_new, shallow = out.n_new_tiles, out.shallow_allocs
        paths = list(out.paths)
        reached_per_level = list(out.reached)
        cur = paths[-1]
        reached = reached_per_level[-1]
        old = value[cur]
        hit_aux = jnp.full((U,), -1, jnp.int32)

    # --- Leaf blend (uniques are already deduplicated). ---
    leaf_ok = ulive & reached
    blended = packing.blend_value(old, mean_rgb)
    leaf_idx = jnp.where(leaf_ok, cur, cap)
    value = value.at[leaf_idx].set(blended, mode="drop")

    if emit_mips:
        from octree_slam_tpu.map import mips as mips_mod
        mip_invalid = jnp.int32(mips_mod.total_cells(depth))
        mip_idx_parts = [jnp.where(
            leaf_ok, mips_mod.flat_index(ukeys, depth, depth), mip_invalid)]
        mip_val_parts = [blended]

    # First-ever-written leaves (old alpha == exactly the init value 127 and
    # untouched rgb) — the renderer's persistent voxel list appends these.
    is_new_leaf = leaf_ok & (old == packing.EMPTY_VALUE)
    nl_ranks, nl_count = compaction.exclusive_ranks(is_new_leaf)
    nl_idx = jnp.where(is_new_leaf, nl_ranks, U)
    new_leaf_keys = jnp.full((U,), -1, jnp.int32)
    new_leaf_keys = new_leaf_keys.at[nl_idx].set(ukeys, mode="drop")
    new_leaf_nodes = jnp.zeros((U,), jnp.int32)
    new_leaf_nodes = new_leaf_nodes.at[nl_idx].set(cur, mode="drop")

    # --- Bottom-up mipmap over unique parents, shrinking caps per level.
    # Deepest parents first so shallower averages see refreshed children.
    # With update_interior=False the whole refresh is DEFERRED: interior
    # values (and their dense-mip mirror entries) go stale until
    # refresh_interior runs — a ~7 ms/frame saving for consumers that only
    # read leaves (splat, slab cone); see pipeline.SLAMState.interior_stale.
    for level in (range(depth - 1, 0, -1) if update_interior else ()):
        prefix = morton.level_prefix(ukeys, depth, level)
        node = paths[level - 1]  # ancestor at `level` per unique-leaf row
        # the level-`level` node has a tile on this row's path iff the path
        # reached level+1 (no gather needed: known from allocation)
        mask = (compaction.first_occurrence(prefix, ulive)
                & reached_per_level[level])
        # distinct parents at `level` <= min(U uniques, 8^level cells):
        # this bound is exact, so compaction can NEVER drop a touched
        # parent (a fixed shrink schedule here silently left interior
        # values and the distance-field occupancy stale for spread-out
        # inserts)
        lcap = min(U, 8 ** level)
        if lcap >= U:
            # compaction wouldn't shrink anything: work on masked rows
            cn = jnp.where(mask, node, cap)
            cpfx = jnp.where(mask, prefix, 0)
        else:
            (cn, cpfx), _ = compaction.compact_multi(
                [jnp.where(mask, node, cap), jnp.where(mask, prefix, 0)],
                mask, lcap, fill=cap)
        clive = cn < cap

        tile = jnp.where(clive, child[jnp.minimum(cn, cap - 1)], 0)
        # tiles are 8-aligned, so the 8 children are one contiguous row of
        # the tile-major view — a row gather (32B blocks) instead of 8x
        # scalar gathers (measured 3.7ms -> sub-ms for the deepest level)
        kid_val = value.reshape(cap // 8, 8)[
            jnp.minimum(tile >> 3, cap // 8 - 1)]
        r, g, b, a = packing.unpack_rgba8(kid_val)
        occ = (a > packing.OCCUPIED_ALPHA).astype(jnp.float32)
        n_occ = jnp.sum(occ, axis=1)
        safe = jnp.maximum(n_occ, 1.0)
        avg_r = jnp.sum(r.astype(jnp.float32) * occ, axis=1) / safe
        avg_g = jnp.sum(g.astype(jnp.float32) * occ, axis=1) / safe
        avg_b = jnp.sum(b.astype(jnp.float32) * occ, axis=1) / safe
        max_a = jnp.max(a, axis=1)
        packed_v = packing.pack_rgba8(
            avg_r.astype(jnp.int32), avg_g.astype(jnp.int32),
            avg_b.astype(jnp.int32), max_a)
        widx = jnp.where(clive & (tile > 0), cn, cap)
        value = value.at[widx].set(packed_v, mode="drop")
        if emit_mips:
            ok_mip = clive & (tile > 0)
            mip_idx_parts.append(jnp.where(
                ok_mip,
                jnp.int32(mips_mod.level_offset(level)) + cpfx, mip_invalid))
            mip_val_parts.append(packed_v)

    if emit_mips:
        mip_idx = jnp.concatenate(mip_idx_parts)
        mip_val = jnp.concatenate(mip_val_parts)
    else:
        mip_idx = jnp.full((1,), jnp.int32(2**31 - 1), jnp.int32)
        mip_val = jnp.zeros((1,), jnp.uint32)

    unique_overflow = u_count > U
    last_idx = jnp.minimum(u_count, U) - 1
    if use_cache:
        # miss overflow defers uniques [first_drop:] to the pager: report
        # it as a unique overflow whose resume cursor is the last KEPT key
        # (first_drop >= miss_cap >= 1, so the cursor always advances)
        unique_overflow = unique_overflow | m_over
        last_idx = jnp.where(m_over, first_drop - 1, last_idx)
    # the pool flag records the irrecoverable condition (node capacity);
    # unique overflow is recoverable via the min_key remainder pass and
    # only reported in the stats
    pool_overflowed = pool.overflowed | (n_nodes + 8 > cap)
    overflowed = pool_overflowed | unique_overflow
    last_key = ukeys[jnp.clip(last_idx, 0, U - 1)]
    new_pool = pool._replace(child=child, value=value, n_nodes=n_nodes,
                             overflowed=pool_overflowed)
    stats = InsertStats(
        new_nodes=8 * total_new,
        n_valid=jnp.sum(svalid.astype(jnp.int32)),
        n_unique=jnp.minimum(u_count, U),
        overflowed=overflowed,
        unique_overflow=unique_overflow,
        last_key=last_key,
        shallow_allocs=shallow,
        dir_hits=(jnp.sum(hit.astype(jnp.int32)) if use_cache
                  else jnp.int32(-1)),
        hit_aux=hit_aux,
        new_leaf_keys=new_leaf_keys,
        new_leaf_nodes=new_leaf_nodes,
        new_leaf_count=jnp.minimum(nl_count, U),
        touched_leaf_nodes=jnp.where(leaf_ok, cur, -1),
        touched_leaf_keys=jnp.where(leaf_ok, ukeys, morton.INVALID_KEY),
        touched_leaf_vals=blended,
        sat_transition=(leaf_ok
                        & (packing.alpha_of(old) < 255)
                        & (packing.alpha_of(blended) == 255)),
        mip_idx=mip_idx,
        mip_val=mip_val,
    )
    return new_pool, stats


@functools.partial(
    jax.jit,
    static_argnames=("depth", "unique_cap", "shallow_level", "overwrite"))
def insert_exact(pool: SVONodePool, keys: jnp.ndarray, values: jnp.ndarray,
                 *, depth: int, unique_cap: int = 1 << 16,
                 min_key: jnp.ndarray | None = None,
                 shallow_level: int = 6,
                 overwrite: bool = True) -> Tuple[SVONodePool, InsertStats]:
    """Bulk value-exact leaf write: the restore half of host tiering.

    Unlike `insert` (the sensor-fusion path: segment means + alpha blend +
    interior mipmap, fillNodes svo.cu:291-382), this writes each unique
    leaf's packed RGBA8 word VERBATIM — the device half of the reference's
    pushToGPU re-serialization (octree.cpp:41-79, addToLinearTree :130-152),
    which likewise transfers stored node words rather than re-observing
    them. Missing interior tiles are allocated exactly as in `insert`.
    Interior values are NOT recomputed here: callers run `refresh_interior`
    (bit-identical to the eager mipmap) or inherit the lazy-interior stale
    flag protocol.

    keys: i32[N] leaf morton keys at `depth` (< 0 or INVALID_KEY = skip);
    values: u32[N] packed RGBA8. Duplicate keys take the value sorted
    first. Frames with more than `unique_cap` distinct keys page EXACTLY
    like insert: re-run with min_key = stats.last_key until
    stats.unique_overflow clears.

    overwrite=False writes only leaves still at the fresh-node word
    (EMPTY_VALUE): a restore of an archived region never clobbers a leaf
    the camera re-observed while the region was spilled — live data is
    newer than the archive.
    """
    cap = pool.capacity
    U = unique_cap
    keys = jnp.asarray(keys, jnp.int32)
    values = jnp.asarray(values, jnp.uint32)
    key_valid = (keys >= 0) & (keys != morton.INVALID_KEY)
    if min_key is not None:
        key_valid = key_valid & (keys > min_key)
    k = jnp.where(key_valid, keys, morton.INVALID_KEY)
    skeys, svals = jax.lax.sort_key_val(k, values)
    svalid = skeys != morton.INVALID_KEY
    first = compaction.first_occurrence(skeys, svalid)
    ranks, u_count = compaction.exclusive_ranks(first)
    idx_u = jnp.where(first, ranks, U)
    ukeys = jnp.full((U,), morton.INVALID_KEY, jnp.int32)
    ukeys = ukeys.at[idx_u].set(skeys, mode="drop")
    uvals = jnp.zeros((U,), jnp.uint32).at[idx_u].set(svals, mode="drop")
    ulive = (jnp.arange(U) < jnp.minimum(u_count, U)) \
        & (ukeys != morton.INVALID_KEY)

    out = _descend_alloc(pool.child, pool.n_nodes, ukeys, ulive,
                         cap=cap, depth=depth, shallow_level=shallow_level)
    cur = out.paths[-1]
    leaf_ok = ulive & out.reached[-1]
    old = pool.value[cur]
    is_new_leaf = leaf_ok & (old == packing.EMPTY_VALUE)
    write_ok = leaf_ok if overwrite else is_new_leaf
    value = pool.value.at[jnp.where(write_ok, cur, cap)].set(
        uvals, mode="drop")
    final_vals = jnp.where(write_ok, uvals, old)
    nl_ranks, nl_count = compaction.exclusive_ranks(is_new_leaf)
    nl_idx = jnp.where(is_new_leaf, nl_ranks, U)
    new_leaf_keys = jnp.full((U,), -1, jnp.int32)
    new_leaf_keys = new_leaf_keys.at[nl_idx].set(ukeys, mode="drop")
    new_leaf_nodes = jnp.zeros((U,), jnp.int32)
    new_leaf_nodes = new_leaf_nodes.at[nl_idx].set(cur, mode="drop")

    unique_overflow = u_count > U
    pool_overflowed = pool.overflowed | (out.n_nodes + 8 > cap)
    last_key = ukeys[jnp.clip(jnp.minimum(u_count, U) - 1, 0, U - 1)]
    new_pool = pool._replace(child=out.child, value=value,
                             n_nodes=out.n_nodes,
                             overflowed=pool_overflowed)
    stats = InsertStats(
        new_nodes=8 * out.n_new_tiles,
        n_valid=jnp.sum(key_valid.astype(jnp.int32)),
        n_unique=jnp.minimum(u_count, U),
        overflowed=pool_overflowed | unique_overflow,
        unique_overflow=unique_overflow,
        last_key=last_key,
        shallow_allocs=out.shallow_allocs,
        dir_hits=jnp.int32(-1),
        hit_aux=jnp.full((U,), -1, jnp.int32),
        new_leaf_keys=new_leaf_keys,
        new_leaf_nodes=new_leaf_nodes,
        new_leaf_count=jnp.minimum(nl_count, U),
        touched_leaf_nodes=jnp.where(leaf_ok, cur, -1),
        touched_leaf_keys=jnp.where(leaf_ok, ukeys, morton.INVALID_KEY),
        touched_leaf_vals=final_vals,
        # bulk verbatim writes (tiering restore, rebuilds) don't maintain
        # the gate mask incrementally: pool rebuilds go through
        # tiering._rebuild_derived, which reconstructs it from the
        # registry (pipeline.rebuild_sat_mask)
        sat_transition=jnp.zeros((U,), bool),
        mip_idx=jnp.full((1,), jnp.int32(2**31 - 1), jnp.int32),
        mip_val=jnp.zeros((1,), jnp.uint32),
    )
    return new_pool, stats


@functools.partial(jax.jit, static_argnames=("depth",))
def tile_topology(pool: SVONodePool, *, depth: int):
    """Reconstruct per-tile (parent node, level, morton key) from the
    child-pointer array alone — no bookkeeping is stored in the pool.

    parent[t] = the node whose child pointer is tile t (one inverse
    scatter); levels and keys then propagate root-down in depth-1 fused
    gather rounds: level(t) = level(parent's tile) + 1 and
    key(t) = key(parent's tile) << 3 | (parent & 7) (a node's octant is
    its index within its 8-aligned tile). Tile 0 is the root tile
    (level-1 nodes, key prefix 0). Unallocated tiles keep level 0.
    Returns (parent i32[cap/8], level i32[cap/8], key i32[cap/8])."""
    cap = pool.capacity
    nt = cap // 8
    idx = jnp.where(pool.child > 0, pool.child >> 3, nt)
    parent = jnp.full((nt,), -1, jnp.int32).at[idx].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")
    level = jnp.zeros((nt,), jnp.int32).at[0].set(1)
    key = jnp.zeros((nt,), jnp.int32)
    for _ in range(depth - 1):
        pt = jnp.clip(parent, 0, cap - 1) >> 3
        pl = level[pt]
        grow = (level == 0) & (parent >= 0) & (pl > 0)
        level = jnp.where(grow, pl + 1, level)
        key = jnp.where(grow, (key[pt] << 3) | (parent & 7), key)
    return parent, level, key


@functools.partial(jax.jit, static_argnames=("depth",))
def refresh_interior(pool: SVONodePool, *, depth: int) -> SVONodePool:
    """Recompute EVERY interior node value bottom-up from the current
    leaves (averageChildren semantics, svo.cu:417-439: mean rgb over
    occupied children, max alpha) — the one-shot companion of
    insert(update_interior=False).

    Works on whole tiles: each level pass is one row-reduce over the
    tile-major value view plus one scatter to the parents of that level's
    tiles — no per-unique compaction, O(depth) kernels over the pool."""
    cap = pool.capacity
    nt = cap // 8
    parent, level, _ = tile_topology(pool, depth=depth)
    value = pool.value
    for lvl in range(depth, 1, -1):
        kid = value.reshape(nt, 8)
        r, g, b, a = packing.unpack_rgba8(kid)
        occ = (a > packing.OCCUPIED_ALPHA).astype(jnp.float32)
        n_occ = jnp.sum(occ, axis=1)
        safe = jnp.maximum(n_occ, 1.0)
        packed = packing.pack_rgba8(
            (jnp.sum(r.astype(jnp.float32) * occ, 1) / safe).astype(
                jnp.int32),
            (jnp.sum(g.astype(jnp.float32) * occ, 1) / safe).astype(
                jnp.int32),
            (jnp.sum(b.astype(jnp.float32) * occ, 1) / safe).astype(
                jnp.int32),
            jnp.max(a, axis=1))
        sel = (level == lvl) & (parent >= 0)
        value = value.at[jnp.where(sel, parent, cap)].set(packed,
                                                          mode="drop")
    return pool._replace(value=value)


def _reroot_dense_map(pre: int):
    """Host-side index maps for one volume doubling (numpy constants).

    The reference's Octree::expand wraps child i in a new parent at
    oppositeNode(i) = ~i (octree.cpp:184-206, svo.h:20-23): an old cell
    with morton key [i, rest...] at level l becomes [i, ~i, rest...] at
    level l+1. Returns (src i64[dense], valid bool[dense]) where the new
    dense node at flat index d takes its value from old dense index src[d].
    Level-1 entries are invalid (recomputed as a mipmap afterwards)."""
    import numpy as np
    dense = _LEVEL_BASE[pre + 1]
    src = np.full((dense,), 0, np.int64)
    valid = np.zeros((dense,), bool)
    for l in range(2, pre + 1):
        base = _LEVEL_BASE[l]
        m = np.arange(_LEVEL_BASE[l + 1] - base, dtype=np.int64)
        s = 3 * (l - 2)
        i1 = m >> (s + 3)
        i2 = (m >> s) & 7
        ok = i2 == (i1 ^ 7)
        m_old = (i1 << s) | (m & ((1 << s) - 1))
        src[base + m] = np.where(ok, _LEVEL_BASE[l - 1] + m_old, 0)
        valid[base + m] = ok
    return src, valid


@jax.jit
def reroot_double(pool: SVONodePool) -> SVONodePool:
    """Double the volume (half_size x2, depth intent +1) preserving every
    node value and child pointer — the TPU-native Octree::expand
    (octree.cpp:184-206, expandBySize :362-378).

    Because only the top `pre` levels are dense-preallocated and all
    deeper tiles are addressed by absolute pool index, ONE doubling needs:
      * a permutation of the dense shallow values ([i] -> [i, ~i] keys);
      * one "bridge" block of 8^(pre-1) tiles holding what used to be the
        dense level-`pre` nodes (values + their child pointers, copied
        verbatim — the pointers still address the same unmoved tiles);
      * a fresh level-1 mipmap.
    Every node outside the dense region keeps its index: no extraction,
    no re-insertion, no alpha/color loss (contrast with the round-1
    extract+reinsert re-root, VERDICT.md round 1 item 2).

    Requires pool capacity headroom of 8^pre nodes; sets `overflowed`
    (and changes nothing else) when it does not fit.
    """
    cap = pool.capacity
    pre = prealloc_levels(cap)
    dense = _LEVEL_BASE[pre + 1]
    n_bridge = _LEVEL_BASE[pre + 1] - _LEVEL_BASE[pre]  # 8^pre nodes
    fits = pool.n_nodes + n_bridge <= cap

    import numpy as np
    src_np, valid_np = _reroot_dense_map(pre)
    src = jnp.asarray(src_np)
    valid = jnp.asarray(valid_np)

    # new dense values: permuted old values, EMPTY where newly exposed
    new_dense = jnp.where(valid, pool.value[src],
                          jnp.uint32(packing.EMPTY_VALUE))

    # level-1 mipmap over the new level-2 values (tiny, fused)
    l2 = new_dense[_LEVEL_BASE[2]:_LEVEL_BASE[3]].reshape(8, 8)
    r, g, b, a = packing.unpack_rgba8(l2)
    occ = (a > packing.OCCUPIED_ALPHA).astype(jnp.float32)
    n_occ = jnp.maximum(jnp.sum(occ, axis=1), 1.0)
    l1 = packing.pack_rgba8(
        (jnp.sum(r.astype(jnp.float32) * occ, 1) / n_occ).astype(jnp.int32),
        (jnp.sum(g.astype(jnp.float32) * occ, 1) / n_occ).astype(jnp.int32),
        (jnp.sum(b.astype(jnp.float32) * occ, 1) / n_occ).astype(jnp.int32),
        jnp.max(a, axis=1))
    new_dense = jax.lax.dynamic_update_slice(new_dense, l1, (0,))

    # bridge block: verbatim copy of the old dense level-`pre` rows
    old_lp_val = pool.value[_LEVEL_BASE[pre]:_LEVEL_BASE[pre + 1]]
    old_lp_child = pool.child[_LEVEL_BASE[pre]:_LEVEL_BASE[pre + 1]]
    base = pool.n_nodes
    br_idx = jnp.where(fits, base + jnp.arange(n_bridge, dtype=jnp.int32),
                       cap)
    value = pool.value.at[br_idx].set(old_lp_val, mode="drop")
    child = pool.child.at[br_idx].set(old_lp_child, mode="drop")

    # dense level-`pre` child pointers: cell m = [i1, ~i1, p_rest] covers
    # old level-(pre-1) cell p = [i1, p_rest] -> bridge tile base + 8p
    m = jnp.arange(n_bridge, dtype=jnp.int32)
    s = 3 * (pre - 2)
    i1 = m >> (s + 3)
    i2 = (m >> s) & 7
    covered = i2 == (i1 ^ 7)
    p = (i1 << s) | (m & ((1 << s) - 1))
    lp_child = jnp.where(covered & fits, base + 8 * p, 0)

    value = jax.lax.dynamic_update_slice(value, new_dense, (0,))
    child = jax.lax.dynamic_update_slice(child, lp_child,
                                         (_LEVEL_BASE[pre],))

    return pool._replace(
        child=jnp.where(fits, child, pool.child),
        value=jnp.where(fits, value, pool.value),
        n_nodes=jnp.where(fits, pool.n_nodes + n_bridge, pool.n_nodes),
        half_size=jnp.where(fits, pool.half_size * 2.0, pool.half_size),
        overflowed=pool.overflowed | ~fits,
    )


def grow_capacity(pool: SVONodePool, new_capacity: int) -> SVONodePool:
    """Reallocate the pool at a larger static capacity (host-level; changes
    array shapes, so jitted consumers recompile — the per-insert
    cudaMalloc/memcpy/free of the reference, svo.cu:609-614, amortized to
    once per doubling). Child pointers are absolute indices and the dense
    prealloc layout depends only on prealloc_levels(capacity), so a plain
    pad preserves the whole structure."""
    cap = pool.capacity
    assert new_capacity >= cap and new_capacity % 8 == 0
    assert prealloc_levels(new_capacity) == prealloc_levels(cap), \
        "growth across a prealloc-level boundary needs a rebuild " \
        "(pipeline.grow_state and Octree.grow_capacity handle this via " \
        "insert_exact)"
    pad = new_capacity - cap
    if pad == 0:
        return pool
    return pool._replace(
        child=jnp.concatenate([pool.child, jnp.zeros((pad,), jnp.int32)]),
        value=jnp.concatenate(
            [pool.value,
             jnp.full((pad,), packing.EMPTY_VALUE, jnp.uint32)]),
        overflowed=jnp.bool_(False),
    )


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


def extract_all_leaves(pool: SVONodePool, *, depth: int,
                       start_capacity: int) -> Tuple[ExtractedVoxels, int]:
    """Host-level extraction that doubles the static buffer until every
    occupied leaf fits. Returns (extraction, capacity used) — the shared
    loop behind registry rebuilds, tiering snapshots, and boundary growth
    (each doubling is a recompile, so callers pass a likely-enough start)."""
    cap = max(start_capacity, 8)  # extraction buffers are 8-tile sized
    while True:
        ex = extract_voxels(pool, depth=depth, capacity=cap)
        if int(ex.count) < cap:
            return ex, cap
        cap *= 2


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
