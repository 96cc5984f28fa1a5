"""Multi-chip execution: pixel-sharded SLAM step over a device mesh.

The reference is strictly single-GPU (SURVEY.md section 2.3: no comm
libraries anywhere). The TPU rebuild is designed mesh-ready from the start:

  * The per-frame compute is embarrassingly pixel-parallel everywhere except
    two global reductions (the 6x6 ICP normal equations and the map insert's
    key sort). We shard the image rows across the mesh ("sp"-style sequence
    parallelism where the 'sequence' is pixels); XLA's SPMD partitioner
    inserts the halo exchanges for the window ops (bilateral/normals) and
    psum-style reductions for the ICP sums over ICI.
  * An explicit shard_map variant of the ICP reduction (`icp_psum`) shows
    the collective contract directly: per-device partial J^T J / J^T r,
    one psum of 42 floats over ICI per Gauss-Newton iteration.
  * The map (node pool) stays replicated: insertion is deterministic, so
    every device computes the identical pool. Sharding the pool by Morton
    range is the planned scale-out for maps exceeding one chip's HBM
    (SURVEY.md section 5 long-context analog).
"""

from __future__ import annotations


from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core.types import Frame
from octree_slam_tpu.map import svo
from octree_slam_tpu.map.svo import SVONodePool
from octree_slam_tpu.render.splat import LeafList, append_new_leaves, \
    create_leaf_list, leaf_list_from_extraction


def make_mesh(n_devices: int | None = None, axis_name: str = "px") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis_name,))


def frame_sharding(mesh: Mesh, axis_name: str = "px"):
    """Frame pytree sharding: depth/color split across image rows."""
    return Frame(
        depth=NamedSharding(mesh, P(axis_name, None)),
        color=NamedSharding(mesh, P(axis_name, None, None)),
        timestamp=NamedSharding(mesh, P()),
    )


def replicated(mesh: Mesh, tree):
    """Fully-replicated sharding pytree matching `tree`'s structure."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: s, tree)


def sharded_step(cfg: SLAMConfig, mesh: Mesh, axis_name: str = "px"):
    """jit the full SLAM step with the frame row-sharded over the mesh and
    the state replicated. XLA partitions the pixel-parallel work and inserts
    ICI collectives at the reductions."""

    def fn(state, frame):
        return pipeline.step(state, frame, cfg)

    return jax.jit(
        fn,
        in_shardings=(replicated(mesh, pipeline.init_state(cfg)),
                      frame_sharding(mesh, axis_name)),
    )


def splat_sharded(leaf_vals, leaf_keys, center, half_size,
                  world_T_cam, fx, fy, cfg: SLAMConfig, mesh: Mesh,
                  axis_name: str = "map"):
    """Map-sharded splat rendering: the persistent leaf registry is sharded
    over the mesh (model-parallel axis for the map), each device z-buffers
    its own leaf shard, and ONE pmin over ICI composites the packed
    depth<<16|RGB565 words into the exact global z-resolve — a 1.2 MB
    all-reduce per frame at 640x480.

    This is the scale-out path for maps beyond one chip's HBM: leaves (and
    in a full deployment the node pool, sharded by Morton range) never
    leave their device; only the screen-sized buffer crosses ICI.
    Returns the finished f32[H, W, 4] framebuffer, replicated.
    """
    from jax import shard_map
    from octree_slam_tpu.render import splat as sp

    def local(vals_s, keys_s, c_s, h_s, T_s):
        # accept both a flat registry split across devices ([LC/M]) and a
        # stacked per-shard registry ([1, LC] from ShardedMap)
        vals_s = vals_s.reshape(-1)
        keys_s = keys_s.reshape(-1)
        live = keys_s >= 0
        buf = sp.splat_zbuffer(vals_s, keys_s, live, c_s, h_s,
                               T_s, fx, fy, width=cfg.width,
                               height=cfg.height, depth=cfg.max_depth,
                               max_range=cfg.max_range)
        buf = jax.lax.pmin(buf, axis_name)
        return sp.finish_zbuffer(buf, width=cfg.width, height=cfg.height)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(), P()),
        out_specs=P(),
    )(leaf_vals, leaf_keys, center, half_size, world_T_cam)


class ShardedMap(NamedTuple):
    """Morton-range-sharded map state: every array has a leading mesh-axis
    dimension; device d holds pool/leaf shard d. Device d owns the
    CONTIGUOUS morton key range [bounds[d], bounds[d+1]) in units of
    level-`cfg.map_split_level` cells (Morton keys are level-major, so a
    cell range is a contiguous key range — the "bricks sharded by Morton
    range" scale-out named in ARCHITECTURE.md: each shard's HBM holds a
    tunable fraction of the world; `rebalance_sharded` re-cuts the
    boundaries to equalize observed leaf load)."""

    pool: SVONodePool   # stacked [M, ...]
    leaves: LeafList    # stacked [M, ...]
    bounds: jnp.ndarray  # i32[M, M+1] range boundaries, identical rows
                         # (each shard carries a full copy)


def default_bounds(cfg: SLAMConfig, m: int):
    """Equal key-space split of the 8^split_level cells over m shards
    (numpy i32[m+1]). With split_level=1 and m=8 this is exactly the
    octant-per-device partition."""
    import numpy as np
    cells = 1 << (3 * cfg.map_split_level)
    assert m <= cells, \
        f"{m} shards need map_split_level >= {max(1, (m - 1).bit_length() + 2) // 3}"
    return np.round(np.arange(m + 1) * cells / m).astype(np.int32)


def make_sharded_map(cfg: SLAMConfig, mesh: Mesh, map_center=(0.0, 0.0, 0.0),
                     axis_name: str = "map", bounds=None) -> ShardedMap:
    """M empty per-device pools/registries, placed shard-per-device."""
    import numpy as np
    m = mesh.shape[axis_name]
    half = cfg.voxel_resolution * (2 ** (cfg.max_depth - 1))
    pool = svo.create(cfg.node_capacity,
                      jnp.asarray(map_center, jnp.float32),
                      jnp.float32(half))
    leaves = create_leaf_list(cfg.leaf_capacity, cfg.node_capacity)
    if bounds is None:
        bounds = default_bounds(cfg, m)
    bounds = np.asarray(bounds, np.int32)
    assert bounds.shape == (m + 1,)

    def stack(x):
        return jnp.asarray(np.broadcast_to(np.asarray(x)[None],
                                           (m,) + np.asarray(x).shape))

    smap = ShardedMap(pool=jax.tree_util.tree_map(stack, pool),
                      leaves=jax.tree_util.tree_map(stack, leaves),
                      bounds=stack(bounds))
    shardings = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1)))),
        smap)
    return jax.device_put(smap, shardings)


def insert_sharded(smap: ShardedMap, points, colors, cfg: SLAMConfig,
                   mesh: Mesh, axis_name: str = "map"
                   ) -> Tuple[ShardedMap, jnp.ndarray]:
    """Morton-range-sharded map insert: every device sees the (replicated)
    frame's world points, keeps exactly those in its own key range (keys
    arrive pre-sorted by construction of the range split — the
    shard-local-filter routing; no all_to_all needed when the frame is
    replicated), and runs the standard batched insert into its LOCAL pool.
    Shards are disjoint by key, so the union of shard contents is
    bit-identical to the replicated single-pool insert
    (tests/test_parallel.py proves it on the 8-device mesh).

    Returns (updated ShardedMap, global unique count — one psum over ICI).
    """
    from jax import shard_map

    from octree_slam_tpu.map import morton

    L = cfg.map_split_level

    def local(pool_s, leaves_s, bounds_s, pts, cols):
        pool = SVONodePool(*(x[0] for x in pool_s))
        leaves = LeafList(*(x[0] for x in leaves_s))
        b = bounds_s[0]
        d = jax.lax.axis_index(axis_name)
        # shard-range routing: the level-L prefix of a point's morton key
        # (the octant chain is prefix-consistent, so encoding at depth L
        # IS the full key's level-L prefix; computeKey octant test,
        # svo.cu:50-57). Non-finite points encode to INVALID_KEY, which
        # exceeds every boundary — owned by no shard (svo.insert would
        # drop them anyway).
        prefix, _ = morton.encode(pts, pool.center, pool.half_size, L)
        mine = (prefix >= b[d]) & (prefix < b[d + 1])
        pool, stats = svo.insert(pool, pts, cols, valid=mine,
                                 depth=cfg.max_depth,
                                 unique_cap=cfg.insert_unique_cap)
        leaves = append_new_leaves(leaves, stats)

        # Unique-cap remainder, per shard: a frame concentrated in one
        # device's key range can exceed insert_unique_cap; page through
        # the rest in sorted key order (same lossless protocol as
        # pipeline.step). Trip counts differ per device — fine, the only
        # collective (psum) is after the loop.
        def _more(c):
            return c[0]

        def _page(c):
            _, lk, p, lv, n = c
            p, st = svo.insert(p, pts, cols, valid=mine,
                               depth=cfg.max_depth,
                               unique_cap=cfg.insert_unique_cap,
                               min_key=lk)
            return (st.unique_overflow, st.last_key, p,
                    append_new_leaves(lv, st), n + st.n_unique)

        _, _, pool, leaves, n_unique = jax.lax.while_loop(
            _more, _page, (stats.unique_overflow, stats.last_key, pool,
                           leaves, stats.n_unique))
        total = jax.lax.psum(n_unique, axis_name)
        return (jax.tree_util.tree_map(lambda x: x[None], pool),
                jax.tree_util.tree_map(lambda x: x[None], leaves),
                total)

    spec_map = jax.tree_util.tree_map(lambda _: P(axis_name), smap.pool), \
        jax.tree_util.tree_map(lambda _: P(axis_name), smap.leaves)
    pool, leaves, total = shard_map(
        local, mesh=mesh,
        in_specs=(spec_map[0], spec_map[1], P(axis_name), P(), P()),
        out_specs=(spec_map[0], spec_map[1], P()),
    )(smap.pool, smap.leaves, smap.bounds, points, colors)
    return ShardedMap(pool=pool, leaves=leaves, bounds=smap.bounds), total


def _exact_rebuild(keys, vals, center, half_size, cfg: SLAMConfig):
    """Build a fresh pool + registry from a (keys, vals) leaf snapshot via
    the value-verbatim insert with unique-cap paging, then refresh
    interiors — the shard-local rebuild shared by boundary growth and
    rebalancing (svo.insert_exact reproduces every value bit-identically).
    keys: i32[N] (< 0 = skip); vals: u32[N]. jit-safe."""
    shallow = max(1, min(cfg.accel_level, cfg.max_depth - 2))
    fresh = svo.create(cfg.node_capacity, center, half_size)
    out = create_leaf_list(cfg.leaf_capacity, cfg.node_capacity)
    fresh, st = svo.insert_exact(
        fresh, keys, vals, depth=cfg.max_depth,
        unique_cap=cfg.insert_unique_cap, shallow_level=shallow,
        overwrite=True)
    out = append_new_leaves(out, st)

    def _more(c):
        return c[0]

    def _page(c):
        _, lk, p, o = c
        p, s2 = svo.insert_exact(
            p, keys, vals, depth=cfg.max_depth,
            unique_cap=cfg.insert_unique_cap,
            shallow_level=shallow, overwrite=True, min_key=lk)
        return (s2.unique_overflow, s2.last_key, p,
                append_new_leaves(o, s2))

    _, _, fresh, out = jax.lax.while_loop(
        _more, _page, (st.unique_overflow, st.last_key, fresh, out))
    fresh = svo.refresh_interior(fresh, depth=cfg.max_depth)
    return fresh, out


def grow_sharded(smap: ShardedMap, cfg: SLAMConfig, mesh: Mesh, *,
                 grow_nodes: bool = True, grow_leaves: bool = False,
                 axis_name: str = "map") -> Tuple[ShardedMap, SLAMConfig]:
    """Double every shard's pool and/or leaf-registry capacity, preserving
    all content — pipeline.grow_state for the Morton-sharded map (shapes
    are uniform across shards, so all grow together). Within a dense-
    prealloc regime the stacked arrays pad in place (child pointers are
    absolute); a doubling that crosses a prealloc boundary rebuilds each
    shard from its own leaf registry via the value-verbatim insert
    (svo.insert_exact, the same machinery as the single-pool rebuild),
    entirely shard-local — no cross-chip traffic."""
    import dataclasses

    from octree_slam_tpu.core import packing

    new_cfg = dataclasses.replace(
        cfg,
        node_capacity=cfg.node_capacity * (2 if grow_nodes else 1),
        leaf_capacity=cfg.leaf_capacity * (2 if grow_leaves else 1))
    m = mesh.shape[axis_name]
    leaves = smap.leaves
    rebuild = grow_nodes and (svo.prealloc_levels(new_cfg.node_capacity)
                              != svo.prealloc_levels(cfg.node_capacity))
    if bool(jnp.any(leaves.overflowed)):
        # An overflowed registry dropped registrations (appends are
        # first-write-only): rebuild every shard's registry from its own
        # POOL by doubling extraction (pipeline.grow_state's overflow
        # path, per shard at host level — growth is rare). All shards
        # must share one static leaf capacity, so size to the largest.
        import dataclasses as _dc
        exs, caps = [], []
        for d in range(m):
            pool_d = jax.tree_util.tree_map(lambda x: x[d], smap.pool)
            # defensive: extraction BFS reads interior occupancy; a
            # caller that bypassed the always-fresh invariant would
            # otherwise lose its unregistered leaves here for good
            pool_d = svo.refresh_interior(pool_d, depth=cfg.max_depth)
            ex, cap = svo.extract_all_leaves(
                pool_d, depth=cfg.max_depth,
                start_capacity=new_cfg.leaf_capacity)
            exs.append((pool_d, ex))
            caps.append(cap)
        final_cap = max(caps)
        new_cfg = _dc.replace(new_cfg, leaf_capacity=final_cap)
        shards = []
        for pool_d, ex in exs:
            if ex.keys.shape[0] != final_cap:
                ex = svo.extract_voxels(pool_d, depth=cfg.max_depth,
                                        capacity=final_cap)
            shards.append(leaf_list_from_extraction(
                ex, pool_d.value, node_capacity=cfg.node_capacity))
        leaves = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *shards)
        smap = ShardedMap(pool=smap.pool, leaves=leaves,
                          bounds=smap.bounds)

    if rebuild:
        from jax import shard_map

        def local(pool_s, leaves_s):
            pool = SVONodePool(*(x[0] for x in pool_s))
            lv = LeafList(*(x[0] for x in leaves_s))
            fresh, out = _exact_rebuild(
                lv.keys, lv.vals, pool.center, pool.half_size, new_cfg)
            return (jax.tree_util.tree_map(lambda x: x[None], fresh),
                    jax.tree_util.tree_map(lambda x: x[None], out))

        specs = (jax.tree_util.tree_map(lambda _: P(axis_name), smap.pool),
                 jax.tree_util.tree_map(lambda _: P(axis_name),
                                        smap.leaves))
        pool, new_leaves = shard_map(
            local, mesh=mesh, in_specs=specs, out_specs=specs,
        )(smap.pool, smap.leaves)
        return ShardedMap(pool=pool, leaves=new_leaves,
                          bounds=smap.bounds), new_cfg

    pool = smap.pool
    if grow_nodes:
        pad = new_cfg.node_capacity - pool.child.shape[1]
        pool = pool._replace(
            child=jnp.concatenate(
                [pool.child, jnp.zeros((m, pad), jnp.int32)], axis=1),
            value=jnp.concatenate(
                [pool.value,
                 jnp.full((m, pad), packing.EMPTY_VALUE, jnp.uint32)],
                axis=1),
            overflowed=jnp.zeros((m,), bool))
    lc_pad = new_cfg.leaf_capacity - leaves.keys.shape[1]
    nc_pad = new_cfg.node_capacity - leaves.node2pos.shape[1]
    new_leaves = LeafList(
        keys=jnp.concatenate(
            [leaves.keys, jnp.full((m, lc_pad), -1, jnp.int32)], axis=1),
        nodes=jnp.concatenate(
            [leaves.nodes, jnp.zeros((m, lc_pad), jnp.int32)], axis=1),
        vals=jnp.concatenate(
            [leaves.vals, jnp.zeros((m, lc_pad), jnp.uint32)], axis=1),
        node2pos=jnp.concatenate(
            [leaves.node2pos, jnp.full((m, nc_pad), -1, jnp.int32)],
            axis=1),
        count=leaves.count,
        overflowed=leaves.overflowed,
    )
    smap2 = ShardedMap(pool=pool, leaves=new_leaves, bounds=smap.bounds)
    shardings = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh,
                                P(axis_name, *([None] * (x.ndim - 1)))),
        smap2)
    return jax.device_put(smap2, shardings), new_cfg


def shard_leaf_counts(smap: ShardedMap):
    """Per-shard live leaf counts (i32[M]) — the load-imbalance metric.
    Registry keys are -1 until appended, so `keys >= 0` counts exactly the
    registered leaves of each shard."""
    return jnp.sum((smap.leaves.keys >= 0).astype(jnp.int32), axis=1)


def balanced_bounds(cell_counts, m: int):
    """Cut the level-L cell space into m contiguous ranges of near-equal
    total count (numpy; greedy cumulative-sum split). cell_counts:
    i64[8^L] leaves per cell. Returns i32[m+1], strictly increasing,
    covering [0, 8^L]. A range is never empty (every shard owns >= 1
    cell) so the partition stays total and disjoint."""
    import numpy as np
    cells = len(cell_counts)
    c = np.concatenate([[0], np.cumsum(cell_counts)])
    total = int(c[-1])
    bounds = [0]
    for d in range(1, m):
        t = total * d / m
        i = int(np.searchsorted(c, t, side="left"))
        i = max(bounds[-1] + 1, min(i, cells - (m - d)))
        bounds.append(i)
    bounds.append(cells)
    return np.asarray(bounds, np.int32)


def rebuild_from_union(smap: ShardedMap, cfg: SLAMConfig, mesh: Mesh,
                       keys_live, vals_live, bounds,
                       axis_name: str = "map") -> ShardedMap:
    """Rebuild EVERY shard from a union (keys, vals) leaf snapshot under
    the given boundaries: each device keeps the snapshot rows in its own
    Morton range and runs the value-verbatim shard-local rebuild
    (_exact_rebuild) — the shared machinery behind rebalance_sharded
    (re-cut bounds) and the sharded tiering spill (unchanged bounds,
    cold rows dropped from the snapshot). Host-level, rare-path."""
    import numpy as np
    from jax import shard_map

    m = mesh.shape[axis_name]
    L = cfg.map_split_level
    keys_live = np.asarray(keys_live, np.int32)
    vals_live = np.asarray(vals_live, np.uint32)

    # static union buffer: every shard gets the full snapshot and keeps
    # its range (same replicated-routing shape as insert_sharded). A
    # pool-backed snapshot can exceed the registries' total capacity
    # (that is what overflow means) — pad up in cap_u quanta so the
    # rare-path recompile family stays bounded.
    cap_u = smap.leaves.keys.shape[1]  # per-shard registry capacity
    size = max(m * cap_u, -(-keys_live.size // cap_u) * cap_u)
    union_k = np.full((size,), -1, np.int32)
    union_v = np.zeros((size,), np.uint32)
    union_k[: keys_live.size] = keys_live
    union_v[: keys_live.size] = vals_live
    union_k_j = jnp.asarray(union_k)
    union_v_j = jnp.asarray(union_v)
    bounds_stacked = jnp.asarray(
        np.broadcast_to(np.asarray(bounds, np.int32)[None],
                        (m, m + 1)).copy())

    def local(bounds_s, uk, uv, center, half):
        b = bounds_s[0]
        d = jax.lax.axis_index(axis_name)
        prefix = uk >> (3 * (cfg.max_depth - L))
        mine = (uk >= 0) & (prefix >= b[d]) & (prefix < b[d + 1])
        k = jnp.where(mine, uk, -1)
        fresh, out = _exact_rebuild(k, uv, center, half, cfg)
        return (jax.tree_util.tree_map(lambda x: x[None], fresh),
                jax.tree_util.tree_map(lambda x: x[None], out))

    specs = (jax.tree_util.tree_map(lambda _: P(axis_name), smap.pool),
             jax.tree_util.tree_map(lambda _: P(axis_name), smap.leaves))
    pool, new_leaves = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P(), P()),
        out_specs=specs,
    )(bounds_stacked, union_k_j, union_v_j,
      smap.pool.center[0], smap.pool.half_size[0])
    return ShardedMap(pool=pool, leaves=new_leaves, bounds=bounds_stacked)


def union_leaf_snapshot(smap: ShardedMap, cfg: SLAMConfig
                        ) -> Tuple["np.ndarray", "np.ndarray"]:
    """COMPLETE union (keys, vals) leaf snapshot of the sharded map
    (host). Fast path reads the registries (vals mirror every leaf's
    current word); when ANY shard's registry has overflowed the registry
    is missing leaves that exist only in that shard's pool, so the
    snapshot falls back to per-shard POOL extraction — the single-chip
    _leaf_snapshot discipline (map/tiering.py). Any rebuild that feeds a
    registry union back into the pools (rebalance, tiering spill) MUST go
    through this, or pool-only leaves are lost permanently."""
    import numpy as np

    if not bool(np.any(np.asarray(smap.leaves.overflowed))):
        k = np.asarray(smap.leaves.keys).ravel()
        v = np.asarray(smap.leaves.vals).ravel()
        live = k >= 0
        return k[live], v[live]
    m = smap.leaves.keys.shape[0]
    ks, vs = [], []
    for d in range(m):
        pool_d = jax.tree_util.tree_map(lambda x: x[d], smap.pool)
        pool_d = svo.refresh_interior(pool_d, depth=cfg.max_depth)
        ex, _ = svo.extract_all_leaves(
            pool_d, depth=cfg.max_depth,
            start_capacity=max(cfg.extract_capacity, cfg.leaf_capacity))
        n = int(ex.count)
        keys = np.asarray(ex.keys[:n])
        nodes = np.asarray(ex.nodes[:n])
        live = nodes >= 0
        vals = np.asarray(pool_d.value)[np.maximum(nodes, 0)]
        ks.append(keys[live])
        vs.append(vals[live])
    return np.concatenate(ks), np.concatenate(vs)


def rebalance_sharded(smap: ShardedMap, cfg: SLAMConfig, mesh: Mesh,
                      axis_name: str = "map") -> ShardedMap:
    """Re-cut the shard boundaries to equalize leaf load and redistribute
    the map (host-level, rare — a growth-cadence operation, not per-frame).

    The fixed level-1 octant split loads 1-2 of 8 devices on any scene
    concentrated in few octants (round-2 verdict item #5). This measures
    the observed per-cell leaf histogram at cfg.map_split_level, computes
    balanced contiguous ranges, and rebuilds every shard from the UNION
    leaf snapshot filtered to its new range (value-verbatim insert_exact,
    so the union is bit-identical before and after). Needs
    map_split_level >= 2 to help: level 1 has only 8 cells to cut.
    """
    import numpy as np

    m = mesh.shape[axis_name]
    L = cfg.map_split_level
    cells = 1 << (3 * L)

    # COMPLETE union leaf snapshot (pool-backed when a registry has
    # overflowed — a registry union would silently drop its excess
    # leaves from the rebuilt pools)
    keys_live, vals_live = union_leaf_snapshot(smap, cfg)
    prefixes = keys_live >> (3 * (cfg.max_depth - L))
    counts = np.bincount(prefixes, minlength=cells)
    bounds = balanced_bounds(counts, m)
    return rebuild_from_union(smap, cfg, mesh, keys_live, vals_live,
                              bounds, axis_name=axis_name)


def render_sharded_map(smap: ShardedMap, world_T_cam, fx, fy,
                       cfg: SLAMConfig, mesh: Mesh,
                       axis_name: str = "map") -> jnp.ndarray:
    """Render the Morton-sharded map: each device z-buffers its own leaf
    shard, one pmin of packed words over ICI composites (splat_sharded)."""
    # center/half_size are identical across shards; pass shard 0's
    return splat_sharded(
        smap.leaves.vals, smap.leaves.keys,
        smap.pool.center[0], smap.pool.half_size[0],
        world_T_cam, fx, fy, cfg, mesh, axis_name=axis_name)


def render_sharded_cone(smap: ShardedMap, world_T_cam, fx, fy,
                        cfg: SLAMConfig, mesh: Mesh,
                        axis_name: str = "map") -> jnp.ndarray:
    """Cone-composite the Morton-sharded map: the single-chip production
    cone renderer (render/conesplat.py slab compositor) distributed the
    same way splat_sharded distributes the z-buffer.

    Each device projects + scatter-mins ONLY its own leaf shard into the
    slab-cell word buffer (conesplat.slab_scatter_min), ONE `pmin` of the
    packed (prio9 | inv_alpha7 | rgb555) words over ICI composites —
    min-per-shard then min-across-shards is bit-identical to the global
    scatter-min — and the shared front-to-back composite tail runs
    replicated. Traffic: total_cells words/frame (~1.6 MB at 640x480 with
    the default 16-slab spec), same order as splat_sharded's z-buffer.
    Parity vs the single-chip render="cone" image is proven on the CPU
    mesh (tests/test_run2d.py): the packed WORD buffer is bit-identical;
    the f32 composite tail of those words compiles to a slightly
    different fusion order under shard_map, so the images agree to 1 ULP
    rather than bitwise."""
    from jax import shard_map
    from octree_slam_tpu.render import conesplat

    spec = conesplat.make_slab_spec(
        width=cfg.width, height=cfg.height, fx=cfg.focal_x,
        leaf_size=cfg.voxel_resolution, z_near=cfg.cone_znear,
        z_far=cfg.max_range, n_slabs=cfg.cone_slabs,
        max_scale=cfg.cone_max_scale)

    def words(vals_s, keys_s, c_s, h_s, T_s):
        vals = vals_s.reshape(-1)
        keys = keys_s.reshape(-1)
        live = keys >= 0
        buf = conesplat.slab_scatter_min(
            vals, keys, live, c_s, h_s, T_s, fx, fy, spec=spec,
            depth=cfg.max_depth)
        return jax.lax.pmin(buf, axis_name)

    # only the leaf-sharded scatter + word pmin need shard_map; the
    # composite tail is plain pixel-parallel math on the replicated word
    # buffer, left to the SPMD partitioner (it can split it over a "px"
    # axis on a 2-D mesh)
    buf = shard_map(
        words, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(), P()),
        out_specs=P(),
    )(smap.leaves.vals, smap.leaves.keys,
      smap.pool.center[0], smap.pool.half_size[0], world_T_cam)
    return conesplat.composite_min_words(buf, spec=spec)


def union_leaf_mirror(smap: ShardedMap, cfg: SLAMConfig):
    """Replicated dense leaf mirror (+ occupancy + distance field) of the
    Morton-sharded map — what the hybrid band march samples
    (render/hybrid.py reads ONLY the leaf mip level and `dist`).

    Built from the UNION leaf registry in one scatter: registry vals
    mirror every leaf's current word (append_new_leaves contract), shards
    own disjoint key ranges so indices never collide, and the output is
    replicated — the SPMD partitioner all_gathers the [M, LC] key/val
    arrays (a few MB over ICI) into each device's scatter. Interior mip
    cells stay EMPTY (the band march never reads them; an exact-march
    caller needs rebuild_from_pool semantics instead). With
    cfg.cone_band_fused_dist the free leaf cells are stamped with their
    covering dist cell's skip distance (mips.encode_free_dist), matching
    the single-chip fused single-gather contract. Traced-only."""
    from octree_slam_tpu.core import packing
    from octree_slam_tpu.map import mips as mips_mod

    lvl = max(1, min(cfg.accel_level, cfg.max_depth - 2))
    keys = smap.leaves.keys.reshape(-1)
    vals = smap.leaves.vals.reshape(-1)
    live = keys >= 0
    total = mips_mod.total_cells(cfg.max_depth)
    flat = jnp.where(
        live, mips_mod.flat_index(keys, cfg.max_depth, cfg.max_depth),
        total)
    values = jnp.full((total,), packing.EMPTY_VALUE,
                      jnp.uint32).at[flat].set(vals, mode="drop")
    g = 1 << lvl
    pk = keys >> (3 * (cfg.max_depth - lvl))
    lx, ly, lz = mips_mod.deinterleave3(jnp.where(live, pk, 0), lvl)
    xyz = (lz << (2 * lvl)) | (ly << lvl) | lx
    occ = jnp.zeros((g * g * g,), bool).at[
        jnp.where(live, xyz, g * g * g)].set(True, mode="drop")
    dist = mips_mod._dist_from_occ(occ.reshape(g, g, g),
                                   cfg.dist_max_skip).reshape(-1)
    cache = mips_mod.RenderCache(values=values, occ=occ, dist=dist)
    if cfg.cone_band_fused_dist:
        cache = mips_mod.encode_free_dist(cache, max_depth=cfg.max_depth,
                                          dist_level=lvl)
    return cache, lvl


def render_sharded_hybrid(smap: ShardedMap, world_T_cam, fx, fy,
                          cfg: SLAMConfig, mesh: Mesh,
                          axis_name: str = "map") -> jnp.ndarray:
    """The production QUALITY cone renderer (render/hybrid.py: slab
    composite + seeded exact march of the edge band) on the Morton-range-
    sharded map — closing the single-chip/multi-chip render-mode gap.

    Stage 1 distributes exactly like render_sharded_cone: each device
    scatter-mins ONLY its own leaf shard into the packed slab word
    buffer, one `pmin` over ICI composites (bit-identical to the global
    scatter-min by min-associativity), and the composite tail runs
    replicated with want_aux (per-pixel first-hit depth seeds). Stage 2
    builds the replicated union leaf mirror (union_leaf_mirror) and runs
    the identical band select + seeded march + merge the single-chip path
    runs (hybrid.band_march_merge) — pixel-parallel on the replicated
    image, partitionable over a "px" axis by the SPMD partitioner.
    Traffic per frame: the slab word buffer (~1.6 MB at 640x480) +
    the registry all_gather (~MBs)."""
    from jax import shard_map
    from octree_slam_tpu.render import conesplat
    from octree_slam_tpu.render import hybrid as hybrid_mod

    spec = conesplat.make_slab_spec(
        width=cfg.width, height=cfg.height, fx=cfg.focal_x,
        leaf_size=cfg.voxel_resolution, z_near=cfg.cone_znear,
        z_far=cfg.max_range, n_slabs=cfg.cone_slabs,
        max_scale=cfg.cone_max_scale)

    def words(vals_s, keys_s, c_s, h_s, T_s):
        vals = vals_s.reshape(-1)
        keys = keys_s.reshape(-1)
        live = keys >= 0
        buf = conesplat.slab_scatter_min(
            vals, keys, live, c_s, h_s, T_s, fx, fy, spec=spec,
            depth=cfg.max_depth)
        return jax.lax.pmin(buf, axis_name)

    buf = shard_map(
        words, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(), P()),
        out_specs=P(),
    )(smap.leaves.vals, smap.leaves.keys,
      smap.pool.center[0], smap.pool.half_size[0], world_T_cam)
    fb, _w, z_first = conesplat.composite_min_words(buf, spec=spec,
                                                    dilate=1,
                                                    want_aux=True)
    cache, lvl = union_leaf_mirror(smap, cfg)
    return hybrid_mod.band_march_merge(
        fb, z_first, cache, smap.pool.center[0], smap.pool.half_size[0],
        world_T_cam, fx, fy, spec=spec, depth=cfg.max_depth,
        dist_level=lvl, max_range=cfg.max_range,
        start_dist=cfg.start_dist, band_cap=cfg.cone_band_cap,
        band_iters=cfg.cone_band_iters, crawl=cfg.cone_band_crawl,
        fused_dist=cfg.cone_band_fused_dist,
        depth_prio=cfg.cone_band_depth_prio,
        compact_after=cfg.cone_band_compact_after)


def make_mesh2(n_px: int, n_map: int) -> Mesh:
    """2-D device mesh ("px", "map"): tracking parallelism on one axis,
    Morton-range map parallelism on the other — the DP x TP-style
    composite. Needs n_px * n_map devices."""
    import numpy as np
    devs = jax.devices()
    assert len(devs) >= n_px * n_map
    return Mesh(np.array(devs[:n_px * n_map]).reshape(n_px, n_map),
                ("px", "map"))


def slam_step_2d(cfg: SLAMConfig, mesh: Mesh, render: str = "splat",
                 sticky_gate: bool = False):
    """The FULL distributed SLAM frame over a 2-D ("px", "map") mesh, one
    jitted program:

      * preprocessing + ICP tracking partition over image rows ("px");
        XLA inserts the halo exchanges for the window stencils and the
        42-float normal-equation reductions over ICI;
      * fusion routes the frame's world points into the Morton-range
        map shards ("map": shard-local key filter, per-shard batched
        insert + in-device unique-cap paging, one psum for the global
        unique count);
      * rendering: "splat" z-buffers each map shard and composites with
        one pmin over the "map" axis; "cone" runs the production slab
        cone compositor the same way (render_sharded_cone);
        "cone_hybrid" adds the seeded edge-band march over the union
        leaf mirror (render_sharded_hybrid — the single-chip quality
        mode, now at multi-chip parity); "none" returns a zero
        framebuffer (tracking+fusion only).

    State = (last_pyramid, pose, initialized, ShardedMap, diverged,
    key_pyramid, key_pose, key_T_cam) — the last three are empty pytrees
    unless cfg.track_keyframe (same gating as pipeline.SLAMState).
    Tracking is identical math to pipeline.step: frame-to-frame ICP, or
    keyframe-anchored when cfg.track_keyframe (ICP against the anchor
    frame's maps seeded by the previous key-relative transform,
    re-anchoring at keyframe_max_dist / keyframe_max_angle_deg — drift
    accrues per keyframe hop instead of per frame).
    sticky_gate mirrors pipeline.step's recovery contract: with it, the
    diverged flag LATCHES and gates fusion until the host loop's
    relocalization clears it (run2d.run_slam_2d); without it the gate is
    per-frame only — a transient bad frame is skipped, fusion resumes
    when tracking re-locks (the reference's per-frame abort,
    rgbd_camera.cpp:148-151).

    Returns step(state, frame) -> (state', (framebuffer, pose, signals))
    where signals is a packed f32[11] health vector
    [unique_total, max_shard_nodes, max_shard_leaf_count,
     any_pool_overflow, any_leaf_overflow, diverged, residual, inliers,
     cam_x, cam_y, cam_z]
    — ONE fetch per frame drives the host loop (parallel/run2d.py),
    including its tiering radius checks (the camera position rides the
    same packed vector).
    """
    from octree_slam_tpu import pipeline
    from octree_slam_tpu.sensor import tracking as tr

    import math as _math

    def fn(state, frame):
        (last_pyramid, pose, initialized, smap, diverged,
         key_pyramid, key_pose, key_T_cam) = state
        pyramid = tr.build_pyramid(frame.depth, frame.color, cfg)
        eye = jnp.eye(4, dtype=jnp.float32)
        if cfg.track_keyframe:
            # keyframe anchoring on the mesh — same math as
            # pipeline.step's branch (drift accrues per keyframe hop)
            update_T, tstats = tr.track(list(key_pyramid), list(pyramid),
                                        cfg, init_T=key_T_cam)
            update_T = jnp.where(initialized, update_T, eye)
            new_pose = jnp.where(initialized, key_pose @ update_T, pose)
            new_div = diverged | (initialized & tstats.diverged)
            t_dist = jnp.linalg.norm(update_T[:3, 3])
            cos_ang = jnp.clip((jnp.trace(update_T[:3, :3]) - 1.0) * 0.5,
                               -1.0, 1.0)
            far = (t_dist > cfg.keyframe_max_dist) | (
                cos_ang < _math.cos(
                    _math.radians(cfg.keyframe_max_angle_deg)))
            re_anchor = (~initialized) | (far & ~tstats.diverged)
            key_pyramid = jax.tree_util.tree_map(
                lambda new, old: jnp.where(re_anchor, new, old),
                tuple(pyramid), key_pyramid)
            key_pose = jnp.where(re_anchor, new_pose, key_pose)
            key_T_cam = jnp.where(re_anchor, eye, update_T)
        else:
            update_T, tstats = tr.track(list(last_pyramid), list(pyramid),
                                        cfg)
            update_T = jnp.where(initialized, update_T, eye)
            new_pose = pose @ update_T
            new_div = diverged | (initialized & tstats.diverged)

        v = pyramid[cfg.fuse_level].vertex.reshape(-1, 3)
        world_pts = v @ new_pose[:3, :3].T + new_pose[:3, 3]
        colors = pipeline._fuse_colors(frame, cfg)
        gate = new_div if sticky_gate else (initialized & tstats.diverged)
        world_pts = jnp.where(~gate, world_pts, jnp.inf)

        smap, total = insert_sharded(smap, world_pts, colors, cfg, mesh)
        if render == "cone":
            fb = render_sharded_cone(smap, new_pose, cfg.focal_x,
                                     cfg.focal_y, cfg, mesh)
        elif render == "cone_hybrid":
            fb = render_sharded_hybrid(smap, new_pose, cfg.focal_x,
                                       cfg.focal_y, cfg, mesh)
        elif render == "splat":
            fb = render_sharded_map(smap, new_pose, cfg.focal_x,
                                    cfg.focal_y, cfg, mesh)
        else:
            fb = jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)
        new_state = (tuple(pyramid), new_pose, jnp.bool_(True), smap,
                     new_div, key_pyramid, key_pose, key_T_cam)
        # Packed health/growth signals — ONE small fetch serves the host
        # loop (run2d), which reads it TRAILING one frame so a frame costs
        # max(step, RTT), the pipeline.run_slam fetch protocol. Plain array
        # reductions over the stacked shard arrays; XLA inserts the
        # cross-shard collectives. Slots 8-10 carry the camera position so
        # the host tiering policy (spill/restore radii) runs off the SAME
        # trailing fetch — no extra per-frame round trip.
        signals = jnp.concatenate([jnp.stack([
            total.astype(jnp.float32),
            jnp.max(smap.pool.n_nodes).astype(jnp.float32),
            jnp.max(smap.leaves.count).astype(jnp.float32),
            jnp.any(smap.pool.overflowed).astype(jnp.float32),
            jnp.any(smap.leaves.overflowed).astype(jnp.float32),
            new_div.astype(jnp.float32),
            # inliers/residual are per-pyramid-level vectors; report the
            # finest tracked level (index 0, the last GN iterations)
            tstats.residual.ravel()[0].astype(jnp.float32),
            tstats.inliers.ravel()[0].astype(jnp.float32),
        ]), new_pose[:3, 3].astype(jnp.float32)])
        return new_state, (fb, new_pose, signals)

    # PINNED state shardings: the map P("map")-stacked, everything else
    # replicated, frames row-sharded over "px". Early builds left these
    # unpinned ("committed argument shardings drive the partitioner"),
    # which worked until the host loop REBUILT the step mid-run (growth):
    # the carried pyramid then arrived laid out by the old executable and
    # the fresh compile of the cone path mis-bound its runtime buffers
    # (INVALID_ARGUMENT "expected parameter 0 of size 4"). Explicit pins
    # make the state placement a stable contract across step rebuilds —
    # jit re-shards any differently-placed input to match.
    from octree_slam_tpu.core.types import PyramidLevel
    rep = NamedSharding(mesh, P())
    ms = NamedSharding(mesh, P(axis_name_of(mesh)))
    pyr_spec = tuple(
        PyramidLevel(vertex=rep, normal=rep, intensity=rep)
        for _ in range(cfg.pyramid_depth))
    smap_spec = ShardedMap(
        pool=SVONodePool(child=ms, value=ms, n_nodes=ms, center=ms,
                         half_size=ms, overflowed=ms),
        leaves=LeafList(keys=ms, nodes=ms, vals=ms, node2pos=ms,
                        count=ms, overflowed=ms),
        bounds=ms)
    key_pyr_spec = (pyr_spec if cfg.track_keyframe else ())
    key_rep = rep  # scalar-shaped placeholders shard the same either way
    state_spec = (pyr_spec, rep, rep, smap_spec, rep,
                  key_pyr_spec, key_rep, key_rep)
    out_spec = (state_spec, (rep, rep, rep))
    return jax.jit(fn,
                   in_shardings=(state_spec, frame_sharding(mesh, "px")),
                   out_shardings=out_spec)


def axis_name_of(mesh: Mesh, preferred: str = "map") -> str:
    """The map axis name on this mesh ("map" when present, else the sole
    axis — make_mesh(axis_name="map") and make_mesh2 both qualify)."""
    names = list(mesh.shape.keys())
    return preferred if preferred in names else names[-1]


def slam_init_2d(cfg: SLAMConfig, mesh: Mesh, map_center=(0.0, 0.0, 0.0),
                 initial_pose=None):
    """Initial (pyramid, pose, initialized, ShardedMap, diverged,
    key_pyramid, key_pose, key_T_cam) for slam_step_2d. The keyframe
    fields are empty pytrees unless cfg.track_keyframe (same shape gating
    as pipeline.SLAMState, so the donated/checkpointed template stays
    stable per config)."""
    from octree_slam_tpu import pipeline
    pose = (jnp.eye(4, dtype=jnp.float32) if initial_pose is None
            else jnp.asarray(initial_pose, jnp.float32))
    return (tuple(pipeline._empty_pyramid(cfg)), pose, jnp.bool_(False),
            make_sharded_map(cfg, mesh, map_center=map_center),
            jnp.bool_(False),
            (tuple(pipeline._empty_pyramid(cfg)) if cfg.track_keyframe
             else ()),
            (jnp.array(pose, copy=True) if cfg.track_keyframe
             else jnp.zeros((0,), jnp.float32)),
            (jnp.eye(4, dtype=jnp.float32) if cfg.track_keyframe
             else jnp.zeros((0,), jnp.float32)))


def model_zbuffer_sharded(smap: ShardedMap, pose, cfg: SLAMConfig,
                          mesh: Mesh, axis_name: str = "map"
                          ) -> jnp.ndarray:
    """Packed splat z-buffer of the SHARDED map as seen from `pose` — the
    model view relocalization renders candidates against
    (relocalize.model_pyramid's z-buffer, with the per-shard scatter +
    one pmin composite of splat_sharded). Returns the replicated
    i32[H*W] packed (depth<<16 | rgb565) buffer; the caller finishes with
    relocalize.pyramid_from_zbuffer."""
    from jax import shard_map
    from octree_slam_tpu.render import splat as sp

    def local(vals_s, keys_s, c_s, h_s, T_s):
        vals = vals_s.reshape(-1)
        keys = keys_s.reshape(-1)
        live = keys >= 0
        buf = sp.splat_zbuffer(vals, keys, live, c_s, h_s, T_s,
                               cfg.focal_x, cfg.focal_y, width=cfg.width,
                               height=cfg.height, depth=cfg.max_depth,
                               max_range=cfg.max_range)
        return jax.lax.pmin(buf, axis_name)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(), P()),
        out_specs=P(),
    )(smap.leaves.vals, smap.leaves.keys,
      smap.pool.center[0], smap.pool.half_size[0], pose)


def icp_psum(v1, n1, v2, n2, cfg: SLAMConfig, mesh: Mesh,
             axis_name: str = "px") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Explicit shard_map ICP reduction: rows sharded, partial normal
    equations psum'd over ICI — the collective-level contract of the
    pixel-sharded tracker (the 42-float thrust::reduce of the reference,
    localization_kernels.cu:318, becomes one psum)."""
    from jax import shard_map
    from octree_slam_tpu.sensor.tracking import icp_normal_equations

    def local(v1s, n1s, v2s, n2s):
        A, b, count, _ = icp_normal_equations(v1s, n1s, v2s, n2s, cfg)
        A = jax.lax.psum(A, axis_name)
        b = jax.lax.psum(b, axis_name)
        return A, b

    spec = P(axis_name, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(P(), P()),
    )(v1, n1, v2, n2)
