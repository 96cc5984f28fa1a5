"""Host-RAM tiering for the Morton-range-sharded map (2-D mesh runs).

map/tiering.py gives the single-chip pool a host-RAM cold tier (the
reference's pushToGPU/pullToCPU hybrid octree, octree.cpp:41-111, at
region granularity); this module is the same protocol for the
distributed.ShardedMap, closing the last single-chip-only subsystem on
the mesh (round-4 verdict item #5b):

  * `spill_cold_sharded` — union leaf snapshot from the per-shard
    registries (host), cold tier cells (every leaf farther than
    spill_keep_radius from the camera) archived to the SAME HostArchive
    structure, every shard rebuilt from the kept snapshot rows in its own
    Morton range (distributed.rebuild_from_union: value-verbatim
    insert_exact, shard-local — no cross-chip traffic beyond the
    replicated snapshot routing);
  * `restore_due_sharded` — archived cells whose center enters
    restore_radius re-insert via a shard-routed exact-value insert
    (insert_exact_sharded: the insert_sharded routing with
    svo.insert_exact, overwrite=False so leaves re-observed while spilled
    are never clobbered), with the single-chip insert-with-retry
    guarantee: capacity overflow grows the sharded map (grow_sharded)
    and re-runs the SAME keys — idempotent because non-EMPTY leaves are
    skipped.

The spill -> restore round trip is bit-exact per leaf value and the
shard union matches the single-chip tiering result on the same stream
(tests/test_run2d.py TestShardedTiering). The sharded step carries no
saturation-gate bitmask or insert directory (single-chip-only
accelerations), so tiering._rebuild_derived's sat-mask/dircache resets
have no counterpart here; if either is ever added to slam_step_2d its
rebuild must be wired into both functions below (CLAUDE.md invariants).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.map import morton, svo
from octree_slam_tpu.map.tiering import HostArchive
from octree_slam_tpu.parallel import distributed
from octree_slam_tpu.parallel.distributed import ShardedMap
from octree_slam_tpu.map.svo import SVONodePool
from octree_slam_tpu.render.splat import LeafList, append_new_leaves


def spill_cold_sharded(smap: ShardedMap, cfg: SLAMConfig, mesh,
                       archive: HostArchive, *, camera_pos,
                       axis_name: str = "map"
                       ) -> Tuple[ShardedMap, int]:
    """Archive every cold tier cell to host RAM and rebuild each shard
    from its kept leaves (bounds unchanged). Returns
    (smap, n_leaves_spilled); a no-op (0) when every cell is warm.
    Host-level, growth-cadence — mirrors tiering.spill_cold."""
    assert archive.level == cfg.tier_level
    # COMPLETE snapshot: pool-backed when any registry overflowed — a
    # registry union would archive/rebuild an incomplete leaf set and
    # lose the excess permanently (distributed.union_leaf_snapshot)
    keys, vals = distributed.union_leaf_snapshot(smap, cfg)
    if keys.size == 0:
        return smap, 0
    center = np.asarray(smap.pool.center[0], np.float32)
    half = float(np.asarray(smap.pool.half_size[0]))
    centers = np.asarray(morton.decode_centers(
        jnp.asarray(keys), jnp.asarray(center), jnp.float32(half),
        cfg.max_depth))
    d = np.linalg.norm(centers - np.asarray(camera_pos, np.float32),
                       axis=1)
    shift = 3 * (cfg.max_depth - cfg.tier_level)
    pfx = keys >> shift
    order = np.argsort(pfx, kind="stable")
    spfx, sd = pfx[order], d[order]
    starts = np.flatnonzero(np.concatenate([[True],
                                            spfx[1:] != spfx[:-1]]))
    cell_min = np.minimum.reduceat(sd, starts)
    seg_cold = cell_min > cfg.spill_keep_radius
    if not seg_cold.any():
        return smap, 0

    skeys, svals = keys[order], vals[order]
    ends = np.append(starts[1:], spfx.size)
    for s, e, is_cold in zip(starts, ends, seg_cold):
        if is_cold:
            archive.add(int(spfx[s]), skeys[s:e].copy(), svals[s:e].copy())
    cold = np.empty(pfx.size, bool)
    cold[order] = np.repeat(seg_cold,
                            np.diff(np.append(starts, spfx.size)))

    bounds = np.asarray(smap.bounds)[0]
    smap = distributed.rebuild_from_union(
        smap, cfg, mesh, keys[~cold], vals[~cold], bounds,
        axis_name=axis_name)
    return smap, int(np.sum(cold))


def insert_exact_sharded(smap: ShardedMap, keys: np.ndarray,
                         vals: np.ndarray, cfg: SLAMConfig, mesh,
                         axis_name: str = "map") -> ShardedMap:
    """Value-verbatim insert of (keys, vals) into the sharded map, routed
    by Morton range exactly like insert_sharded routes points, with
    in-device unique-cap paging and overwrite=False (existing leaves keep
    their values — restores never clobber re-observations, and overflow
    retries are idempotent). Registry appends ride append_new_leaves per
    page. The key buffer is padded to a multiple of insert_unique_cap so
    the (rare, host-driven) call compiles a bounded family of shapes."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    L = cfg.map_split_level
    U = cfg.insert_unique_cap
    n_pad = max(U, ((keys.size + U - 1) // U) * U)
    kbuf = np.full((n_pad,), morton.INVALID_KEY, np.int32)
    vbuf = np.zeros((n_pad,), np.uint32)
    order = np.argsort(keys, kind="stable")
    kbuf[: keys.size] = keys[order]
    vbuf[: keys.size] = vals[order]
    kj, vj = jnp.asarray(kbuf), jnp.asarray(vbuf)
    shallow = max(1, min(cfg.accel_level, cfg.max_depth - 2))

    def local(pool_s, leaves_s, bounds_s, uk, uv):
        pool = SVONodePool(*(x[0] for x in pool_s))
        leaves = LeafList(*(x[0] for x in leaves_s))
        b = bounds_s[0]
        dd = jax.lax.axis_index(axis_name)
        prefix = uk >> (3 * (cfg.max_depth - L))
        mine = (uk != morton.INVALID_KEY) & (prefix >= b[dd]) \
            & (prefix < b[dd + 1])
        k = jnp.where(mine, uk, morton.INVALID_KEY)
        pool, st = svo.insert_exact(pool, k, uv, depth=cfg.max_depth,
                                    unique_cap=U, shallow_level=shallow,
                                    overwrite=False)
        leaves = append_new_leaves(leaves, st)

        def _more(c):
            return c[0]

        def _page(c):
            _, lk, p, lv = c
            p, s2 = svo.insert_exact(p, k, uv, depth=cfg.max_depth,
                                     unique_cap=U, shallow_level=shallow,
                                     overwrite=False, min_key=lk)
            return (s2.unique_overflow, s2.last_key, p,
                    append_new_leaves(lv, s2))

        _, _, pool, leaves = jax.lax.while_loop(
            _more, _page,
            (st.unique_overflow, st.last_key, pool, leaves))
        # sharded pools keep the ALWAYS-FRESH interior invariant
        # (insert_sharded's eager mipmap; _exact_rebuild refreshes):
        # insert_exact writes leaves only, and a stale interior would
        # make any later BFS extraction (grow_sharded's overflow
        # registry rebuild, union_leaf_snapshot) silently skip the
        # just-restored subtrees — which overwrite=False retries then
        # never re-register
        pool = svo.refresh_interior(pool, depth=cfg.max_depth)
        return (jax.tree_util.tree_map(lambda x: x[None], pool),
                jax.tree_util.tree_map(lambda x: x[None], leaves))

    specs = (jax.tree_util.tree_map(lambda _: P(axis_name), smap.pool),
             jax.tree_util.tree_map(lambda _: P(axis_name), smap.leaves))
    pool, leaves = shard_map(
        local, mesh=mesh,
        in_specs=(specs[0], specs[1], P(axis_name), P(), P()),
        out_specs=specs,
    )(smap.pool, smap.leaves, smap.bounds, kj, vj)
    return ShardedMap(pool=pool, leaves=leaves, bounds=smap.bounds)


def restore_due_sharded(smap: ShardedMap, cfg: SLAMConfig, mesh,
                        archive: HostArchive, *, camera_pos,
                        axis_name: str = "map"
                        ) -> Tuple[ShardedMap, SLAMConfig, int]:
    """Re-insert archived cells whose center entered restore_radius into
    the sharded map. Returns (smap, cfg, n_leaves_restored). Carries the
    single-chip insert-with-retry guarantee: a restore that outruns
    pool/registry capacity grows the sharded map and re-runs the same
    keys (idempotent via overwrite=False; dropped registry appends are
    recovered by grow_sharded's overflow rebuild)."""
    assert archive.level == cfg.tier_level
    pfx, centers = archive.cell_centers(smap.pool.center[0],
                                        smap.pool.half_size[0])
    if pfx.size == 0:
        return smap, cfg, 0
    d = np.linalg.norm(centers - np.asarray(camera_pos, np.float32),
                       axis=1)
    due = pfx[d <= cfg.restore_radius]
    if due.size == 0:
        return smap, cfg, 0
    keys, vals = archive.take(int(p) for p in due)

    while True:
        smap = insert_exact_sharded(smap, keys, vals, cfg, mesh,
                                    axis_name=axis_name)
        pool_of = bool(np.any(np.asarray(smap.pool.overflowed)))
        leaf_of = bool(np.any(np.asarray(smap.leaves.overflowed)))
        if not pool_of and not leaf_of:
            break
        if pool_of:
            smap = smap._replace(pool=smap.pool._replace(
                overflowed=jnp.zeros_like(smap.pool.overflowed)))
        smap, cfg = distributed.grow_sharded(
            smap, cfg, mesh, grow_nodes=pool_of, grow_leaves=leaf_of,
            axis_name=axis_name)
    return smap, cfg, int(keys.size)
