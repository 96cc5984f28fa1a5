"""Host-RAM tiering of cold map regions — HBM as a working set.

The reference keeps the octree hybrid CPU/GPU: `pushToGPU` serializes a
subtree into the linear device array and `pullToCPU` deserializes it back,
so only the active subtree occupies device memory (octree.cpp:41-111,
`on_gpu_` flag octree.h:60). The TPU rebuild's pool is one static-shape HBM
array, so tiering is expressed at the *region* level instead of the
*subtree-pointer* level:

  * The volume is partitioned into level-`tier_level` morton cells
    (8^level cells). A cell is COLD when every leaf in it is farther than
    `spill_keep_radius` from the camera.
  * `spill_cold` extracts all leaves with their EXACT packed values,
    archives the cold cells' (key, value) arrays in host RAM, and rebuilds
    the pool from the kept leaves (svo.insert_exact — value-verbatim, the
    pushToGPU re-serialization). Node count drops by the cold regions'
    share; the freed slots become insert headroom, so a bounded HBM pool
    can map an unbounded trajectory.
  * `restore_due` re-inserts archived cells whose center enters
    `restore_radius` (pullToCPU + pushToGPU of the revisited subtree).
    Restores never clobber leaves re-observed while spilled
    (insert_exact(overwrite=False)); with restore_radius > max_range a
    region is live again before the camera can even see it.

Both operations are host-triggered between frames (like pipeline.grow_state)
and leave the SLAMState fully consistent: leaf registry rebuilt/appended,
interiors refreshed or flagged stale per the lazy-interior protocol, accel
structures rebuilt (pool rebuild invalidates node indices).

The spill→restore round trip is bit-exact for every leaf value, and
interiors follow bit-identically via refresh_interior (tests/test_tiering.py).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.map import morton, svo
from octree_slam_tpu.map import mips as mips_mod
from octree_slam_tpu.render import raycast
from octree_slam_tpu.render.splat import append_new_leaves, \
    leaf_list_from_extraction


def _decode_center_host(prefix: int, center: np.ndarray, half: float,
                        level: int) -> np.ndarray:
    """Pure-host cell center for a level-`level` morton prefix (the numpy
    twin of morton.decode_centers — restore checks run EVERY frame and must
    not dispatch device work or fetch; CLAUDE.md one-fetch-per-frame rule)."""
    c = np.array(center, np.float32).copy()
    e = float(half)
    for lv in range(level):
        octant = (prefix >> (3 * (level - 1 - lv))) & 7
        e *= 0.5
        c += np.float32(e) * np.array(
            [1.0 if octant & 1 else -1.0,
             1.0 if octant & 2 else -1.0,
             1.0 if octant & 4 else -1.0], np.float32)
    return c


class HostArchive:
    """Host-RAM store of spilled cells: level-`level` morton prefix ->
    (leaf keys i32[n], packed values u32[n]) numpy arrays."""

    def __init__(self, level: int):
        self.level = level
        self.cells: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self._centers: Dict[int, np.ndarray] = {}
        self._frame = None  # (center np.f32[3], half float), fixed per run

    @property
    def n_leaves(self) -> int:
        return sum(k.size for k, _ in self.cells.values())

    def __len__(self) -> int:
        return len(self.cells)

    def add(self, prefix: int, keys: np.ndarray, vals: np.ndarray) -> None:
        if prefix in self.cells:
            # merge, new spill wins on duplicate keys (it is newer)
            ok, ov = self.cells[prefix]
            stale = ~np.isin(ok, keys)
            keys = np.concatenate([keys, ok[stale]])
            vals = np.concatenate([vals, ov[stale]])
        self.cells[prefix] = (keys, vals)

    def take(self, prefixes) -> Tuple[np.ndarray, np.ndarray]:
        ks, vs = [], []
        for p in prefixes:
            k, v = self.cells.pop(p)
            ks.append(k)
            vs.append(v)
        if not ks:
            return (np.zeros((0,), np.int32), np.zeros((0,), np.uint32))
        return np.concatenate(ks), np.concatenate(vs)

    def cell_centers(self, center, half_size) -> Tuple[np.ndarray, np.ndarray]:
        """(prefixes i32[m], centers f32[m,3]) of all archived cells.
        Pure host math after the first call: the map frame (center,
        half_size) is fetched ONCE and cached — this runs every frame in
        run_slam's restore check and must not cost a tunnel round trip."""
        if self._frame is None:
            self._frame = (np.asarray(center, np.float32),
                           float(np.asarray(half_size)))
        c0, h0 = self._frame
        pfx = np.fromiter(self.cells.keys(), np.int32,
                          count=len(self.cells))
        if pfx.size == 0:
            return pfx, np.zeros((0, 3), np.float32)
        out = np.empty((pfx.size, 3), np.float32)
        for i, p in enumerate(pfx.tolist()):
            c = self._centers.get(p)
            if c is None:
                c = _decode_center_host(p, c0, h0, self.level)
                self._centers[p] = c
            out[i] = c
        return pfx, out


def _leaf_snapshot(state, cfg: SLAMConfig):
    """(pool, keys np.i32[n], exact values np.u32[n]) of every occupied
    leaf; refreshes interiors first (extraction BFS reads occupancy)."""
    pool = state.pool
    if bool(state.interior_stale):
        pool = svo.refresh_interior(pool, depth=cfg.max_depth)
    ex, _ = svo.extract_all_leaves(
        pool, depth=cfg.max_depth,
        start_capacity=max(cfg.extract_capacity, cfg.leaf_capacity))
    n = int(ex.count)
    keys = np.asarray(ex.keys[:n])
    nodes = np.asarray(ex.nodes[:n])
    live = nodes >= 0
    vals = np.asarray(pool.value)[np.maximum(nodes, 0)]
    return pool, keys[live], vals[live]


def bulk_insert_exact(pool, keys: np.ndarray, vals: np.ndarray, *,
                      depth: int, unique_cap: int, shallow_level: int = 6,
                      overwrite: bool):
    """Chunked value-verbatim bulk write (keys need not be sorted but must
    be distinct across chunks — sort once here so chunks never share a
    key). Returns (pool, per-chunk stats list)."""
    order = np.argsort(keys, kind="stable")
    keys, vals = keys[order], vals[order]
    U = unique_cap
    stats_list = []
    for i in range(0, max(keys.size, 1), U):
        ck = np.full((U,), morton.INVALID_KEY, np.int32)
        cv = np.zeros((U,), np.uint32)
        chunk = keys[i:i + U]
        ck[:chunk.size] = chunk
        cv[:chunk.size] = vals[i:i + U]
        pool, st = svo.insert_exact(pool, jnp.asarray(ck), jnp.asarray(cv),
                                    depth=depth, unique_cap=U,
                                    shallow_level=shallow_level,
                                    overwrite=overwrite)
        stats_list.append(st)
    return pool, stats_list


def _insert_all_exact(pool, keys: np.ndarray, vals: np.ndarray,
                      cfg: SLAMConfig, *, overwrite: bool):
    return bulk_insert_exact(
        pool, keys, vals, depth=cfg.max_depth,
        unique_cap=cfg.insert_unique_cap,
        shallow_level=max(1, min(cfg.accel_level, cfg.max_depth - 2)),
        overwrite=overwrite)


def _rebuild_derived(state, cfg: SLAMConfig, pool):
    """Fully refresh everything derived from a REBUILT pool (node indices
    changed): interiors, leaf registry, render accel."""
    pool = svo.refresh_interior(pool, depth=cfg.max_depth)
    lvl = max(1, min(cfg.accel_level, cfg.max_depth - 2))
    ex, cap = svo.extract_all_leaves(pool, depth=cfg.max_depth,
                                     start_capacity=cfg.leaf_capacity)
    leaves = leaf_list_from_extraction(ex, pool.value,
                                       node_capacity=cfg.node_capacity)
    accel = (mips_mod.rebuild_from_pool(pool, max_depth=cfg.max_depth,
                                        dist_level=lvl,
                                        max_skip=cfg.dist_max_skip)
             if cfg.use_dense_mips
             else raycast.build_accel(pool, level=lvl))
    if cfg.use_dense_mips and cfg.cone_band_fused_dist:
        # this rebuild CLEARS mirror_stale, so the in-step stamp trigger
        # (had_new | mirror_stale) won't fire on a quiet next frame —
        # re-stamp the free-cell skip distances here or the fused band
        # march would leaf-crawl (correct image, no empty-space skips)
        accel = mips_mod.encode_free_dist(accel, max_depth=cfg.max_depth,
                                          dist_level=lvl)
    import dataclasses
    new_cfg = cfg if cap == cfg.leaf_capacity else dataclasses.replace(
        cfg, leaf_capacity=cap)
    state = state._replace(pool=pool, leaves=leaves, accel=accel,
                           interior_stale=jnp.bool_(False),
                           mirror_stale=jnp.bool_(False),
                           stamps_stale=jnp.bool_(False))
    # node indices just changed: a stale insert-directory entry would
    # blend into the wrong node (pipeline.reset_dircache contract);
    # the saturation-gate bitmask is rebuilt from the LIVE registry so
    # spilled leaves stop gating until restored
    from octree_slam_tpu import pipeline as _pipeline
    state = _pipeline.reset_dircache(state)
    state = _pipeline.rebuild_sat_mask(state, new_cfg)
    return state, new_cfg


def spill_cold(state, cfg: SLAMConfig, archive: HostArchive, *,
               camera_pos) -> Tuple[object, SLAMConfig, int]:
    """Archive every cold tier cell to host RAM and rebuild the pool from
    the kept leaves. Returns (state, cfg, n_leaves_spilled); a no-op
    (0 spilled) when every cell has a leaf within spill_keep_radius."""
    assert archive.level == cfg.tier_level
    pool, keys, vals = _leaf_snapshot(state, cfg)
    # Keep the stale flag on the no-op paths: _leaf_snapshot refreshed the
    # POOL interiors, but the dense-mip mirror (state.accel) still misses
    # every lazy frame's update — clearing the flag here would disarm the
    # in-step heal that rebuilds it. Only the full _rebuild_derived path
    # below leaves everything fresh.
    state = state._replace(pool=pool)
    if keys.size == 0:
        return state, cfg, 0

    centers = np.asarray(morton.decode_centers(
        jnp.asarray(keys), pool.center, pool.half_size, cfg.max_depth))
    d = np.linalg.norm(centers - np.asarray(camera_pos, np.float32), axis=1)
    shift = 3 * (cfg.max_depth - cfg.tier_level)
    pfx = keys >> shift
    # cell min-distance via sorted segment reduction
    order = np.argsort(pfx, kind="stable")
    spfx, sd = pfx[order], d[order]
    starts = np.flatnonzero(np.concatenate(
        [[True], spfx[1:] != spfx[:-1]]))
    cell_min = np.minimum.reduceat(sd, starts)
    seg_cold = cell_min > cfg.spill_keep_radius
    if not seg_cold.any():
        return state, cfg, 0

    # archive cold cells by slicing the SORTED view per segment (one pass;
    # a per-cell `pfx == p` scan is O(cells x leaves) on this host path)
    skeys, svals = keys[order], vals[order]
    ends = np.append(starts[1:], spfx.size)
    for s, e, is_cold in zip(starts, ends, seg_cold):
        if is_cold:
            archive.add(int(spfx[s]), skeys[s:e].copy(), svals[s:e].copy())
    # O(n) cold mask from the sorted view (the segment bounds already
    # encode it; np.isin would re-search all leaves)
    cold = np.empty(pfx.size, bool)
    cold[order] = np.repeat(seg_cold, np.diff(np.append(starts, spfx.size)))

    fresh = svo.create(cfg.node_capacity, pool.center, pool.half_size)
    fresh, _ = _insert_all_exact(fresh, keys[~cold], vals[~cold], cfg,
                                 overwrite=True)
    state, cfg = _rebuild_derived(state, cfg, fresh)
    return state, cfg, int(np.sum(cold))


def restore_due(state, cfg: SLAMConfig, archive: HostArchive, *,
                camera_pos) -> Tuple[object, SLAMConfig, int]:
    """Re-insert archived cells whose center entered restore_radius.
    Returns (state, cfg, n_leaves_restored)."""
    assert archive.level == cfg.tier_level
    pfx, centers = archive.cell_centers(state.pool.center,
                                        state.pool.half_size)
    if pfx.size == 0:
        return state, cfg, 0
    d = np.linalg.norm(centers - np.asarray(camera_pos, np.float32), axis=1)
    due = pfx[d <= cfg.restore_radius]
    if due.size == 0:
        return state, cfg, 0
    keys, vals = archive.take(int(p) for p in due)

    # Insert-with-retry: a restore that outruns pool/registry capacity
    # must NOT lose leaves (insert_exact silently drops allocations that
    # don't fit, and the archive entries are already popped). Grow and
    # re-run the SAME keys — overwrite=False makes the retry idempotent:
    # leaves written in an earlier round are non-EMPTY and skipped, only
    # the dropped ones get written. Registry appends dropped by an
    # overflowed round are recovered by grow_state's full rebuild.
    state = state._replace(interior_stale=jnp.bool_(True),
                           mirror_stale=jnp.bool_(cfg.use_dense_mips),
                           stamps_stale=jnp.bool_(
                               cfg.use_dense_mips
                               and cfg.cone_band_fused_dist))
    while True:
        pool, stats_list = _insert_all_exact(state.pool, keys, vals, cfg,
                                             overwrite=False)
        leaves = state.leaves
        for st in stats_list:
            leaves = append_new_leaves(leaves, st)
        state = state._replace(pool=pool, leaves=leaves)
        pool_of = bool(pool.overflowed)
        leaf_of = bool(leaves.overflowed)
        if not pool_of and not leaf_of:
            break
        from octree_slam_tpu import pipeline
        state = state._replace(
            pool=pool._replace(overflowed=jnp.bool_(False)))
        state, cfg = pipeline.grow_state(state, cfg, grow_nodes=pool_of,
                                         grow_leaves=leaf_of)
    # Accel freshness: restore only ADDS tiles, so node indices stay valid,
    # but the entry grid / dense mirror are stale. Lazy+dense configs heal
    # in-step off the stale flag; everything else refreshes here (rare op).
    lvl = max(1, min(cfg.accel_level, cfg.max_depth - 2))
    if not cfg.use_dense_mips:
        state = state._replace(
            accel=raycast.build_accel(state.pool, level=lvl))
    if not cfg.lazy_interior:
        pool = svo.refresh_interior(state.pool, depth=cfg.max_depth)
        state = state._replace(pool=pool, interior_stale=jnp.bool_(False))
        if cfg.use_dense_mips:
            state = state._replace(
                accel=mips_mod.rebuild_from_pool(
                    pool, max_depth=cfg.max_depth, dist_level=lvl,
                    max_skip=cfg.dist_max_skip),
                mirror_stale=jnp.bool_(False))
            # rebuild_from_pool leaves free cells unstamped; the flag
            # (set above) stays True so the next hybrid frame re-stamps
    return state, cfg, int(keys.size)
