"""The per-frame SLAM pipeline: track -> fuse -> render, one jitted program.

TPU-native rebuild of the reference main loop (main.cpp:31-84 + the
commented-in tracking path at :35). Where the reference crosses host<->device
on every kernel (cudaDeviceSynchronize throughout, e.g. svo.cu:656,683,688)
and reallocates the octree per frame (svo.cu:609-614), here the entire frame
is a single XLA program over static-shape state: no host sync, no allocation,
no GL interop — the renderer returns a framebuffer array. State buffers are
donated, so the map updates in place across frames.

Render modes (the reference's compile-time flags, main.h:28-32, as runtime
choices):
  "splat"      — persistent-leaf-list voxel splatting (the real-time path);
  "cone"       — cone-traced compositing via slab-volume splatting
                 (CONE_TRACING mode semantics, real-time on TPU);
  "cone_march" — the exact per-ray cone-tracing march (render/raycast.py,
                 bit-faithful to cone_tracing_kernels.cu; slow on TPU);
  "none"       — tracking + fusion only.

Map sizing: the reference grows the octree to the observed cloud bbox
(Scene::addPointCloudToOctree, scene.cpp:94-107 + Octree::expandBySize,
octree.cpp:362-378). Static shapes want a fixed root: the pool covers
half_size = resolution * 2^(max_depth-1) meters around `map_center`
(so leaves are exactly `voxel_resolution`); out-of-volume growth is handled
by the host-side re-rooting in map/octree.py.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core.types import Frame, PyramidLevel
from octree_slam_tpu.map import mips as mips_mod
from octree_slam_tpu.map import morton
from octree_slam_tpu.map import svo
from octree_slam_tpu.map.svo import SVONodePool
from octree_slam_tpu.render import raycast
from octree_slam_tpu.render.splat import LeafList, append_new_leaves, \
    append_new_leaves_cached, create_leaf_list, \
    leaf_list_from_extraction, render_splat
from octree_slam_tpu.sensor import tracking


class SLAMState(NamedTuple):
    pool: SVONodePool
    leaves: LeafList
    accel: object              # render acceleration: mips.RenderCache when
                               # cfg.use_dense_mips, else raycast.AccelGrid
    pose: jnp.ndarray          # f32[4,4] world_T_cam
    last_pyramid: Tuple[PyramidLevel, ...]
    initialized: jnp.ndarray   # bool[] at least one frame ingested
    frame_idx: jnp.ndarray     # i32[]
    diverged: jnp.ndarray      # bool[] tracking lost at some frame
    interior_stale: jnp.ndarray  # bool[] lazy frames deferred the interior
                                 # mipmap + dense-mirror refresh
    # Keyframe anchor (cfg.track_keyframe; empty pytrees when disabled so
    # the donated/checkpointed template stays shape-stable per config):
    key_pyramid: Tuple[PyramidLevel, ...]  # the anchor frame's maps
    key_pose: jnp.ndarray      # f32[4,4] world_T_key ((0,) when disabled)
    key_T_cam: jnp.ndarray     # f32[4,4] key_T_cam of the PREVIOUS frame
                               # (the GN seed; (0,) when disabled)
    # Insert directory cache (cfg.insert_dircache; (0,) arrays when off):
    # last frame's leaf key -> (pool node, post-blend value, registry
    # position), so repeat keys skip the insert descent, the pool-value
    # gather, and the registry's node2pos gather (svo.insert dir_* args +
    # splat.append_new_leaves_cached). Cleared by reset_dircache whenever
    # node indices, leaf values, or registry positions change under the
    # map (tiering._rebuild_derived, registry rebuilds in grow_state).
    dir_keys: jnp.ndarray      # i32[U] morton keys, INVALID_KEY = dead row
    dir_nodes: jnp.ndarray     # i32[U] leaf node indices, -1 = dead row
    dir_vals: jnp.ndarray      # u32[U] the keys' current packed values
    dir_pos: jnp.ndarray       # i32[U] registry positions, -1 = unknown
    # Saturation-gate bitmask (cfg.saturation_gate; (0,) when off):
    # bit (key & 31) of word (key >> 5) is 1 iff the leaf at that morton
    # key reached alpha == 255. Points landing in a set-bit leaf are
    # dropped BEFORE the insert's key sort — at alpha 255 the blend moves
    # a channel only for |new - old| >= 128, so re-observation is a
    # quantization no-op (fillNodes weight a/256, svo.cu:326-332). Bits
    # are set by scatter-ADD on the once-per-leaf-lifetime saturation
    # transition (InsertStats.sat_transition); any pool REBUILD that
    # changes the key space (reroot) or drops leaves (tiering spill) must
    # rebuild it from the live registry (rebuild_sat_mask, wired into
    # tiering._rebuild_derived). Capacity growth by plain pad keeps keys
    # and the mask valid.
    sat_mask: jnp.ndarray      # u32[2^(3*max_depth) / 32]
    # Dense-mirror staleness for the HYBRID renderer (use_dense_mips
    # runs; scalar False otherwise): True when some lazy frame since the
    # last full rebuild did NOT maintain the mirror's leaf level +
    # occupancy (splat/cone/none frames skip even the cheap leaf_mirror
    # scatters). The cone_hybrid branch heals it in one lax.cond
    # (refresh_interior + rebuild_from_pool) before fusing — without
    # this, switching render modes mid-run (or run_slam's
    # render_every > 1 "none" frames) would hand the band march a stale
    # leaf mip and it would march through geometry. Distinct from
    # interior_stale: eager frames update the mirror INCREMENTALLY, which
    # cannot heal staleness accumulated before them.
    mirror_stale: jnp.ndarray  # bool[]
    # Fused-dist STAMP staleness, separate from mirror CONTENT staleness
    # (round-5 fix: conflating them made every eager cone_march frame
    # re-heal — a full 613 MB mirror rebuild per frame, measured as a
    # 2x full-pipeline regression on --config conescale): True when the
    # mirror's free leaf cells lack current encode_free_dist stamps even
    # though the leaf values themselves are current (eager non-hybrid
    # frames update content incrementally but never stamp). Hybrid
    # frames re-stamp off (had_new | mirror_stale | stamps_stale);
    # the eager heal ignores it. Scalar False when fused stamps are off.
    stamps_stale: jnp.ndarray  # bool[]


class StepOutput(NamedTuple):
    framebuffer: jnp.ndarray   # f32[H, W, 4]
    pose: jnp.ndarray          # f32[4,4]
    track_inliers: jnp.ndarray
    track_residual: jnp.ndarray
    map_nodes: jnp.ndarray     # i32[] total allocated nodes
    map_leaves: jnp.ndarray    # i32[] leaf voxels registered
    map_overflowed: jnp.ndarray  # bool[] any static capacity exceeded
    diverged: jnp.ndarray
    unique_overflow: jnp.ndarray  # bool[] frame touched > unique_cap leaves;
                                  # finish via insert_remainder(last_key)
    last_insert_key: jnp.ndarray  # i32[] resume cursor for the remainder


def _accel_level(cfg: SLAMConfig) -> int:
    return max(1, min(cfg.accel_level, cfg.max_depth - 2))


def _miss_cap(cfg: SLAMConfig) -> int:
    """Static lane count for the directory fast path's miss descent.
    Default: a quarter of the unique cap — frame-to-frame camera motion
    first-sees a few percent of a frame's leaves, so 25% headroom keeps
    the lax.cond fallback (full-width descent) rare while the miss
    descent's gather chain runs 4x narrower."""
    if cfg.insert_miss_cap > 0:
        return min(cfg.insert_miss_cap, cfg.insert_unique_cap)
    return min(max(1024, cfg.insert_unique_cap // 4),
               cfg.insert_unique_cap)


def heal_for_march(state: "SLAMState", cfg: SLAMConfig):
    """Heal lazy-interior staleness for a DIRECT marcher call.

    Lazy frames (cfg.lazy_interior) leave interior node values and the
    dense mirror STALE; anything that calls raycast.cone_trace_dense /
    the BFS extractor outside pipeline.step must refresh both first
    (pipeline.step self-heals only for render="cone_march").
    Returns (pool, cache) ready for the marcher. Idempotent — safe to
    call on a non-stale state.
    """
    lvl = _accel_level(cfg)
    pool = svo.refresh_interior(state.pool, depth=cfg.max_depth)
    cache = mips_mod.rebuild_from_pool(pool, max_depth=cfg.max_depth,
                                       dist_level=lvl,
                                       max_skip=cfg.dist_max_skip)
    return pool, cache


def _fuse_once(pool, leaves, accel, world_pts, colors, valid,
               cfg: SLAMConfig, *, eager: bool,
               min_key=None, with_dist: bool, dircache=None,
               want_tpos: bool = False, leaf_mirror: bool = False,
               sat_mask=None):
    """One insert pass + registry append + accel maintenance — the single
    definition behind the step's primary insert, its in-device remainder
    pages, and the host-driven insert_remainder (they previously drifted:
    only the primary pass may refresh the distance field).

    Without dense mips the AccelGrid is NOT maintained here: only the
    exact marcher reads it, and step's cone_march branch rebuilds it
    unconditionally per frame (direct marcher callers outside step must
    build_accel themselves — same contract as heal_for_march for the
    dense mirror). The previous shallow-alloc-triggered lax.cond rebuild
    re-fired nearly every frame on 1 cm maps (new 8 cm tiles keep
    appearing), a traced 15.7 ms/frame spent on a renderer that was not
    in use (round-3 depth-9/1cm trace)."""
    lvl = _accel_level(cfg)
    dk, dn, dv, dp = (dircache if dircache is not None
                      else (None, None, None, None))
    pool, st = svo.insert(pool, world_pts, colors, valid=valid,
                          depth=cfg.max_depth,
                          unique_cap=cfg.insert_unique_cap,
                          emit_mips=cfg.use_dense_mips and eager,
                          shallow_level=lvl, min_key=min_key,
                          update_interior=eager,
                          dir_keys=dk, dir_nodes=dn, dir_vals=dv,
                          dir_aux=dp,
                          miss_cap=(_miss_cap(cfg) if dircache is not None
                                    else 0))
    if want_tpos:
        # cached registry refresh: hit rows carry their position through
        # stats.hit_aux; only misses gather node2pos (miss_cap lanes).
        # tpos (every touched row's position) becomes next frame's
        # dir_pos payload.
        leaves, tpos = append_new_leaves_cached(leaves, st,
                                                _miss_cap(cfg))
    else:
        leaves = append_new_leaves(leaves, st)
        tpos = None
    if cfg.use_dense_mips and eager:
        # Dense-mip render cache (map/mips.py): mirror this insert's
        # touched values and occupancy; refresh the empty-space distance
        # field only when the exact marcher will read it this frame.
        accel = mips_mod.update(accel, st.mip_idx, st.mip_val,
                                max_depth=cfg.max_depth, dist_level=lvl,
                                max_skip=cfg.dist_max_skip,
                                with_dist=with_dist)
    elif leaf_mirror and cfg.use_dense_mips:
        # Hybrid-renderer lazy maintenance: the band march samples ONLY
        # the leaf level + the dist field's occupancy, so lazy frames can
        # keep it current with one leaf-value scatter + one occupancy
        # scatter (new leaves are the only events that newly occupy a
        # dist cell) instead of the eager interior mipmap. The distance
        # transform itself is refreshed once per hybrid frame by step's
        # lax.cond on new-leaf activity; interior mip levels STAY STALE
        # (interior_stale protocol unchanged).
        total = mips_mod.total_cells(cfg.max_depth)
        tkeys = st.touched_leaf_keys
        tval = tkeys != morton.INVALID_KEY
        # indices are provably unique: valid rows are distinct registry
        # rows (distinct leaf keys -> distinct cells) and each invalid row
        # gets its OWN out-of-bounds slot (total + lane) so mode="drop"
        # discards it — unique_indices=True then lets XLA skip the
        # scatter's duplicate-combine machinery on this 512^3 table
        flat = jnp.where(
            tval, mips_mod.flat_index(tkeys, cfg.max_depth, cfg.max_depth),
            total + jnp.arange(tkeys.shape[0], dtype=jnp.int32))
        values = accel.values.at[flat].set(st.touched_leaf_vals,
                                           mode="drop",
                                           unique_indices=True)
        g = 1 << lvl
        nk = st.new_leaf_keys
        nval = nk >= 0
        lx, ly, lz = mips_mod.deinterleave3(
            jnp.where(nval, nk >> (3 * (cfg.max_depth - lvl)), 0), lvl)
        xyz = (lz << (2 * lvl)) | (ly << lvl) | lx
        occ = accel.occ.at[jnp.where(nval, xyz, g * g * g)].set(
            True, mode="drop")
        accel = accel._replace(values=values, occ=occ)
    if sat_mask is not None and sat_mask.shape[0] > 0:
        # Saturation-gate maintenance: set each NEWLY saturated leaf's
        # bit. sat_transition fires exactly once per leaf lifetime (and
        # gated leaves are never re-blended), so scatter-ADD of the
        # per-row bit is an exact OR even when several rows share a word.
        tr = st.sat_transition
        tk = jnp.where(tr, st.touched_leaf_keys, 0)
        widx = jnp.where(tr, tk >> 5, sat_mask.shape[0])
        bits = jnp.where(tr, jnp.uint32(1) << (tk & 31).astype(jnp.uint32),
                         jnp.uint32(0))
        sat_mask = sat_mask.at[widx].add(bits, mode="drop")
    return pool, leaves, accel, sat_mask, st, tpos


def _fuse_colors(frame: Frame, cfg: SLAMConfig) -> jnp.ndarray:
    """Frame colors on cfg.fuse_level's pixel grid, as f32[N, 3] in [0,1].

    The depth pyramid decimates at the (2x, 2y) sample (subsample_depth),
    so plain 2x decimation keeps colors registered with the fused vertex
    map (the reference's subsampleKernel pairing, image_kernels.cu:291)."""
    from octree_slam_tpu.sensor.image_ops import decimate2
    colors = frame.color
    for _ in range(cfg.fuse_level):
        colors = decimate2(colors)
    return colors.reshape(-1, 3).astype(jnp.float32) / 255.0


def _empty_pyramid(cfg: SLAMConfig) -> Tuple[PyramidLevel, ...]:
    # shapes must mirror tracking.build_pyramid exactly (the state template
    # validates checkpoints and the donated step reuses these buffers):
    # levels finer than every consumer hold 1x1 placeholder maps
    min_map_level = min(cfg.track_finest_level, cfg.fuse_level)
    levels = []
    for i in range(cfg.pyramid_depth):
        h, w = cfg.level_shape(i) if i >= min_map_level else (1, 1)
        ih, iw = cfg.level_shape(i)
        levels.append(
            PyramidLevel(
                vertex=jnp.full((h, w, 3), jnp.inf, jnp.float32),
                normal=jnp.full((h, w, 3), jnp.inf, jnp.float32),
                intensity=jnp.zeros((ih, iw), jnp.float32),
            )
        )
    return tuple(levels)


def init_state(cfg: SLAMConfig, map_center=(0.0, 0.0, 0.0),
               initial_pose: jnp.ndarray | None = None) -> SLAMState:
    half_size = cfg.voxel_resolution * (2 ** (cfg.max_depth - 1))
    pool = svo.create(cfg.node_capacity, jnp.asarray(map_center, jnp.float32),
                      jnp.float32(half_size))
    # copy the caller's pose: hot loops donate state buffers
    pose = (jnp.eye(4, dtype=jnp.float32) if initial_pose is None
            else jnp.array(initial_pose, jnp.float32, copy=True))
    return SLAMState(
        pool=pool,
        leaves=create_leaf_list(cfg.leaf_capacity, cfg.node_capacity),
        accel=(mips_mod.create(max_depth=cfg.max_depth,
                               dist_level=_accel_level(cfg),
                               max_skip=cfg.dist_max_skip)
               if cfg.use_dense_mips
               else raycast.build_accel(pool, level=_accel_level(cfg))),
        pose=pose,
        last_pyramid=_empty_pyramid(cfg),
        initialized=jnp.bool_(False),
        frame_idx=jnp.int32(0),
        diverged=jnp.bool_(False),
        interior_stale=jnp.bool_(False),
        key_pyramid=(_empty_pyramid(cfg) if cfg.track_keyframe else ()),
        key_pose=(jnp.array(pose, copy=True) if cfg.track_keyframe
                  else jnp.zeros((0,), jnp.float32)),
        key_T_cam=(jnp.eye(4, dtype=jnp.float32) if cfg.track_keyframe
                   else jnp.zeros((0,), jnp.float32)),
        dir_keys=(jnp.full((cfg.insert_unique_cap,), morton.INVALID_KEY,
                           jnp.int32) if cfg.insert_dircache
                  else jnp.zeros((0,), jnp.int32)),
        dir_nodes=(jnp.full((cfg.insert_unique_cap,), -1, jnp.int32)
                   if cfg.insert_dircache
                   else jnp.zeros((0,), jnp.int32)),
        dir_vals=(jnp.zeros((cfg.insert_unique_cap,), jnp.uint32)
                  if cfg.insert_dircache
                  else jnp.zeros((0,), jnp.uint32)),
        dir_pos=(jnp.full((cfg.insert_unique_cap,), -1, jnp.int32)
                 if cfg.insert_dircache
                 else jnp.zeros((0,), jnp.int32)),
        sat_mask=(jnp.zeros(((1 << (3 * cfg.max_depth)) // 32,), jnp.uint32)
                  if cfg.saturation_gate
                  else jnp.zeros((0,), jnp.uint32)),
        mirror_stale=jnp.bool_(False),
        stamps_stale=jnp.bool_(False),
    )


def rebuild_sat_mask(state: SLAMState, cfg: SLAMConfig) -> SLAMState:
    """Reconstruct the saturation-gate bitmask from the LIVE leaf registry
    (alpha == 255 leaves only) — REQUIRED after any operation that changes
    the key space (reroot) or removes leaves from the pool (tiering
    spill): a stale set bit for a live unsaturated key would silently
    drop its observations, and spilled leaves should re-gate only once
    restored. Registry keys are unique, so one scatter-ADD of each key's
    bit is an exact OR."""
    if state.sat_mask.shape[0] == 0:
        return state
    lv = state.leaves
    from octree_slam_tpu.core import packing
    sat = (lv.keys >= 0) & (packing.alpha_of(lv.vals) == 255)
    k = jnp.where(sat, lv.keys, 0)
    widx = jnp.where(sat, k >> 5, state.sat_mask.shape[0])
    bits = jnp.where(sat, jnp.uint32(1) << (k & 31).astype(jnp.uint32),
                     jnp.uint32(0))
    mask = jnp.zeros_like(state.sat_mask).at[widx].add(bits, mode="drop")
    return state._replace(sat_mask=mask)


def reset_dircache(state: SLAMState) -> SLAMState:
    """Clear the insert directory cache — REQUIRED after any operation
    that changes leaf keys or node indices out from under the map (pool
    rebuilds: tiering spill, growth across a prealloc boundary, reroot).
    A stale entry would silently blend a leaf into the wrong node; a
    cleared cache merely costs one full-descent frame."""
    if state.dir_keys.shape[0] == 0:
        return state
    return state._replace(
        dir_keys=jnp.full_like(state.dir_keys, morton.INVALID_KEY),
        dir_nodes=jnp.full_like(state.dir_nodes, -1),
        dir_vals=jnp.zeros_like(state.dir_vals),
        dir_pos=jnp.full_like(state.dir_pos, -1))


def grow_state(state: SLAMState, cfg: SLAMConfig, *,
               grow_nodes: bool = True,
               grow_leaves: bool = False) -> Tuple[SLAMState, SLAMConfig]:
    """Double the node pool and/or leaf registry capacity, preserving all
    content (the reference reallocs per insert, svo.cu:609-614; here
    growth is amortized to doublings because shape changes recompile the
    jitted step). Child pointers and node indices are absolute, so the
    pool pads in place; the leaf registry pads, or is rebuilt from the
    pool when it had overflowed (re-registering leaves that could not be
    appended)."""
    import dataclasses

    new_cfg = dataclasses.replace(
        cfg,
        node_capacity=cfg.node_capacity * (2 if grow_nodes else 1),
        leaf_capacity=cfg.leaf_capacity * (2 if grow_leaves else 1),
    )
    if grow_nodes and (svo.prealloc_levels(new_cfg.node_capacity)
                       != svo.prealloc_levels(cfg.node_capacity)):
        # Doubling crosses a dense-prealloc boundary (tiny pools, or big
        # ones entering the level-5/6 dense regime): a plain pad cannot
        # preserve the shallow layout, so rebuild from the exact leaf set
        # (svo.insert_exact reproduces every value bit-identically).
        from octree_slam_tpu.map import tiering
        pool0, keys, vals = tiering._leaf_snapshot(state, cfg)
        state = state._replace(pool=pool0,
                               interior_stale=jnp.bool_(False))
        fresh = svo.create(new_cfg.node_capacity, pool0.center,
                           pool0.half_size)
        fresh, _ = tiering._insert_all_exact(fresh, keys, vals, new_cfg,
                                             overwrite=True)
        return tiering._rebuild_derived(state, new_cfg, fresh)
    pool = (svo.grow_capacity(state.pool, new_cfg.node_capacity)
            if grow_nodes else state.pool)

    leaves = state.leaves
    if bool(leaves.overflowed):
        # the registry rebuild extracts occupied leaves by BFS, which reads
        # interior occupancy — refresh first if lazy frames deferred it
        if bool(state.interior_stale):
            pool = svo.refresh_interior(pool, depth=cfg.max_depth)
            state = state._replace(pool=pool)
        # some first-seen leaves were never registered (appends are
        # first-write-only): rebuild the registry from the pool itself,
        # doubling until the full leaf set fits
        ex, cap = svo.extract_all_leaves(
            pool, depth=new_cfg.max_depth,
            start_capacity=new_cfg.leaf_capacity)
        new_cfg = dataclasses.replace(new_cfg, leaf_capacity=cap)
        leaves = leaf_list_from_extraction(
            ex, pool.value, node_capacity=new_cfg.node_capacity)
        # registry positions just changed: cached dir_pos entries would
        # point the vals mirror at the wrong rows
        state = reset_dircache(state)
    else:
        lc_pad = new_cfg.leaf_capacity - leaves.keys.shape[0]
        nc_pad = new_cfg.node_capacity - leaves.node2pos.shape[0]
        leaves = LeafList(
            keys=jnp.concatenate(
                [leaves.keys, jnp.full((lc_pad,), -1, jnp.int32)]),
            nodes=jnp.concatenate(
                [leaves.nodes, jnp.zeros((lc_pad,), jnp.int32)]),
            vals=jnp.concatenate(
                [leaves.vals, jnp.zeros((lc_pad,), jnp.uint32)]),
            node2pos=jnp.concatenate(
                [leaves.node2pos, jnp.full((nc_pad,), -1, jnp.int32)]),
            count=leaves.count,
            overflowed=leaves.overflowed,
        ) if (lc_pad or nc_pad) else leaves

    # accel is capacity-independent: RenderCache is sized by max_depth;
    # AccelGrid entries are node indices, which growth preserves
    return state._replace(pool=pool, leaves=leaves), new_cfg


@functools.partial(jax.jit, static_argnames=("cfg", "render"))
def step(state: SLAMState, frame: Frame, cfg: SLAMConfig,
         render: str = "splat") -> Tuple[SLAMState, StepOutput]:
    """One SLAM frame: preprocess -> ICP track -> fuse -> render.

    Mirrors mainLoop (main.cpp:31-64) with RGBDCamera::update enabled
    (the capability is built in the reference but commented out of the loop,
    main.cpp:35).
    """
    # --- Preprocess: bilateral + pyramid of vertex/normal maps. ---
    pyramid = tracking.build_pyramid(frame.depth, frame.color, cfg)

    # --- Track: cam_{t-1}_T_cam_t from coarse-to-fine point-to-plane ICP
    # against the previous FRAME (reference semantics, rgbd_camera.cpp).
    # Frame-to-MODEL tracking (ICP against a splat render of the map) was
    # measured and rejected for the hot path: occupancy leaves render
    # blocky, nearest-fill hole dilation biases the model surface toward
    # the camera, and orbit ATE degraded 0.22 m -> 0.90 m. The model-view
    # machinery lives on in relocalize.py, where coarse accuracy is all a
    # recovery needs. ---
    eye = jnp.eye(4, dtype=jnp.float32)
    if cfg.track_keyframe:
        # Keyframe anchoring: ICP against the ANCHOR frame's maps (drift
        # accrues per keyframe, not per frame), seeded by the previous
        # frame's key-relative transform so GN starts one frame from the
        # optimum. Re-anchor when the camera moves keyframe_max_dist /
        # keyframe_max_angle_deg from the anchor (never on a diverged
        # solve: a bad pose must not become the new anchor).
        update_T, tstats = tracking.track(
            list(state.key_pyramid), list(pyramid), cfg,
            init_T=state.key_T_cam)
        update_T = jnp.where(state.initialized, update_T, eye)
        pose = jnp.where(state.initialized,
                         state.key_pose @ update_T, state.pose)
        diverged = state.diverged | (state.initialized & tstats.diverged)
        t_dist = jnp.linalg.norm(update_T[:3, 3])
        cos_ang = jnp.clip((jnp.trace(update_T[:3, :3]) - 1.0) * 0.5,
                           -1.0, 1.0)
        far = (t_dist > cfg.keyframe_max_dist) | (
            cos_ang < math.cos(
                math.radians(cfg.keyframe_max_angle_deg)))
        re_anchor = (~state.initialized) | (
            far & ~tstats.diverged)
        key_pyramid = jax.tree_util.tree_map(
            lambda new, old: jnp.where(re_anchor, new, old),
            tuple(pyramid), state.key_pyramid)
        key_pose = jnp.where(re_anchor, pose, state.key_pose)
        key_T_cam = jnp.where(re_anchor, eye, update_T)
    else:
        update_T, tstats = tracking.track(list(state.last_pyramid),
                                          list(pyramid), cfg)
        update_T = jnp.where(state.initialized, update_T, eye)
        pose = state.pose @ update_T
        diverged = state.diverged | (state.initialized & tstats.diverged)
        key_pyramid = state.key_pyramid
        key_pose = state.key_pose
        key_T_cam = state.key_T_cam

    # --- Fuse: full-res camera-frame points -> world -> SVO insert
    #     (main.cpp:39-44 -> svoFromPointCloud). ---
    # Interior laziness: splat and the slab cone read only leaf values, so
    # lazy frames skip the bottom-up mipmap and every dense-mirror update
    # (~7 ms). An eager frame (the exact marcher, or lazy_interior=False)
    # first self-heals any deferred staleness in one lax.cond.
    eager = (not cfg.lazy_interior) or (render == "cone_march")
    lvl = _accel_level(cfg)
    pool_in, accel_in = state.pool, state.accel

    def _heal(operand):
        p, a = operand
        p = svo.refresh_interior(p, depth=cfg.max_depth)
        if cfg.use_dense_mips:
            a = mips_mod.rebuild_from_pool(
                p, max_depth=cfg.max_depth, dist_level=lvl,
                max_skip=cfg.dist_max_skip)
        return p, a

    if eager and cfg.lazy_interior:
        # eager frames update the mirror INCREMENTALLY, so staleness
        # accumulated by earlier lazy frames (interior values OR a
        # mirror left behind by non-mirror-maintaining renders) must be
        # healed first
        pool_in, accel_in = jax.lax.cond(
            state.interior_stale | state.mirror_stale, _heal,
            lambda o: o, (pool_in, accel_in))
    elif render == "cone_hybrid" and cfg.use_dense_mips \
            and cfg.lazy_interior:
        # hybrid frames maintain the leaf level + occupancy themselves
        # (leaf_mirror scatters below), but only on top of a CURRENT
        # mirror: heal once after any splat/cone/none lazy frames
        pool_in, accel_in = jax.lax.cond(
            state.mirror_stale, _heal, lambda o: o, (pool_in, accel_in))

    v = pyramid[cfg.fuse_level].vertex.reshape(-1, 3)
    world_pts = v @ pose[:3, :3].T + pose[:3, 3]
    colors = _fuse_colors(frame, cfg)
    # Lost tracking gates fusion: the reference aborts the frame's update
    # on divergence (rgbd_camera.cpp:148-151 returns before the swap) —
    # fusing at a bogus pose would poison the map. With relocalization
    # available the gate is the STICKY flag (recovery clears it); without
    # it the gate is per-frame only — a transient bad frame is skipped but
    # fusion resumes once tracking re-locks, matching the reference's
    # per-frame abort rather than freezing the map forever.
    gate = diverged if cfg.recovery_enabled \
        else (state.initialized & tstats.diverged)
    fuse_ok = jnp.broadcast_to(~gate, (world_pts.shape[0],))
    if cfg.saturation_gate:
        # Saturation pre-gate (round-3 verdict #2): points whose leaf is
        # already alpha-saturated are a quantization no-op to blend —
        # drop them BEFORE the sort via one bitmask gather, so the
        # frame's genuinely-new uniques (not its full re-observation
        # load) size the per-unique work. Early frames overflow the
        # (smaller) unique_cap and page via device_remainder; steady
        # state fits one pass.
        gkeys, gvalid = morton.encode(world_pts, pool_in.center,
                                      pool_in.half_size, cfg.max_depth)
        word = state.sat_mask[jnp.where(gvalid, gkeys >> 5, 0)]
        satbit = (word >> (gkeys & 31).astype(jnp.uint32)) & jnp.uint32(1)
        fuse_ok = fuse_ok & ~(gvalid & (satbit == 1))
    # Directory cache (cfg.insert_dircache): last frame's key ->
    # (node, value, registry position) map lets the PRIMARY insert skip
    # its descent + value gather + node2pos gather for repeat keys. Lazy
    # frames only — the eager mipmap needs full per-level paths — and the
    # remainder pages below run uncached (their key ranges barely overlap
    # the primary page's directory). tpos (every touched row's registry
    # position) is tracked whenever the cache EXISTS, eager frames
    # included, so the next lazy frame starts with a warm position map.
    have_dir = state.dir_keys.shape[0] > 0
    dircache = ((state.dir_keys, state.dir_nodes, state.dir_vals,
                 state.dir_pos) if (not eager) and have_dir else None)
    needs_mirror = (render == "cone_hybrid") and cfg.use_dense_mips \
        and not eager
    pool, leaves, accel, sat_mask, istats, tpos = _fuse_once(
        pool_in, state.leaves, accel_in, world_pts, colors, fuse_ok, cfg,
        eager=eager,
        with_dist=(render in ("cone_march", "cone_hybrid")),
        dircache=dircache, want_tpos=have_dir, leaf_mirror=needs_mirror,
        sat_mask=state.sat_mask)

    if cfg.device_remainder:
        # Unique-cap remainder ON DEVICE: while a frame still has distinct
        # leaves beyond insert_unique_cap, page through them in sorted key
        # order inside a lax.while_loop — the lossless guarantee without
        # any host round trip (the host-driven variant, insert_remainder,
        # remains for device_remainder=False). Terminates because min_key
        # strictly advances each page and a frame has finitely many
        # uniques. Runs BEFORE render, so oversized frames render complete.
        def _more(c):
            return c[0]

        def _page(c):
            _, last_key, pool_c, leaves_c, accel_c, sat_c = c
            pool_n, leaves_n, accel_n, sat_n, st, _ = _fuse_once(
                pool_c, leaves_c, accel_c, world_pts, colors, fuse_ok,
                cfg, eager=eager, min_key=last_key, with_dist=False,
                leaf_mirror=needs_mirror, sat_mask=sat_c)
            return (st.unique_overflow, st.last_key, pool_n, leaves_n,
                    accel_n, sat_n)

        uo_out, lk_out, pool, leaves, accel, sat_mask = jax.lax.while_loop(
            _more, _page,
            (istats.unique_overflow, istats.last_key, pool, leaves, accel,
             sat_mask))
        if cfg.use_dense_mips and eager and render in ("cone_march",
                                                       "cone_hybrid"):
            # pages update occupancy with with_dist=False; if any ran,
            # re-run the distance transform so THIS frame's march does not
            # empty-space-skip through the just-inserted tail geometry
            accel = jax.lax.cond(
                istats.unique_overflow,
                lambda a: mips_mod.refresh_dist(
                    a, dist_level=lvl, max_skip=cfg.dist_max_skip),
                lambda a: a, accel)
    else:
        uo_out, lk_out = istats.unique_overflow, istats.last_key

    # --- Render the map from the tracked pose. ---
    if render == "cone":
        # Real-time cone compositing: slab-volume splatting over the leaf
        # registry (render/conesplat.py) — same accumulation semantics as
        # the march, no per-ray loop.
        from octree_slam_tpu.render import conesplat
        spec = conesplat.make_slab_spec(
            width=cfg.width, height=cfg.height, fx=cfg.focal_x,
            leaf_size=cfg.voxel_resolution, z_near=cfg.cone_znear,
            z_far=cfg.max_range, n_slabs=cfg.cone_slabs,
            max_scale=cfg.cone_max_scale)
        fb = conesplat.render_cone_splat(
            leaves, pool.center, pool.half_size, pose,
            cfg.focal_x, cfg.focal_y, spec=spec, depth=cfg.max_depth)
    elif render == "cone_hybrid":
        # Production cone mode: slab composite + seeded exact march of the
        # edge band (render/hybrid.py). Stays on LAZY frames: the band
        # march reads only the leaf mip level + the dist field, which
        # _fuse_once's leaf_mirror scatters keep current; the distance
        # transform re-runs only when this frame created leaves (steady
        # state skips it). Requires cfg.use_dense_mips.
        from octree_slam_tpu.render import hybrid as hybrid_mod
        assert cfg.use_dense_mips, \
            "render='cone_hybrid' needs cfg.use_dense_mips (the band " \
            "march samples the dense leaf mip)"
        if needs_mirror:
            had_new = (istats.new_leaf_count > 0) | istats.unique_overflow

            def _redist(a):
                a = mips_mod.refresh_dist(a, dist_level=lvl,
                                          max_skip=cfg.dist_max_skip)
                if cfg.cone_band_fused_dist:
                    # single-gather band-march contract: free leaf cells
                    # carry the covering dist cell's skip distance; the
                    # stamps go stale exactly when `dist` does, so they
                    # ride the same trigger. state.mirror_stale joins it
                    # because a _heal this frame rebuilt the mirror
                    # WITHOUT stamps (rebuild_from_pool leaves free cells
                    # EMPTY — correct but skip-less for the fused body).
                    a = mips_mod.encode_free_dist(a, max_depth=cfg.max_depth,
                                                  dist_level=lvl)
                return a

            trigger = (had_new | state.mirror_stale | state.stamps_stale) \
                if cfg.cone_band_fused_dist else had_new
            accel = jax.lax.cond(trigger, _redist, lambda a: a, accel)
        if not needs_mirror and cfg.cone_band_fused_dist:
            # eager hybrid frames recompute `dist` inside mips.update every
            # frame (with_dist=True), so the free-cell stamps re-run
            # unconditionally here (the lazy path gates them on occupancy
            # changes instead)
            accel = mips_mod.encode_free_dist(accel, max_depth=cfg.max_depth,
                                              dist_level=lvl)
        from octree_slam_tpu.render import conesplat
        spec = conesplat.make_slab_spec(
            width=cfg.width, height=cfg.height, fx=cfg.focal_x,
            leaf_size=cfg.voxel_resolution, z_near=cfg.cone_znear,
            z_far=cfg.max_range, n_slabs=cfg.cone_slabs,
            max_scale=cfg.cone_max_scale)
        fb = hybrid_mod.render_cone_hybrid(
            leaves, accel, pool.center, pool.half_size, pose,
            cfg.focal_x, cfg.focal_y, spec=spec, depth=cfg.max_depth,
            dist_level=lvl, max_range=cfg.max_range,
            start_dist=cfg.start_dist, band_cap=cfg.cone_band_cap,
            band_iters=cfg.cone_band_iters, crawl=cfg.cone_band_crawl,
            fused_dist=cfg.cone_band_fused_dist,
            depth_prio=cfg.cone_band_depth_prio,
            compact_after=cfg.cone_band_compact_after,
            sel_decimate=cfg.cone_band_sel_decimate)
    elif render == "cone_march":
        if cfg.use_dense_mips:
            s = max(1, cfg.cone_scale)
            assert cfg.width % s == 0 and cfg.height % s == 0, \
                "cone_scale must divide the frame size"
            fb = raycast.cone_trace_dense(
                accel, pool.center, pool.half_size, pose,
                cfg.focal_x / s, cfg.focal_y / s,
                width=cfg.width // s, height=cfg.height // s,
                max_depth=cfg.max_depth,
                dist_level=lvl, max_iters=cfg.max_march_iters,
                max_range=cfg.max_range, start_dist=cfg.start_dist,
                max_skip=cfg.dist_max_skip)
            if s > 1:  # nearest upsample back to the display resolution
                fb = jnp.repeat(jnp.repeat(fb, s, axis=0), s, axis=1)
                fb = fb[:cfg.height, :cfg.width]
        else:
            # non-dense accel is NOT maintained by the fuse path (see
            # _fuse_once): rebuild the entry grid for this march frame —
            # ~16 ms against a march that costs ~30x that
            accel = raycast.build_accel(pool, level=lvl)
            fb = raycast.cone_trace(
                pool, pose, cfg.focal_x, cfg.focal_y,
                width=cfg.width, height=cfg.height, max_depth=cfg.max_depth,
                max_iters=cfg.max_march_iters, max_range=cfg.max_range,
                start_dist=cfg.start_dist, accel=accel, accel_level=lvl)
    elif render == "splat":
        fb = render_splat(
            pool, leaves, pose, cfg.focal_x, cfg.focal_y,
            width=cfg.width, height=cfg.height, depth=cfg.max_depth,
            max_range=cfg.max_range)
    else:
        fb = jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)

    new_state = SLAMState(
        pool=pool,
        leaves=leaves,
        accel=accel,
        pose=pose,
        last_pyramid=tuple(pyramid),
        initialized=jnp.bool_(True),
        frame_idx=state.frame_idx + 1,
        diverged=diverged,
        interior_stale=jnp.bool_(not eager),
        key_pyramid=key_pyramid,
        key_pose=key_pose,
        key_T_cam=key_T_cam,
        # next frame's directory = every leaf this PRIMARY insert blended
        # (hits and misses alike; gated frames blend nothing, so a
        # diverged frame naturally empties the cache)
        dir_keys=(istats.touched_leaf_keys
                  if have_dir else state.dir_keys),
        dir_nodes=(istats.touched_leaf_nodes
                   if have_dir else state.dir_nodes),
        dir_vals=(istats.touched_leaf_vals
                  if have_dir else state.dir_vals),
        dir_pos=(tpos if have_dir else state.dir_pos),
        sat_mask=sat_mask,
        # eager frames healed + updated the mirror; hybrid lazy frames
        # healed + maintained its leaf level; every other lazy frame
        # leaves it behind (see SLAMState.mirror_stale). CONTENT only —
        # with the fused single-gather band march, an eager NON-hybrid
        # frame's mirror is current but UNSTAMPED (mips.update /
        # rebuild_from_pool leave free cells EMPTY), which the SEPARATE
        # stamps_stale flag records so the next hybrid frame re-stamps
        # without the eager path re-healing a current mirror every frame.
        mirror_stale=(jnp.bool_(not (eager or needs_mirror))
                      if cfg.use_dense_mips else state.mirror_stale),
        stamps_stale=(jnp.bool_(render != "cone_hybrid")
                      if (cfg.use_dense_mips and cfg.cone_band_fused_dist)
                      else jnp.bool_(False)),
    )
    out = StepOutput(
        framebuffer=fb,
        pose=pose,
        track_inliers=tstats.inliers,
        track_residual=tstats.residual,
        map_nodes=pool.n_nodes,
        map_leaves=leaves.count,
        map_overflowed=pool.overflowed | leaves.overflowed,
        diverged=diverged,
        unique_overflow=uo_out,
        last_insert_key=lk_out,
    )
    return new_state, out


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=0)
def insert_remainder(state: SLAMState, frame: Frame, cfg: SLAMConfig,
                     min_key: jnp.ndarray
                     ) -> Tuple[SLAMState, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Fuse the unique-cap remainder of the CURRENT frame (the one `step`
    just consumed: its fused vertex map is state.last_pyramid[fuse_level]
    and its pose is state.pose). Uniques are processed in sorted key order, so
    masking keys > min_key continues exactly where step's insert stopped —
    each leaf blends once in total. Returns the new state plus
    (unique_overflow, last_key) to drive the host loop; min_key is a
    dynamic scalar, so the loop never recompiles."""
    v = state.last_pyramid[cfg.fuse_level].vertex.reshape(-1, 3)
    world_pts = v @ state.pose[:3, :3].T + state.pose[:3, 3]
    colors = _fuse_colors(frame, cfg)
    valid = None
    if cfg.saturation_gate:
        # same pre-gate as step: remainder keys (> min_key) were not
        # touched by earlier passes, so their bits are unchanged and the
        # probe is exact
        gkeys, gvalid = morton.encode(world_pts, state.pool.center,
                                      state.pool.half_size, cfg.max_depth)
        word = state.sat_mask[jnp.where(gvalid, gkeys >> 5, 0)]
        satbit = (word >> (gkeys & 31).astype(jnp.uint32)) & jnp.uint32(1)
        valid = ~(gvalid & (satbit == 1))
    eager = not cfg.lazy_interior
    pool, leaves, accel, sat_mask, istats, _ = _fuse_once(
        state.pool, state.leaves, state.accel, world_pts, colors, valid,
        cfg, eager=eager, min_key=min_key, with_dist=False,
        sat_mask=state.sat_mask)
    new_state = state._replace(
        pool=pool, leaves=leaves, accel=accel, sat_mask=sat_mask,
        # a lazy remainder skips the interior mipmap + mirror updates: the
        # flag must record that even if the step that consumed this frame
        # was eager (cone_march) and had cleared it
        interior_stale=state.interior_stale | jnp.bool_(not eager),
        mirror_stale=state.mirror_stale
        | jnp.bool_(cfg.use_dense_mips and not eager),
        stamps_stale=state.stamps_stale
        | jnp.bool_(cfg.use_dense_mips and cfg.cone_band_fused_dist))
    return new_state, (istats.unique_overflow, istats.last_key)
