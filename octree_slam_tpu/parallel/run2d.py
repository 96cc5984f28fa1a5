"""Multi-chip application loop: run_slam for the 2-D ("px" x "map") mesh.

The reference's main loop is single-GPU (main.cpp:31-84); app.run_slam is
its single-chip TPU rebuild. This module drives distributed.slam_step_2d —
tracking sharded over image rows, the map Morton-range-sharded — with the
same host-loop disciplines run_slam established (round-2 verdict item #4),
brought to production parity in round 4 (round-3 verdict item #3):

  * ONE packed signal fetch per frame, read TRAILING one frame, so a frame
    costs max(step, fetch RTT) instead of step + 2*RTT;
  * capacity growth between frames via grow_sharded (doubling, recompile),
    triggered from the trailing signals at a 3/4-full headroom;
  * REBALANCE-BEFORE-GROW: when one shard triggers growth while holding
    > rebalance_factor x the mean leaf load, the Morton ranges are re-cut
    first and the growth decision re-checked against the balanced loads —
    a hot shard no longer forces a uniform doubling of every shard's HBM
    (round-3 verdict item #6);
  * render modes "splat" (z-buffer pmin), "cone" (the production slab
    cone compositor, per-shard scatter-min + one pmin of packed words —
    distributed.render_sharded_cone), and "cone_hybrid" (slab + seeded
    edge-band march over the union leaf mirror —
    distributed.render_sharded_hybrid);
  * relocalization: with cfg.recovery_enabled the diverged flag LATCHES
    inside the step (fusion gated off) and the host loop re-anchors the
    camera by ICP against splat renders of the SHARDED map at recent
    keyposes (distributed.model_zbuffer_sharded + relocalize.score_zbuffer
    — the same recovery app.run_slam runs single-chip);
  * ShardedMap checkpointing (save_sharded / load_sharded) with the same
    capacity/semantics stamps app.save_state writes.

Growth and rebalancing change array shapes / routing only between frames —
the jitted step itself stays a fixed-shape program per (cfg, bounds epoch).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.parallel import distributed


def union_leaves(smap: distributed.ShardedMap):
    """(keys, vals) of every live leaf across shards, sorted by key — the
    canonical map content for bit-identity checks against a single-chip
    run (shards own disjoint key ranges, so keys are globally unique)."""
    k = np.asarray(smap.leaves.keys).ravel()
    v = np.asarray(smap.leaves.vals).ravel()
    live = k >= 0
    order = np.argsort(k[live], kind="stable")
    return k[live][order], v[live][order]


def relocalize_2d(state, cfg: SLAMConfig, mesh, keyposes):
    """Recover a lost camera on the 2-D mesh: render the SHARDED map at
    each recent keypose (per-shard splat + pmin), ICP the live pyramid
    against the render, accept the best candidate clearing the inlier
    gate. Mirrors relocalize.relocalize; per-candidate programs are fine
    here — recovery is rare and host-driven. Returns (pose|None, ok,
    diagnostics)."""
    from octree_slam_tpu import relocalize as reloc

    pyr = state[0]
    smap = state[3]
    cands = [np.asarray(c, np.float32)
             for c in keyposes[::-1][:cfg.reloc_candidates]]
    if not cands:
        return None, False, {"candidates_tried": 0, "inliers": -1,
                             "residual": None}
    best_pose, best_inl, best_res = None, -1, None
    for cand in cands:
        cand_dev = jnp.asarray(cand)
        buf = distributed.model_zbuffer_sharded(smap, cand_dev, cfg, mesh)
        row = np.asarray(reloc.score_zbuffer(buf, cand_dev, pyr, cfg))
        if row[18] > 0 and int(row[16]) > best_inl:
            best_pose = row[:16].reshape(4, 4)
            best_inl = int(row[16])
            best_res = float(row[17])
    return best_pose, best_pose is not None, {
        "candidates_tried": len(cands), "inliers": best_inl,
        "residual": best_res}


def save_sharded(path: str, state, cfg: SLAMConfig) -> None:
    """Checkpoint the 2-D-mesh SLAM state (sharded map + pose + pyramid)
    to npz with the same capacity/semantics stamps app.save_state writes
    (auto-growth changes capacities mid-run; the prealloc schedule is part
    of the pool's on-disk meaning)."""
    from octree_slam_tpu.map import svo
    smap = state[3]
    flat, _ = jax.tree_util.tree_flatten(state)
    np.savez_compressed(
        path, n=len(flat),
        node_capacity=cfg.node_capacity, leaf_capacity=cfg.leaf_capacity,
        prealloc=svo.prealloc_levels(cfg.node_capacity),
        width=cfg.width, height=cfg.height,
        pyramid_depth=cfg.pyramid_depth,
        track_finest_level=cfg.track_finest_level,
        fuse_level=cfg.fuse_level, max_depth=cfg.max_depth,
        map_split_level=cfg.map_split_level,
        insert_unique_cap=cfg.insert_unique_cap,
        voxel_resolution=cfg.voxel_resolution,
        n_shards=np.asarray(smap.bounds).shape[0],
        **{f"a{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_sharded(path: str, cfg: SLAMConfig, mesh
                 ) -> Tuple[tuple, SLAMConfig]:
    """Restore a save_sharded checkpoint onto `mesh`, re-placing every
    shard on its device. Capacities stored in the checkpoint override the
    caller's; the shard count must match the mesh's "map" axis (re-cutting
    a map to a different shard count goes through rebalance_sharded on a
    matching mesh first). Returns (state, cfg)."""
    import dataclasses
    from jax.sharding import NamedSharding, PartitionSpec as P
    from octree_slam_tpu import pipeline
    from octree_slam_tpu.map import svo

    z = np.load(path)
    m = mesh.shape["map"]
    stored_m = int(z["n_shards"])
    if stored_m != m:
        raise ValueError(
            f"checkpoint {path!r} holds {stored_m} map shards but the mesh "
            f"has {m} — restore on a matching mesh (then rebalance)")
    cfg = dataclasses.replace(
        cfg, node_capacity=int(z["node_capacity"]),
        leaf_capacity=int(z["leaf_capacity"]),
        map_split_level=int(z["map_split_level"]),
        width=int(z["width"]), height=int(z["height"]),
        pyramid_depth=int(z["pyramid_depth"]),
        track_finest_level=int(z["track_finest_level"]),
        fuse_level=int(z["fuse_level"]), max_depth=int(z["max_depth"]),
        insert_unique_cap=int(z["insert_unique_cap"]),
        voxel_resolution=float(z["voxel_resolution"]))
    cur = svo.prealloc_levels(cfg.node_capacity)
    if int(z["prealloc"]) != cur:
        raise ValueError(
            f"checkpoint {path!r} was written with {int(z['prealloc'])} "
            f"dense-preallocated octree levels but this build uses {cur} "
            f"for capacity {cfg.node_capacity} — pool layout incompatible")
    template = distributed.slam_init_2d(cfg, mesh)
    flat, treedef = jax.tree_util.tree_flatten(template)
    if int(z["n"]) != len(flat):
        raise ValueError(
            f"checkpoint {path!r} has {int(z['n'])} arrays but the config "
            f"expects {len(flat)} — written under a different SLAMConfig")
    loaded = []
    for i, t in enumerate(flat):
        a = z[f"a{i}"]
        if tuple(a.shape) != tuple(t.shape) or a.dtype != t.dtype:
            raise ValueError(
                f"checkpoint {path!r} array a{i}: stored "
                f"{a.dtype}{list(a.shape)} vs expected "
                f"{t.dtype}{list(t.shape)} — config mismatch")
        loaded.append(a)
    state = jax.tree_util.tree_unflatten(treedef, loaded)
    smap = state[3]
    shardings = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P("map", *([None] * (x.ndim - 1)))),
        smap)
    smap = jax.device_put(smap, shardings)
    rep = NamedSharding(mesh, P())
    rest0 = jax.device_put(
        state[:3], jax.tree_util.tree_map(lambda _: rep, state[:3]))
    rest1 = jax.device_put(
        state[4:], jax.tree_util.tree_map(lambda _: rep, state[4:]))
    return rest0 + (smap,) + rest1, cfg


def run_slam_2d(frames: Iterable, cfg: SLAMConfig, mesh,
                *, map_center=(0.0, 0.0, 0.0), initial_pose=None,
                grow_headroom: float = 0.75,
                rebalance_factor: float | None = None,
                rebalance_check_every: int = 8,
                render: str = "splat",
                log=None) -> Tuple[tuple, SLAMConfig, dict]:
    """Run the full sharded SLAM pipeline over a frame stream.

    frames: iterable of core.types.Frame (host arrays are fine; each is
    device_put row-sharded over the "px" axis). render: "splat" | "cone" |
    "cone_hybrid" (the quality mode: per-shard slab + pmin, replicated
    band march over the union leaf mirror) | "none". With cfg.recovery_enabled, divergence latches in-step and the
    host loop attempts relocalization against the sharded map. Returns
    (final_state, final_cfg, info) where info carries the trajectory
    (np [N,4,4]), growth/rebalance/relocalize/tiering events, and the
    last signal vector.

    With cfg.host_spill, the host-RAM tiering policy runs on the mesh
    exactly as app.run_slam runs it single-chip (parallel/tiering2d.py):
    node-growth pressure archives cold cells BEFORE growing (spill can
    avert a doubling), and archived cells restore as the camera nears —
    the camera position rides the packed signal vector (slots 8-10), so
    the radius checks cost no extra fetch.
    """
    recovery = cfg.recovery_enabled
    archive = None
    if cfg.host_spill:
        from octree_slam_tpu.map.tiering import HostArchive
        if cfg.restore_radius >= cfg.spill_keep_radius:
            raise ValueError(
                f"host_spill needs restore_radius < spill_keep_radius "
                f"(got restore {cfg.restore_radius} >= keep "
                f"{cfg.spill_keep_radius}): spilled cells would restore "
                f"immediately, thrashing the host tier every frame")
        archive = HostArchive(cfg.tier_level)
    state = distributed.slam_init_2d(cfg, mesh, map_center=map_center,
                                     initial_pose=initial_pose)
    step = distributed.slam_step_2d(cfg, mesh, render=render,
                                    sticky_gate=recovery)
    fshard = distributed.frame_sharding(mesh, "px")
    pending = None          # previous frame's signal vector (device)
    poses = []              # device pose arrays; fetched once at the end
    events = []
    keyposes = []           # relocalization anchors (np poses)
    last_sig = None

    def emit(ev):
        events.append(ev)
        if log:
            log(ev)

    def shard_loads(smap):
        """(max_nodes, max_leaves) across shards — host fetch, rare path."""
        return (int(np.asarray(smap.pool.n_nodes).max()),
                int(np.asarray(distributed.shard_leaf_counts(smap)).max()))

    def maybe_rebalance(frame_idx, reason):
        """Re-cut the Morton ranges when one shard carries
        > rebalance_factor x the mean leaf load. Returns True if it did."""
        nonlocal state
        counts = np.asarray(distributed.shard_leaf_counts(state[3]))
        mean = max(float(counts.mean()), 1.0)
        if counts.max() <= rebalance_factor * mean:
            return False
        smap = distributed.rebalance_sharded(state[3], cfg, mesh)
        state = state[:3] + (smap,) + state[4:]
        new_counts = np.asarray(distributed.shard_leaf_counts(smap))
        emit({"event": "rebalance", "frame": frame_idx, "reason": reason,
              "counts_before": counts.tolist(),
              "counts_after": new_counts.tolist(),
              "bounds": np.asarray(smap.bounds)[0].tolist()})
        return True

    lost = False            # last known diverged state (trails one frame)

    def handle_signals(sig_np, frame_idx):
        nonlocal state, cfg, step, lost
        grew = False
        max_nodes = sig_np[1]
        max_leaves = sig_np[2]
        leaf_ovf = sig_np[4] > 0.5
        grow_nodes = max_nodes > grow_headroom * cfg.node_capacity
        grow_leaves = leaf_ovf or (
            max_leaves > grow_headroom * cfg.leaf_capacity)
        cam = sig_np[8:11] if sig_np.shape[0] >= 11 else None
        if archive is not None and len(archive) and cam is not None:
            # archived-cell restore check: pure host math off the trailing
            # camera position (no extra device read)
            from octree_slam_tpu.parallel import tiering2d
            smap_r, cfg_r, n_rest = tiering2d.restore_due_sharded(
                state[3], cfg, mesh, archive, camera_pos=cam)
            if n_rest:
                state = state[:3] + (smap_r,) + state[4:]
                if cfg_r is not cfg:
                    cfg = cfg_r
                    step = distributed.slam_step_2d(
                        cfg, mesh, render=render, sticky_gate=recovery)
                emit({"event": "map_restore", "frame": frame_idx,
                      "leaves": n_rest, "archived_cells": len(archive)})
        if grow_nodes and archive is not None and cam is not None:
            # HBM pressure: archive cold regions before growing (spill
            # can avert the node doubling; an overflowed registry still
            # grows — registrations were already dropped)
            from octree_slam_tpu.parallel import tiering2d
            smap_s, n_spill = tiering2d.spill_cold_sharded(
                state[3], cfg, mesh, archive, camera_pos=cam)
            if n_spill:
                state = state[:3] + (smap_s,) + state[4:]
                mn, _ = shard_loads(state[3])
                averted = mn <= grow_headroom * cfg.node_capacity
                grow_nodes = not averted
                emit({"event": "map_spill", "frame": frame_idx,
                      "leaves": n_spill, "archived_cells": len(archive),
                      "grow_averted": bool(averted)})
        if (grow_nodes or grow_leaves) and rebalance_factor is not None:
            # REBALANCE-BEFORE-GROW: a hot shard's load may fit existing
            # HBM once spread; re-cut first and re-check the trigger
            # against the balanced per-shard loads (an overflowed registry
            # still grows — registrations were already dropped).
            if maybe_rebalance(frame_idx, "pre-grow"):
                mn, ml = shard_loads(state[3])
                averted_n = grow_nodes and \
                    mn <= grow_headroom * cfg.node_capacity
                averted_l = grow_leaves and not leaf_ovf and \
                    ml <= grow_headroom * cfg.leaf_capacity
                grow_nodes = grow_nodes and not averted_n
                grow_leaves = grow_leaves and not averted_l
                if averted_n or averted_l:
                    emit({"event": "grow_averted", "frame": frame_idx,
                          "nodes": bool(averted_n),
                          "leaves": bool(averted_l),
                          "max_nodes": mn, "max_leaves": ml})
        if grow_nodes or grow_leaves:
            smap, cfg = distributed.grow_sharded(
                state[3], cfg, mesh, grow_nodes=grow_nodes,
                grow_leaves=grow_leaves)
            state = state[:3] + (smap,) + state[4:]
            step = distributed.slam_step_2d(cfg, mesh, render=render,
                                            sticky_gate=recovery)
            grew = True
            emit({"event": "grow", "frame": frame_idx,
                  "nodes": bool(grow_nodes), "leaves": bool(grow_leaves),
                  "node_capacity": cfg.node_capacity,
                  "leaf_capacity": cfg.leaf_capacity})
        # imbalance check only at growth events or every K frames: the
        # per-shard counts are an EXTRA host fetch, so keep it off the
        # per-frame path (the packed signals are the only per-frame read)
        if rebalance_factor is not None and not grew and frame_idx > 0 and (
                frame_idx % rebalance_check_every == 0):
            maybe_rebalance(frame_idx, "periodic")
        # tracking-loss recovery (round-3 verdict #3b): the sticky flag
        # gated fusion inside the step; try to re-anchor against the
        # sharded map and clear it
        lost = sig_np[5] > 0.5
        if recovery and lost:
            pose_new, ok, diag = relocalize_2d(state, cfg, mesh,
                                               keyposes or
                                               [np.asarray(state[1])])
            if ok:
                from jax.sharding import NamedSharding, PartitionSpec
                rep = NamedSharding(mesh, PartitionSpec())
                # re-place the recovered pose + cleared flag REPLICATED on
                # the mesh: a host-committed array here changes the jitted
                # step's input placement and can mismatch its executable
                pose_dev = jax.device_put(
                    jnp.asarray(pose_new, jnp.float32), rep)
                key_tail = state[5:]
                if cfg.track_keyframe:
                    # the anchor predates the loss: re-seed it at the
                    # recovered pose with the latest frame's maps (same
                    # contract as app.run_slam's single-chip recovery)
                    key_tail = (state[0], pose_dev,
                                jax.device_put(
                                    jnp.eye(4, dtype=jnp.float32), rep))
                state = (state[0], pose_dev, state[2], state[3],
                         jax.device_put(jnp.bool_(False), rep)) + key_tail
                lost = False
            emit({"event": "relocalize" if ok else "relocalize_failed",
                  "frame": frame_idx, **diag})

    for i, frame in enumerate(frames):
        f = jax.device_put(frame, fshard)
        state, (fb, pose, sig) = step(state, f)
        poses.append(pose)
        if pending is not None:
            # trailing fetch: frame i executes while frame i-1's packed
            # signals cross back; growth acts one frame late, which the
            # 3/4 headroom absorbs
            handle_signals(np.asarray(pending), i - 1)
        pending = sig
        if recovery and not lost and i % cfg.keypose_every == 0:
            # keypose ring: record healthy anchors (one small pose fetch
            # every keypose_every frames; skipped while the last known
            # signals said diverged — a bad pose must not become a
            # recovery candidate)
            keyposes.append(np.asarray(pose))
            keyposes[:] = keyposes[-max(cfg.reloc_candidates, 1):]

    if pending is not None:
        last_sig = np.asarray(pending)
        handle_signals(last_sig, len(poses) - 1)

    info = {
        "poses": np.asarray(jax.numpy.stack(poses)) if poses else
        np.zeros((0, 4, 4), np.float32),
        "events": events,
        "last_signals": last_sig,
        "archived_cells": len(archive) if archive is not None else 0,
        "archive": archive,
    }
    return state, cfg, info
