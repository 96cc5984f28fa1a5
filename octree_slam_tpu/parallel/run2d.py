"""Multi-chip application loop: run_slam for the 2-D ("px" x "map") mesh.

The reference's main loop is single-GPU (main.cpp:31-84); app.run_slam is
its single-chip TPU rebuild. This module drives distributed.slam_step_2d —
tracking sharded over image rows, the map Morton-range-sharded — with the
same host-loop disciplines run_slam established (round-2 verdict item #4):

  * ONE packed signal fetch per frame, read TRAILING one frame, so a frame
    costs max(step, fetch RTT) instead of step + 2*RTT;
  * capacity growth between frames via grow_sharded (doubling, recompile),
    triggered from the trailing signals at a 3/4-full headroom;
  * per-frame divergence gating lives inside the step (fusion skipped on a
    bad frame, resumes when tracking re-locks);
  * optional load rebalancing: when one shard holds > `rebalance_factor` x
    the mean leaf load, the Morton range boundaries are re-cut and the map
    redistributed bit-identically (rebalance_sharded).

Growth and rebalancing change array shapes / routing only between frames —
the jitted step itself stays a fixed-shape program per (cfg, bounds epoch).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax
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


def run_slam_2d(frames: Iterable, cfg: SLAMConfig, mesh,
                *, map_center=(0.0, 0.0, 0.0), initial_pose=None,
                grow_headroom: float = 0.75,
                rebalance_factor: float | None = None,
                rebalance_check_every: int = 8,
                log=None) -> Tuple[tuple, SLAMConfig, dict]:
    """Run the full sharded SLAM pipeline over a frame stream.

    frames: iterable of core.types.Frame (host arrays are fine; each is
    device_put row-sharded over the "px" axis). Returns
    (final_state, final_cfg, info) where info carries the trajectory
    (np [N,4,4]), growth/rebalance events, and the last signal vector.
    """
    state = distributed.slam_init_2d(cfg, mesh, map_center=map_center,
                                     initial_pose=initial_pose)
    step = distributed.slam_step_2d(cfg, mesh)
    fshard = distributed.frame_sharding(mesh, "px")
    pending = None          # previous frame's signal vector (device)
    poses = []              # device pose arrays; fetched once at the end
    events = []
    last_sig = None

    def emit(ev):
        events.append(ev)
        if log:
            log(ev)

    def handle_signals(sig_np, frame_idx):
        nonlocal state, cfg, step
        grew = False
        max_nodes = sig_np[1]
        max_leaves = sig_np[2]
        leaf_ovf = sig_np[4] > 0.5
        grow_nodes = max_nodes > grow_headroom * cfg.node_capacity
        grow_leaves = leaf_ovf or (
            max_leaves > grow_headroom * cfg.leaf_capacity)
        if grow_nodes or grow_leaves:
            pyr, pose, init, smap = state
            smap, cfg = distributed.grow_sharded(
                smap, cfg, mesh, grow_nodes=grow_nodes,
                grow_leaves=grow_leaves)
            state = (pyr, pose, init, smap)
            step = distributed.slam_step_2d(cfg, mesh)
            grew = True
            emit({"event": "grow", "frame": frame_idx,
                  "nodes": bool(grow_nodes), "leaves": bool(grow_leaves),
                  "node_capacity": cfg.node_capacity,
                  "leaf_capacity": cfg.leaf_capacity})
        # imbalance check only at growth events or every K frames: the
        # per-shard counts are an EXTRA host fetch, so keep it off the
        # per-frame path (the packed signals are the only per-frame read)
        if rebalance_factor is not None and (
                grew or frame_idx % rebalance_check_every == 0):
            counts = np.asarray(
                distributed.shard_leaf_counts(state[3]))
            mean = max(float(counts.mean()), 1.0)
            if counts.max() > rebalance_factor * mean:
                pyr, pose, init, smap = state
                smap = distributed.rebalance_sharded(smap, cfg, mesh)
                state = (pyr, pose, init, smap)
                new_counts = np.asarray(
                    distributed.shard_leaf_counts(smap))
                emit({"event": "rebalance", "frame": frame_idx,
                      "counts_before": counts.tolist(),
                      "counts_after": new_counts.tolist(),
                      "bounds": np.asarray(smap.bounds)[0].tolist()})

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

    if pending is not None:
        last_sig = np.asarray(pending)
        handle_signals(last_sig, len(poses) - 1)

    info = {
        "poses": np.asarray(jax.numpy.stack(poses)) if poses else
        np.zeros((0, 4, 4), np.float32),
        "events": events,
        "last_signals": last_sig,
    }
    return state, cfg, info
