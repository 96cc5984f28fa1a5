"""Profile the dense cone tracer on the bench scene (real TPU).

Answers the round-2 perf questions from VERDICT.md #1:
  * per-ray iteration histogram (how many rays finish when);
  * loop trip counts for phase 1 (skip) and phase 2 (composite);
  * per-iteration cost (slope of time vs max_iters);
  * raw gather cost from the 613 MB mips buffer vs a small table.

Run: python examples/profile_cone.py
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from octree_slam_tpu.utils import runtime

runtime.setup()

import jax
import jax.numpy as jnp

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.render import raycast
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils.timing import sync


def timed(fn, n=5):
    fn()  # compile + warm
    sync(jnp.zeros(()))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out if isinstance(out, jnp.ndarray) else jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    cfg = SLAMConfig(width=640, height=480, max_depth=9,
                     voxel_resolution=0.02, node_capacity=1 << 20,
                     leaf_capacity=1 << 17)
    scene = sources.default_scene()
    state = pipeline.init_state(cfg, initial_pose=sources.orbit_pose(0.0))
    step = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="cone"),
                   donate_argnums=0)
    print("building 14-frame map...", flush=True)
    for i in range(14):
        gt = sources.orbit_pose(i * 0.01, radius=2.0)
        f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        state, out = step(state, f)
    sync(out.framebuffer)
    pose = state.pose
    lvl = pipeline._accel_level(cfg)
    # direct marcher call: heal the lazy-interior staleness first
    # (profiling the stale mirror reads as a near-empty map, CLAUDE.md)
    pool, cache = pipeline.heal_for_march(state, cfg)
    sync(cache.values)

    sync_floor = timed(lambda: jnp.zeros((8, 128)) + 1, n=8)
    print(f"sync floor ~{sync_floor*1e3:.1f} ms")

    # --- raw gather calibration ---
    idx = jnp.asarray(np.random.randint(0, cache.values.shape[0],
                                        size=(307200,)).astype(np.int32))
    g_big = timed(lambda: cache.values[idx]) - sync_floor
    small = cache.values[: 1 << 18]
    idx_s = idx & ((1 << 18) - 1)
    g_small = timed(lambda: small[idx_s]) - sync_floor
    print(f"gather 307k from 613MB: {g_big*1e3:.2f} ms; "
          f"from 1MB: {g_small*1e3:.2f} ms")

    # --- end-to-end cone trace at several iteration caps ---
    def trace(iters):
        return raycast.cone_trace_dense(
            cache, pool.center, pool.half_size, pose,
            cfg.focal_x, cfg.focal_y, width=cfg.width, height=cfg.height,
            max_depth=cfg.max_depth, dist_level=lvl, max_iters=iters,
            max_range=cfg.max_range, start_dist=cfg.start_dist,
            max_skip=cfg.dist_max_skip)

    prev = None
    for iters in (8, 16, 32, 64, 96):
        t = timed(lambda: trace(iters), n=3) - sync_floor
        slope = (f"  (+{(t-prev[1])/(iters-prev[0])*1e3:.2f} ms/iter)"
                 if prev else "")
        print(f"max_iters={iters:3d}: {t*1e3:7.1f} ms{slope}")
        prev = (iters, t)

    # --- instrumented run: trip counts + finish histogram ---
    fb, dbg = raycast.cone_trace_dense(
        cache, pool.center, pool.half_size, pose,
        cfg.focal_x, cfg.focal_y, width=cfg.width, height=cfg.height,
        max_depth=cfg.max_depth, dist_level=lvl, max_iters=96,
        max_range=cfg.max_range, start_dist=cfg.start_dist,
        max_skip=cfg.dist_max_skip, debug_iters=True)
    fin = np.asarray(dbg["fin"]).ravel()
    print(f"phase1 trips={int(dbg['p1_trips'])}  "
          f"phase2 trips={int(dbg['p2_trips'])}")
    pct = np.percentile(fin, [50, 90, 95, 99, 99.9, 100])
    print("phase2 finish-iteration percentiles "
          "[p50 p90 p95 p99 p99.9 max]:", pct)
    alive = [(fin >= k).mean() for k in (8, 16, 24, 32, 48, 64, 96)]
    print("fraction of rays still active at iter "
          "[8,16,24,32,48,64,96]:",
          [f"{a:.4f}" for a in alive])
    a = np.asarray(fb[..., 3]).ravel()
    print(f"finished rays (alpha=1): {(a > 0.99).mean():.4f}; "
          f"mean alpha {a.mean():.3f}")


if __name__ == "__main__":
    main()
