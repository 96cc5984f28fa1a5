"""A/B the exact-march live-ray compaction knobs on the bench map (real TPU).

The sort-compaction (render/raycast.py::cone_trace_dense) packs the
march's surviving tail into `compact_cap` lanes after at least
`compact_after` full-width trips (and as soon as the live count fits).
This sweeps both knobs against the uncompacted control to pick the
default; results are recorded in BASELINE.md.

Run: python examples/compact_ab.py
"""

from __future__ import annotations

import pathlib
import sys
import time

import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from octree_slam_tpu.utils import runtime

runtime.setup()

import jax

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.render import raycast
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils.timing import sync


def timed(fn, n=4):
    out = fn()  # compile + warm
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
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
    lvl = pipeline._accel_level(cfg)
    # direct marcher call: heal the lazy-interior staleness first
    pool, cache = pipeline.heal_for_march(state, cfg)
    pose = state.pose
    sync(cache.values)
    n = cfg.width * cfg.height

    sync_floor = timed(lambda: jnp.zeros((8, 128)) + 1, n=8)
    print(f"sync floor ~{sync_floor*1e3:.1f} ms", flush=True)

    def trace(after, cap):
        return raycast.cone_trace_dense(
            cache, pool.center, pool.half_size, pose,
            cfg.focal_x, cfg.focal_y, width=cfg.width, height=cfg.height,
            max_depth=cfg.max_depth, dist_level=lvl,
            max_iters=cfg.max_march_iters,
            max_range=cfg.max_range, start_dist=cfg.start_dist,
            max_skip=cfg.dist_max_skip,
            compact_after=after, compact_cap=cap)

    ref = None
    grid = [
        ("uncompacted", cfg.max_march_iters, None),
        ("after=12 cap=n/4 (default)", 12, n // 4),
        ("after=4  cap=n/4", 4, n // 4),
        ("after=12 cap=n/8", 12, n // 8),
        ("after=12 cap=n/16", 12, n // 16),
        ("after=4  cap=n/16", 4, n // 16),
    ]
    for label, after, cap in grid:
        t = timed(lambda: trace(after, cap)) - sync_floor
        fb = trace(after, cap)
        if ref is None:
            ref = fb
            tag = "(control)"
        else:
            tag = ("bit-identical" if bool(jnp.array_equal(fb, ref))
                   else "MISMATCH!")
        print(f"{label:28s}: {t*1e3:7.1f} ms  ({1.0/t:5.2f} fps)  {tag}",
              flush=True)


if __name__ == "__main__":
    main()
