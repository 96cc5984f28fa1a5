"""Device-trace the full cone_hybrid step (headline config): where do the
full-pipeline milliseconds go vs the render-only figure?

Builds the bench map (splat warm steps), then traces N donated
cone_hybrid steps with jax.profiler and prints the per-source-line
summary (examples/parse_trace.py).

Run (real TPU): python examples/profile_hybrid.py [--trace-dir /tmp/hyb]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from octree_slam_tpu.utils import runtime

runtime.setup()

import jax
import jax.numpy as jnp

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils.timing import sync


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", default="/tmp/hybrid_trace")
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--render", default="cone_hybrid")
    args = p.parse_args()

    cfg = SLAMConfig(width=640, height=480, max_depth=9,
                     voxel_resolution=0.02, node_capacity=1 << 20,
                     leaf_capacity=1 << 17)
    scene = sources.default_scene()
    frames = []
    for i in range(14):
        gt = sources.orbit_pose(i * 0.01, radius=2.0)
        f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        sync(f.depth)
        frames.append(f)

    state = pipeline.init_state(cfg, initial_pose=sources.orbit_pose(0.0))
    step = jax.jit(lambda s, f: pipeline.step(s, f, cfg,
                                              render=args.render),
                   donate_argnums=0)
    for i in range(10):
        state, out = step(state, frames[i])
    sync(out.framebuffer)

    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        for i in range(args.frames):
            state, out = step(state, frames[10 + (i % 4)])
        sync(out.framebuffer)
    wall = (time.perf_counter() - t0) / args.frames
    print(f"wall per traced frame: {wall * 1e3:.1f} ms", flush=True)

    from examples import parse_trace
    f, events = parse_trace.load_events(args.trace_dir)
    rows = parse_trace.summarize(events)
    print(f"trace: {f}")
    for total_us, count, label in rows[:30]:
        print(f"{total_us / 1000 / args.frames:9.2f} ms/frame  x{count:5d}"
              f"  {label}")


if __name__ == "__main__":
    main()
