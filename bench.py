"""Headline benchmark: track + fuse + raycast FPS at 640x480 on one chip.

Runs the full SLAM step (point-to-plane ICP over a 3-level pyramid with the
reference's {10,5,4} iteration schedule, SVO fusion at depth 9, cone-traced
raycast render) on a synthetic orbit stream, steady-state, and prints ONE
JSON line. Baseline: the driver target of 30 FPS (BASELINE.json north_star;
the reference publishes no numbers, BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Pose math must not run through bf16 MXU passes: trajectories drift at
# bf16 precision. The heavy einsums set their own precision explicitly.
jax.config.update("jax_default_matmul_precision", "highest")

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils import metrics


def main():
    cfg = SLAMConfig(
        width=640, height=480,
        max_depth=9, voxel_resolution=0.02,  # 10.24 m volume at 2 cm leaves
        node_capacity=1 << 20,
    )
    scene = sources.default_scene()

    n_stream = 12
    step_angle = 0.01

    # Pre-render the synthetic frame stream (not part of the timed loop).
    frames = []
    gt_poses = []
    for i in range(n_stream):
        gt = sources.orbit_pose(i * step_angle, radius=2.0)
        f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        jax.block_until_ready(f.depth)
        frames.append(f)
        gt_poses.append(gt)

    state = pipeline.init_state(cfg)
    state = state._replace(pose=gt_poses[0])

    # Warmup: compile + first fusion.
    state, out = pipeline.step(state, frames[0], cfg)
    jax.block_until_ready(out.framebuffer)
    state, out = pipeline.step(state, frames[1], cfg)
    jax.block_until_ready(out.framebuffer)

    # Timed steady-state loop.
    est_poses = []
    n_timed = n_stream - 2
    t0 = time.perf_counter()
    for i in range(2, n_stream):
        state, out = pipeline.step(state, frames[i], cfg)
        est_poses.append(out.pose)
    jax.block_until_ready(out.framebuffer)
    dt = time.perf_counter() - t0
    fps = n_timed / dt

    # Health: trajectory error over the timed window (not the metric, but
    # guards against "fast because broken").
    import numpy as np
    ate = metrics.ate_rmse(np.stack([np.asarray(p) for p in est_poses]),
                           np.stack([np.asarray(p) for p in gt_poses[2:]]))
    diverged = bool(out.diverged)

    result = {
        "metric": "track_fuse_raycast_fps_640x480",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
        "ate_rmse_m": round(ate, 5),
        "diverged": diverged,
        "map_nodes": int(out.map_nodes),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
