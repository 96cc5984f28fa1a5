"""Keyframe-anchored tracking A/B on the long-run soak (verdict #7).

Round-2 recorded 0.48 m ATE over a 200-frame full-360° orbit
(~6.3 cm/frame, 12.6 m path) with frame-to-frame odometry — ~3.8% of
path, parity-acceptable (the reference tracker is frame-to-frame and
disabled in its own main loop, main.cpp:35) but the obvious next win.
This script replays the SAME soak trajectory with cfg.track_keyframe
on and off and prints one JSON line per arm: ATE, steady fps, and the
drift ratio. Target: keyframe ATE < 0.25 m at unchanged per-frame cost.

Run (real TPU): python examples/soak_keyframe_ab.py [--frames 200]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from octree_slam_tpu.utils import runtime

runtime.setup()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--radius", type=float, default=2.0)
    p.add_argument("--kf-dist", type=float, default=None,
                   help="override keyframe_max_dist (anchor hop baseline)")
    p.add_argument("--kf-angle", type=float, default=None,
                   help="override keyframe_max_angle_deg")
    p.add_argument("--skip-f2f", action="store_true",
                   help="run only the keyframe arm (threshold sweeps)")
    args = p.parse_args()

    from octree_slam_tpu import app
    from octree_slam_tpu.config import SLAMConfig
    from octree_slam_tpu.sensor import sources

    n = args.frames
    step_angle = 2.0 * np.pi / n  # full 360° sweep, like the round-2 soak
    # Sized so the 200-frame 360° sweep NEVER grows (the full sweep's map
    # reaches ~1.9M nodes — growth triggers at 3/4, so 1<<22 keeps clear):
    # growth is out of scope for a tracking-drift A/B, and a mid-run
    # synchronous growth recompile through the tunnel broke the device
    # session on three attempts (INVALID_ARGUMENT on every later fetch;
    # the production loop hides that stall with cfg.precompile_ahead).
    base = SLAMConfig(width=640, height=480, max_depth=9,
                      voxel_resolution=0.02, node_capacity=1 << 22,
                      leaf_capacity=1 << 20, precompile_ahead=False)
    scene = sources.default_scene()
    gt = [sources.orbit_pose(i * step_angle, radius=args.radius)
          for i in range(n)]

    def frame_fn(i):
        return sources.render_frame(scene, gt[i], base.focal_x,
                                    base.focal_y, width=base.width,
                                    height=base.height)

    results = {}
    for kf in ((True,) if args.skip_f2f else (False, True)):
        over = {"track_keyframe": kf}
        if kf and args.kf_dist is not None:
            over["keyframe_max_dist"] = args.kf_dist
        if kf and args.kf_angle is not None:
            over["keyframe_max_angle_deg"] = args.kf_angle
        cfg = dataclasses.replace(base, **over)
        # render off: ATE needs only the tracked poses, and the 1M-lane
        # leaf registry would make every cone render lane-bound
        res = app.run_slam(frame_fn, n, cfg, initial_pose=gt[0],
                           gt_fn=lambda i: gt[i], render_every=0,
                           render_mode="none", log_every=50)
        arm = "keyframe" if kf else "frame_to_frame"
        results[arm] = {"ate_rmse_m": round(res.ate_rmse, 4),
                        "steady_fps": round(res.steady_fps, 2),
                        "diverged": res.diverged,
                        "map_nodes": res.map_nodes}
        print(json.dumps({"arm": arm, **results[arm]}), flush=True)
    line = {"config": "soak_keyframe_ab", "frames": n,
            "path_m": round(2 * np.pi * args.radius, 2),
            **{f"{k}_{m}": v for k, r in results.items()
               for m, v in r.items()}}
    if "frame_to_frame" in results:
        line["ate_ratio_keyframe_over_f2f"] = round(
            results["keyframe"]["ate_rmse_m"] / max(
                results["frame_to_frame"]["ate_rmse_m"], 1e-9), 3)
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
