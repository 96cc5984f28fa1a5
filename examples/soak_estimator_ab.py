"""Estimator A/B on the long-run soak drift (round-3 verdict item #5).

Round-3 diagnosed the 200-frame soak drift (0.4758 m over a 12.6 m loop)
as a per-solve BIAS proportional to motion — depth quantization + surface
bias in the one-sided point-to-plane linearization — which keyframe
anchoring (a variance fix) could only trim 4.8%. This replays the same
soak with the two cheap bias-side mitigations:

  * symmetric point-to-plane (cfg.icp_symmetric): residual projected on
    n1 + n2', cancelling the first-order normal-disagreement bias
    (Rusinkiewicz 2019);
  * Huber IRLS (cfg.icp_huber_k): soft downweight of the residual tail
    instead of the reference's hard 0.1 m gate.

One JSON line per arm (ATE, steady fps) + a summary line. Target from the
verdict: < 0.35 m (baseline 0.4758).

Run (real TPU): python examples/soak_estimator_ab.py [--frames 200]
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

ARMS = {
    "baseline_f2f": {},
    "symmetric": {"icp_symmetric": True},
    "huber": {"icp_huber_k": 0.02},
    "symmetric_huber": {"icp_symmetric": True, "icp_huber_k": 0.02},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--radius", type=float, default=2.0)
    p.add_argument("--arms", default="all",
                   help="comma list of arm names (default all)")
    p.add_argument("--huber-k", type=float, default=None,
                   help="override the Huber k (meters) in huber arms")
    args = p.parse_args()

    from octree_slam_tpu import app
    from octree_slam_tpu.config import SLAMConfig
    from octree_slam_tpu.sensor import sources

    n = args.frames
    step_angle = 2.0 * np.pi / n
    # growth-free sizing, same rationale as soak_keyframe_ab.py
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

    wanted = (list(ARMS) if args.arms == "all"
              else [a.strip() for a in args.arms.split(",")])
    results = {}
    for arm in wanted:
        over = dict(ARMS[arm])
        if args.huber_k is not None and "icp_huber_k" in over:
            over["icp_huber_k"] = args.huber_k
        cfg = dataclasses.replace(base, **over)
        res = app.run_slam(frame_fn, n, cfg, initial_pose=gt[0],
                           gt_fn=lambda i: gt[i], render_every=0,
                           render_mode="none", log_every=50)
        results[arm] = {"ate_rmse_m": round(res.ate_rmse, 4),
                        "steady_fps": round(res.steady_fps, 2),
                        "diverged": res.diverged}
        print(json.dumps({"arm": arm, **results[arm]}), flush=True)

    line = {"config": "soak_estimator_ab", "frames": n,
            "path_m": round(2 * np.pi * args.radius, 2),
            **{f"{k}_{m}": v for k, r in results.items()
               for m, v in r.items()}}
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
