"""End-to-end SLAM loop on the synthetic orbit scene (the minimum
end-to-end slice of SURVEY.md section 7)."""

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core import se3
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils import metrics

CFG = SLAMConfig(width=80, height=60, focal_x=70.0, focal_y=70.0,
                 pyramid_depth=2, pyramid_iters=(6, 6),
                 voxel_resolution=0.04, max_depth=8,
                 node_capacity=1 << 17, max_march_iters=48)


def run_orbit(n_frames, step_angle=0.015, cfg=CFG):
    scene = sources.default_scene()
    state = pipeline.init_state(cfg)
    poses_gt = []
    poses_est = []
    out = None
    for i in range(n_frames):
        gt = sources.orbit_pose(i * step_angle, radius=2.0)
        if i == 0:
            state = state._replace(pose=jnp.asarray(gt))
        frame = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                     width=cfg.width, height=cfg.height)
        state, out = pipeline.step(state, frame, cfg)
        poses_gt.append(np.asarray(gt))
        poses_est.append(np.asarray(out.pose))
    return state, out, np.stack(poses_gt), np.stack(poses_est)


class TestPipeline:
    def test_first_frame_builds_map(self):
        state, out, _, _ = run_orbit(1)
        assert int(out.map_nodes) > 1000
        assert not bool(out.diverged)

    def test_tracking_follows_orbit(self):
        state, out, gt, est = run_orbit(5)
        assert not bool(out.diverged)
        ate = metrics.ate_rmse(est, gt)
        # per-frame motion is ~3cm; trajectory error must stay well under it
        assert ate < 0.03, ate

    def test_render_shows_map(self):
        state, out, _, _ = run_orbit(3)
        fb = np.asarray(out.framebuffer)
        assert fb.shape == (60, 80, 4)
        assert fb[..., :3].max() > 0.05  # some fused color visible

    def test_map_grows_then_stabilizes(self):
        cfg = CFG
        scene = sources.default_scene()
        state = pipeline.init_state(cfg)
        pose = sources.orbit_pose(0.0)
        state = state._replace(pose=jnp.asarray(pose))
        frame = sources.render_frame(scene, pose, cfg.focal_x, cfg.focal_y,
                                     width=cfg.width, height=cfg.height)
        state, o1 = pipeline.step(state, frame, cfg, render="none")
        n1 = int(o1.map_nodes)
        state, o2 = pipeline.step(state, frame, cfg, render="none")
        n2 = int(o2.map_nodes)
        assert n2 == n1  # same viewpoint: no new structure
