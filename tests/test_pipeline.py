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


class TestReducedLevelTrackFuse:
    """cfg.track_finest_level / cfg.fuse_level: ICP and fusion run on a
    coarser pyramid level while rendering stays full-res (the 1080p
    regime — the reference's {10,5,4} schedule targets its fixed 640x480
    sensor, rgbd_camera.cpp:19 / main.h:39)."""

    CFG1 = SLAMConfig(width=80, height=60, focal_x=70.0, focal_y=70.0,
                      pyramid_depth=3, pyramid_iters=(6, 6),
                      track_finest_level=1, fuse_level=1,
                      voxel_resolution=0.04, max_depth=8,
                      node_capacity=1 << 17, max_march_iters=48)

    def test_tracking_follows_orbit_at_level1(self):
        state, out, gt, est = run_orbit(5, cfg=self.CFG1)
        assert not bool(out.diverged)
        ate = metrics.ate_rmse(est, gt)
        # same bound as the full-res test: level-1 ICP must not cost
        # trajectory accuracy on this scene
        assert ate < 0.03, ate

    def test_stats_keep_pyramid_depth_entries(self):
        state, out, _, _ = run_orbit(2, cfg=self.CFG1)
        inl = np.asarray(out.track_inliers)
        res = np.asarray(out.track_residual)
        assert inl.shape == (3,) and res.shape == (3,)
        # the skipped finest level repeats the finest TRACKED entry, so
        # [-1] stays "finest available" (relocalize gates on it)
        assert inl[-1] == inl[-2]
        assert res[-1] == res[-2]

    def test_fused_leaves_cover_fullres_map(self):
        # one frame at a FIXED pose (frame 0 fuses at the initial pose, so
        # tracking noise can't shift the clouds): the level-1 cloud is the
        # depth-aware 2x decimation of the full one — its leaves must
        # near-coincide with the full-res map (voxels are 4x the level-1
        # pixel footprint here, so 2x decimation still oversamples)
        # run in the regime the knob is FOR: voxels much larger than the
        # level-1 pixel footprint (1080p/2cm oversamples ~8x per axis).
        # 16 cm voxels at this toy 80x60 scale give every interior voxel
        # dozens of samples; the residual misses are silhouette/sliver
        # voxels seen by only 1-2 full-res pixels, a set that shrinks
        # with resolution (the 1080p bench config reports map_nodes + ATE
        # against full-res fusion as the production-side check).
        cfg1 = SLAMConfig(**{**self.CFG1.__dict__,
                             "voxel_resolution": 0.16, "max_depth": 6})
        cfg0 = SLAMConfig(**{**cfg1.__dict__,
                             "track_finest_level": 0, "fuse_level": 0,
                             "pyramid_iters": (6, 6, 6)})
        st1, out1, _, _ = run_orbit(1, cfg=cfg1)
        st0, out0, _, _ = run_orbit(1, cfg=cfg0)
        k1 = np.asarray(st1.leaves.keys)[: int(st1.leaves.count)]
        k0 = np.asarray(st0.leaves.keys)[: int(st0.leaves.count)]
        assert 0 < len(k1) <= len(k0)
        # near-total overlap = level-1 fusion mints no spurious geometry
        assert np.isin(k1, k0).mean() > 0.95
        # bounded density loss (measured 0.81 here; silhouette slivers)
        assert len(k1) > 0.75 * len(k0)

    def test_render_full_res_from_level1_fusion(self):
        state, out, _, _ = run_orbit(3, cfg=self.CFG1)
        fb = np.asarray(out.framebuffer)
        assert fb.shape == (60, 80, 4)
        assert fb[..., :3].max() > 0.05

    def test_placeholder_level0_maps(self):
        state, out, _, _ = run_orbit(1, cfg=self.CFG1)
        # level-0 vertex/normal maps are 1x1 placeholders (never consumed);
        # intensity stays full-res (it feeds the subsample chain)
        assert state.last_pyramid[0].vertex.shape == (1, 1, 3)
        assert state.last_pyramid[0].normal.shape == (1, 1, 3)
        assert state.last_pyramid[0].intensity.shape == (60, 80)
        assert state.last_pyramid[1].vertex.shape == (30, 40, 3)
