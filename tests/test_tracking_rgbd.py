"""Photometric (RGBD) tracking term tests."""

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core import se3
from octree_slam_tpu.sensor import sources, tracking


CFG = SLAMConfig(width=80, height=60, focal_x=70.0, focal_y=70.0,
                 pyramid_depth=2, pyramid_iters=(6, 6), w_rgbd=0.05)


def pyramids(pose_a, pose_b, cfg):
    scene = sources.default_scene()
    fa = sources.render_frame(scene, pose_a, cfg.focal_x, cfg.focal_y,
                              width=cfg.width, height=cfg.height)
    fb = sources.render_frame(scene, pose_b, cfg.focal_x, cfg.focal_y,
                              width=cfg.width, height=cfg.height)
    return (tracking.build_pyramid(fa.depth, fa.color, cfg),
            tracking.build_pyramid(fb.depth, fb.color, cfg))


class TestRGBDTerm:
    def test_zero_residual_at_identity(self):
        pose = sources.orbit_pose(0.0)
        pa, pb = pyramids(pose, pose, CFG)
        A, b, count = tracking.rgbd_normal_equations(
            pa[0], pb[0].vertex, pb[0].intensity, 0, CFG)
        assert int(count) > 1000
        # same frame: residuals ~0 so the gradient b is ~0
        assert float(jnp.max(jnp.abs(b))) < 1e-2 * float(jnp.max(jnp.abs(A)) + 1)

    def test_psd_normal_matrix(self):
        pose_a = sources.orbit_pose(0.0)
        pose_b = sources.orbit_pose(0.01)
        pa, pb = pyramids(pose_a, pose_b, CFG)
        A, b, count = tracking.rgbd_normal_equations(
            pa[0], pb[0].vertex, pb[0].intensity, 0, CFG)
        eig = np.linalg.eigvalsh(np.asarray(A))
        assert eig.min() > -1e-3  # PSD up to float noise

    def test_track_with_rgbd_still_converges(self):
        pose_a = sources.orbit_pose(0.0)
        pose_b = sources.orbit_pose(0.015)
        pa, pb = pyramids(pose_a, pose_b, CFG)
        T, stats = tracking.track(pa, pb, CFG)
        gt = np.asarray(se3.inverse(pose_a) @ pose_b)
        est = np.asarray(T)
        t_err = np.linalg.norm(est[:3, 3] - gt[:3, 3])
        assert t_err < 0.02
        assert not bool(stats.diverged)
