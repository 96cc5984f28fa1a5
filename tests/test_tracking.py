"""ICP tracking tests: normal equations vs oracle, synthetic pose recovery."""

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core import se3
from octree_slam_tpu.sensor import image_ops, sources, tracking

from oracle import icp_normal_equations as oracle_ne

CFG_SMALL = SLAMConfig(width=80, height=60, focal_x=70.0, focal_y=70.0,
                       pyramid_depth=2, pyramid_iters=(6, 6))


def synth_pyramids(cfg, pose_a, pose_b, scene=None):
    scene = scene or sources.default_scene()
    fa = sources.render_frame(scene, pose_a, cfg.focal_x, cfg.focal_y,
                              width=cfg.width, height=cfg.height)
    fb = sources.render_frame(scene, pose_b, cfg.focal_x, cfg.focal_y,
                              width=cfg.width, height=cfg.height)
    pa = tracking.build_pyramid(fa.depth, fa.color, cfg)
    pb = tracking.build_pyramid(fb.depth, fb.color, cfg)
    return pa, pb


class TestNormalEquations:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        n = 200
        v1 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        v1[:, 2] = rng.uniform(0.3, 3.0, n)
        v2 = v1 + rng.normal(0, 0.02, (n, 3)).astype(np.float32)
        n1 = rng.normal(size=(n, 3)).astype(np.float32)
        n1 /= np.linalg.norm(n1, axis=1, keepdims=True)
        n2 = n1 + rng.normal(0, 0.05, (n, 3)).astype(np.float32)
        n2 /= np.linalg.norm(n2, axis=1, keepdims=True)
        # sprinkle invalids
        v1[3] = np.inf
        v2[7, 2] = 0.01    # z too small
        v2[11] = v1[11] + 0.5  # too far
        # the oracle models the REFERENCE estimator (one-sided
        # point-to-plane, hard gate) — pin those semantics; the round-5
        # production default is symmetric+Huber (config.py)
        cfg = SLAMConfig(icp_symmetric=False, icp_huber_k=0.0)
        A, b, count, _ = tracking.icp_normal_equations(
            jnp.asarray(v1), jnp.asarray(n1), jnp.asarray(v2), jnp.asarray(n2), cfg)
        A_ref, b_ref, count_ref = oracle_ne(v1, n1, v2, n2)
        assert int(count) == count_ref
        np.testing.assert_allclose(np.asarray(A), A_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(b), b_ref, rtol=1e-4, atol=1e-4)

    def test_solve_recovers_known_twist(self):
        """Small rigid perturbation of a synthetic surface -> one GN solve
        recovers the twist (validates Jacobian against autodiff-free truth)."""
        rng = np.random.default_rng(1)
        n = 500
        v1 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        v1[:, 2] = rng.uniform(0.5, 3.0, n)
        n1 = rng.normal(size=(n, 3)).astype(np.float32)
        n1 /= np.linalg.norm(n1, axis=1, keepdims=True)
        twist = jnp.asarray([0.004, -0.003, 0.005, 0.006, -0.004, 0.008], jnp.float32)
        T = se3.exp_se3(twist)
        # v2 = T^-1 v1 so that T v2 == v1: solver should return ~twist
        Ti = se3.inverse(T)
        v2 = np.asarray(se3.transform_points(Ti, jnp.asarray(v1)))
        n2 = np.asarray(se3.transform_dirs(Ti, jnp.asarray(n1)))
        cfg = SLAMConfig()
        A, b, count, _ = tracking.icp_normal_equations(
            jnp.asarray(v1), jnp.asarray(n1), jnp.asarray(v2), jnp.asarray(n2), cfg)
        x = np.asarray(tracking.solve_normal_equations(A, b))
        assert int(count) > 400
        np.testing.assert_allclose(x, np.asarray(twist), rtol=0.08, atol=2e-4)


class TestPyramid:
    def test_shapes_and_validity(self):
        cfg = CFG_SMALL
        scene = sources.default_scene()
        f = sources.render_frame(scene, sources.orbit_pose(0.0),
                                 cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        pyr = tracking.build_pyramid(f.depth, f.color, cfg)
        assert len(pyr) == 2
        assert pyr[0].vertex.shape == (60, 80, 3)
        assert pyr[1].vertex.shape == (30, 40, 3)
        # most of the image should be valid geometry
        finite = np.isfinite(np.asarray(pyr[0].vertex)).all(-1).mean()
        assert finite > 0.8


class TestTrack:
    def test_identity_motion(self):
        cfg = CFG_SMALL
        pose = sources.orbit_pose(0.0)
        pa, pb = synth_pyramids(cfg, pose, pose)
        T, stats = tracking.track(pa, pb, cfg)
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=5e-4)
        assert not bool(stats.diverged)

    def test_small_motion_recovery(self):
        """Synthetic camera moves slightly; ICP recovers the relative pose
        (ATE building block; SURVEY.md section 4 integration test)."""
        cfg = CFG_SMALL
        pose_a = sources.orbit_pose(0.0, radius=2.0)
        pose_b = sources.orbit_pose(0.02, radius=2.0)  # ~2.3 deg orbit step
        pa, pb = synth_pyramids(cfg, pose_a, pose_b)
        T, stats = tracking.track(pa, pb, cfg)
        # ground truth: cam_a_T_cam_b
        gt = np.asarray(se3.inverse(pose_a) @ pose_b)
        est = np.asarray(T)
        t_err = np.linalg.norm(est[:3, 3] - gt[:3, 3])
        r_err = np.arccos(np.clip((np.trace(est[:3, :3].T @ gt[:3, :3]) - 1) / 2, -1, 1))
        motion = np.linalg.norm(gt[:3, 3])
        assert t_err < 0.25 * motion + 2e-3, (t_err, motion)
        assert r_err < 0.02, r_err
        assert not bool(stats.diverged)

    def test_divergence_flag_on_garbage(self):
        cfg = CFG_SMALL
        h, w = cfg.height, cfg.width
        inf_map = jnp.full((h, w, 3), jnp.inf, jnp.float32)
        lvl = [
            tracking.PyramidLevel(
                vertex=inf_map[: h >> i, : w >> i],
                normal=inf_map[: h >> i, : w >> i],
                intensity=jnp.zeros((h >> i, w >> i)),
            )
            for i in range(2)
        ]
        T, stats = tracking.track(lvl, lvl, cfg)
        # no inliers anywhere: update stays identity, divergence flagged
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)
        assert bool(stats.diverged)


class TestEstimatorVariants:
    """Symmetric point-to-plane + Huber IRLS (round-3 verdict item #5 —
    bias-side drift mitigations; defaults stay off, reference behavior)."""

    def _recover(self, cfg):
        pose_a = sources.orbit_pose(0.0, radius=2.0)
        pose_b = sources.orbit_pose(0.02, radius=2.0)
        pa, pb = synth_pyramids(cfg, pose_a, pose_b)
        T, stats = tracking.track(pa, pb, cfg)
        gt = np.asarray(se3.inverse(pose_a) @ pose_b)
        est = np.asarray(T)
        t_err = np.linalg.norm(est[:3, 3] - gt[:3, 3])
        motion = np.linalg.norm(gt[:3, 3])
        assert not bool(stats.diverged)
        assert t_err < 0.25 * motion + 2e-3, (t_err, motion)

    def test_symmetric_recovers_motion(self):
        import dataclasses
        self._recover(dataclasses.replace(CFG_SMALL, icp_symmetric=True))

    def test_huber_recovers_motion(self):
        import dataclasses
        self._recover(dataclasses.replace(CFG_SMALL, icp_huber_k=0.02))

    def test_symmetric_huber_recovers_motion(self):
        import dataclasses
        self._recover(dataclasses.replace(
            CFG_SMALL, icp_symmetric=True, icp_huber_k=0.02))

    def test_identity_fixed_point_symmetric(self):
        import dataclasses
        cfg = dataclasses.replace(CFG_SMALL, icp_symmetric=True)
        pose = sources.orbit_pose(0.0)
        pa, pb = synth_pyramids(cfg, pose, pose)
        T, stats = tracking.track(pa, pb, cfg)
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=5e-4)
        assert not bool(stats.diverged)
