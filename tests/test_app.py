"""App loop + state checkpoint tests."""

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu import app, pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.sensor import sources

CFG = SLAMConfig(width=64, height=48, focal_x=55.0, focal_y=55.0,
                 pyramid_depth=2, pyramid_iters=(4, 4),
                 voxel_resolution=0.05, max_depth=7,
                 node_capacity=1 << 15, max_march_iters=24)


class TestRunSlam:
    def test_orbit_run(self):
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.02) for i in range(4)]

        def frame_fn(i):
            return sources.render_frame(scene, gt[i], CFG.focal_x, CFG.focal_y,
                                        width=CFG.width, height=CFG.height)

        res = app.run_slam(frame_fn, 4, CFG, initial_pose=gt[0],
                           gt_fn=lambda i: gt[i], render_every=2)
        assert res.frames == 4
        assert res.ate_rmse is not None and res.ate_rmse < 0.1
        assert not res.diverged
        assert res.map_nodes > 100

    def test_auto_grow_completes_without_overflow(self):
        """A pool too small for the scene doubles mid-run instead of
        silently dropping geometry (VERDICT round-1 item 5)."""
        cfg = SLAMConfig(width=64, height=48, focal_x=55.0, focal_y=55.0,
                         pyramid_depth=2, pyramid_iters=(2, 2),
                         voxel_resolution=0.02, max_depth=8,
                         node_capacity=9368,  # smallest pre=4 pool + slack
                         leaf_capacity=1 << 9, max_march_iters=16)
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.05) for i in range(5)]

        def frame_fn(i):
            return sources.render_frame(scene, gt[i], cfg.focal_x,
                                        cfg.focal_y, width=cfg.width,
                                        height=cfg.height)

        sink: list = []
        res = app.run_slam(frame_fn, 5, cfg, initial_pose=gt[0],
                           render_every=0, state_out=sink)
        assert res.frames == 5
        state = sink[0]
        assert state.pool.capacity > 9368          # growth happened
        assert state.leaves.keys.shape[0] > (1 << 9)
        assert not bool(state.pool.overflowed)
        assert not bool(state.leaves.overflowed)
        # registry rebuilt after its overflow: count matches the map
        # (extraction BFS needs interiors, which lazy frames defer)
        from octree_slam_tpu.map import svo as svo_mod
        pool = (svo_mod.refresh_interior(state.pool, depth=cfg.max_depth)
                if bool(state.interior_stale) else state.pool)
        ex = svo_mod.extract_voxels(pool, depth=cfg.max_depth,
                                    capacity=1 << 14)
        assert int(state.leaves.count) == int(ex.count)

    def test_state_checkpoint_roundtrip(self, tmp_path):
        scene = sources.default_scene()
        pose = sources.orbit_pose(0.0)
        frame = sources.render_frame(scene, pose, CFG.focal_x, CFG.focal_y,
                                     width=CFG.width, height=CFG.height)
        state = pipeline.init_state(CFG, initial_pose=pose)
        state, _ = pipeline.step(state, frame, CFG, render="none")
        p = str(tmp_path / "state.npz")
        app.save_state(p, state, CFG)
        state2, cfg2 = app.load_state(p, CFG)
        assert cfg2.node_capacity == CFG.node_capacity
        np.testing.assert_array_equal(np.asarray(state2.pool.child),
                                      np.asarray(state.pool.child))
        np.testing.assert_allclose(np.asarray(state2.pose),
                                   np.asarray(state.pose))
        # resumed state continues stepping
        state3, out = pipeline.step(state2, frame, CFG, render="none")
        assert int(state3.frame_idx) == 2

    def test_cli_orbit(self, capsys):
        app.main(["--source", "orbit", "--frames", "2", "--width", "64",
                  "--height", "48", "--max-depth", "6",
                  "--resolution", "0.08", "--render-every", "0",
                  "--log-every", "0"])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        import json
        rec = json.loads(out)
        assert rec["frames"] == 2
