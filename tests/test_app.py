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

    def test_state_checkpoint_roundtrip(self, tmp_path):
        scene = sources.default_scene()
        pose = sources.orbit_pose(0.0)
        frame = sources.render_frame(scene, pose, CFG.focal_x, CFG.focal_y,
                                     width=CFG.width, height=CFG.height)
        state = pipeline.init_state(CFG, initial_pose=pose)
        state, _ = pipeline.step(state, frame, CFG, render="none")
        p = str(tmp_path / "state.npz")
        app.save_state(p, state)
        state2 = app.load_state(p, CFG)
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
