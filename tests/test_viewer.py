"""Scripted fly-camera viewer (the app caller for camera_controller)."""

import numpy as np

from octree_slam_tpu import viewer
from octree_slam_tpu.render import camera_controller as fly


class TestScript:
    def test_parse_expands_ticks(self):
        ticks = viewer.parse_script("w 1.0; look 0.5 -0.2; zoom -5; wait 0.2",
                                    fps=10.0)
        assert sum(1 for t in ticks if t.forward > 0) == 10
        assert any(t.scroll == -5 for t in ticks)
        drag = [t for t in ticks if t.drag_x != 0]
        assert abs(sum(t.drag_x for t in drag) - 0.5) < 1e-6
        assert abs(sum(t.drag_y for t in drag) + 0.2) < 1e-6

    def test_unknown_command(self):
        import pytest
        with pytest.raises(ValueError):
            viewer.parse_script("teleport 3", fps=10.0)

    def test_poses_move_and_turn(self):
        ticks = viewer.parse_script("w 1.0; look 0.8 0", fps=5.0)
        poses = [p for _, p in viewer.fly_poses(
            fly.FlyCameraState(position=(0, 0, 3.0)), ticks, dt=0.2)]
        # forward motion along -z (yaw pi looks down -z)
        assert poses[4][2, 3] < poses[0][2, 3]
        # the look command changed heading
        assert not np.allclose(poses[-1][:3, :3], poses[4][:3, :3])


class TestViewerRender:
    def test_flight_renders_distinct_frames(self, tmp_path):
        from octree_slam_tpu import app
        from octree_slam_tpu.config import SLAMConfig
        from octree_slam_tpu.sensor import sources

        cfg = SLAMConfig(width=64, height=48, focal_x=55.0, focal_y=55.0,
                         pyramid_depth=2, pyramid_iters=(2, 2),
                         voxel_resolution=0.05, max_depth=7,
                         node_capacity=1 << 15, leaf_capacity=1 << 12)
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.02) for i in range(3)]
        sink: list = []
        app.run_slam(
            lambda i: sources.render_frame(scene, gt[i], cfg.focal_x,
                                           cfg.focal_y, width=cfg.width,
                                           height=cfg.height),
            3, cfg, initial_pose=gt[0], render_every=0, state_out=sink)
        state = sink[0]

        out = str(tmp_path / "fly")
        n = viewer.run_viewer(state.pool, state.leaves, cfg,
                              script="wait 0.2; w 0.4; look 0.5 0",
                              out_dir=out, mode="splat", fps=5.0)
        import pathlib
        frames = sorted(pathlib.Path(out).glob("fly_*.png"))
        assert len(frames) == n and n >= 4
        from PIL import Image
        a = np.asarray(Image.open(frames[0]))
        b = np.asarray(Image.open(frames[-1]))
        assert a.shape == (48, 64, 4) or a.shape == (48, 64, 3)
        assert not np.array_equal(a, b)  # the camera actually moved
