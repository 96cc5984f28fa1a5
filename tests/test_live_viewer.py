"""Live terminal viewer: key decoding, ANSI drawing, interactive core."""

import numpy as np

from octree_slam_tpu import live_viewer
from octree_slam_tpu.render import camera_controller as fly


class TestKeys:
    def test_decode_plain_and_arrows(self):
        assert live_viewer.decode_keys(b"wasd") == ["w", "a", "s", "d"]
        assert live_viewer.decode_keys(b"\x1b[A\x1b[D") == ["UP", "LEFT"]
        assert live_viewer.decode_keys(b"W") == ["w"]
        assert live_viewer.decode_keys(b"q\t+") == ["q", "\t", "+"]

    def test_truncated_escape_is_safe(self):
        # a bare ESC or ESC-[ at the end of a read chunk must not crash
        assert "UP" not in live_viewer.decode_keys(b"\x1b")
        assert "UP" not in live_viewer.decode_keys(b"\x1b[")


class TestAnsiFrame:
    def test_halfblocks_and_colors(self):
        img = np.zeros((4, 3, 3), np.uint8)
        img[0::2] = [255, 0, 0]   # top rows red
        img[1::2] = [0, 0, 255]   # bottom rows blue
        s = live_viewer.ansi_frame(img)
        assert s.startswith("\x1b[H")
        assert s.count("▀") == 2 * 3       # H/2 x W cells
        assert "38;2;255;0;0" in s and "48;2;0;0;255" in s

    def test_run_length_reuses_sgr(self):
        flat = np.full((2, 10, 3), 7, np.uint8)
        s = live_viewer.ansi_frame(flat, home=False)
        # one SGR for the whole identical row, not one per cell
        assert s.count("38;2;7;7;7") == 1


def _tiny_map():
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
    res = app.run_slam(
        lambda i: sources.render_frame(scene, gt[i], cfg.focal_x,
                                       cfg.focal_y, width=cfg.width,
                                       height=cfg.height),
        3, cfg, initial_pose=gt[0], render_every=0, state_out=sink)
    # auto-growth can change capacities mid-run: the run-end cfg is the
    # one that matches the state's shapes (save_state docstring)
    return sink[0], res.final_cfg


class TestLiveViewer:
    def test_feed_tick_moves_and_renders(self):
        state, cfg = _tiny_map()
        v = live_viewer.LiveViewer(state.pool, state.leaves, cfg,
                                   width=64, height=48, mode="splat")
        p0 = np.asarray(v.state.position)
        fb0 = v.tick()
        assert fb0.shape == (48, 64, 4) and fb0[..., 3].max() > 0

        v.feed(["w", "w"])
        v.tick()
        p1 = np.asarray(v.state.position)
        assert np.linalg.norm(p1 - p0) > 0.01

        yaw0 = v.state.yaw
        v.feed(["LEFT"])
        v.tick()
        assert v.state.yaw != yaw0

        fov0 = v.state.fov
        v.feed(["+"])
        v.tick()
        assert v.state.fov < fov0     # zoom in narrows FoV

    def test_tab_switches_mode_and_q_quits(self):
        state, cfg = _tiny_map()
        v = live_viewer.LiveViewer(state.pool, state.leaves, cfg,
                                   width=64, height=48, mode="splat")
        v.feed(["\t"])
        assert v.mode == "cone"
        fb = v.tick()
        assert fb.shape == (48, 64, 4)
        v.feed(["q"])
        assert v.quit

    def test_status_line_carries_fps(self):
        state, cfg = _tiny_map()
        v = live_viewer.LiveViewer(state.pool, state.leaves, cfg,
                                   width=64, height=48)
        line = v.status(12.3)
        assert "12.3 fps" in line and "splat" in line

    def test_headless_main_smoke(self, tmp_path, monkeypatch, capsys):
        """main() with stdin not a tty: scripted ticks, no termios."""
        state, cfg = _tiny_map()
        from octree_slam_tpu import app as app_mod
        path = str(tmp_path / "m.npz")
        app_mod.save_state(path, state, cfg)
        n = live_viewer.main(["--load-state", path, "--ticks", "3",
                              "--fps", "100"])
        assert n == 3
        out = capsys.readouterr().out
        assert "▀" in out and "fps" in out


class TestPickSize:
    def test_fits_terminal(self):
        w, h = live_viewer.pick_size(100, 40)
        assert w % 8 == 0 and h % 8 == 0 and h % 2 == 0
        assert w <= 100 and h <= 2 * 38
        # tiny terminals still get a renderable floor
        assert live_viewer.pick_size(10, 5) == (32, 32)
