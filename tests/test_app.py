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


class TestPrecompileAhead:
    """Compile-ahead of the post-growth step (app.precompile_step):
    the executable built from predicted init_state shapes must accept the
    LIVE state and reproduce the jit path bit-for-bit."""

    def _cfg(self, **kw):
        base = dict(width=64, height=48, focal_x=55.0, focal_y=55.0,
                    pyramid_depth=2, pyramid_iters=(2, 2),
                    voxel_resolution=0.05, max_depth=7,
                    node_capacity=1 << 14, leaf_capacity=1 << 11,
                    max_march_iters=16)
        base.update(kw)
        return SLAMConfig(**base)

    def test_prewarmed_step_matches_fresh_jit(self, capsys):
        import jax
        cfg = self._cfg()
        th = app.precompile_step(cfg, "none")
        assert th is not None
        th.join(timeout=600)
        assert (cfg, "none") in app._aot_cache
        assert "precompile_ready" in capsys.readouterr().out

        pose = sources.orbit_pose(0.0)
        scene = sources.default_scene()
        frame = sources.render_frame(scene, pose, cfg.focal_x, cfg.focal_y,
                                     width=cfg.width, height=cfg.height)
        state = pipeline.init_state(cfg, initial_pose=pose)
        s2 = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), state)

        ref_state, ref_out = app._build_jit(cfg, "none")(state, frame)
        fn = app._donated_step(cfg, "none")   # adopts the warmed wrapper
        assert (cfg, "none") not in app._aot_cache
        aot_state, aot_out = fn(s2, frame)

        np.testing.assert_array_equal(np.asarray(aot_out.pose),
                                      np.asarray(ref_out.pose))
        np.testing.assert_array_equal(np.asarray(aot_state.pool.value),
                                      np.asarray(ref_state.pool.value))
        assert int(aot_out.map_nodes) == int(ref_out.map_nodes)
        # cleanup so other tests see a fresh cache for this cfg
        app._step_cache.pop((cfg, "none"), None)

    def test_mispredicted_precompile_is_harmless(self):
        """A precompiled config that never becomes live just sits unused;
        the actually-grown config misses the cache and compiles normally."""
        cfg_pred = self._cfg(node_capacity=1 << 13)
        cfg_live = self._cfg(node_capacity=1 << 15)
        th = app.precompile_step(cfg_pred, "none")
        if th is not None:
            th.join(timeout=600)

        pose = sources.orbit_pose(0.0)
        scene = sources.default_scene()
        frame = sources.render_frame(scene, pose, cfg_live.focal_x,
                                     cfg_live.focal_y, width=cfg_live.width,
                                     height=cfg_live.height)
        state = pipeline.init_state(cfg_live, initial_pose=pose)
        fn = app._donated_step(cfg_live, "none")
        new_state, out = fn(state, frame)
        assert int(new_state.frame_idx) == 1
        # the stale smaller-capacity prediction is evicted on adoption of
        # a bigger config (capacities only grow — it can never become live)
        assert (cfg_pred, "none") not in app._aot_cache
        app._step_cache.pop((cfg_live, "none"), None)
        app._step_cache.pop((cfg_pred, "none"), None)

    def test_growth_run_with_precompile_matches_without(self):
        """End-to-end: an auto-growing run with compile-ahead produces the
        identical trajectory and map as with the flag off."""
        def run(flag):
            cfg = self._cfg(node_capacity=9368, leaf_capacity=1 << 9,
                            voxel_resolution=0.02, max_depth=8,
                            precompile_ahead=flag)
            scene = sources.default_scene()
            gt = [sources.orbit_pose(i * 0.05) for i in range(5)]

            def frame_fn(i):
                return sources.render_frame(scene, gt[i], cfg.focal_x,
                                            cfg.focal_y, width=cfg.width,
                                            height=cfg.height)

            sink: list = []
            res = app.run_slam(frame_fn, 5, cfg, initial_pose=gt[0],
                               render_every=0, state_out=sink)
            return res, sink[0]

        res_a, st_a = run(True)
        res_b, st_b = run(False)
        assert res_a.frames == res_b.frames == 5
        np.testing.assert_array_equal(np.stack(res_a.poses),
                                      np.stack(res_b.poses))
        assert st_a.pool.capacity == st_b.pool.capacity
        np.testing.assert_array_equal(np.asarray(st_a.pool.value),
                                      np.asarray(st_b.pool.value))


class TestRunControls:
    def test_stop_fn_ends_run_early(self):
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.02) for i in range(6)]

        def frame_fn(i):
            return sources.render_frame(scene, gt[i], CFG.focal_x,
                                        CFG.focal_y, width=CFG.width,
                                        height=CFG.height)

        res = app.run_slam(frame_fn, 6, CFG, initial_pose=gt[0],
                           render_every=0, stop_fn=lambda i: i >= 3)
        assert res.frames == 3
        assert len(res.poses) == 3
        assert res.steady_fps > 0 and res.max_frame_s > 0
        assert res.growth_frame_s is None  # no growth in 3 frames
