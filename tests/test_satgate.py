"""Saturation pre-gate (cfg.saturation_gate; round-3 verdict item #2).

Once a leaf's alpha saturates at 255, the fillNodes blend
(svo.cu:326-332) weights the new sample 1/256: a channel moves only when
the observation differs enough (upward: never, the +fraction truncates
away; downward: creeps 1 level/frame toward darker observations — int
truncation, same as the reference's float->int cast). The gate drops
points landing in saturated leaves BEFORE the key sort, trading that
bounded creep for a frame cost sized by genuinely-new uniques.

Checks: the gate leaves keys/occupancy identical and values within the
creep bound; the bitmask exactly mirrors the registry's saturated set
(incremental scatter-ADD == from-scratch rebuild); gated frames actually
shrink the unique load; pager interaction stays lossless.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core import packing
from octree_slam_tpu.sensor import sources

CFG = SLAMConfig(width=64, height=48, focal_x=55.0, focal_y=55.0,
                 pyramid_depth=2, pyramid_iters=(2, 2),
                 voxel_resolution=0.05, max_depth=6,
                 node_capacity=1 << 16, leaf_capacity=1 << 12,
                 insert_unique_cap=1 << 11, relocalize=False,
                 saturation_gate=True)


def run_frames(cfg, n, step_angle=0.0):
    """n orbit frames (static camera by default so leaves saturate)."""
    scene = sources.default_scene()
    state = pipeline.init_state(cfg,
                                initial_pose=sources.orbit_pose(0.0))
    step = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="none"))
    out = None
    for i in range(n):
        gt = sources.orbit_pose(i * step_angle)
        frame = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                     width=cfg.width, height=cfg.height)
        state, out = step(state, frame)
    return state, out


def live_leaves(state):
    k = np.asarray(state.leaves.keys)
    v = np.asarray(state.leaves.vals)
    live = k >= 0
    order = np.argsort(k[live], kind="stable")
    return k[live][order], v[live][order]


class TestSaturationGate:
    def test_mask_matches_registry_after_saturation(self):
        # 70 static frames: alpha 127 + 2*70 saturates (64 observations)
        state, _ = run_frames(CFG, 70)
        k, v = live_leaves(state)
        sat_keys = k[packing.alpha_of(jnp.asarray(v)) == 255]
        assert sat_keys.size > 50, "scene must have saturated leaves"
        # incremental mask == from-scratch rebuild, bit for bit
        rebuilt = pipeline.rebuild_sat_mask(state, CFG)
        np.testing.assert_array_equal(np.asarray(state.sat_mask),
                                      np.asarray(rebuilt.sat_mask))
        # every saturated key's bit is set, and ONLY those
        mask = np.asarray(state.sat_mask)
        bits = (mask[sat_keys >> 5] >> (sat_keys & 31)) & 1
        assert np.all(bits == 1)
        assert int(sum(bin(w).count("1") for w in mask.tolist())) \
            == sat_keys.size

    def test_gate_content_equivalence_with_creep_bound(self):
        """Gate on vs off over the same stream: identical leaf SET and
        alphas; colors within the 1-level-per-post-saturation-frame
        truncation creep."""
        n, extra = 70, 6
        cfg_off = dataclasses.replace(CFG, saturation_gate=False)
        s_on, _ = run_frames(CFG, n + extra)
        s_off, _ = run_frames(cfg_off, n + extra)
        k1, v1 = live_leaves(s_on)
        k0, v0 = live_leaves(s_off)
        np.testing.assert_array_equal(k1, k0)
        a1 = np.asarray(packing.alpha_of(jnp.asarray(v1)))
        a0 = np.asarray(packing.alpha_of(jnp.asarray(v0)))
        np.testing.assert_array_equal(a1, a0)
        for shift in (0, 8, 16):
            c1 = (v1 >> shift) & 0xFF
            c0 = (v0 >> shift) & 0xFF
            # static camera: observations repeat, so ungated saturated
            # leaves creep at most 1 level per extra frame
            assert np.abs(c1.astype(int) - c0.astype(int)).max() <= extra

    def test_gated_frames_shrink_unique_load(self):
        """After saturation, a tiny unique_cap no longer overflows: the
        gate removed the re-observation load. The probe steps run with
        device_remainder=False so StepOutput.unique_overflow reports the
        PRIMARY pass's flag (the in-device pager otherwise drains it
        before it's visible); warming runs lossless under CFG."""
        state, _ = run_frames(CFG, 70)
        scene = sources.default_scene()
        frame = sources.render_frame(scene, sources.orbit_pose(0.0),
                                     CFG.focal_x, CFG.focal_y,
                                     width=CFG.width, height=CFG.height)
        cfg_small = dataclasses.replace(CFG, insert_unique_cap=256,
                                        device_remainder=False)
        s1 = jax.tree_util.tree_map(jnp.copy, state)
        _, out = pipeline.step(s1, frame, cfg_small, render="none")
        # the gated insert fit in 256 uniques (everything re-observed)
        assert not bool(out.unique_overflow)
        # control: gate off, same warmed map, same cap — overflows
        cfg_ctl = dataclasses.replace(cfg_small, saturation_gate=False)
        s2 = jax.tree_util.tree_map(jnp.copy, state)
        _, out_ctl = pipeline.step(s2, frame, cfg_ctl, render="none")
        assert bool(out_ctl.unique_overflow)

    def test_checkpoint_roundtrip_preserves_mask(self, tmp_path):
        from octree_slam_tpu import app
        state, _ = run_frames(CFG, 70)
        p = str(tmp_path / "sat.npz")
        app.save_state(p, state, CFG)
        state2, cfg2 = app.load_state(p, CFG)
        assert cfg2.saturation_gate
        np.testing.assert_array_equal(np.asarray(state.sat_mask),
                                      np.asarray(state2.sat_mask))
