"""Tracking-loss recovery (relocalize.py): a garbage frame diverges the
tracker, fusion gates off, and the app re-anchors the pose by ICP against
map renders at recent keyposes. The reference only prints "Camera tracking
is lost" (rgbd_camera.cpp:148-151) — recovery is beyond-parity."""

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu import app, pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core.types import Frame
from octree_slam_tpu.sensor import sources

CFG = SLAMConfig(width=80, height=60, focal_x=70.0, focal_y=70.0,
                 pyramid_depth=2, pyramid_iters=(6, 6),
                 voxel_resolution=0.04, max_depth=8,
                 node_capacity=1 << 17, leaf_capacity=1 << 15,
                 insert_unique_cap=1 << 13, max_march_iters=48,
                 keypose_every=2, reloc_candidates=4,
                 reloc_min_inlier_frac=0.05)


def make_frames(n_good_before=6, n_after=4, step=0.02):
    scene = sources.default_scene()
    gts, frames = [], []
    for i in range(n_good_before + 1 + n_after):
        gt = sources.orbit_pose(i * step, radius=2.0)
        gts.append(np.asarray(gt))
        if i == n_good_before:
            # garbage frame: zero depth -> every ICP gate fails -> diverged
            frames.append(Frame(
                depth=jnp.zeros((CFG.height, CFG.width), jnp.uint16),
                color=jnp.zeros((CFG.height, CFG.width, 3), jnp.uint8),
                timestamp=jnp.float32(i / 30.0)))
        else:
            frames.append(sources.render_frame(
                scene, gt, CFG.focal_x, CFG.focal_y, width=CFG.width,
                height=CFG.height))
    return frames, gts


class TestRelocalize:
    def test_recovers_after_garbage_frame(self):
        frames, gts = make_frames()
        res = app.run_slam(lambda i: frames[i], len(frames), CFG,
                           initial_pose=gts[0], gt_fn=lambda i: gts[i],
                           render_every=0)
        assert res.relocalizations >= 1
        assert not res.diverged
        # the final pose re-anchored to the true trajectory
        err = np.linalg.norm(res.poses[-1][:3, 3] - gts[-1][:3, 3])
        assert err < 0.05, err

    def test_without_relocalize_stays_lost(self):
        import dataclasses
        cfg = dataclasses.replace(CFG, relocalize=False)
        frames, gts = make_frames()
        res = app.run_slam(lambda i: frames[i], len(frames), cfg,
                           initial_pose=gts[0], gt_fn=lambda i: gts[i],
                           render_every=0)
        assert res.relocalizations == 0
        assert res.diverged  # sticky, like the reference's lost state

    def test_fusion_gated_while_diverged(self):
        """pipeline.step must not fuse a diverged frame's points."""
        frames, gts = make_frames(n_good_before=2, n_after=1)
        state = pipeline.init_state(CFG, initial_pose=gts[0])
        state = state._replace(pose=jnp.asarray(gts[0]))
        for i in range(2):
            state, out = pipeline.step(state, frames[i], CFG, render="none")
        n_before = int(out.map_nodes)
        leaves_before = int(out.map_leaves)
        # garbage frame flips diverged; its (empty) points are gated anyway
        state, out = pipeline.step(state, frames[2], CFG, render="none")
        assert bool(out.diverged)
        # next GOOD frame arrives while still diverged: must not fuse
        state, out = pipeline.step(state, frames[3], CFG, render="none")
        assert bool(out.diverged)
        assert int(out.map_nodes) == n_before
        assert int(out.map_leaves) == leaves_before

    def test_fusion_resumes_per_frame_without_relocalize(self):
        """With relocalize=False there is no recovery to clear the sticky
        flag, so the gate must be PER-FRAME: a transient bad frame is
        skipped but fusion resumes once tracking re-locks (else one glitch
        would freeze the map forever)."""
        import dataclasses
        cfg = dataclasses.replace(CFG, relocalize=False)
        frames, gts = make_frames(n_good_before=3, n_after=3, step=0.02)
        state = pipeline.init_state(cfg, initial_pose=gts[0])
        state = state._replace(pose=jnp.asarray(gts[0]))

        def alpha_sum(st):  # grows iff leaves blended this frame
            # max 2^17 nodes x 255 alpha ~ 3e7: safe in int32 (x64 is off)
            return int(jnp.sum((st.pool.value >> 24).astype(jnp.int32)))

        for i in range(3):
            state, out = pipeline.step(state, frames[i], cfg, render="none")
        state, out = pipeline.step(state, frames[3], cfg, render="none")
        assert bool(out.diverged)
        a_garbage = alpha_sum(state)
        # frame 4 is good, but it tracks AGAINST the garbage pyramid ->
        # per-frame gate still holds: nothing blends
        state, out = pipeline.step(state, frames[4], cfg, render="none")
        assert alpha_sum(state) == a_garbage
        assert bool(out.diverged)  # flag stays sticky for reporting
        # frame 5 tracks against good frame 4: re-locked, fusion resumes
        state, out = pipeline.step(state, frames[5], cfg, render="none")
        assert alpha_sum(state) > a_garbage
