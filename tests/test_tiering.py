"""Host tiering: spill/restore of cold map regions (map/tiering.py) and the
value-verbatim bulk write underneath it (svo.insert_exact).

The invariants mirror the reference's pushToGPU/pullToCPU round trip
(octree.cpp:41-111), which re-serializes stored node words exactly: a
spill -> restore cycle must reproduce every leaf value bit-identically, and
interiors must follow bit-identically through refresh_interior."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.map import mips, morton, svo, tiering
from octree_slam_tpu.sensor import sources

CFG = SLAMConfig(width=80, height=60, focal_x=70.0, focal_y=70.0,
                 pyramid_depth=2, pyramid_iters=(6, 6),
                 voxel_resolution=0.04, max_depth=8,
                 node_capacity=1 << 17, leaf_capacity=1 << 15,
                 extract_capacity=1 << 15, insert_unique_cap=1 << 13,
                 max_march_iters=48, host_spill=True,
                 spill_keep_radius=1.0, restore_radius=0.9)


def build_state(n_frames=3, cfg=CFG):
    scene = sources.default_scene()
    state = pipeline.init_state(cfg)
    pose0 = sources.orbit_pose(0.0, radius=2.0)
    state = state._replace(pose=jnp.asarray(pose0))
    for i in range(n_frames):
        gt = sources.orbit_pose(i * 0.015, radius=2.0)
        frame = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                     width=cfg.width, height=cfg.height)
        state, out = pipeline.step(state, frame, cfg)
    return state, out


def leaf_dict(pool, cfg):
    p = svo.refresh_interior(pool, depth=cfg.max_depth)
    cap = cfg.extract_capacity
    while True:
        ex = svo.extract_voxels(p, depth=cfg.max_depth, capacity=cap)
        n = int(ex.count)
        if n < cap:
            break
        cap *= 2
    keys = np.asarray(ex.keys[:n])
    nodes = np.asarray(ex.nodes[:n])
    vals = np.asarray(p.value)[np.maximum(nodes, 0)]
    live = nodes >= 0
    return dict(zip(keys[live].tolist(), vals[live].tolist()))


class TestInsertExact:
    def test_rebuild_is_bit_identical(self):
        """create + insert_exact(all leaves) + refresh_interior reproduces
        leaf values AND interior values exactly (compared through the dense
        mirror, which is keyed by morton cell, not node index)."""
        state, _ = build_state()
        pool = svo.refresh_interior(state.pool, depth=CFG.max_depth)
        before = leaf_dict(pool, CFG)
        assert len(before) > 500

        keys = np.fromiter(before.keys(), np.int32, len(before))
        vals = np.fromiter(before.values(), np.uint32, len(before))
        fresh = svo.create(CFG.node_capacity, pool.center, pool.half_size)
        fresh, _ = tiering._insert_all_exact(fresh, keys, vals, CFG,
                                             overwrite=True)
        fresh = svo.refresh_interior(fresh, depth=CFG.max_depth)

        assert leaf_dict(fresh, CFG) == before
        lvl = 3
        m0 = mips.rebuild_from_pool(pool, max_depth=CFG.max_depth,
                                    dist_level=lvl)
        m1 = mips.rebuild_from_pool(fresh, max_depth=CFG.max_depth,
                                    dist_level=lvl)
        assert bool(jnp.all(m0.values == m1.values))
        assert bool(jnp.all(m0.dist == m1.dist))
        # the rebuild is also at least as compact (no duplicate tiles)
        assert int(fresh.n_nodes) <= int(pool.n_nodes)

    def test_overwrite_false_keeps_live_leaves(self):
        pool = svo.create(1 << 14, jnp.zeros(3), jnp.float32(1.0))
        pts = jnp.asarray([[0.51, 0.51, 0.51], [-0.49, -0.49, -0.49]])
        keys, ok = morton.encode(pts, pool.center, pool.half_size, 6)
        assert bool(jnp.all(ok))
        a = jnp.asarray([0xAABBCC01, 0xDDEEFF02], jnp.uint32)
        pool, _ = svo.insert_exact(pool, keys, a, depth=6,
                                   unique_cap=8)
        b = jnp.asarray([0x11223303, 0x44556604], jnp.uint32)
        # overwrite=True clobbers; overwrite=False keeps the live word
        p1, _ = svo.insert_exact(pool, keys, b, depth=6, unique_cap=8,
                                 overwrite=True)
        p2, st = svo.insert_exact(pool, keys, b, depth=6, unique_cap=8,
                                  overwrite=False)
        qv, _ = svo.query_points(p1, pts, depth=6)
        assert np.asarray(qv).tolist() == list(np.asarray(b))
        qv, _ = svo.query_points(p2, pts, depth=6)
        assert np.asarray(qv).tolist() == list(np.asarray(a))
        # stats report the value actually resident post-write
        tv = np.asarray(st.touched_leaf_vals)[
            np.asarray(st.touched_leaf_nodes) >= 0]
        assert sorted(tv.tolist()) == sorted(np.asarray(a).tolist())


class TestSpillRestore:
    def test_roundtrip_bit_identical(self):
        state, out = build_state()
        cfg = CFG
        before = leaf_dict(state.pool, cfg)
        n_before = int(state.pool.n_nodes)
        cam = np.asarray(state.pose)[:3, 3]

        archive = tiering.HostArchive(cfg.tier_level)
        state, cfg, n_spilled = tiering.spill_cold(
            state, cfg, archive, camera_pos=cam)
        assert n_spilled > 0
        assert len(archive) > 0
        assert archive.n_leaves == n_spilled
        assert int(state.pool.n_nodes) < n_before
        # spilled + kept partitions the original leaf set exactly
        kept = leaf_dict(state.pool, cfg)
        spilled = {}
        for k, v in archive.cells.values():
            spilled.update(zip(k.tolist(), v.tolist()))
        assert set(kept) | set(spilled) == set(before)
        assert not set(kept) & set(spilled)
        assert all(before[k] == v for k, v in kept.items())
        assert all(before[k] == v for k, v in spilled.items())
        # registry rebuilt to the kept set
        assert int(state.leaves.count) == len(kept)

        # restore everything: camera "teleports" near each archived cell
        big = dataclasses.replace(cfg, restore_radius=1e9)
        state, big, n_restored = tiering.restore_due(
            state, big, archive, camera_pos=cam)
        assert n_restored == len(spilled)
        assert len(archive) == 0
        assert leaf_dict(state.pool, big) == before
        assert int(state.leaves.count) == len(before)

    def test_spill_noop_when_all_hot(self):
        state, _ = build_state(1)
        cfg = dataclasses.replace(CFG, spill_keep_radius=1e9)
        archive = tiering.HostArchive(cfg.tier_level)
        n0 = int(state.pool.n_nodes)
        stale0 = bool(state.interior_stale)
        state, cfg, n = tiering.spill_cold(
            state, cfg, archive, camera_pos=np.zeros(3))
        assert n == 0 and len(archive) == 0
        assert int(state.pool.n_nodes) == n0
        # the no-op path must NOT clear the stale flag: the dense-mip
        # mirror was never rebuilt, only pool interiors were refreshed —
        # clearing would disarm the in-step heal (review finding r2)
        assert bool(state.interior_stale) == stale0

    def test_restore_grows_instead_of_losing_leaves(self):
        """A restore that outruns pool capacity must grow and retry, not
        silently drop archived leaves (review finding r1)."""
        state, _ = build_state()
        cfg = CFG
        cam = np.asarray(state.pose)[:3, 3]
        before = leaf_dict(state.pool, cfg)
        archive = tiering.HostArchive(cfg.tier_level)
        state, cfg, n_spilled = tiering.spill_cold(
            state, cfg, archive, camera_pos=cam)
        assert n_spilled > 0

        # fill the pool close to capacity with NEW geometry so the
        # restore cannot fit without growing
        rng = np.random.default_rng(3)
        touched = set()
        for _ in range(64):
            if int(state.pool.n_nodes) >= cfg.node_capacity * 7 // 8:
                break
            pts = rng.uniform(-4.5, 4.5, (4096, 3)).astype(np.float32)
            cols = rng.uniform(0, 1, (4096, 3)).astype(np.float32)
            fk, fok = morton.encode(jnp.asarray(pts), state.pool.center,
                                    state.pool.half_size, cfg.max_depth)
            touched.update(np.asarray(fk)[np.asarray(fok)].tolist())
            pool, st = svo.insert(state.pool, jnp.asarray(pts),
                                  jnp.asarray(cols), depth=cfg.max_depth,
                                  unique_cap=cfg.insert_unique_cap)
            from octree_slam_tpu.render.splat import append_new_leaves
            state = state._replace(
                pool=pool, leaves=append_new_leaves(state.leaves, st),
                interior_stale=jnp.bool_(True))
        assert int(state.pool.n_nodes) >= cfg.node_capacity * 7 // 8
        spilled_keys = {int(k) for ks, _ in archive.cells.values()
                        for k in ks}

        big = dataclasses.replace(cfg, restore_radius=1e9)
        state, big, n_restored = tiering.restore_due(
            state, big, archive, camera_pos=cam)
        assert n_restored == len(spilled_keys)
        assert big.node_capacity > cfg.node_capacity  # it had to grow
        after = leaf_dict(state.pool, big)
        # every spilled leaf is back: archived value when untouched, the
        # NEWER live value when the filler re-observed it while spilled
        # (restore never clobbers re-observation, insert_exact overwrite=F)
        untouched = spilled_keys - touched
        assert len(untouched) > 100  # the equality check is non-vacuous
        for k in spilled_keys:
            if k in untouched:
                assert after[k] == before[k]
            else:
                assert k in after

    def test_run_slam_spills_under_pressure(self):
        """End-to-end: a pool too small for the scene + host_spill keeps
        the run alive by archiving cold regions instead of only growing,
        and the trajectory stays tracked."""
        from octree_slam_tpu import app
        from octree_slam_tpu.sensor import sources

        cfg = dataclasses.replace(
            CFG, node_capacity=1 << 13, leaf_capacity=1 << 12,
            extract_capacity=1 << 12, spill_keep_radius=1.6,
            restore_radius=1.2)
        scene = sources.default_scene()
        gts = [sources.orbit_pose(i * 0.02, radius=2.0) for i in range(8)]

        def frame_fn(i):
            return sources.render_frame(scene, gts[i], cfg.focal_x,
                                        cfg.focal_y, width=cfg.width,
                                        height=cfg.height)

        res = app.run_slam(frame_fn, len(gts), cfg, initial_pose=gts[0],
                           gt_fn=lambda i: gts[i], render_every=0)
        assert not res.diverged
        assert res.spilled_leaves > 0

    def test_restore_never_clobbers_reobserved(self):
        state, _ = build_state()
        cfg = CFG
        cam = np.asarray(state.pose)[:3, 3]
        archive = tiering.HostArchive(cfg.tier_level)
        state, cfg, n_spilled = tiering.spill_cold(
            state, cfg, archive, camera_pos=cam)
        assert n_spilled > 0

        # re-observe ONE spilled leaf with a new color before restoring
        k0, v0 = next(iter(archive.cells.values()))
        key = int(k0[0])
        c = morton.decode_centers(jnp.asarray([key]), state.pool.center,
                                  state.pool.half_size, cfg.max_depth)
        newpool, st = svo.insert(state.pool, c,
                                 jnp.asarray([[1.0, 0.0, 0.0]]),
                                 depth=cfg.max_depth,
                                 unique_cap=cfg.insert_unique_cap,
                                 update_interior=False)
        from octree_slam_tpu.render.splat import append_new_leaves
        state = state._replace(pool=newpool,
                               leaves=append_new_leaves(state.leaves, st),
                               interior_stale=jnp.bool_(True))
        live_val = int(np.asarray(
            svo.query_points(newpool, c, depth=cfg.max_depth)[0])[0])

        big = dataclasses.replace(cfg, restore_radius=1e9)
        state, big, n_restored = tiering.restore_due(
            state, big, archive, camera_pos=cam)
        assert n_restored > 0
        after = int(np.asarray(svo.query_points(
            state.pool, c, depth=big.max_depth)[0])[0])
        assert after == live_val  # the newer observation survived
        assert after != int(v0[0]) or live_val == int(v0[0])


def test_inverted_hysteresis_rejected():
    """restore_radius >= spill_keep_radius thrashes (spill -> immediate
    restore every frame, observed live at 1080p): run_slam refuses it."""
    import pytest
    from octree_slam_tpu import app
    from octree_slam_tpu.config import SLAMConfig

    cfg = SLAMConfig(width=32, height=24, max_depth=5,
                     node_capacity=1 << 12, leaf_capacity=1 << 10,
                     host_spill=True, spill_keep_radius=2.2)
    assert cfg.restore_radius >= cfg.spill_keep_radius  # the footgun
    with pytest.raises(ValueError, match="hysteresis|restore_radius"):
        app.run_slam(lambda i: None, 0, cfg)
