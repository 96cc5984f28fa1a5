"""Insert directory-cache tests (svo.insert dir_keys/dir_nodes/miss_cap).

The cache answers repeat leaf keys from last insert's
(touched_leaf_keys, touched_leaf_nodes) instead of the phase-1 descent
(the measured floor of full-res 1 cm fusion). Its contract is strict
bit-identity with the uncached insert — pool arrays, allocation cursor,
and every registry-facing stat — across hits, misses, the miss-cap
fallback, and whole-pipeline runs (reference semantics anchor:
fillNodes/expandTreeAtKeys, /root/reference/src/world/svo/svo.cu:239-382).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.map import morton, svo
from octree_slam_tpu import pipeline
from octree_slam_tpu.sensor import sources


def random_points(n, seed=0, lo=-0.9, hi=0.9):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    return jnp.asarray(pts), jnp.asarray(cols)


def _insert(pool, pts, cols, **kw):
    return svo.insert(pool, pts, cols, depth=8, unique_cap=8192,
                      update_interior=False, **kw)


def _leaf_content(pool, depth):
    """Canonical (sorted keys, their values): allocation-order-independent
    map content, for comparisons across paged vs single-pass inserts."""
    pool = svo.refresh_interior(pool, depth=depth)  # heal lazy interiors:
    # the BFS extraction reads interior occupancy (CLAUDE.md invariant)
    ex, _ = svo.extract_all_leaves(pool, depth=depth,
                                   start_capacity=1 << 15)
    k = np.asarray(ex.keys)
    n = np.asarray(ex.nodes)
    live = n >= 0
    order = np.argsort(k[live], kind="stable")
    v = np.asarray(pool.value)[n[live]][order]
    return k[live][order], v.astype(np.int64)


def assert_same_insert(a, b):
    pa, sa = a
    pb, sb = b
    assert bool(jnp.all(pa.child == pb.child))
    assert bool(jnp.all(pa.value == pb.value))
    assert int(pa.n_nodes) == int(pb.n_nodes)
    assert bool(pa.overflowed) == bool(pb.overflowed)
    for f in ("new_leaf_keys", "new_leaf_nodes", "touched_leaf_nodes",
              "touched_leaf_keys", "touched_leaf_vals"):
        assert bool(jnp.all(getattr(sa, f) == getattr(sb, f))), f
    assert int(sa.new_leaf_count) == int(sb.new_leaf_count)
    assert int(sa.new_nodes) == int(sb.new_nodes)


class TestDirLookup:
    def test_hits_and_misses(self):
        # returns the matching DIRECTORY ROW index (payload gathers are
        # the caller's), -1 on miss / dead rows
        dkeys = jnp.asarray([3, 9, 17, morton.INVALID_KEY,
                             morton.INVALID_KEY], jnp.int32)
        q = jnp.asarray([1, 3, 9, 10, 17, morton.INVALID_KEY], jnp.int32)
        out = np.asarray(svo._dir_lookup(dkeys, q))
        assert list(out) == [-1, 0, 1, -1, 2, -1]

    def test_unsorted_directory(self):
        # touched_leaf rows are key-sorted, but the lookup must not rely
        # on it (dead rows intersperse INVALID_KEY)
        dkeys = jnp.asarray([17, morton.INVALID_KEY, 3], jnp.int32)
        q = jnp.asarray([3, 17], jnp.int32)
        assert list(np.asarray(svo._dir_lookup(dkeys, q))) == [2, 0]


class TestInsertCacheBitIdentity:
    def setup_method(self):
        self.pool = svo.create(1 << 20, jnp.zeros(3), 1.28)
        self.pts, self.cols = random_points(5000, seed=3)
        self.warm, self.s1 = _insert(self.pool, self.pts, self.cols)

    def _dir(self, with_vals=False, with_aux=False):
        d = dict(dir_keys=self.s1.touched_leaf_keys,
                 dir_nodes=self.s1.touched_leaf_nodes)
        if with_vals:
            d["dir_vals"] = self.s1.touched_leaf_vals
        if with_aux:
            d["dir_aux"] = jnp.arange(
                self.s1.touched_leaf_keys.shape[0], dtype=jnp.int32) + 100
        return d

    def test_all_hits(self):
        ref = _insert(self.warm, self.pts, self.cols)
        got = _insert(self.warm, self.pts, self.cols, miss_cap=512,
                      **self._dir())
        assert_same_insert(ref, got)

    def test_mixed_hits_misses(self):
        pts2 = np.asarray(self.pts).copy()
        pts2[:2500] += 0.15  # ~half the frame first-seen
        pts2 = jnp.asarray(pts2)
        ref = _insert(self.warm, pts2, self.cols)
        got = _insert(self.warm, pts2, self.cols, miss_cap=4096,
                      **self._dir())
        assert_same_insert(ref, got)
        assert int(ref[1].new_leaf_count) > 0  # the misses were real

    def test_miss_cap_overflow_defers_to_pager(self):
        # misses >> miss_cap: the insert processes uniques up to the first
        # dropped miss and reports unique_overflow; the standard min_key
        # paging loop (uncached, as the pipeline runs it) finishes the
        # rest — the PAGED result must equal the single uncached pass
        pts2 = np.asarray(self.pts).copy()
        pts2[:2500] += 0.15
        pts2 = jnp.asarray(pts2)
        ref_pool, ref_st = _insert(self.warm, pts2, self.cols)
        assert not bool(ref_st.unique_overflow)

        pool, st = _insert(self.warm, pts2, self.cols, miss_cap=64,
                           **self._dir(with_vals=True))
        assert bool(st.unique_overflow)  # the deferral fired
        n_pages = 0
        while bool(st.unique_overflow):
            pool, st = _insert(pool, pts2, self.cols,
                               min_key=st.last_key)
            n_pages += 1
            assert n_pages < 100
        # paging allocates tiles in a different ORDER than a single pass
        # (page-local ranks), so raw arrays differ; the map CONTENT — the
        # sorted (leaf key, value) set — must be identical
        assert int(ref_pool.n_nodes) == int(pool.n_nodes)
        np.testing.assert_array_equal(*[
            np.stack(_leaf_content(p, 8)) for p in (ref_pool, pool)])

    def test_value_cache_bit_identity(self):
        # dir_vals: hits read their old value from the directory instead
        # of the pool — must be indistinguishable, mixed hits + misses
        pts2 = np.asarray(self.pts).copy()
        pts2[:2500] += 0.15
        pts2 = jnp.asarray(pts2)
        ref = _insert(self.warm, pts2, self.cols)
        got = _insert(self.warm, pts2, self.cols, miss_cap=4096,
                      **self._dir(with_vals=True))
        assert_same_insert(ref, got)

    def test_aux_payload_carried_for_hits(self):
        got_p, got_s = _insert(self.warm, self.pts, self.cols,
                               miss_cap=512,
                               **self._dir(with_vals=True, with_aux=True))
        hit_aux = np.asarray(got_s.hit_aux)
        touched = np.asarray(got_s.touched_leaf_keys) != morton.INVALID_KEY
        # every touched row is a hit here (same cloud): aux = dir row + 100
        dkeys = np.asarray(self.s1.touched_leaf_keys)
        ukeys = np.asarray(got_s.touched_leaf_keys)
        for i in np.nonzero(touched)[0][:50]:
            j = np.nonzero(dkeys == ukeys[i])[0]
            assert j.size == 1 and hit_aux[i] == j[0] + 100, i
        assert np.all(hit_aux[~touched] == -1)

    def test_cold_directory_is_all_misses(self):
        cold_k = jnp.full_like(self.s1.touched_leaf_keys,
                               morton.INVALID_KEY)
        cold_n = jnp.full_like(self.s1.touched_leaf_nodes, -1)
        ref = _insert(self.warm, self.pts, self.cols)
        got = _insert(self.warm, self.pts, self.cols, miss_cap=8192,
                      dir_keys=cold_k, dir_nodes=cold_n)
        assert_same_insert(ref, got)

    def test_eager_frames_reject_cache(self):
        import pytest
        with pytest.raises(ValueError):
            svo.insert(self.warm, self.pts, self.cols, depth=8,
                       unique_cap=8192, update_interior=True,
                       miss_cap=64, **self._dir())


class TestPipelineDircache:
    def _run(self, dircache: bool, n=6):
        cfg = SLAMConfig(width=64, height=48, focal_x=55.0, focal_y=55.0,
                         pyramid_depth=2, pyramid_iters=(3, 3),
                         voxel_resolution=0.02, max_depth=8,
                         node_capacity=1 << 17, leaf_capacity=1 << 13,
                         insert_unique_cap=1 << 11,
                         use_dense_mips=False, relocalize=False,
                         insert_dircache=dircache)
        scene = sources.default_scene()
        state = pipeline.init_state(cfg)
        step = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="none"),
                       static_argnums=())
        outs = []
        for i in range(n):
            gt = sources.orbit_pose(i * 0.02)
            f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                     width=cfg.width, height=cfg.height)
            state, out = step(state, f)
            outs.append(out)
        return cfg, state, outs

    def test_pipeline_bit_identity(self):
        # Cold frames defer their miss overflow to the in-step pager,
        # which allocates tiles in page-local order — raw child arrays
        # legitimately differ from the uncached run. The map CONTENT,
        # the registry's key/value columns, and every pose must match
        # exactly.
        cfg, s_off, o_off = self._run(False)
        _, s_on, o_on = self._run(True)
        assert int(s_off.pool.n_nodes) == int(s_on.pool.n_nodes)
        np.testing.assert_array_equal(*[
            np.stack(_leaf_content(s.pool, cfg.max_depth))
            for s in (s_off, s_on)])
        assert bool(jnp.all(s_off.leaves.keys == s_on.leaves.keys))
        assert bool(jnp.all(s_off.leaves.vals == s_on.leaves.vals))
        assert int(s_off.leaves.count) == int(s_on.leaves.count)
        for a, b in zip(o_off, o_on):
            np.testing.assert_array_equal(np.asarray(a.pose),
                                          np.asarray(b.pose))
        # the cache actually populated (not silently disabled)
        assert int(jnp.sum(s_on.dir_keys != morton.INVALID_KEY)) > 0

    def test_dir_coherence(self):
        # live directory rows must agree with BOTH the pool (value at the
        # cached node) and the registry (key/value at the cached position)
        _, s, _ = self._run(True)
        dk = np.asarray(s.dir_keys)
        dn = np.asarray(s.dir_nodes)
        dv = np.asarray(s.dir_vals)
        dp = np.asarray(s.dir_pos)
        live = dk != morton.INVALID_KEY
        assert live.sum() > 0
        pool_vals = np.asarray(s.pool.value)
        reg_keys = np.asarray(s.leaves.keys)
        reg_vals = np.asarray(s.leaves.vals)
        assert np.all(pool_vals[dn[live]] == dv[live])
        known = live & (dp >= 0)
        assert known.sum() > 0
        assert np.all(reg_keys[dp[known]] == dk[known])
        assert np.all(reg_vals[dp[known]] == dv[known])

    def test_reset_dircache(self):
        _, s_on, _ = self._run(True)
        cleared = pipeline.reset_dircache(s_on)
        assert bool(jnp.all(cleared.dir_keys == morton.INVALID_KEY))
        assert bool(jnp.all(cleared.dir_nodes == -1))
        # disabled states are a no-op
        _, s_off, _ = self._run(False)
        assert pipeline.reset_dircache(s_off) is s_off

    def test_rebuild_derived_clears_cache(self):
        cfg, s_on, _ = self._run(True)
        from octree_slam_tpu.map import tiering
        assert int(jnp.sum(s_on.dir_keys != morton.INVALID_KEY)) > 0
        state2, _ = tiering._rebuild_derived(s_on, cfg, s_on.pool)
        assert bool(jnp.all(state2.dir_keys == morton.INVALID_KEY))

    def test_checkpoint_roundtrip_and_legacy(self, tmp_path):
        from octree_slam_tpu import app
        cfg, s_on, _ = self._run(True)
        path = str(tmp_path / "state.npz")
        app.save_state(path, s_on, cfg)
        loaded, cfg2 = app.load_state(path, cfg)
        for a, b in zip(jax.tree_util.tree_leaves(s_on),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # legacy checkpoint (pre-dircache): strip the trailing dir pair
        # and the stamp; load must fill a cold cache
        z = dict(np.load(path))
        n = int(z.pop("n"))
        z.pop(f"a{n-1}"), z.pop(f"a{n-2}")
        z.pop("insert_dircache"), z.pop("insert_unique_cap")
        legacy = str(tmp_path / "legacy.npz")
        np.savez_compressed(legacy, n=n - 2, **z)
        old, _ = app.load_state(legacy, cfg)
        assert bool(jnp.all(old.dir_keys == morton.INVALID_KEY))
        assert bool(jnp.all(old.pool.value == s_on.pool.value))


class TestValidationMode:
    """cfg.debug_validate_dircache: the invariant contract as an
    executable check (round-3 verdict item #7)."""

    CFG = SLAMConfig(width=64, height=48, focal_x=55.0, focal_y=55.0,
                     pyramid_depth=2, pyramid_iters=(3, 3),
                     voxel_resolution=0.02, max_depth=8,
                     node_capacity=1 << 17, leaf_capacity=1 << 13,
                     insert_unique_cap=1 << 11, use_dense_mips=False,
                     relocalize=False, insert_dircache=True)

    def test_run_slam_validation_passes(self):
        import dataclasses
        from octree_slam_tpu import app
        cfg = dataclasses.replace(self.CFG, debug_validate_dircache=2)
        scene = sources.default_scene()

        def frame_fn(i):
            return sources.render_frame(
                scene, sources.orbit_pose(i * 0.02), cfg.focal_x,
                cfg.focal_y, width=cfg.width, height=cfg.height)

        res = app.run_slam(frame_fn, 6, cfg, render_every=0)
        assert res.frames == 6 and not res.diverged

    def test_validation_catches_poisoned_directory(self):
        """Simulate a violated reset obligation: corrupt one live value
        mirror row, step cached, and the validator must raise."""
        import pytest
        from octree_slam_tpu import app
        cfg = self.CFG
        scene = sources.default_scene()
        state = pipeline.init_state(cfg)
        for i in range(4):
            f = sources.render_frame(
                scene, sources.orbit_pose(i * 0.02), cfg.focal_x,
                cfg.focal_y, width=cfg.width, height=cfg.height)
            state, _ = pipeline.step(state, f, cfg, render="none")
        live = np.flatnonzero(
            np.asarray(state.dir_keys) != morton.INVALID_KEY)
        assert live.size > 100
        # flip every live row's color byte: the next cached insert blends
        # from the poisoned mirror instead of the pool
        dv = np.asarray(state.dir_vals).copy()
        dv[live] ^= np.uint32(0xFF)
        state = state._replace(dir_vals=jnp.asarray(dv))
        pre = jax.tree_util.tree_map(jnp.copy, state)
        f = sources.render_frame(
            scene, sources.orbit_pose(3 * 0.02), cfg.focal_x, cfg.focal_y,
            width=cfg.width, height=cfg.height)
        post, _ = pipeline.step(state, f, cfg, render="none")
        with pytest.raises(RuntimeError, match="dircache validation"):
            app._validate_dircache(pre, post, f, cfg, 4)
