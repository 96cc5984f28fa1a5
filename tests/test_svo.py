"""Map core tests: morton keys, insertion, extraction, mipmap, properties."""

import numpy as np
import jax.numpy as jnp
import pytest

from octree_slam_tpu.core import packing
from octree_slam_tpu.map import morton, svo

from oracle import OracleOctree, decode_center, morton_key


def random_points(n, seed=0, lo=-0.9, hi=0.9):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    return pts, cols


class TestMorton:
    def test_matches_oracle(self):
        pts, _ = random_points(200, seed=1)
        center = np.array([0.1, -0.2, 0.05], np.float32)
        keys, valid = morton.encode(jnp.asarray(pts), jnp.asarray(center), 1.5, 6)
        keys = np.asarray(keys)
        assert np.all(np.asarray(valid))
        for i in range(pts.shape[0]):
            assert keys[i] == morton_key(pts[i], center, 1.5, 6), i

    def test_invalid_points(self):
        pts = np.array([[0.1, 0.2, 0.3], [np.inf, 0, 0], [np.nan, 1, 1]], np.float32)
        keys, valid = morton.encode(jnp.asarray(pts), jnp.zeros(3), 1.0, 4)
        assert list(np.asarray(valid)) == [True, False, False]
        assert np.asarray(keys)[1] == morton.INVALID_KEY

    def test_decode_roundtrip(self):
        pts, _ = random_points(100, seed=2)
        center = np.zeros(3, np.float32)
        depth = 7
        keys, _ = morton.encode(jnp.asarray(pts), center, 1.0, depth)
        centers = np.asarray(morton.decode_centers(keys, center, 1.0, depth))
        cell = 2.0 * 1.0 / (1 << depth)  # full edge / 2^depth
        # decoded center must be within half a cell of the original point
        assert np.all(np.abs(centers - pts) <= cell / 2 + 1e-5)
        for i in range(10):
            ref = decode_center(int(np.asarray(keys)[i]), center, 1.0, depth)
            np.testing.assert_allclose(centers[i], ref, atol=1e-5)


class TestInsert:
    def test_deep_dense_prealloc_tier(self):
        """Pools big enough for the level-5 dense region (>= 8 x its size)
        behave identically to small-pool inserts: same extraction set,
        same queried values, allocation only below the dense levels."""
        cap = 1 << 19
        assert svo.prealloc_levels(cap) == 5
        pts, cols = random_points(2000, seed=21)
        big = svo.create(cap, jnp.zeros(3), 1.0)
        big, st = svo.insert(big, jnp.asarray(pts), jnp.asarray(cols),
                             depth=7)
        small = svo.create(1 << 16, jnp.zeros(3), 1.0)  # pre = 4
        small, st2 = svo.insert(small, jnp.asarray(pts), jnp.asarray(cols),
                                depth=7)
        assert int(st.n_unique) == int(st2.n_unique)
        vb, db = svo.query_points(big, jnp.asarray(pts), depth=7)
        vs, ds = svo.query_points(small, jnp.asarray(pts), depth=7)
        np.testing.assert_array_equal(np.asarray(vb), np.asarray(vs))
        np.testing.assert_array_equal(np.asarray(db), np.asarray(ds))
        eb = svo.extract_voxels(big, depth=7, capacity=1 << 13)
        es = svo.extract_voxels(small, depth=7, capacity=1 << 13)
        kb = np.sort(np.asarray(eb.keys)[np.asarray(eb.nodes) >= 0])
        ks = np.sort(np.asarray(es.keys)[np.asarray(es.nodes) >= 0])
        np.testing.assert_array_equal(kb, ks)
        # dense level 5 never allocates dynamically
        assert int(st.new_nodes) <= 8 * 2 * int(st.n_unique)

    def test_level6_dense_prealloc_tier(self):
        """Pools >= 3x the level-6 dense region (1 << 20) preallocate six
        levels and still behave identically to small-pool inserts — incl.
        depth == pre (a depth-6 map where every node is dense-indexed)."""
        cap = 1 << 20
        assert svo.prealloc_levels(cap) == 6
        pts, cols = random_points(2000, seed=22)
        for depth in (7, 6):
            big = svo.create(cap, jnp.zeros(3), 1.0)
            big, st = svo.insert(big, jnp.asarray(pts), jnp.asarray(cols),
                                 depth=depth)
            small = svo.create(1 << 16, jnp.zeros(3), 1.0)  # pre = 4
            small, st2 = svo.insert(small, jnp.asarray(pts),
                                    jnp.asarray(cols), depth=depth)
            assert int(st.n_unique) == int(st2.n_unique)
            vb, db = svo.query_points(big, jnp.asarray(pts), depth=depth)
            vs, ds = svo.query_points(small, jnp.asarray(pts), depth=depth)
            np.testing.assert_array_equal(np.asarray(vb), np.asarray(vs))
            np.testing.assert_array_equal(np.asarray(db), np.asarray(ds))
            eb = svo.extract_voxels(big, depth=depth, capacity=1 << 13)
            es = svo.extract_voxels(small, depth=depth, capacity=1 << 13)
            kb = np.sort(np.asarray(eb.keys)[np.asarray(eb.nodes) >= 0])
            ks = np.sort(np.asarray(es.keys)[np.asarray(es.nodes) >= 0])
            np.testing.assert_array_equal(kb, ks)
            if depth == 6:
                # the whole tree is dense: nothing allocates
                assert int(st.new_nodes) == 0

    def test_single_point(self):
        pool = svo.create(1 << 12, jnp.zeros(3), 1.0)
        pts = jnp.array([[0.5, 0.5, 0.5]], jnp.float32)
        cols = jnp.array([[1.0, 0.5, 0.25]], jnp.float32)
        pool, stats = svo.insert(pool, pts, cols, depth=4)
        assert int(stats.n_valid) == 1
        # shallow levels are dense-preallocated (svo.create); this insert
        # only allocates the tiles below them along the single path
        pre = svo.prealloc_levels(1 << 12)
        expected_new = 8 * (4 - pre)
        assert int(stats.new_nodes) == expected_new
        assert int(pool.n_nodes) == svo._LEVEL_BASE[pre + 1] + expected_new
        val, reached = svo.query_points(pool, pts, depth=4)
        r, g, b, a = packing.unpack_rgba8(val)
        assert int(reached[0]) == 4
        # blend from alpha=127: f1 = 1 - 127/256
        f1 = 1.0 - 127.0 / 256.0
        assert int(r[0]) == int(255 * f1)
        assert int(a[0]) == 129

    def test_matches_oracle_tree(self):
        depth = 5
        pts, cols = random_points(300, seed=3)
        pool = svo.create(1 << 14, jnp.zeros(3), 1.0)
        pool, _ = svo.insert(pool, jnp.asarray(pts), jnp.asarray(cols), depth=depth)

        oracle = OracleOctree(np.zeros(3), 1.0, depth)
        oracle.insert(pts, cols)

        vals, reached = svo.query_points(pool, jnp.asarray(pts), depth=depth)
        r, g, b, a = (np.asarray(x) for x in packing.unpack_rgba8(vals))
        assert np.all(np.asarray(reached) == depth)
        for i in range(pts.shape[0]):
            key = morton_key(pts[i], np.zeros(3), 1.0, depth)
            ov = oracle.values[(depth, key)]
            # int truncation in both paths can differ by 1 ulp of rounding
            assert abs(r[i] - ov[0]) <= 1, (i, r[i], ov)
            assert abs(g[i] - ov[1]) <= 1
            assert abs(b[i] - ov[2]) <= 1
            assert a[i] == ov[3]

    def test_two_inserts_blend(self):
        """Second insert of same voxel blends with alpha weighting."""
        pool = svo.create(1 << 12, jnp.zeros(3), 1.0)
        pts = jnp.array([[0.5, 0.5, 0.5]], jnp.float32)
        pool, _ = svo.insert(pool, pts, jnp.array([[1.0, 0.0, 0.0]]), depth=4)
        pool, s2 = svo.insert(pool, pts, jnp.array([[0.0, 0.0, 1.0]]), depth=4)
        assert int(s2.new_nodes) == 0  # structure already exists
        val, _ = svo.query_points(pool, pts, depth=4)
        r, g, b, a = packing.unpack_rgba8(val)
        assert int(a[0]) == 131
        # red decayed but present; blue newly blended in
        assert 0 < int(r[0]) < 255 * (1 - 127 / 256)
        assert int(b[0]) > 0

    def test_duplicate_keys_segment_mean(self):
        """Duplicates within one insert are averaged once (fixes the
        reference's unhandled-duplicates race, svo.cu TODO:631)."""
        pool = svo.create(1 << 12, jnp.zeros(3), 1.0)
        pts = jnp.array([[0.5, 0.5, 0.5]] * 4, jnp.float32)
        cols = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], jnp.float32)
        pool, _ = svo.insert(pool, pts, cols, depth=4)
        val, _ = svo.query_points(pool, pts[:1], depth=4)
        r, g, b, a = packing.unpack_rgba8(val)
        assert int(a[0]) == 129  # one bump, not four
        f1 = 1.0 - 127.0 / 256.0
        assert abs(int(r[0]) - int(0.5 * 255 * f1)) <= 1
        assert abs(int(g[0]) - int(0.5 * 255 * f1)) <= 1

    def test_mipmap_interior_values(self):
        depth = 4
        pts, cols = random_points(64, seed=4)
        pool = svo.create(1 << 13, jnp.zeros(3), 1.0)
        pool, _ = svo.insert(pool, jnp.asarray(pts), jnp.asarray(cols), depth=depth)
        oracle = OracleOctree(np.zeros(3), 1.0, depth)
        oracle.insert(pts, cols)
        # check level-1..depth-1 values of every touched prefix
        child = np.asarray(pool.child)
        value = np.asarray(pool.value)
        for (level, prefix), ov in oracle.values.items():
            if level == depth:
                continue
            # walk to the node
            idx = prefix >> (3 * (level - 1))
            for l in range(1, level):
                octant = (prefix >> (3 * (level - 1 - l))) & 7
                idx = child[idx] + octant
            v = int(value[idx])
            r, g, b, a = v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF
            assert abs(r - ov[0]) <= 1, (level, prefix)
            assert abs(g - ov[1]) <= 1
            assert abs(b - ov[2]) <= 1
            assert a == ov[3], (level, prefix, a, ov)

    def test_capacity_overflow_is_safe(self):
        pool = svo.create(64, jnp.zeros(3), 1.0)  # tiny pool
        pts, cols = random_points(500, seed=5)
        pool, stats = svo.insert(pool, jnp.asarray(pts), jnp.asarray(cols), depth=6)
        assert bool(stats.overflowed)
        assert int(pool.n_nodes) <= 64
        # root tile intact: no child pointer escapes capacity
        child = np.asarray(pool.child)
        assert np.all(child[child > 0] + 8 <= 64)


class TestUniqueCapRemainder:
    def test_paged_insert_matches_single_pass(self):
        """A frame with more distinct voxels than unique_cap inserts
        losslessly by paging through sorted key order with min_key
        (VERDICT round-1 item 7): bit-identical to one big-cap pass."""
        depth = 7
        rng = np.random.default_rng(11)
        pts = rng.uniform(-0.9, 0.9, (20000, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (20000, 3)).astype(np.float32)

        big = svo.create(1 << 20, jnp.zeros(3), 1.0)
        big, bstats = svo.insert(big, jnp.asarray(pts), jnp.asarray(cols),
                                 depth=depth, unique_cap=1 << 15)
        assert not bool(bstats.unique_overflow)
        n_total = int(bstats.n_unique)
        assert n_total > 4096  # the paged run must actually overflow

        paged = svo.create(1 << 20, jnp.zeros(3), 1.0)
        paged, stats = svo.insert(paged, jnp.asarray(pts),
                                  jnp.asarray(cols), depth=depth,
                                  unique_cap=4096)
        n_seen = int(stats.n_unique)
        passes = 1
        while bool(stats.unique_overflow):
            paged, stats = svo.insert(paged, jnp.asarray(pts),
                                      jnp.asarray(cols), depth=depth,
                                      unique_cap=4096,
                                      min_key=stats.last_key)
            n_seen += int(stats.n_unique)
            passes += 1
        assert passes > 1
        assert n_seen == n_total
        # tile allocation ORDER differs between the runs, so compare the
        # trees semantically: per-point leaf values and the extracted
        # occupied voxel set must be bit-identical
        vb, db = svo.query_points(big, jnp.asarray(pts), depth=depth)
        vp, dp = svo.query_points(paged, jnp.asarray(pts), depth=depth)
        np.testing.assert_array_equal(np.asarray(vb), np.asarray(vp))
        np.testing.assert_array_equal(np.asarray(db), np.asarray(dp))
        assert int(paged.n_nodes) == int(big.n_nodes)

        eb = svo.extract_voxels(big, depth=depth, capacity=1 << 15)
        ep = svo.extract_voxels(paged, depth=depth, capacity=1 << 15)
        assert int(eb.count) == int(ep.count)

        def key_set(ex):
            k = np.asarray(ex.keys)
            v = np.asarray(ex.colors)[k >= 0]
            return k[k >= 0], v

        kb, cb = key_set(eb)
        kp, cp = key_set(ep)
        ob, op = np.argsort(kb), np.argsort(kp)
        np.testing.assert_array_equal(kb[ob], kp[op])
        np.testing.assert_array_equal(cb[ob], cp[op])

    def test_pipeline_remainder_loop(self):
        """run_slam finishes oversized frames via insert_remainder."""
        from octree_slam_tpu import app
        from octree_slam_tpu.config import SLAMConfig
        from octree_slam_tpu.sensor import sources

        cfg = SLAMConfig(width=64, height=48, focal_x=55.0, focal_y=55.0,
                         pyramid_depth=2, pyramid_iters=(2, 2),
                         voxel_resolution=0.01, max_depth=9,
                         node_capacity=1 << 17, leaf_capacity=1 << 13,
                         insert_unique_cap=1 << 9,  # « 64*48 px
                         max_march_iters=16)
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.05) for i in range(2)]

        def frame_fn(i):
            return sources.render_frame(scene, gt[i], cfg.focal_x,
                                        cfg.focal_y, width=cfg.width,
                                        height=cfg.height)

        sink: list = []
        res = app.run_slam(frame_fn, 2, cfg, initial_pose=gt[0],
                           render_every=0, state_out=sink, auto_grow=False)
        assert res.frames == 2
        state = sink[0]
        # at 1 cm leaves nearly every valid pixel is a distinct voxel:
        # far more than the 512 cap — the remainder loop registered them
        assert int(state.leaves.count) > (1 << 9)


class TestExtract:
    def test_roundtrip_occupancy(self):
        """Insert N random points -> extraction returns exactly the set of
        quantized occupied voxels (SURVEY.md section 4 property test)."""
        depth = 5
        pts, cols = random_points(400, seed=6)
        pool = svo.create(1 << 14, jnp.zeros(3), 1.0)
        pool, _ = svo.insert(pool, jnp.asarray(pts), jnp.asarray(cols), depth=depth)
        out = svo.extract_voxels(pool, depth=depth, capacity=1 << 12)

        expected = {morton_key(p, np.zeros(3), 1.0, depth) for p in pts}
        got = set(np.asarray(out.keys)[: int(out.count)].tolist())
        assert got == expected

    def test_extracted_centers_and_colors(self):
        depth = 4
        pool = svo.create(1 << 12, jnp.zeros(3), 1.0)
        pts = jnp.array([[0.5, 0.5, 0.5], [-0.5, -0.5, -0.5]], jnp.float32)
        cols = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
        pool, _ = svo.insert(pool, pts, cols, depth=depth)
        out = svo.extract_voxels(pool, depth=depth, capacity=256)
        assert int(out.count) == 2
        centers = np.asarray(out.centers)[:2]
        cell = 2.0 / (1 << depth)
        assert np.all(np.abs(np.sort(centers, 0) - np.sort(np.asarray(pts), 0))
                      <= cell / 2 + 1e-6)
        colors = np.asarray(out.colors)[:2]
        assert np.all(colors[:, 3] > 127 / 255.0)

    def test_idempotent_occupancy(self):
        """Insert twice -> same occupied set, monotone alpha."""
        depth = 5
        pts, cols = random_points(200, seed=7)
        pool = svo.create(1 << 14, jnp.zeros(3), 1.0)
        pool, _ = svo.insert(pool, jnp.asarray(pts), jnp.asarray(cols), depth=depth)
        out1 = svo.extract_voxels(pool, depth=depth, capacity=1 << 12)
        a1 = np.asarray(out1.colors)[: int(out1.count), 3]
        pool, s = svo.insert(pool, jnp.asarray(pts), jnp.asarray(cols), depth=depth)
        assert int(s.new_nodes) == 0
        out2 = svo.extract_voxels(pool, depth=depth, capacity=1 << 12)
        assert int(out1.count) == int(out2.count)
        k1 = set(np.asarray(out1.keys)[: int(out1.count)].tolist())
        k2 = set(np.asarray(out2.keys)[: int(out2.count)].tolist())
        assert k1 == k2
        a2 = np.asarray(out2.colors)[: int(out2.count), 3]
        assert np.all(a2 >= a1.min())


class TestFullyPreallocated:
    def test_depth_not_above_prealloc_levels(self):
        """depth <= preallocated levels: insert never allocates, still
        blends and queries correctly (degenerate single-row alloc matrix)."""
        import numpy as np
        cap = 1 << 15  # prealloc_levels -> 4
        assert svo.prealloc_levels(cap) == 4
        pool = svo.create(cap, jnp.zeros(3), 1.0)
        pts, cols = random_points(100, seed=9)
        pool, stats = svo.insert(pool, jnp.asarray(pts), jnp.asarray(cols),
                                 depth=4)
        assert int(stats.new_nodes) == 0
        vals, reached = svo.query_points(pool, jnp.asarray(pts), depth=4)
        assert np.all(np.asarray(reached) == 4)
        _, _, _, a = packing.unpack_rgba8(vals)
        assert np.all(np.asarray(a) >= 129)


class TestSegmentMeanPrecision:
    def test_exact_means_at_full_frame_scale(self):
        """Regression (round-2 verdict #3): per-key color means must be
        bit-exact even for keys late in the sorted order at full-frame
        lane counts. The old f32 cumulative sum reached ~7.8e7 (ULP = 8)
        at 307k lanes and cost late keys up to +-1.5 color levels; the
        int32 accumulator is exact (sums < 307200*255 < 2^31)."""
        import numpy as np
        from octree_slam_tpu.map import morton

        n_unique, reps = 153_600, 2
        n = n_unique * reps                      # 307,200 = one VGA frame
        skeys = jnp.repeat(jnp.arange(n_unique, dtype=jnp.int32), reps)
        svalid = jnp.ones((n,), bool)
        # per-key samples {1, 254}: exact mean 127.5 for EVERY key
        sc = jnp.tile(jnp.array([[1], [254]], jnp.int32), (n_unique, 3))
        ukeys, mean_rgb, ulive, u_count = svo._unique_compact(
            skeys, svalid, sc, 1 << 18)
        assert int(u_count) == n_unique
        live = np.asarray(ulive)
        means = np.asarray(mean_rgb)[live] * 255.0
        np.testing.assert_array_equal(means, np.full_like(means, 127.5))
        assert np.asarray(ukeys)[live][-1] == n_unique - 1  # late keys live
