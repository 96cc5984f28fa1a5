"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.parallel import distributed
from octree_slam_tpu.sensor.tracking import icp_normal_equations


class TestMesh:
    def test_eight_devices(self):
        assert len(jax.devices()) == 8

    def test_icp_psum_matches_single_device(self):
        cfg = SLAMConfig()
        mesh = distributed.make_mesh(8)
        rng = np.random.default_rng(0)
        h, w = 32, 16
        v1 = rng.uniform(-1, 1, (h, w, 3)).astype(np.float32)
        v1[..., 2] = rng.uniform(0.5, 3.0, (h, w))
        v2 = v1 + rng.normal(0, 0.01, (h, w, 3)).astype(np.float32)
        n1 = rng.normal(size=(h, w, 3)).astype(np.float32)
        n1 /= np.linalg.norm(n1, axis=-1, keepdims=True)
        n2 = n1
        A_ref, b_ref, _, _ = icp_normal_equations(
            jnp.asarray(v1), jnp.asarray(n1), jnp.asarray(v2), jnp.asarray(n2), cfg)
        A, b = distributed.icp_psum(
            jnp.asarray(v1), jnp.asarray(n1), jnp.asarray(v2), jnp.asarray(n2),
            cfg, mesh)
        np.testing.assert_allclose(np.asarray(A), np.asarray(A_ref), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref), rtol=1e-5, atol=1e-5)

    def test_dryrun_multichip(self):
        """The driver's multi-chip dry run must pass on the virtual mesh."""
        import sys, pathlib
        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import sys, pathlib
        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
        import __graft_entry__ as ge
        fn, args = ge.entry()
        jax.jit(fn).lower(*args)  # trace/lower only; full compile is slow on CPU


class TestMortonShardedMap:
    """VERDICT round-1 item 4: node pool sharded by Morton key range."""

    CFG = SLAMConfig(width=64, height=48, focal_x=60.0, focal_y=60.0,
                     max_depth=6, voxel_resolution=2 * 0.64 / (1 << 6),
                     node_capacity=1 << 16, leaf_capacity=1 << 12,
                     insert_unique_cap=1 << 12, max_range=8.0)

    def make_cloud(self, n=2500, seed=3):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-0.6, 0.6, (n, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        return pts, cols

    def test_sharded_insert_equals_replicated(self):
        """Union of the 8 Morton-range shards == the single-pool insert,
        bit-for-bit (keys, values, leaf registries)."""
        from octree_slam_tpu.map import svo as svo_mod
        from octree_slam_tpu.render.splat import append_new_leaves, \
            create_leaf_list

        cfg = self.CFG
        pts, cols = self.make_cloud()
        mesh = distributed.make_mesh(8, axis_name="map")

        # replicated reference
        pool = svo_mod.create(cfg.node_capacity, jnp.zeros(3),
                              jnp.float32(0.64))
        leaves = create_leaf_list(cfg.leaf_capacity, cfg.node_capacity)
        for _ in range(2):
            pool, stats = svo_mod.insert(pool, jnp.asarray(pts),
                                         jnp.asarray(cols),
                                         depth=cfg.max_depth,
                                         unique_cap=cfg.insert_unique_cap)
            leaves = append_new_leaves(leaves, stats)

        # Morton-sharded
        smap = distributed.make_sharded_map(cfg, mesh)
        for _ in range(2):
            smap, total = distributed.insert_sharded(
                smap, jnp.asarray(pts), jnp.asarray(cols), cfg, mesh)
        assert int(total) == int(stats.n_unique)

        # per-shard leaf registries union == replicated registry
        sk = np.asarray(smap.leaves.keys).ravel()
        sv = np.asarray(smap.leaves.vals).ravel()
        live_s = sk >= 0
        rk = np.asarray(leaves.keys)
        rv = np.asarray(leaves.vals)
        live_r = rk >= 0
        assert live_s.sum() == live_r.sum()
        os_, or_ = np.argsort(sk[live_s]), np.argsort(rk[live_r])
        np.testing.assert_array_equal(sk[live_s][os_], rk[live_r][or_])
        np.testing.assert_array_equal(sv[live_s][os_], rv[live_r][or_])

        # every shard only holds keys in its own Morton range
        m = np.asarray(smap.leaves.keys)  # [8, LC]
        for d in range(8):
            k = m[d][m[d] >= 0]
            assert np.all((k >> (3 * (cfg.max_depth - 1))) == d)

    def test_sharded_insert_pages_past_unique_cap(self):
        """A shard receiving more distinct leaves than insert_unique_cap
        pages in-device (lax.while_loop, same lossless protocol as
        pipeline.step) — the shard union must still equal a fully-paged
        replicated insert."""
        import dataclasses
        from octree_slam_tpu.map import svo as svo_mod
        from octree_slam_tpu.render.splat import append_new_leaves, \
            create_leaf_list

        cfg = dataclasses.replace(self.CFG, insert_unique_cap=128)
        pts, cols = self.make_cloud(4000, seed=7)
        mesh = distributed.make_mesh(8, axis_name="map")

        pool = svo_mod.create(cfg.node_capacity, jnp.zeros(3),
                              jnp.float32(0.64))
        leaves = create_leaf_list(cfg.leaf_capacity, cfg.node_capacity)
        n_total = 0
        pool, stats = svo_mod.insert(pool, jnp.asarray(pts),
                                     jnp.asarray(cols), depth=cfg.max_depth,
                                     unique_cap=128)
        leaves = append_new_leaves(leaves, stats)
        n_total += int(stats.n_unique)
        passes = 1
        while bool(stats.unique_overflow):
            pool, stats = svo_mod.insert(pool, jnp.asarray(pts),
                                         jnp.asarray(cols),
                                         depth=cfg.max_depth, unique_cap=128,
                                         min_key=stats.last_key)
            leaves = append_new_leaves(leaves, stats)
            n_total += int(stats.n_unique)
            passes += 1
        assert passes > 2  # the cap was genuinely exceeded

        smap = distributed.make_sharded_map(cfg, mesh)
        smap, total = distributed.insert_sharded(
            smap, jnp.asarray(pts), jnp.asarray(cols), cfg, mesh)
        assert int(total) == n_total

        sk = np.asarray(smap.leaves.keys).ravel()
        sv = np.asarray(smap.leaves.vals).ravel()
        live_s = sk >= 0
        rk = np.asarray(leaves.keys)
        rv = np.asarray(leaves.vals)
        live_r = rk >= 0
        assert live_s.sum() == live_r.sum() == n_total
        os_, or_ = np.argsort(sk[live_s]), np.argsort(rk[live_r])
        np.testing.assert_array_equal(sk[live_s][os_], rk[live_r][or_])
        np.testing.assert_array_equal(sv[live_s][os_], rv[live_r][or_])

    def test_sharded_render_matches_replicated(self):
        from octree_slam_tpu.map import svo as svo_mod
        from octree_slam_tpu.render.splat import append_new_leaves, \
            create_leaf_list, render_splat

        cfg = self.CFG
        pts, cols = self.make_cloud(seed=4)
        mesh = distributed.make_mesh(8, axis_name="map")

        pool = svo_mod.create(cfg.node_capacity, jnp.zeros(3),
                              jnp.float32(0.64))
        leaves = create_leaf_list(cfg.leaf_capacity, cfg.node_capacity)
        smap = distributed.make_sharded_map(cfg, mesh)
        for _ in range(3):  # alpha above the occupancy threshold
            pool, stats = svo_mod.insert(pool, jnp.asarray(pts),
                                         jnp.asarray(cols),
                                         depth=cfg.max_depth,
                                         unique_cap=cfg.insert_unique_cap)
            leaves = append_new_leaves(leaves, stats)
            smap, _ = distributed.insert_sharded(
                smap, jnp.asarray(pts), jnp.asarray(cols), cfg, mesh)

        pose = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(-1.5)
        fb_single = render_splat(pool, leaves, pose, cfg.focal_x,
                                 cfg.focal_y, width=cfg.width,
                                 height=cfg.height, depth=cfg.max_depth,
                                 max_range=cfg.max_range, dilate=0)
        fb_shard = distributed.render_sharded_map(
            smap, pose, cfg.focal_x, cfg.focal_y, cfg, mesh)
        # splat_sharded's finisher uses the default dilation; compare the
        # raw hit pattern by re-running single with the same settings
        fb_single2 = render_splat(pool, leaves, pose, cfg.focal_x,
                                  cfg.focal_y, width=cfg.width,
                                  height=cfg.height, depth=cfg.max_depth,
                                  max_range=cfg.max_range)
        # identical hit pattern; colors equal up to fusion rounding (<1e-7)
        np.testing.assert_allclose(np.asarray(fb_shard),
                                   np.asarray(fb_single2), atol=1e-6)
        assert np.asarray(fb_single2)[..., 3].sum() > 0


class TestShardedSplat:
    def test_sharded_splat_matches_single_device(self):
        """Leaf-sharded z-buffers composited with pmin over the mesh must
        equal the single-device render exactly."""
        from octree_slam_tpu.map import morton
        from octree_slam_tpu.render import splat as sp

        rng = np.random.default_rng(5)
        depth, cap = 6, 1 << 12
        lc = 1 << 10
        cfg = SLAMConfig(width=64, height=48, focal_x=60.0, focal_y=60.0,
                         max_depth=depth, max_range=8.0)
        n_live = 700
        keys = np.full(lc, -1, np.int32)
        keys[:n_live] = rng.integers(0, 1 << (3 * depth), n_live)
        nodes = rng.integers(0, cap, lc).astype(np.int32)
        values = (rng.integers(0, 2**24, cap).astype(np.uint32)
                  | np.uint32(0xFF000000))
        center = jnp.zeros(3, jnp.float32)
        half = jnp.float32(0.64)
        pose = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(-1.0)

        vals = jnp.asarray(values)[jnp.asarray(nodes)]
        live = jnp.asarray(keys >= 0)
        buf = sp.splat_zbuffer(
            vals, jnp.asarray(keys), live,
            center, half, pose, cfg.focal_x, cfg.focal_y,
            width=cfg.width, height=cfg.height, depth=depth,
            max_range=cfg.max_range)
        fb_single = sp.finish_zbuffer(buf, width=cfg.width, height=cfg.height)

        mesh = distributed.make_mesh(8, axis_name="map")
        fb_sharded = distributed.splat_sharded(
            vals, jnp.asarray(keys),
            center, half, pose, cfg.focal_x, cfg.focal_y, cfg, mesh)
        np.testing.assert_array_equal(np.asarray(fb_single),
                                      np.asarray(fb_sharded))


class TestSlamStep2D:
    """The full SLAM frame on a 2-D ("px", "map") mesh: tracking sharded
    over image rows, map Morton-sharded, one jitted program
    (distributed.slam_step_2d)."""

    CFG = SLAMConfig(width=64, height=48, focal_x=55.0, focal_y=55.0,
                     pyramid_depth=2, pyramid_iters=(2, 2),
                     voxel_resolution=0.05, max_depth=6,
                     node_capacity=1 << 14, leaf_capacity=1 << 12,
                     insert_unique_cap=1 << 12)

    def _frames(self, n):
        from octree_slam_tpu.sensor import sources
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.02) for i in range(n)]
        fr = [sources.render_frame(scene, g, self.CFG.focal_x,
                                   self.CFG.focal_y, width=self.CFG.width,
                                   height=self.CFG.height) for g in gt]
        return gt, fr

    def test_two_by_four_matches_single_device(self):
        cfg = self.CFG
        mesh = distributed.make_mesh2(2, 4)
        gt, frames = self._frames(3)
        step = distributed.slam_step_2d(cfg, mesh)
        state = distributed.slam_init_2d(cfg, mesh, initial_pose=gt[0])

        poses, totals = [], []
        for f in frames:
            f = jax.device_put(f, distributed.frame_sharding(mesh, "px"))
            state, (fb, pose, sig) = step(state, f)
            poses.append(np.asarray(pose))
            totals.append(int(sig[0]))  # signals[0] = global unique count
        assert fb.shape == (cfg.height, cfg.width, 4)
        assert np.asarray(fb)[..., :3].sum() > 0
        assert all(t > 0 for t in totals)

        # tracking quality: the sharded ICP (different reduction order,
        # same math) stays within float tolerance of ground truth
        err = np.linalg.norm(poses[-1][:3, 3] - np.asarray(gt[-1])[:3, 3])
        assert err < 0.05, err

        # Map equality: replay the SAME world points (vertex maps are
        # pose-independent; use the 2-D step's own poses) into one
        # replicated pool — the shard union must match bit-for-bit.
        from octree_slam_tpu.map import svo as svo_mod
        from octree_slam_tpu.render.splat import append_new_leaves, \
            create_leaf_list
        from octree_slam_tpu.sensor import tracking as tr
        from octree_slam_tpu import pipeline

        half = cfg.voxel_resolution * (2 ** (cfg.max_depth - 1))
        pool = svo_mod.create(cfg.node_capacity, jnp.zeros(3),
                              jnp.float32(half))
        leaves = create_leaf_list(cfg.leaf_capacity, cfg.node_capacity)
        for f, pose in zip(frames, poses):
            pyr = tr.build_pyramid(f.depth, f.color, cfg)
            v = pyr[cfg.fuse_level].vertex.reshape(-1, 3)
            wp = v @ jnp.asarray(pose)[:3, :3].T + jnp.asarray(pose)[:3, 3]
            cols = pipeline._fuse_colors(f, cfg)
            pool, st = svo_mod.insert(pool, wp, cols, depth=cfg.max_depth,
                                      unique_cap=cfg.insert_unique_cap)
            leaves = append_new_leaves(leaves, st)

        smap = state[3]
        sk = np.asarray(smap.leaves.keys).ravel()
        sv = np.asarray(smap.leaves.vals).ravel()
        live_s = sk >= 0
        rk = np.asarray(leaves.keys)
        rv = np.asarray(leaves.vals)
        live_r = rk >= 0
        assert live_s.sum() == live_r.sum() > 0
        os_, or_ = np.argsort(sk[live_s]), np.argsort(rk[live_r])
        np.testing.assert_array_equal(sk[live_s][os_], rk[live_r][or_])
        np.testing.assert_array_equal(sv[live_s][os_], rv[live_r][or_])

        # every shard only holds keys in its own level-1 Morton range
        m = np.asarray(smap.leaves.keys)  # [4, LC]
        for d in range(4):
            k = m[d][m[d] >= 0]
            assert np.all((k >> (3 * cfg.max_depth - 2)) == d)


class TestShardedGrowth:
    """grow_sharded: capacity doubling for the Morton-sharded map — pad in
    place within a prealloc regime, shard-local value-verbatim rebuild
    across a boundary (pipeline.grow_state's two paths, distributed)."""

    def _cloud(self, n, seed, lo=-0.6, hi=0.6):
        rng = np.random.default_rng(seed)
        return (rng.uniform(lo, hi, (n, 3)).astype(np.float32),
                rng.uniform(0, 1, (n, 3)).astype(np.float32))

    def _union(self, smap):
        sk = np.asarray(smap.leaves.keys).ravel()
        sv = np.asarray(smap.leaves.vals).ravel()
        live = sk >= 0
        o = np.argsort(sk[live])
        return sk[live][o], sv[live][o]

    def test_pad_growth_matches_fresh_at_final_capacity(self):
        """Same prealloc regime: insert -> grow -> insert must equal a
        fresh sharded map at the final capacity fed both clouds (dense
        bases match, so allocation indices and words are bit-identical)."""
        import dataclasses
        from octree_slam_tpu.map import svo as svo_mod
        cfg = SLAMConfig(width=64, height=48, max_depth=6,
                         voxel_resolution=2 * 0.64 / (1 << 6),
                         node_capacity=1 << 16, leaf_capacity=1 << 11,
                         insert_unique_cap=1 << 12)
        assert svo_mod.prealloc_levels(1 << 16) == \
            svo_mod.prealloc_levels(1 << 17)
        mesh = distributed.make_mesh(8, axis_name="map")
        p1, c1 = self._cloud(2000, 1)
        p2, c2 = self._cloud(2000, 2)

        smap = distributed.make_sharded_map(cfg, mesh)
        smap, _ = distributed.insert_sharded(smap, jnp.asarray(p1),
                                             jnp.asarray(c1), cfg, mesh)
        smap, cfg2 = distributed.grow_sharded(smap, cfg, mesh,
                                              grow_nodes=True,
                                              grow_leaves=True)
        assert cfg2.node_capacity == 1 << 17
        assert smap.pool.child.shape == (8, 1 << 17)
        smap, _ = distributed.insert_sharded(smap, jnp.asarray(p2),
                                             jnp.asarray(c2), cfg2, mesh)

        big = dataclasses.replace(cfg, node_capacity=1 << 17,
                                  leaf_capacity=1 << 12)
        ref = distributed.make_sharded_map(big, mesh)
        ref, _ = distributed.insert_sharded(ref, jnp.asarray(p1),
                                            jnp.asarray(c1), big, mesh)
        ref, _ = distributed.insert_sharded(ref, jnp.asarray(p2),
                                            jnp.asarray(c2), big, mesh)

        k_a, v_a = self._union(smap)
        k_b, v_b = self._union(ref)
        np.testing.assert_array_equal(k_a, k_b)
        np.testing.assert_array_equal(v_a, v_b)

    def test_boundary_growth_preserves_content(self):
        """Across a prealloc boundary (8192: pre=3 -> 16384: pre=4) the
        rebuild must keep every leaf key/value bit-identical, render the
        same image, and keep accepting inserts."""
        from octree_slam_tpu.map import svo as svo_mod
        assert svo_mod.prealloc_levels(8192) != svo_mod.prealloc_levels(16384)
        cfg = SLAMConfig(width=64, height=48, max_depth=6,
                         voxel_resolution=2 * 0.64 / (1 << 6),
                         node_capacity=8192, leaf_capacity=1 << 10,
                         insert_unique_cap=256)  # forces rebuild paging
        mesh = distributed.make_mesh(8, axis_name="map")
        p1, c1 = self._cloud(1500, 3)
        smap = distributed.make_sharded_map(cfg, mesh)
        smap, _ = distributed.insert_sharded(smap, jnp.asarray(p1),
                                             jnp.asarray(c1), cfg, mesh)
        k_before, v_before = self._union(smap)
        eye = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(2.0)
        fb_before = distributed.render_sharded_map(
            smap, eye, cfg.focal_x, cfg.focal_y, cfg, mesh)

        smap, cfg2 = distributed.grow_sharded(smap, cfg, mesh,
                                              grow_nodes=True)
        assert cfg2.node_capacity == 16384
        k_after, v_after = self._union(smap)
        np.testing.assert_array_equal(k_before, k_after)
        np.testing.assert_array_equal(v_before, v_after)
        fb_after = distributed.render_sharded_map(
            smap, eye, cfg2.focal_x, cfg2.focal_y, cfg2, mesh)
        np.testing.assert_array_equal(np.asarray(fb_before),
                                      np.asarray(fb_after))

        p2, c2 = self._cloud(800, 4)
        smap, total = distributed.insert_sharded(smap, jnp.asarray(p2),
                                                 jnp.asarray(c2), cfg2,
                                                 mesh)
        assert int(total) > 0
        assert not bool(jnp.any(smap.pool.overflowed))

    def test_overflowed_registry_rebuilds_on_growth(self):
        """A shard whose leaf registry overflowed (appends dropped) must
        recover at growth: the registry is rebuilt from the pool itself,
        so no leaf is permanently lost and the sticky flag clears."""
        from octree_slam_tpu.map import svo as svo_mod
        cfg = SLAMConfig(width=64, height=48, max_depth=6,
                         voxel_resolution=2 * 0.64 / (1 << 6),
                         node_capacity=1 << 14, leaf_capacity=64,
                         insert_unique_cap=1 << 10)
        mesh = distributed.make_mesh(8, axis_name="map")
        pts, cols = self._cloud(3000, 9)
        smap = distributed.make_sharded_map(cfg, mesh)
        smap, total = distributed.insert_sharded(smap, jnp.asarray(pts),
                                                 jnp.asarray(cols), cfg,
                                                 mesh)
        assert bool(jnp.any(smap.leaves.overflowed))  # 64 slots << leaves

        smap, cfg2 = distributed.grow_sharded(smap, cfg, mesh,
                                              grow_nodes=False,
                                              grow_leaves=True)
        assert not bool(jnp.any(smap.leaves.overflowed))
        k_u, v_u = self._union(smap)
        assert k_u.size == int(total)  # every unique leaf re-registered

        # the rebuilt registry matches a replicated single-pool insert
        from octree_slam_tpu.render.splat import append_new_leaves, \
            create_leaf_list
        # the sharded map holds 8 pools of node_capacity, so the
        # replicated twin needs 8x to fit the same leaves in ONE pool
        rep_cap = cfg.node_capacity * 8
        pool = svo_mod.create(rep_cap, jnp.zeros(3), jnp.float32(0.64))
        leaves = create_leaf_list(1 << 13, rep_cap)
        last_key = None
        while True:  # page the unique-cap remainder like insert_sharded
            pool, st = svo_mod.insert(pool, jnp.asarray(pts),
                                      jnp.asarray(cols),
                                      depth=cfg.max_depth,
                                      unique_cap=cfg.insert_unique_cap,
                                      min_key=last_key)
            leaves = append_new_leaves(leaves, st)
            if not bool(st.unique_overflow):
                break
            last_key = st.last_key
        rk = np.asarray(leaves.keys)
        rv = np.asarray(leaves.vals)
        live = rk >= 0
        o = np.argsort(rk[live])
        np.testing.assert_array_equal(k_u, rk[live][o])
        np.testing.assert_array_equal(v_u, rv[live][o])
