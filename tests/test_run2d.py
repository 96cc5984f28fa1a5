"""Multi-chip application loop + shard load balance (round-2 verdict #4/#5).

Runs on the virtual 8-device CPU mesh (conftest). Covers:
  * rebalance_sharded on an adversarial one-octant scene: per-shard leaf
    counts within 2x of the mean afterwards, union bit-identical;
  * run_slam_2d: >= 20 synthetic-orbit frames through a growth event on a
    2x4 ("px" x "map") mesh, final shard-union map bit-identical to a
    single-chip run of the same frames;
  * boundary routing correctness for level-2 splits.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.parallel import distributed, run2d


def union(smap):
    return run2d.union_leaves(smap)


class TestRebalance:
    CFG = SLAMConfig(width=64, height=48, focal_x=60.0, focal_y=60.0,
                     max_depth=6, voxel_resolution=2 * 0.64 / (1 << 6),
                     node_capacity=1 << 16, leaf_capacity=1 << 12,
                     insert_unique_cap=1 << 12, map_split_level=2)

    def one_octant_cloud(self, n=3000, seed=11):
        """Everything in octant 0 (x,y,z < 0): the fixed octant split
        loads exactly one of 8 devices (round-2 verdict item #5)."""
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-0.6, -0.01, (n, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        return pts, cols

    def test_rebalance_one_octant_scene(self):
        cfg = self.CFG
        mesh = distributed.make_mesh(8, axis_name="map")
        pts, cols = self.one_octant_cloud()
        smap = distributed.make_sharded_map(cfg, mesh)
        smap, total = distributed.insert_sharded(
            smap, jnp.asarray(pts), jnp.asarray(cols), cfg, mesh)

        counts = np.asarray(distributed.shard_leaf_counts(smap))
        assert int(total) > 500
        # adversarial by construction: all leaves land in one shard
        # (octant 0 is cell range [0, 8) at level 2 = shard 0's default
        # range [0, 8))
        assert counts.max() == counts.sum()

        k0, v0 = union(smap)
        smap2 = distributed.rebalance_sharded(smap, cfg, mesh)
        counts2 = np.asarray(distributed.shard_leaf_counts(smap2))

        # balanced within ~2x of the mean (level-2 split: 64 cells over
        # 8 shards; granularity is per-cell so perfect balance is not
        # guaranteed, 2x is the verdict's bar)
        assert counts2.sum() == counts.sum()
        assert counts2.max() <= 2.0 * counts2.mean(), counts2
        # every shard owns a non-empty CELL range (a trailing shard may
        # still hold zero leaves when all occupied cells fit in fewer
        # ranges — correct: the partition must stay total)
        b = np.asarray(smap2.bounds)[0]
        assert np.all(np.diff(b) >= 1)

        # union is bit-identical after redistribution
        k1, v1 = union(smap2)
        np.testing.assert_array_equal(k0, k1)
        np.testing.assert_array_equal(v0, v1)

        # every shard holds only keys in its new range
        b = np.asarray(smap2.bounds)[0]
        keys = np.asarray(smap2.leaves.keys)
        L = cfg.map_split_level
        for d in range(8):
            kd = keys[d][keys[d] >= 0]
            pref = kd >> (3 * (cfg.max_depth - L))
            assert np.all((pref >= b[d]) & (pref < b[d + 1]))

        # inserts continue correctly under the new boundaries
        pts2, cols2 = self.one_octant_cloud(800, seed=12)
        smap3, _ = distributed.insert_sharded(
            smap2, jnp.asarray(pts2), jnp.asarray(cols2), cfg, mesh)
        # reference: replicated pool fed both clouds
        from octree_slam_tpu.map import svo as svo_mod
        from octree_slam_tpu.render.splat import append_new_leaves, \
            create_leaf_list
        half = cfg.voxel_resolution * (2 ** (cfg.max_depth - 1))
        pool = svo_mod.create(cfg.node_capacity, jnp.zeros(3),
                              jnp.float32(half))
        leaves = create_leaf_list(cfg.leaf_capacity, cfg.node_capacity)
        for p, c in ((pts, cols), (pts2, cols2)):
            pool, st = svo_mod.insert(pool, jnp.asarray(p), jnp.asarray(c),
                                      depth=cfg.max_depth,
                                      unique_cap=cfg.insert_unique_cap)
            leaves = append_new_leaves(leaves, st)
        rk = np.asarray(leaves.keys)
        rv = np.asarray(leaves.vals)
        live = rk >= 0
        order = np.argsort(rk[live], kind="stable")
        k3, v3 = union(smap3)
        np.testing.assert_array_equal(k3, rk[live][order])
        np.testing.assert_array_equal(v3, rv[live][order])

    def test_balanced_bounds_properties(self):
        rng = np.random.default_rng(0)
        for m in (2, 4, 8):
            for _ in range(5):
                counts = rng.integers(0, 100, size=64)
                counts[rng.integers(0, 64)] += 5000  # a hot cell
                b = distributed.balanced_bounds(counts, m)
                assert b[0] == 0 and b[-1] == 64
                assert np.all(np.diff(b) >= 1)  # total, disjoint, nonempty


class TestRunSlam2D:
    """run_slam_2d: the run_slam-grade host loop over the 2-D mesh."""

    # node_capacity is sized so NO pool ever overflows (pool overflow
    # truncates allocation in sorted-key order, which differs between a
    # global pool and shard-local pools — bit-identity only holds for
    # lossless runs); leaf_capacity is deliberately tiny so the registry
    # overflows early and forces growth events on both sides.
    CFG = SLAMConfig(width=64, height=48, focal_x=55.0, focal_y=55.0,
                     pyramid_depth=2, pyramid_iters=(2, 2),
                     voxel_resolution=0.05, max_depth=6,
                     node_capacity=1 << 15, leaf_capacity=1 << 10,
                     insert_unique_cap=1 << 11, map_split_level=2,
                     relocalize=False)

    def _frames(self, n):
        from octree_slam_tpu.sensor import sources
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.02) for i in range(n)]
        fr = [sources.render_frame(scene, g, self.CFG.focal_x,
                                   self.CFG.focal_y, width=self.CFG.width,
                                   height=self.CFG.height) for g in gt]
        return gt, fr

    def test_twenty_frames_through_growth_matches_single_chip(self):
        cfg = self.CFG
        n = 20
        mesh = distributed.make_mesh2(2, 4)
        gt, frames = self._frames(n)

        state, final_cfg, info = run2d.run_slam_2d(
            frames, cfg, mesh, initial_pose=gt[0], grow_headroom=0.75,
            rebalance_factor=1.1)
        events = info["events"]
        assert any(e["event"] == "grow" for e in events), \
            "capacities were sized to force at least one growth event"
        # the desk scene weights the floor/wall octants, so a tight 1.1x
        # trigger guarantees at least one mid-run redistribution — the
        # bit-identity check below then covers insert-after-rebalance
        assert any(e["event"] == "rebalance" for e in events)
        # growth doubled at least the leaf registry (tiny initial cap)
        assert (final_cfg.leaf_capacity > cfg.leaf_capacity
                or final_cfg.node_capacity > cfg.node_capacity)
        smap = state[3]
        assert not bool(np.any(np.asarray(smap.pool.overflowed)))
        assert not bool(np.any(np.asarray(smap.leaves.overflowed)))

        # single-chip reference: pipeline.step over the same frames with
        # matching growth policy; tracking math is identical, so the maps
        # must agree bit-for-bit (keys AND values)
        from octree_slam_tpu import pipeline
        scfg = dataclasses.replace(cfg)
        sstate = pipeline.init_state(scfg, initial_pose=gt[0])
        step = jax.jit(
            lambda s, f, c: pipeline.step(s, f, c, render="none"),
            static_argnames="c")
        for f in frames:
            sstate, out = step(sstate, f, scfg)
            if (int(out.map_nodes) > 0.75 * scfg.node_capacity
                    or bool(out.map_overflowed)
                    or int(out.map_leaves) > 0.75 * scfg.leaf_capacity):
                sstate, scfg = pipeline.grow_state(
                    sstate, scfg, grow_nodes=True, grow_leaves=True)
        assert not bool(sstate.pool.overflowed)
        assert not bool(sstate.leaves.overflowed)

        rk = np.asarray(sstate.leaves.keys)
        rv = np.asarray(sstate.leaves.vals)
        live = rk >= 0
        order = np.argsort(rk[live], kind="stable")
        ku, vu = run2d.union_leaves(smap)
        np.testing.assert_array_equal(ku, rk[live][order])
        np.testing.assert_array_equal(vu, rv[live][order])

        # trajectory: 2-D mesh tracking stayed near ground truth
        err = np.linalg.norm(info["poses"][-1][:3, 3]
                             - np.asarray(gt[-1])[:3, 3])
        assert err < 0.08, err


class TestGrowAverted:
    """REBALANCE-BEFORE-GROW (round-3 verdict #6): a hot shard crossing
    the growth headroom must first re-cut the Morton ranges; when the
    balanced loads fit existing capacity the growth event is AVERTED and
    logged as such."""

    def one_octant_scene(self):
        """All geometry strictly inside octant 0 (x,y,z < 0) of the
        1.6 m-half map volume: every fused leaf lands in shard 0's
        default Morton range, so the first big frame pushes that one
        shard over the (deliberately low) leaf headroom while the
        re-cut loads fit it with margin — level-2 cell granularity
        caps how evenly 3 hot cells split over 4 shards."""
        from octree_slam_tpu.sensor import sources
        z = jnp.zeros((0,), jnp.float32)
        return sources.SyntheticScene(
            spheres=jnp.array([[-0.45, -0.40, -0.45, 0.30]], jnp.float32),
            sphere_albedo=jnp.array([[0.9, 0.3, 0.2]], jnp.float32),
            boxes=jnp.array([[-1.0, -0.9, -1.0, -0.15, -0.70, -0.15]],
                            jnp.float32),
            box_albedo=jnp.array([[0.3, 0.8, 0.3]], jnp.float32),
            planes=jnp.zeros((0, 4), jnp.float32),
            plane_albedo=jnp.zeros((0, 3), jnp.float32),
        )

    def test_rebalance_averts_growth(self):
        from octree_slam_tpu.sensor import sources
        cfg = SLAMConfig(width=64, height=48, focal_x=55.0, focal_y=55.0,
                         pyramid_depth=2, pyramid_iters=(2, 2),
                         voxel_resolution=0.05, max_depth=6,
                         node_capacity=1 << 15, leaf_capacity=1 << 10,
                         insert_unique_cap=1 << 11, map_split_level=2,
                         relocalize=False)
        scene = self.one_octant_scene()
        # look INTO octant 0 from outside it
        n = 6
        gt = [sources.orbit_pose(0.9 + i * 0.015) for i in range(n)]
        fr = [sources.render_frame(scene, g, cfg.focal_x, cfg.focal_y,
                                   width=cfg.width, height=cfg.height)
              for g in gt]
        mesh = distributed.make_mesh2(2, 4)
        state, final_cfg, info = run2d.run_slam_2d(
            fr, cfg, mesh, initial_pose=gt[0], grow_headroom=0.3,
            rebalance_factor=1.1, rebalance_check_every=10**9)
        events = info["events"]
        averted = [e for e in events if e["event"] == "grow_averted"]
        assert averted, events
        assert averted[0]["leaves"], averted
        # the FIRST headroom trip was absorbed by the re-cut: the averted
        # event precedes any actual growth (the map keeps accreting, so a
        # later growth may legitimately fire once even the balanced loads
        # outgrow the low headroom)
        grows = [e for e in events if e["event"] == "grow"]
        if grows:
            assert averted[0]["frame"] < grows[0]["frame"], events
        # the averting rebalance is in the log with its decision inputs
        pre = [e for e in events if e["event"] == "rebalance"
               and e["reason"] == "pre-grow"]
        assert pre and pre[0]["frame"] == averted[0]["frame"], events
        assert max(pre[0]["counts_after"]) <= 0.3 * cfg.leaf_capacity
        assert max(pre[0]["counts_before"]) > 0.3 * cfg.leaf_capacity
        smap = state[3]
        assert not bool(np.any(np.asarray(smap.leaves.overflowed)))


class TestShardedCone:
    """render_sharded_cone: per-shard scatter-min + one pmin of packed
    words must be BIT-IDENTICAL to the single-chip slab compositor
    (round-3 verdict item #3a)."""

    CFG = SLAMConfig(width=64, height=48, focal_x=60.0, focal_y=60.0,
                     max_depth=6, voxel_resolution=2 * 1.28 / (1 << 6),
                     node_capacity=1 << 16, leaf_capacity=1 << 12,
                     insert_unique_cap=1 << 12, map_split_level=2)

    def test_cone_bit_parity_vs_single_chip(self):
        from octree_slam_tpu.map import svo as svo_mod
        from octree_slam_tpu.render import conesplat
        from octree_slam_tpu.render.splat import append_new_leaves, \
            create_leaf_list
        from test_render import look_at_pose

        cfg = self.CFG
        mesh = distributed.make_mesh(8, axis_name="map")
        rng = np.random.default_rng(3)
        pts = rng.uniform(-1.0, 1.0, (4000, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (4000, 3)).astype(np.float32)

        smap = distributed.make_sharded_map(cfg, mesh)
        for _ in range(2):
            smap, _ = distributed.insert_sharded(
                smap, jnp.asarray(pts), jnp.asarray(cols), cfg, mesh)

        half = cfg.voxel_resolution * (2 ** (cfg.max_depth - 1))
        pool = svo_mod.create(cfg.node_capacity, jnp.zeros(3),
                              jnp.float32(half))
        leaves = create_leaf_list(cfg.leaf_capacity, cfg.node_capacity)
        for _ in range(2):
            pool, st = svo_mod.insert(pool, jnp.asarray(pts),
                                      jnp.asarray(cols),
                                      depth=cfg.max_depth,
                                      unique_cap=cfg.insert_unique_cap)
            leaves = append_new_leaves(leaves, st)

        pose = look_at_pose([0, 0, 2.2], [0, 0, 0.0])
        fb_sh = np.asarray(distributed.render_sharded_cone(
            smap, jnp.asarray(pose), cfg.focal_x, cfg.focal_y, cfg, mesh))
        spec = conesplat.make_slab_spec(
            width=cfg.width, height=cfg.height, fx=cfg.focal_x,
            leaf_size=cfg.voxel_resolution, z_near=cfg.cone_znear,
            z_far=cfg.max_range, n_slabs=cfg.cone_slabs,
            max_scale=cfg.cone_max_scale)
        fb_1 = np.asarray(conesplat.render_cone_splat(
            leaves, pool.center, pool.half_size, jnp.asarray(pose),
            cfg.focal_x, cfg.focal_y, spec=spec, depth=cfg.max_depth))
        assert fb_1[..., :3].max() > 0.1  # scene actually visible

        # the packed word buffer — the whole scatter-resolve — must be
        # BIT-identical: per-shard min + pmin == global scatter-min
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def words(vals_s, keys_s, c, h, T):
            v = vals_s.reshape(-1)
            k = keys_s.reshape(-1)
            buf = conesplat.slab_scatter_min(
                v, k, k >= 0, c, h, T, cfg.focal_x, cfg.focal_y,
                spec=spec, depth=cfg.max_depth)
            return jax.lax.pmin(buf, "map")

        buf_sh = np.asarray(shard_map(
            words, mesh=mesh,
            in_specs=(P("map"), P("map"), P(), P(), P()),
            out_specs=P(),
        )(smap.leaves.vals, smap.leaves.keys, smap.pool.center[0],
          smap.pool.half_size[0], jnp.asarray(pose)))
        lc = leaves.keys.shape[0]
        live1 = (np.arange(lc) < int(leaves.count)) \
            & (np.asarray(leaves.keys) >= 0)
        buf_1 = np.asarray(conesplat.slab_scatter_min(
            leaves.vals, leaves.keys, jnp.asarray(live1), pool.center,
            pool.half_size, jnp.asarray(pose), cfg.focal_x, cfg.focal_y,
            spec=spec, depth=cfg.max_depth))
        np.testing.assert_array_equal(buf_sh, buf_1)
        # the f32 composite tail of the same words compiles to a slightly
        # different fusion order under shard_map: 1-ULP agreement
        np.testing.assert_allclose(fb_sh, fb_1, atol=2e-7)


class TestShardedHybrid:
    """render_sharded_hybrid (round-4 verdict item #5a): per-shard slab
    scatter-min + pmin, then the replicated band march over the union
    leaf mirror, must reproduce the single-chip quality renderer. The
    packed slab words and the union mirror are BIT-identical; the f32
    composite tail differs by 1 ULP under shard_map, which can flip
    argsort ties in the band selection — so the image check tolerates a
    sub-0.5% pixel set difference at > 40 dB agreement."""

    CFG = SLAMConfig(width=64, height=48, focal_x=60.0, focal_y=60.0,
                     max_depth=6, voxel_resolution=2 * 1.28 / (1 << 6),
                     node_capacity=1 << 16, leaf_capacity=1 << 12,
                     insert_unique_cap=1 << 12, map_split_level=2)

    def test_hybrid_parity_vs_single_chip(self):
        from octree_slam_tpu.map import mips, svo as svo_mod
        from octree_slam_tpu.render import conesplat, hybrid
        from octree_slam_tpu.render.splat import append_new_leaves, \
            create_leaf_list
        from test_render import look_at_pose

        cfg = self.CFG
        mesh = distributed.make_mesh(8, axis_name="map")
        rng = np.random.default_rng(3)
        pts = rng.uniform(-1.0, 1.0, (4000, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (4000, 3)).astype(np.float32)

        smap = distributed.make_sharded_map(cfg, mesh)
        for _ in range(2):
            smap, _ = distributed.insert_sharded(
                smap, jnp.asarray(pts), jnp.asarray(cols), cfg, mesh)

        half = cfg.voxel_resolution * (2 ** (cfg.max_depth - 1))
        pool = svo_mod.create(cfg.node_capacity, jnp.zeros(3),
                              jnp.float32(half))
        leaves = create_leaf_list(cfg.leaf_capacity, cfg.node_capacity)
        for _ in range(2):
            pool, st = svo_mod.insert(pool, jnp.asarray(pts),
                                      jnp.asarray(cols),
                                      depth=cfg.max_depth,
                                      unique_cap=cfg.insert_unique_cap)
            leaves = append_new_leaves(leaves, st)

        # the union mirror equals the single-chip production cache on
        # everything the band march reads (leaf level, occ, dist, stamps)
        lvl = max(1, min(cfg.accel_level, cfg.max_depth - 2))
        cache_sh, lvl_sh = jax.jit(
            lambda s: distributed.union_leaf_mirror(s, cfg))(smap)
        assert lvl_sh == lvl
        pool_f = svo_mod.refresh_interior(pool, depth=cfg.max_depth)
        cache_1 = mips.rebuild_from_pool(pool_f, max_depth=cfg.max_depth,
                                         dist_level=lvl,
                                         max_skip=cfg.dist_max_skip)
        if cfg.cone_band_fused_dist:
            cache_1 = mips.encode_free_dist(cache_1,
                                            max_depth=cfg.max_depth,
                                            dist_level=lvl)
        lo = mips.level_offset(cfg.max_depth)
        hi = mips.level_offset(cfg.max_depth + 1)
        np.testing.assert_array_equal(
            np.asarray(cache_sh.values[lo:hi]),
            np.asarray(cache_1.values[lo:hi]))
        np.testing.assert_array_equal(np.asarray(cache_sh.occ),
                                      np.asarray(cache_1.occ))
        np.testing.assert_array_equal(np.asarray(cache_sh.dist),
                                      np.asarray(cache_1.dist))

        pose = look_at_pose([0, 0, 2.2], [0, 0, 0.0])
        fb_sh = np.asarray(distributed.render_sharded_hybrid(
            smap, jnp.asarray(pose), cfg.focal_x, cfg.focal_y, cfg, mesh))
        spec = conesplat.make_slab_spec(
            width=cfg.width, height=cfg.height, fx=cfg.focal_x,
            leaf_size=cfg.voxel_resolution, z_near=cfg.cone_znear,
            z_far=cfg.max_range, n_slabs=cfg.cone_slabs,
            max_scale=cfg.cone_max_scale)
        fb_1 = np.asarray(hybrid.render_cone_hybrid(
            leaves, cache_1, pool.center, pool.half_size,
            jnp.asarray(pose), cfg.focal_x, cfg.focal_y, spec=spec,
            depth=cfg.max_depth, dist_level=lvl,
            max_range=cfg.max_range, start_dist=cfg.start_dist,
            band_cap=cfg.cone_band_cap, band_iters=cfg.cone_band_iters,
            crawl=cfg.cone_band_crawl,
            fused_dist=cfg.cone_band_fused_dist,
            depth_prio=cfg.cone_band_depth_prio,
            compact_after=cfg.cone_band_compact_after))
        assert fb_1[..., :3].max() > 0.1
        d = np.abs(fb_sh[..., :3] - fb_1[..., :3])
        frac_off = float((d.max(axis=-1) > 1e-5).mean())
        assert frac_off < 0.005, frac_off
        mse = float((d ** 2).mean())
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 40.0, psnr

    def test_run_slam_2d_cone_hybrid_mode(self):
        """The full loop accepts render='cone_hybrid' and tracks sanely."""
        from octree_slam_tpu.sensor import sources
        cfg = dataclasses.replace(
            TestRunSlam2D.CFG, node_capacity=1 << 16,
            leaf_capacity=1 << 12)
        mesh = distributed.make_mesh2(2, 4)
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.02) for i in range(6)]
        frames = [sources.render_frame(scene, g, cfg.focal_x, cfg.focal_y,
                                       width=cfg.width, height=cfg.height)
                  for g in gt]
        state, _, info = run2d.run_slam_2d(frames, cfg, mesh,
                                           initial_pose=gt[0],
                                           render="cone_hybrid")
        err = np.linalg.norm(info["poses"][-1][:3, 3]
                             - np.asarray(gt[-1])[:3, 3])
        assert err < 0.08, err


class TestShardedTiering:
    """Host-RAM tiering on the Morton-sharded map (round-4 verdict item
    #5b, parallel/tiering2d.py): spill -> restore round trips are
    bit-exact, restores never clobber re-observations, and capacity
    overflow during restore grows the sharded map without losing leaves
    — the single-chip tiering guarantees (tests/test_tiering.py) on the
    mesh."""

    CFG = SLAMConfig(width=64, height=48, focal_x=60.0, focal_y=60.0,
                     max_depth=6, voxel_resolution=2 * 1.28 / (1 << 6),
                     node_capacity=1 << 16, leaf_capacity=1 << 12,
                     insert_unique_cap=1 << 10, map_split_level=2,
                     tier_level=2, spill_keep_radius=0.8,
                     restore_radius=1.2)

    def _two_cluster_map(self, cfg, mesh):
        """Cluster A near the origin-side camera, cluster B far across
        the volume — B's tier cells are cold from A and vice versa."""
        rng = np.random.default_rng(7)
        a = rng.uniform(-0.4, -0.05, (1500, 3)).astype(np.float32)
        b = rng.uniform(0.55, 0.95, (1500, 3)).astype(np.float32)
        pts = np.concatenate([a, b])
        cols = rng.uniform(0, 1, (3000, 3)).astype(np.float32)
        smap = distributed.make_sharded_map(cfg, mesh)
        smap, _ = distributed.insert_sharded(
            smap, jnp.asarray(pts), jnp.asarray(cols), cfg, mesh)
        return smap

    def test_spill_restore_roundtrip_bit_exact(self):
        from octree_slam_tpu.map.tiering import HostArchive
        from octree_slam_tpu.parallel import tiering2d

        cfg = self.CFG
        mesh = distributed.make_mesh(8, axis_name="map")
        smap = self._two_cluster_map(cfg, mesh)
        k0, v0 = run2d.union_leaves(smap)

        archive = HostArchive(cfg.tier_level)
        cam_a = np.array([-0.3, -0.3, -0.3], np.float32)
        smap, n_spill = tiering2d.spill_cold_sharded(
            smap, cfg, mesh, archive, camera_pos=cam_a)
        assert n_spill > 0 and len(archive) > 0
        k1, _ = run2d.union_leaves(smap)
        assert k1.size == k0.size - n_spill
        # nothing near the camera was spilled
        assert np.isin(k1, k0).all()

        # camera crosses to cluster B: everything restores, bit-exact
        cam_b = np.array([0.75, 0.75, 0.75], np.float32)
        smap, cfg2, n_rest = tiering2d.restore_due_sharded(
            smap, cfg, mesh, archive, camera_pos=cam_b)
        assert n_rest == n_spill and len(archive) == 0
        k2, v2 = run2d.union_leaves(smap)
        np.testing.assert_array_equal(k2, k0)
        np.testing.assert_array_equal(v2, v0)
        # shard-range ownership still holds after the round trip
        b = np.asarray(smap.bounds)[0]
        keys = np.asarray(smap.leaves.keys)
        L = cfg.map_split_level
        for dd in range(8):
            kd = keys[dd][keys[dd] >= 0]
            pref = kd >> (3 * (cfg.max_depth - L))
            assert np.all((pref >= b[dd]) & (pref < b[dd + 1]))

    def test_restore_never_clobbers_reobservation(self):
        from octree_slam_tpu.map.tiering import HostArchive
        from octree_slam_tpu.parallel import tiering2d
        from octree_slam_tpu.map import morton as morton_mod

        cfg = self.CFG
        mesh = distributed.make_mesh(8, axis_name="map")
        smap = self._two_cluster_map(cfg, mesh)
        archive = HostArchive(cfg.tier_level)
        cam_a = np.array([-0.3, -0.3, -0.3], np.float32)
        smap, n_spill = tiering2d.spill_cold_sharded(
            smap, cfg, mesh, archive, camera_pos=cam_a)
        assert n_spill > 0

        # re-observe ONE spilled location with a fresh color while cold
        spilled_pfx = next(iter(archive.cells))
        sk, sv = archive.cells[spilled_pfx]
        target_key = int(sk[0])
        center = np.asarray(smap.pool.center[0], np.float32)
        half = float(np.asarray(smap.pool.half_size[0]))
        pt = np.asarray(morton_mod.decode_centers(
            jnp.asarray([target_key], jnp.int32), jnp.asarray(center),
            jnp.float32(half), cfg.max_depth))[0]
        col = np.array([[1.0, 1.0, 1.0]], np.float32)
        smap, _ = distributed.insert_sharded(
            smap, jnp.asarray(pt[None]), jnp.asarray(col), cfg, mesh)
        ku, vu = run2d.union_leaves(smap)
        new_val = vu[np.searchsorted(ku, target_key)]

        cam_b = np.array([0.75, 0.75, 0.75], np.float32)
        smap, _, n_rest = tiering2d.restore_due_sharded(
            smap, cfg, mesh, archive, camera_pos=cam_b)
        k2, v2 = run2d.union_leaves(smap)
        # the re-observed leaf KEEPS its live value (overwrite=False)
        assert v2[np.searchsorted(k2, target_key)] == new_val
        # the rest of its cell restored verbatim
        for kk, vv in zip(sk.tolist(), sv.tolist()):
            if kk == target_key:
                continue
            assert v2[np.searchsorted(k2, kk)] == vv

    def test_restore_grows_instead_of_losing_leaves(self):
        from octree_slam_tpu.map.tiering import HostArchive
        from octree_slam_tpu.parallel import tiering2d

        cfg = dataclasses.replace(self.CFG, leaf_capacity=1 << 9)
        mesh = distributed.make_mesh(8, axis_name="map")
        smap = self._two_cluster_map(cfg, mesh)
        k0, v0 = run2d.union_leaves(smap)
        archive = HostArchive(cfg.tier_level)
        cam_a = np.array([-0.3, -0.3, -0.3], np.float32)
        smap, n_spill = tiering2d.spill_cold_sharded(
            smap, cfg, mesh, archive, camera_pos=cam_a)
        assert n_spill > 0
        # shrink headroom: pack the warm shards with extra geometry so
        # the restore overflows at least one registry
        rng = np.random.default_rng(8)
        extra = rng.uniform(-0.45, -0.02, (1200, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (1200, 3)).astype(np.float32)
        smap, _ = distributed.insert_sharded(
            smap, jnp.asarray(extra), jnp.asarray(cols), cfg, mesh)
        cam_b = np.array([0.75, 0.75, 0.75], np.float32)
        smap, cfg2, n_rest = tiering2d.restore_due_sharded(
            smap, cfg, mesh, archive, camera_pos=cam_b)
        assert n_rest == n_spill
        assert not bool(np.any(np.asarray(smap.leaves.overflowed)))
        k2, v2 = run2d.union_leaves(smap)
        # every originally spilled leaf is present with its exact value
        # (keys not re-observed since the spill restore verbatim)
        idx = np.searchsorted(k2, k0)
        assert np.all(idx < k2.size) and np.array_equal(k2[idx], k0)


class TestTiering2DLoop:
    """cfg.host_spill wired into run_slam_2d (the app-loop leg of the
    sharded tiering): node-growth pressure spills cold cells off the
    trailing camera signal, events are logged, and NO LEAF IS LOST —
    the union of the final map and the archive holds exactly the key
    set a no-tiering run of the same stream produces (tracking is
    map-independent, so the observed key set is deterministic)."""

    def test_spill_in_loop_loses_nothing(self):
        from octree_slam_tpu.sensor import sources

        # moderate capacity + LOW grow headroom: pressure fires early
        # (spill path) without ever hard-overflowing a shard pool, which
        # would drop allocations — a capacity artifact, not tiering
        cfg = dataclasses.replace(
            TestRunSlam2D.CFG,
            node_capacity=1 << 14, leaf_capacity=1 << 12,
            insert_unique_cap=1 << 11,
            host_spill=True, tier_level=2,
            spill_keep_radius=1.2, restore_radius=1.0)
        n = 10
        mesh = distributed.make_mesh2(2, 4)
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.02) for i in range(n)]
        frames = [sources.render_frame(scene, g, cfg.focal_x, cfg.focal_y,
                                       width=cfg.width, height=cfg.height)
                  for g in gt]
        state, cfg2, info = run2d.run_slam_2d(frames, cfg, mesh,
                                              initial_pose=gt[0],
                                              grow_headroom=0.25)
        spills = [e for e in info["events"] if e["event"] == "map_spill"]
        assert spills, info["events"]
        assert info["archive"] is not None
        assert not bool(np.any(np.asarray(state[3].pool.overflowed)))

        # no-tiering reference run (same stream, loose capacity)
        ref_cfg = dataclasses.replace(
            TestRunSlam2D.CFG, node_capacity=1 << 16,
            leaf_capacity=1 << 13, insert_unique_cap=1 << 11)
        ref_state, ref_cfg2, _ = run2d.run_slam_2d(frames, ref_cfg, mesh,
                                                   initial_pose=gt[0])
        ref_keys, _ = distributed.union_leaf_snapshot(ref_state[3],
                                                      ref_cfg2)

        live_keys, _ = distributed.union_leaf_snapshot(state[3], cfg2)
        arch = info["archive"]
        arch_keys = (np.concatenate([k for k, _ in arch.cells.values()])
                     if len(arch) else np.zeros((0,), np.int32))
        got = np.unique(np.concatenate([live_keys, arch_keys]))
        np.testing.assert_array_equal(got, np.unique(ref_keys))

    def test_inverted_hysteresis_rejected_2d(self):
        import pytest
        cfg = dataclasses.replace(TestRunSlam2D.CFG, host_spill=True,
                                  spill_keep_radius=1.0,
                                  restore_radius=2.0)
        mesh = distributed.make_mesh2(2, 4)
        with pytest.raises(ValueError, match="restore_radius"):
            run2d.run_slam_2d([], cfg, mesh)


class TestKeyframe2D:
    """Keyframe-anchored tracking on the 2-D mesh (round-4 verdict item
    #5c): identical math to pipeline.step's cfg.track_keyframe branch, so
    the sharded map must match a single-chip keyframe run bit-for-bit."""

    def test_keyframe_matches_single_chip(self):
        from octree_slam_tpu import pipeline
        from octree_slam_tpu.sensor import sources

        # reference estimator pinned: the test proves KEYFRAME-LOGIC
        # parity via map bit-identity, and the production Huber IRLS
        # default turns 1-ULP psum-reassociation pose differences into
        # occasional single-level value rounding flips (2/4107 leaves
        # observed) that are not what this test is about
        cfg = dataclasses.replace(
            TestRunSlam2D.CFG, node_capacity=1 << 16,
            leaf_capacity=1 << 13, track_keyframe=True,
            keyframe_max_dist=0.05, keyframe_max_angle_deg=3.0,
            icp_symmetric=False, icp_huber_k=0.0)
        n = 10
        mesh = distributed.make_mesh2(2, 4)
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.02) for i in range(n)]
        frames = [sources.render_frame(scene, g, cfg.focal_x, cfg.focal_y,
                                       width=cfg.width, height=cfg.height)
                  for g in gt]
        state, _, info = run2d.run_slam_2d(frames, cfg, mesh,
                                           initial_pose=gt[0])

        sstate = pipeline.init_state(cfg, initial_pose=gt[0])
        step = jax.jit(lambda s, f: pipeline.step(s, f, cfg,
                                                  render="none"))
        poses1 = []
        for f in frames:
            sstate, out = step(sstate, f)
            poses1.append(np.asarray(out.pose))

        rk = np.asarray(sstate.leaves.keys)
        rv = np.asarray(sstate.leaves.vals)
        live = rk >= 0
        order = np.argsort(rk[live], kind="stable")
        ku, vu = run2d.union_leaves(state[3])
        np.testing.assert_array_equal(ku, rk[live][order])
        np.testing.assert_array_equal(vu, rv[live][order])
        # trajectories agree to float tolerance (identical math, sharded
        # reductions reassociate)
        np.testing.assert_allclose(info["poses"], np.stack(poses1),
                                   atol=1e-4)


class TestRecovery2D:
    """Sticky divergence + relocalization on the 2-D mesh (round-3 verdict
    item #3b): a garbage frame diverges tracking, fusion gates off via
    the latched flag, and the host loop re-anchors against splat renders
    of the SHARDED map."""

    CFG = SLAMConfig(width=64, height=48, focal_x=55.0, focal_y=55.0,
                     pyramid_depth=2, pyramid_iters=(3, 3),
                     voxel_resolution=0.05, max_depth=6,
                     node_capacity=1 << 16, leaf_capacity=1 << 12,
                     insert_unique_cap=1 << 11, map_split_level=2,
                     relocalize=True, keypose_every=2,
                     reloc_candidates=2, reloc_min_inlier_frac=0.02)

    def test_divergence_gates_then_recovers(self):
        from octree_slam_tpu.core.types import Frame
        from octree_slam_tpu.sensor import sources

        cfg = self.CFG
        mesh = distributed.make_mesh2(2, 4)
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.015) for i in range(8)]
        frames = [sources.render_frame(scene, g, cfg.focal_x, cfg.focal_y,
                                       width=cfg.width, height=cfg.height)
                  for g in gt]
        # frame 4 is garbage: all-zero depth diverges the GN solve
        bad = Frame(depth=jnp.zeros((cfg.height, cfg.width), jnp.uint16),
                    color=jnp.zeros((cfg.height, cfg.width, 3), jnp.uint8),
                    timestamp=jnp.float32(4.0))
        stream = frames[:4] + [bad] + frames[4:]

        state, _, info = run2d.run_slam_2d(stream, cfg, mesh,
                                           initial_pose=gt[0])
        evs = [e["event"] for e in info["events"]]
        assert "relocalize" in evs, evs
        # after recovery the final sticky flag is clear and the last
        # frames fused again (pose back near ground truth)
        assert not bool(np.asarray(state[4]))
        err = np.linalg.norm(info["poses"][-1][:3, 3]
                             - np.asarray(gt[-1])[:3, 3])
        assert err < 0.15, err

    def test_save_load_roundtrip(self, tmp_path):
        from octree_slam_tpu.sensor import sources

        cfg = self.CFG
        mesh = distributed.make_mesh2(2, 4)
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.015) for i in range(5)]
        frames = [sources.render_frame(scene, g, cfg.focal_x, cfg.focal_y,
                                       width=cfg.width, height=cfg.height)
                  for g in gt]
        state, cfg2, _ = run2d.run_slam_2d(frames[:4], cfg, mesh,
                                           initial_pose=gt[0])
        p = str(tmp_path / "smap.npz")
        run2d.save_sharded(p, state, cfg2)
        state2, cfg3 = run2d.load_sharded(p, cfg, mesh)
        assert cfg3.node_capacity == cfg2.node_capacity
        k0, v0 = run2d.union_leaves(state[3])
        k1, v1 = run2d.union_leaves(state2[3])
        np.testing.assert_array_equal(k0, k1)
        np.testing.assert_array_equal(v0, v1)

        # continuing one frame from the restored state matches continuing
        # from the live state bit-for-bit
        step = distributed.slam_step_2d(cfg2, mesh)
        sa, _ = step(state, jax.device_put(
            frames[4], distributed.frame_sharding(mesh, "px")))
        sb, _ = step(state2, jax.device_put(
            frames[4], distributed.frame_sharding(mesh, "px")))
        ka, va = run2d.union_leaves(sa[3])
        kb, vb = run2d.union_leaves(sb[3])
        np.testing.assert_array_equal(ka, kb)
        np.testing.assert_array_equal(va, vb)
