"""Dense value-mip render cache (map/mips.py): consistency with the SVO
and cone-trace equivalence between the pointer and dense paths."""

import numpy as np
import jax.numpy as jnp
import pytest

from octree_slam_tpu.core import packing
from octree_slam_tpu.map import mips, morton, svo
from octree_slam_tpu.render import raycast

DEPTH = 6
CAP = 1 << 14


def make_pool():
    return svo.create(CAP, jnp.zeros(3), jnp.float32(0.02 * 2 ** (DEPTH - 1)))


def insert_cloud(pool, pts, cols, cache=None):
    pool, st = svo.insert(pool, jnp.asarray(pts, jnp.float32),
                          jnp.asarray(cols, jnp.float32),
                          depth=DEPTH, unique_cap=1 << 12, emit_mips=True)
    if cache is not None:
        cache = mips.update(cache, st.mip_idx, st.mip_val,
                            max_depth=DEPTH, dist_level=4, max_skip=5)
        # invariant: the incremental xyz occupancy + dist must equal a
        # from-scratch rebuild off the values buffer
        ref = mips.rebuild_dist(cache.values, max_depth=DEPTH, dist_level=4,
                                max_skip=5)
        np.testing.assert_array_equal(np.asarray(cache.dist),
                                      np.asarray(ref))
    return pool, st, cache


def random_cloud(n=500, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return pts, cols


class TestMipConsistency:
    def test_leaf_values_mirror_tree(self):
        pool = make_pool()
        cache = mips.create(max_depth=DEPTH, dist_level=4, max_skip=5)
        pts, cols = random_cloud()
        pool, st, cache = insert_cloud(pool, pts, cols, cache)

        keys, valid = morton.encode(jnp.asarray(pts), pool.center,
                                    pool.half_size, DEPTH)
        vals_tree, reached = svo.query_points(pool, jnp.asarray(pts),
                                              depth=DEPTH)
        fidx = mips.flat_index(jnp.where(valid, keys, 0), DEPTH, DEPTH)
        vals_mip = cache.values[fidx]
        ok = np.asarray(valid & (reached == DEPTH))
        np.testing.assert_array_equal(np.asarray(vals_tree)[ok],
                                      np.asarray(vals_mip)[ok])

    def test_interior_values_mirror_tree(self):
        pool = make_pool()
        cache = mips.create(max_depth=DEPTH, dist_level=4, max_skip=5)
        pts, cols = random_cloud()
        pool, st, cache = insert_cloud(pool, pts, cols, cache)

        # every touched interior cell in the mip equals the tree node value
        ex = svo.extract_voxels(pool, depth=3, capacity=1 << 9)
        n = int(ex.count)
        keys3 = np.asarray(ex.keys)[:n]
        nodes3 = np.asarray(ex.nodes)[:n]
        tree_vals = np.asarray(pool.value)[nodes3]
        mip_vals = np.asarray(cache.values)[mips.level_offset(3) + keys3]
        np.testing.assert_array_equal(tree_vals, mip_vals)

    def test_second_insert_updates_mips(self):
        pool = make_pool()
        cache = mips.create(max_depth=DEPTH, dist_level=4, max_skip=5)
        pts, cols = random_cloud()
        pool, st, cache = insert_cloud(pool, pts, cols, cache)
        pool, st2, cache = insert_cloud(pool, pts, cols, cache)

        keys, valid = morton.encode(jnp.asarray(pts), pool.center,
                                    pool.half_size, DEPTH)
        vals_tree, reached = svo.query_points(pool, jnp.asarray(pts),
                                              depth=DEPTH)
        fidx = mips.flat_index(jnp.where(valid, keys, 0), DEPTH, DEPTH)
        vals_mip = cache.values[fidx]
        ok = np.asarray(valid & (reached == DEPTH))
        np.testing.assert_array_equal(np.asarray(vals_tree)[ok],
                                      np.asarray(vals_mip)[ok])

    def test_dist_field_zero_at_occupied_positive_in_space(self):
        pool = make_pool()
        cache = mips.create(max_depth=DEPTH, dist_level=4, max_skip=5)
        # single occupied corner cluster
        pts = np.full((50, 3), -0.55, np.float32)
        cols = np.full((50, 3), 0.5, np.float32)
        pool, st, cache = insert_cloud(pool, pts, cols, cache)

        g = 1 << 4
        dist = np.asarray(cache.dist).reshape(g, g, g)
        # cell containing the cluster
        half = float(pool.half_size)
        cell = 2 * half / g
        ix = int((-0.55 + half) / cell)
        assert dist[ix, ix, ix] == 0
        # far corner is at saturation distance
        assert dist[g - 1, g - 1, g - 1] == 5

    def test_interleave_matches_morton_prefix(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(-0.6, 0.6, (200, 3)).astype(np.float32)
        pool = make_pool()
        keys, valid = morton.encode(jnp.asarray(pts), pool.center,
                                    pool.half_size, DEPTH)
        # integer leaf coords -> interleave == morton key
        half = pool.half_size
        q = jnp.clip(jnp.floor((jnp.asarray(pts) - (pool.center - half))
                               / (2 * half / (1 << DEPTH))).astype(jnp.int32),
                     0, (1 << DEPTH) - 1)
        m = mips.interleave3(q[:, 0], q[:, 1], q[:, 2], DEPTH)
        ok = np.asarray(valid)
        np.testing.assert_array_equal(np.asarray(m)[ok],
                                      np.asarray(keys)[ok])


class TestDenseConeTrace:
    def test_dense_matches_pointer_cone_trace(self):
        pool = make_pool()
        cache = mips.create(max_depth=DEPTH, dist_level=4, max_skip=5)
        rng = np.random.default_rng(1)
        # a flat wall in front of the camera
        xs = rng.uniform(-0.4, 0.4, 4000)
        ys = rng.uniform(-0.4, 0.4, 4000)
        pts = np.stack([xs, ys, np.full_like(xs, 0.3)], -1).astype(np.float32)
        cols = np.tile(np.array([[0.8, 0.2, 0.1]], np.float32), (4000, 1))
        for _ in range(40):  # drive alpha to saturation
            pool, st, cache = insert_cloud(pool, pts, cols, cache)

        pose = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(-0.4)
        kw = dict(width=32, height=24, max_depth=DEPTH, max_iters=48,
                  max_range=4.0)
        fb_ptr = raycast.cone_trace(pool, pose, 30.0, 30.0, **kw)
        fb_dense = raycast.cone_trace_dense(
            cache, pool.center, pool.half_size, pose, 30.0, 30.0,
            dist_level=4, max_skip=5, **kw)
        hit_ptr = np.asarray(fb_ptr[..., 3]) > 0.5
        hit_dense = np.asarray(fb_dense[..., 3]) > 0.5
        # the wall must be hit by both in the central region
        assert hit_ptr[8:16, 10:22].all()
        assert hit_dense[8:16, 10:22].all()
        # colors agree where both saturate
        both = hit_ptr & hit_dense
        diff = np.abs(np.asarray(fb_ptr)[..., :3] -
                      np.asarray(fb_dense)[..., :3])[both]
        assert diff.mean() < 0.15

    def test_live_ray_compaction_bit_identical(self):
        """The sort-compacted tail march (raycast.cone_trace_dense
        compact_after/compact_cap) must reproduce the all-lanes march
        EXACTLY — per-lane step sequences are untouched by packing."""
        pool = make_pool()
        cache = mips.create(max_depth=DEPTH, dist_level=4, max_skip=5)
        rng = np.random.default_rng(7)
        # a half-frame wall: the other half rays graze/miss -> a live tail
        xs = rng.uniform(-0.4, 0.05, 3000)
        ys = rng.uniform(-0.4, 0.4, 3000)
        pts = np.stack([xs, ys, np.full_like(xs, 0.3)], -1).astype(np.float32)
        cols = rng.uniform(0, 1, (3000, 3)).astype(np.float32)
        for _ in range(6):  # partial alpha: long accumulation tails
            pool, st, cache = insert_cloud(pool, pts, cols, cache)

        pose = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(-0.4)
        kw = dict(width=64, height=48, max_depth=DEPTH, max_iters=48,
                  max_range=4.0, dist_level=4, max_skip=5)
        fb_ref = raycast.cone_trace_dense(
            cache, pool.center, pool.half_size, pose, 50.0, 50.0,
            compact_after=48, **kw)  # compaction disabled
        fb_cmp = raycast.cone_trace_dense(
            cache, pool.center, pool.half_size, pose, 50.0, 50.0,
            compact_after=4, compact_cap=512, **kw)
        np.testing.assert_array_equal(np.asarray(fb_ref), np.asarray(fb_cmp))

    def test_pipeline_cone_mode_runs_dense(self):
        from octree_slam_tpu import pipeline
        from octree_slam_tpu.config import SLAMConfig
        from octree_slam_tpu.core.types import Frame
        import jax

        cfg = SLAMConfig(width=32, height=24, focal_x=30.0, focal_y=30.0,
                         max_depth=6, voxel_resolution=0.02,
                         node_capacity=1 << 14, insert_unique_cap=1 << 12,
                         leaf_capacity=1 << 12, max_march_iters=24,
                         pyramid_depth=2, pyramid_iters=(2, 2),
                         accel_level=4, use_dense_mips=True)
        state = pipeline.init_state(cfg)
        frame = Frame(depth=jnp.full((24, 32), 800, jnp.uint16),
                      color=jnp.full((24, 32, 3), 90, jnp.uint8),
                      timestamp=jnp.float32(0.0))
        step = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="cone"))
        state, out = step(state, frame)
        state, out = step(state, frame)
        fb = np.asarray(out.framebuffer)
        assert fb.shape == (24, 32, 4)
        assert np.isfinite(fb).all()
        assert fb[..., 3].max() > 0  # the wall renders


def test_cone_scale_halves_resolution():
    """cone_scale renders at reduced resolution and upsamples back."""
    import jax
    from octree_slam_tpu import pipeline
    from octree_slam_tpu.config import SLAMConfig
    from octree_slam_tpu.core.types import Frame

    cfg = SLAMConfig(width=32, height=24, focal_x=30.0, focal_y=30.0,
                     max_depth=6, voxel_resolution=0.02,
                     node_capacity=1 << 14, insert_unique_cap=1 << 12,
                     leaf_capacity=1 << 12, max_march_iters=24,
                     pyramid_depth=2, pyramid_iters=(2, 2),
                     accel_level=4, cone_scale=2)
    state = pipeline.init_state(cfg)
    frame = Frame(depth=jnp.full((24, 32), 800, jnp.uint16),
                  color=jnp.full((24, 32, 3), 90, jnp.uint8),
                  timestamp=jnp.float32(0.0))
    step = jax.jit(lambda s, f: pipeline.step(s, f, cfg,
                                              render="cone_march"))
    state, out = step(state, frame)
    fb = np.asarray(out.framebuffer)
    assert fb.shape == (24, 32, 4)
    assert np.isfinite(fb).all()
    # nearest upsample: 2x2 blocks identical
    assert np.array_equal(fb[0::2, 0::2], fb[1::2, 1::2])
