"""Slab-volume cone splatting (render/conesplat.py).

Checks the compositor against (a) an analytic NumPy oracle of the
capped-additive accumulation and (b) the exact cone-tracing march on a
shared map — the two implement the same semantics
(cone_tracing_kernels.cu:106-139) by scatter vs by marching.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from octree_slam_tpu.core import packing
from octree_slam_tpu.map import morton, svo
from octree_slam_tpu.render import conesplat, raycast
from octree_slam_tpu.render.splat import append_new_leaves, create_leaf_list

from test_render import look_at_pose, pool_with_wall


def leaves_via_insert(pool, pts, cols, depth, n_insert=3, leaf_cap=1 << 12):
    leaves = create_leaf_list(leaf_cap, pool.capacity)
    for _ in range(n_insert):
        pool, stats = svo.insert(pool, jnp.asarray(pts), jnp.asarray(cols),
                                 depth=depth)
        leaves = append_new_leaves(leaves, stats)
    return pool, leaves


def wall_points(z=-1.0, n=40):
    g = np.linspace(-0.95, 0.95, n, dtype=np.float32)
    xx, yy = np.meshgrid(g, g)
    pts = np.stack([xx.ravel(), yy.ravel(),
                    np.full(xx.size, z, np.float32)], -1)
    cols = np.tile(np.array([[1.0, 0.1, 0.1]], np.float32),
                   (pts.shape[0], 1))
    return pts, cols


class TestSlabSpec:
    def test_scales_match_footprint(self):
        spec = conesplat.make_slab_spec(width=640, height=480, fx=532.0,
                                        leaf_size=0.02, n_slabs=16)
        assert len(spec.scales) == 16
        # near slabs coarse, far slabs fine, monotone non-increasing
        assert spec.scales[0] >= spec.scales[-1]
        assert all(a >= b for a, b in zip(spec.scales, spec.scales[1:]))
        # far slabs approach the projected leaf footprint (~1 px at 10 m)
        assert spec.scales[-1] <= 2
        # offsets tile the flat buffer exactly
        total = 0
        for k, s in enumerate(spec.scales):
            assert spec.offsets[k] == total
            total += (640 // s) * (480 // s)
        assert spec.total_cells == total

    def test_scales_divide_frame(self):
        spec = conesplat.make_slab_spec(width=96, height=72, fx=80.0,
                                        leaf_size=0.05, n_slabs=8)
        for s in spec.scales:
            assert 96 % s == 0 and 72 % s == 0


MODES = [dict(accumulate=False, bilinear=False),           # production
         dict(accumulate=False, bilinear=False, dilate=0),  # round-2 shape
         dict(accumulate=True, bilinear=True),
         dict(accumulate=False, bilinear=False, blend=0.5)]


class TestOracle:
    @pytest.mark.parametrize("mode", MODES)
    def test_single_leaf_color_and_rescale(self, mode):
        """One unsaturated leaf: rescale by 127/w reproduces full color."""
        depth = 6
        pool = svo.create(1 << 14, jnp.zeros(3), 2.0)
        pts = np.array([[0.0, 0.0, -1.0]], np.float32)
        cols = np.array([[0.2, 0.9, 0.3]], np.float32)
        pool, leaves = leaves_via_insert(pool, pts, cols, depth, n_insert=4)
        pose = look_at_pose([0, 0, 1.0], [0, 0, -1.0])
        spec = conesplat.make_slab_spec(width=64, height=48, fx=60.0,
                                        leaf_size=4.0 / (1 << depth))
        fb = np.asarray(conesplat.render_cone_splat(
            leaves, pool.center, pool.half_size, pose, 60.0, 60.0,
            spec=spec, depth=depth, **mode))
        ys, xs = np.nonzero(fb[..., 1] > 0.1)
        assert len(xs) >= 1
        # the leaf sits ~2 m away: near image center
        assert abs(xs.mean() - 32) < 6 and abs(ys.mean() - 24) < 6
        # read the blob's PEAK pixel: bilinear upsampling intentionally
        # ramps the silhouette, so edge pixels carry fractional weight
        # (and the 127/max(w,1) exit rescale leaves sub-1 weights dim);
        # the peak must show the blend of 4 samples of (0.2, 0.9, 0.3)
        # at full strength after the 127/w rescale
        py, px_ = np.unravel_index(np.argmax(fb[..., 1]), fb[..., 1].shape)
        px = fb[py, px_]
        assert px[1] > 0.55 and px[1] > 2.0 * px[0]
        assert np.all(fb[..., 3] == 1.0)

    @pytest.mark.parametrize("mode", MODES)
    def test_saturation_caps_accumulation(self, mode):
        """A fully saturated near wall hides everything behind it."""
        depth = 6
        pool = svo.create(1 << 16, jnp.zeros(3), 2.0)
        red_pts, red_cols = wall_points(z=-0.5)
        blue_pts = red_pts.copy()
        blue_pts[:, 2] = -1.5
        blue_cols = np.tile(np.array([[0.1, 0.1, 1.0]], np.float32),
                            (blue_pts.shape[0], 1))
        leaves = create_leaf_list(1 << 13, pool.capacity)
        # 70 inserts saturate alpha (127 + 2*70 -> 255): w = 128 > 127
        for _ in range(70):
            pool, stats = svo.insert(
                pool, jnp.asarray(np.concatenate([red_pts, blue_pts])),
                jnp.asarray(np.concatenate([red_cols, blue_cols])),
                depth=depth)
            leaves = append_new_leaves(leaves, stats)
        pose = look_at_pose([0, 0, 1.0], [0, 0, -1.0])
        spec = conesplat.make_slab_spec(width=64, height=48, fx=60.0,
                                        leaf_size=4.0 / (1 << depth))
        fb = np.asarray(conesplat.render_cone_splat(
            leaves, pool.center, pool.half_size, pose, 60.0, 60.0,
            spec=spec, depth=depth, **mode))
        center = fb[20:28, 28:36]
        assert center[..., 0].mean() > 0.5          # red wall in front
        assert center[..., 2].mean() < 0.15         # blue wall occluded

    def test_empty_map_black(self):
        pool = svo.create(1 << 12, jnp.zeros(3), 2.0)
        leaves = create_leaf_list(1 << 10, pool.capacity)
        pose = look_at_pose([0, 0, 1.0], [0, 0, -1.0])
        spec = conesplat.make_slab_spec(width=32, height=24, fx=30.0,
                                        leaf_size=0.0625)
        fb = np.asarray(conesplat.render_cone_splat(
            leaves, pool.center, pool.half_size, pose, 30.0, 30.0,
            spec=spec, depth=6))
        assert fb[..., :3].max() == 0.0


class TestAgainstMarch:
    @pytest.mark.parametrize("mode", MODES)
    def test_wall_matches_exact_march(self, mode):
        """Same map, same pose: slab compositor vs the exact marcher."""
        depth = 6
        pool = svo.create(1 << 16, jnp.zeros(3), 2.0)
        pts, cols = wall_points()
        pool, leaves = leaves_via_insert(pool, pts, cols, depth, n_insert=3)
        pose = look_at_pose([0, 0, 1.0], [0, 0, -1.0])

        fb_march = np.asarray(raycast.cone_trace(
            pool, pose, 60.0, 60.0, width=64, height=48, max_depth=depth))
        spec = conesplat.make_slab_spec(width=64, height=48, fx=60.0,
                                        leaf_size=4.0 / (1 << depth))
        fb_slab = np.asarray(conesplat.render_cone_splat(
            leaves, pool.center, pool.half_size, pose, 60.0, 60.0,
            spec=spec, depth=depth, **mode))

        # The march tunnels through the 1-leaf-thick wall on oblique rays
        # (it steps by the reached-node size, cone_tracing_kernels.cu:126-129
        # — those pixels stay black), so compare only where it registered a
        # hit; the slab image must agree there and cover a superset.
        hit = fb_march[..., 0] > 0.1
        assert hit.mean() > 0.2
        diff = np.abs(fb_march[hit][:, :3] - fb_slab[hit][:, :3])
        assert diff.mean() < 0.1
        assert (fb_slab[..., 0] > 0.1).sum() >= hit.sum()
        # slab center region is uniformly the rescaled red wall
        cs = fb_slab[20:28, 28:36, :3]
        assert cs[..., 0].min() > 0.5
        assert cs[..., 0].mean() > 2.0 * cs[..., 2].mean()
