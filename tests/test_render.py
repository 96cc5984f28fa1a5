"""Rendering tests: cone tracing over a known SVO, point/voxel splatting."""

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.core import camera as cam_mod
from octree_slam_tpu.core import se3
from octree_slam_tpu.map import svo
from octree_slam_tpu.render import points as points_render
from octree_slam_tpu.render import raycast


def pool_with_wall(depth=6, n_insert=3):
    """SVO with a solid red wall at z=-1 (x,y in [-1,1])."""
    pool = svo.create(1 << 16, jnp.zeros(3), 2.0)
    g = np.linspace(-0.95, 0.95, 40, dtype=np.float32)
    xx, yy = np.meshgrid(g, g)
    pts = np.stack([xx.ravel(), yy.ravel(), np.full(xx.size, -1.0, np.float32)], -1)
    cols = np.tile(np.array([[1.0, 0.1, 0.1]], np.float32), (pts.shape[0], 1))
    for _ in range(n_insert):  # bump alpha past the occupancy threshold
        pool, _ = svo.insert(pool, jnp.asarray(pts), jnp.asarray(cols), depth=depth)
    return pool


def look_at_pose(eye, target):
    eye = np.asarray(eye, np.float32)
    target = np.asarray(target, np.float32)
    z = target - eye
    z /= np.linalg.norm(z)
    up = np.array([0, 1, 0], np.float32)
    x = np.cross(up, z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)
    return jnp.asarray(np.block([[R, eye[:, None]], [np.zeros((1, 3)), np.ones((1, 1))]]).astype(np.float32))


class TestConeTrace:
    def test_hits_wall(self):
        pool = pool_with_wall()
        pose = look_at_pose([0, 0, 1.0], [0, 0, -1.0])
        fb = np.asarray(raycast.cone_trace(
            pool, pose, 60.0, 60.0, width=64, height=48, max_depth=6))
        center = fb[20:28, 28:36]
        assert center[..., 3].min() > 0.5          # rays terminated on the wall
        assert center[..., 0].mean() > 3 * center[..., 1].mean()  # red wall

    def test_empty_pool_background(self):
        pool = svo.create(1 << 10, jnp.zeros(3), 2.0)
        pose = look_at_pose([0, 0, 1.0], [0, 0, -1.0])
        fb = np.asarray(raycast.cone_trace(
            pool, pose, 60.0, 60.0, width=32, height=24, max_depth=6))
        # nothing to hit: rays run out of range, rgb stays 0
        assert fb[..., :3].max() == 0.0

    def test_terminates(self):
        """All rays finish within the static iteration budget."""
        pool = pool_with_wall()
        pose = look_at_pose([0, 0, 1.0], [0, 0, -1.0])
        fb = np.asarray(raycast.cone_trace(
            pool, pose, 60.0, 60.0, width=32, height=24, max_depth=6,
            max_iters=256))
        # every ray either saturated or went out of range -> alpha=1
        assert np.all(fb[..., 3] >= 0.99)

    def test_lod_coarsens_with_distance(self):
        """Far camera uses coarse LOD: image still shows the wall color."""
        pool = pool_with_wall()
        pose = look_at_pose([0, 0, 8.0], [0, 0, -1.0])
        fb = np.asarray(raycast.cone_trace(
            pool, pose, 120.0, 120.0, width=32, height=24, max_depth=6))
        center = fb[10:14, 14:18]
        assert center[..., 0].mean() > center[..., 2].mean()


class TestPointRender:
    def test_single_point_lands(self):
        cam = cam_mod.make_camera([0, 0, 2.0], [0, 0, 0], [0, 1, 0], 60.0, 4 / 3)
        pts = jnp.array([[0.0, 0.0, 0.0]], jnp.float32)
        cols = jnp.array([[0.0, 1.0, 0.0]], jnp.float32)
        fb = np.asarray(points_render.render_points(
            pts, cols, cam.mvp, width=64, height=48))
        ys, xs = np.nonzero(fb[..., 3])
        assert len(xs) == 1
        assert abs(xs[0] - 32) <= 1 and abs(ys[0] - 24) <= 1
        assert fb[ys[0], xs[0], 1] == 1.0

    def test_depth_test(self):
        """Nearer point wins the pixel."""
        cam = cam_mod.make_camera([0, 0, 2.0], [0, 0, 0], [0, 1, 0], 60.0, 4 / 3)
        pts = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
        cols = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
        fb = np.asarray(points_render.render_points(
            pts, cols, cam.mvp, width=64, height=48))
        ys, xs = np.nonzero(fb[..., 2] > 0.5)  # blue (nearer to eye at z=2)
        assert len(xs) >= 1
        # red point is hidden exactly at the shared pixel
        assert not np.any((fb[..., 0] > 0.5) & (fb[..., 2] > 0.5))

    def test_behind_camera_culled(self):
        cam = cam_mod.make_camera([0, 0, 2.0], [0, 0, 0], [0, 1, 0], 60.0, 4 / 3)
        pts = jnp.array([[0.0, 0.0, 5.0]], jnp.float32)  # behind the eye
        cols = jnp.array([[1.0, 1.0, 1.0]], jnp.float32)
        fb = np.asarray(points_render.render_points(
            pts, cols, cam.mvp, width=32, height=24))
        assert fb[..., 3].max() == 0.0


class TestVoxelRender:
    def test_splats_cover_area(self):
        cam = cam_mod.make_camera([0, 0, 2.0], [0, 0, 0], [0, 1, 0], 60.0, 4 / 3)
        centers = jnp.array([[0.0, 0.0, 0.0]], jnp.float32)
        cols = jnp.array([[1.0, 0.5, 0.0]], jnp.float32)
        live = jnp.array([True])
        fb = np.asarray(points_render.render_voxels(
            centers, cols, jnp.float32(0.2), live, cam.view, cam.mvp,
            width=64, height=48, max_splat=4))
        covered = (fb[..., 3] > 0).sum()
        assert covered > 4  # bigger than a single pixel


class TestDilateZbuffer:
    def test_reduce_window_matches_nine_tap(self):
        """dilate_zbuffer's 3x3 reduce_window min must be bit-identical to
        the explicit pad/slice/minimum chain it replaced."""
        import jax
        from octree_slam_tpu.render import splat as splat_mod

        rng = np.random.default_rng(7)
        h, w = 24, 32
        buf = rng.integers(0, 2 ** 30, (h, w), dtype=np.int32)
        buf[rng.random((h, w)) < 0.6] = int(splat_mod.EMPTY)

        def nine_tap(img, rounds):
            for _ in range(rounds):
                p = jnp.pad(img, 1, constant_values=splat_mod.EMPTY)
                best = img
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        best = jnp.minimum(best, jax.lax.dynamic_slice(
                            p, (1 + dy, 1 + dx), (h, w)))
                img = jnp.where(img == splat_mod.EMPTY, best, img)
            return img

        for rounds in (1, 2, 3):
            got = np.asarray(splat_mod.dilate_zbuffer(
                jnp.asarray(buf.reshape(-1)), width=w, height=h,
                rounds=rounds))
            want = np.asarray(nine_tap(jnp.asarray(buf), rounds))
            np.testing.assert_array_equal(got, want)
