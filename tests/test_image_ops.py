"""Sensor image kernel tests against the NumPy oracles."""

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.core import se3
from octree_slam_tpu.sensor import image_ops

from oracle import backproject, bilateral, normal_map


def make_depth(h, w, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.integers(400, 4000, size=(h, w)).astype(np.uint16)
    d[0, 0] = 0        # invalid: no measurement
    d[1, 2] = 16000    # invalid: out of range
    return d


class TestVertexMap:
    def test_matches_oracle_full_res(self):
        d = make_depth(8, 12, seed=1)
        v = np.asarray(image_ops.generate_vertex_map(jnp.asarray(d), 530.0, 525.0, (12, 8)))
        ref = backproject(d, 530.0, 525.0, 12, 8, 12, 8)
        np.testing.assert_allclose(v, ref, rtol=1e-5)

    def test_pyramid_level_scaling(self):
        d = make_depth(8, 12, seed=2)
        sub = np.asarray(image_ops.subsample(jnp.asarray(d)))
        v = np.asarray(image_ops.generate_vertex_map(jnp.asarray(sub), 530.0, 525.0, (12, 8)))
        ref = backproject(sub, 530.0, 525.0, 12, 8, 6, 4)
        np.testing.assert_allclose(v, ref, rtol=1e-5)

    def test_invalid_depth_is_inf(self):
        d = make_depth(4, 4, seed=3)
        v = np.asarray(image_ops.generate_vertex_map(jnp.asarray(d), 500.0, 500.0, (4, 4)))
        assert np.all(np.isinf(v[0, 0]))


class TestNormalMap:
    def test_matches_oracle(self):
        d = make_depth(6, 8, seed=4)
        d[:] = np.maximum(d, 1)  # all valid for a clean comparison
        d[0, 0] = 500
        d[1, 2] = 600
        v = image_ops.generate_vertex_map(jnp.asarray(d), 500.0, 500.0, (8, 6))
        n = np.asarray(image_ops.generate_normal_map(v))
        ref = normal_map(np.asarray(v))
        finite = np.all(np.isfinite(ref), axis=-1)
        np.testing.assert_allclose(n[finite], ref[finite], atol=1e-5)
        # edges invalid
        assert np.all(np.isinf(n[-1, :])) and np.all(np.isinf(n[:, -1]))

    def test_unit_length(self):
        d = make_depth(6, 8, seed=5)
        v = image_ops.generate_vertex_map(jnp.asarray(d), 500.0, 500.0, (8, 6))
        n = np.asarray(image_ops.generate_normal_map(v))
        finite = np.all(np.isfinite(n), axis=-1)
        np.testing.assert_allclose(
            np.linalg.norm(n[finite], axis=-1), 1.0, atol=1e-5)


class TestBilateral:
    def test_matches_oracle(self):
        d = make_depth(9, 11, seed=6)
        d[:] = np.maximum(d, 1)
        out = np.asarray(image_ops.bilateral_filter(jnp.asarray(d)))
        ref = bilateral(d)
        # rounding at the .5 boundary may differ by 1mm
        assert np.max(np.abs(out.astype(int) - ref.astype(int))) <= 1

    def test_preserves_edges(self):
        d = np.full((10, 10), 1000, np.uint16)
        d[:, 5:] = 3000  # sharp depth edge >> sigma
        out = np.asarray(image_ops.bilateral_filter(jnp.asarray(d)))
        assert np.all(np.abs(out[:, :4].astype(int) - 1000) <= 1)
        assert np.all(np.abs(out[:, 6:].astype(int) - 3000) <= 1)


class TestSubsample:
    def test_plain_decimation(self):
        d = make_depth(8, 8, seed=7)
        out = np.asarray(image_ops.subsample(jnp.asarray(d)))
        np.testing.assert_array_equal(out, d[::2, ::2])

    def test_depth_aware_rejects_outliers(self):
        d = np.full((8, 8), 1000, np.uint16)
        d[0, 1] = 5000  # outlier near (0,0) output sample
        out = np.asarray(image_ops.subsample_depth(jnp.asarray(d)))
        assert out.shape == (4, 4)
        assert abs(int(out[0, 0]) - 1000) <= 1  # outlier excluded by gate

    def test_depth_aware_averages_inliers(self):
        d = np.full((8, 8), 1000, np.uint16)
        d[0, 0] = 1050
        out = np.asarray(image_ops.subsample_depth(jnp.asarray(d)))
        v = int(out[0, 0])
        assert 1000 <= v <= 1050


class TestIntensity:
    def test_correct_rgb_channels(self):
        c = np.zeros((2, 2, 3), np.uint8)
        c[0, 0] = [255, 0, 0]
        c[0, 1] = [0, 255, 0]
        c[1, 0] = [0, 0, 255]
        out = np.asarray(image_ops.color_to_intensity(jnp.asarray(c)))
        np.testing.assert_allclose(out[0, 0], 0.299, atol=1e-6)
        np.testing.assert_allclose(out[0, 1], 0.587, atol=1e-6)  # ref bug fixed
        np.testing.assert_allclose(out[1, 0], 0.114, atol=1e-6)


class TestTransforms:
    def test_vertex_and_normal_transform(self):
        rng = np.random.default_rng(8)
        v = rng.normal(size=(5, 7, 3)).astype(np.float32)
        T = np.asarray(se3.exp_se3(jnp.asarray([0.1, -0.2, 0.3, 1.0, 2.0, -1.0], jnp.float32)))
        out_v = np.asarray(image_ops.transform_vertex_map(jnp.asarray(v), jnp.asarray(T)))
        out_n = np.asarray(image_ops.transform_normal_map(jnp.asarray(v), jnp.asarray(T)))
        ref_v = v @ T[:3, :3].T + T[:3, 3]
        ref_n = v @ T[:3, :3].T
        np.testing.assert_allclose(out_v, ref_v, atol=1e-5)
        np.testing.assert_allclose(out_n, ref_n, atol=1e-5)


class TestSE3:
    def test_exp_identity(self):
        T = np.asarray(se3.exp_se3(jnp.zeros(6)))
        np.testing.assert_allclose(T, np.eye(4), atol=1e-7)

    def test_exp_inverse(self):
        tw = jnp.asarray([0.2, -0.1, 0.3, 0.5, -0.2, 0.1], jnp.float32)
        T = se3.exp_se3(tw)
        Ti = se3.inverse(T)
        np.testing.assert_allclose(np.asarray(T @ Ti), np.eye(4), atol=1e-6)

    def test_exp_matches_small_angle(self):
        tw = jnp.asarray([1e-7, 2e-7, -1e-7, 0.1, 0.2, 0.3], jnp.float32)
        T = np.asarray(se3.exp_se3(tw))
        assert np.all(np.isfinite(T))
        np.testing.assert_allclose(T[:3, 3], [0.1, 0.2, 0.3], atol=1e-6)

    def test_rotation_composition(self):
        w = jnp.asarray([0.0, 0.0, np.pi / 2], jnp.float32)
        R = np.asarray(se3.exp_so3(w))
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)
