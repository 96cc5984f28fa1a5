"""Pallas sensor kernels vs the XLA reference path (interpret mode on the
CPU test mesh; the compiled kernel is exercised on the real TPU by
bench.py, where it was verified bit-identical at 640x480)."""

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.sensor import image_ops, pallas_ops


def rand_depth(h, w, seed):
    rng = np.random.default_rng(seed)
    d = rng.uniform(400, 6000, (h, w)).astype(np.uint16)
    d[rng.random((h, w)) < 0.1] = 0  # invalid holes
    return d


class TestPallasBilateral:
    def test_matches_xla_bit_identical(self):
        d = jnp.asarray(rand_depth(16, 128, seed=1))
        ref = np.asarray(image_ops.bilateral_filter(d))
        out = np.asarray(pallas_ops.bilateral(d, 4.5, 40.0, interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_edge_handling_matches(self):
        # sharp depth step at the border region exercises the sentinel mask
        d = np.full((8, 128), 1000, np.uint16)
        d[:, 64:] = 3000
        d[0, :] = 0
        dj = jnp.asarray(d)
        ref = np.asarray(image_ops.bilateral_filter(dj))
        out = np.asarray(pallas_ops.bilateral(dj, 4.5, 40.0, interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_gated_window_matches_xla(self):
        d = jnp.asarray(rand_depth(16, 128, seed=3))
        ref = np.asarray(image_ops.subsample_depth(d, 40.0,
                                                   allow_pallas=False))
        full = np.asarray(pallas_ops.gated_window_mean(d, 120.0,
                                                       interpret=True))
        out = full[::2, ::2].astype(np.uint16)
        np.testing.assert_array_equal(out, ref)

    def test_striped_equals_single_window(self):
        """Big frames run as row stripes with REAL halo rows from their
        neighbors: forcing a tiny per-window budget must reproduce the
        single-window result exactly (and the XLA reference)."""
        d = jnp.asarray(rand_depth(32, 128, seed=4))
        ref = np.asarray(image_ops.bilateral_filter(d))
        striped = np.asarray(pallas_ops.bilateral(
            d, 4.5, 40.0, interpret=True, max_px=8 * 128))  # 4 stripes
        np.testing.assert_array_equal(striped, ref)
        g_ref = np.asarray(pallas_ops.gated_window_mean(
            d, 120.0, interpret=True))
        g_str = np.asarray(pallas_ops.gated_window_mean(
            d, 120.0, interpret=True, max_px=8 * 128))
        np.testing.assert_array_equal(g_str, g_ref)

    def test_dispatch_gating(self):
        # odd shapes and CPU fall back to the XLA path (no error)
        d = jnp.asarray(rand_depth(9, 11, seed=2))
        out = np.asarray(image_ops.bilateral_filter(d))
        assert out.shape == (9, 11)
        assert not pallas_ops.compatible((9, 11))
        assert pallas_ops.compatible((480, 640))
