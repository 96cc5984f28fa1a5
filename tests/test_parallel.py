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
