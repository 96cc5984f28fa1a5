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
