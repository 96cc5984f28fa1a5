"""Multi-chip execution: pixel-sharded SLAM step over a device mesh.

The reference is strictly single-GPU (SURVEY.md section 2.3: no comm
libraries anywhere). The TPU rebuild is designed mesh-ready from the start:

  * The per-frame compute is embarrassingly pixel-parallel everywhere except
    two global reductions (the 6x6 ICP normal equations and the map insert's
    key sort). We shard the image rows across the mesh ("sp"-style sequence
    parallelism where the 'sequence' is pixels); XLA's SPMD partitioner
    inserts the halo exchanges for the window ops (bilateral/normals) and
    psum-style reductions for the ICP sums over ICI.
  * An explicit shard_map variant of the ICP reduction (`icp_psum`) shows
    the collective contract directly: per-device partial J^T J / J^T r,
    one psum of 42 floats over ICI per Gauss-Newton iteration.
  * The map (node pool) stays replicated: insertion is deterministic, so
    every device computes the identical pool. Sharding the pool by Morton
    range is the planned scale-out for maps exceeding one chip's HBM
    (SURVEY.md section 5 long-context analog).
"""

from __future__ import annotations


from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core.types import Frame


def make_mesh(n_devices: int | None = None, axis_name: str = "px") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis_name,))


def frame_sharding(mesh: Mesh, axis_name: str = "px"):
    """Frame pytree sharding: depth/color split across image rows."""
    return Frame(
        depth=NamedSharding(mesh, P(axis_name, None)),
        color=NamedSharding(mesh, P(axis_name, None, None)),
        timestamp=NamedSharding(mesh, P()),
    )


def replicated(mesh: Mesh, tree):
    """Fully-replicated sharding pytree matching `tree`'s structure."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: s, tree)


def sharded_step(cfg: SLAMConfig, mesh: Mesh, axis_name: str = "px"):
    """jit the full SLAM step with the frame row-sharded over the mesh and
    the state replicated. XLA partitions the pixel-parallel work and inserts
    ICI collectives at the reductions."""

    def fn(state, frame):
        return pipeline.step(state, frame, cfg)

    return jax.jit(
        fn,
        in_shardings=(replicated(mesh, pipeline.init_state(cfg)),
                      frame_sharding(mesh, axis_name)),
    )


def splat_sharded(leaf_vals, leaf_keys, center, half_size,
                  world_T_cam, fx, fy, cfg: SLAMConfig, mesh: Mesh,
                  axis_name: str = "map"):
    """Map-sharded splat rendering: the persistent leaf registry is sharded
    over the mesh (model-parallel axis for the map), each device z-buffers
    its own leaf shard, and ONE pmin over ICI composites the packed
    depth<<16|RGB565 words into the exact global z-resolve — a 1.2 MB
    all-reduce per frame at 640x480.

    This is the scale-out path for maps beyond one chip's HBM: leaves (and
    in a full deployment the node pool, sharded by Morton range) never
    leave their device; only the screen-sized buffer crosses ICI.
    Returns the finished f32[H, W, 4] framebuffer, replicated.
    """
    from jax import shard_map
    from octree_slam_tpu.render import splat as sp

    def local(vals_s, keys_s, c_s, h_s, T_s):
        live = keys_s >= 0
        buf = sp.splat_zbuffer(vals_s, keys_s, live, c_s, h_s,
                               T_s, fx, fy, width=cfg.width,
                               height=cfg.height, depth=cfg.max_depth,
                               max_range=cfg.max_range)
        buf = jax.lax.pmin(buf, axis_name)
        return sp.finish_zbuffer(buf, width=cfg.width, height=cfg.height)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(), P(), P()),
        out_specs=P(),
    )(leaf_vals, leaf_keys, center, half_size, world_T_cam)


def icp_psum(v1, n1, v2, n2, cfg: SLAMConfig, mesh: Mesh,
             axis_name: str = "px") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Explicit shard_map ICP reduction: rows sharded, partial normal
    equations psum'd over ICI — the collective-level contract of the
    pixel-sharded tracker (the 42-float thrust::reduce of the reference,
    localization_kernels.cu:318, becomes one psum)."""
    from jax import shard_map
    from octree_slam_tpu.sensor.tracking import icp_normal_equations

    def local(v1s, n1s, v2s, n2s):
        A, b, count, _ = icp_normal_equations(v1s, n1s, v2s, n2s, cfg)
        A = jax.lax.psum(A, axis_name)
        b = jax.lax.psum(b, axis_name)
        return A, b

    spec = P(axis_name, None, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(P(), P()),
    )(v1, n1, v2, n2)
