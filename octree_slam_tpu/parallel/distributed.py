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


from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core.types import Frame
from octree_slam_tpu.map import svo
from octree_slam_tpu.map.svo import SVONodePool
from octree_slam_tpu.render.splat import LeafList, append_new_leaves, \
    create_leaf_list, leaf_list_from_extraction


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
        # accept both a flat registry split across devices ([LC/M]) and a
        # stacked per-shard registry ([1, LC] from ShardedMap)
        vals_s = vals_s.reshape(-1)
        keys_s = keys_s.reshape(-1)
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


class ShardedMap(NamedTuple):
    """Morton-range-sharded map state: every array has a leading mesh-axis
    dimension; device d holds pool/leaf shard d. Device d owns the key
    range whose level-1 octant's top log2(M) bits equal d (Morton keys are
    level-major, so this is a contiguous key range — the "bricks sharded
    by Morton range" scale-out named in ARCHITECTURE.md: each shard's
    HBM holds 1/M of the world, and capacities scale per device)."""

    pool: SVONodePool   # stacked [M, ...]
    leaves: LeafList    # stacked [M, ...]


def _axis_bits(mesh: Mesh, axis_name: str) -> int:
    m = mesh.shape[axis_name]
    bits = m.bit_length() - 1
    assert (1 << bits) == m and bits <= 3, \
        "map axis must be 2, 4, or 8 devices (level-1 octant split)"
    return bits


def make_sharded_map(cfg: SLAMConfig, mesh: Mesh, map_center=(0.0, 0.0, 0.0),
                     axis_name: str = "map") -> ShardedMap:
    """M empty per-device pools/registries, placed shard-per-device."""
    m = mesh.shape[axis_name]
    half = cfg.voxel_resolution * (2 ** (cfg.max_depth - 1))
    pool = svo.create(cfg.node_capacity,
                      jnp.asarray(map_center, jnp.float32),
                      jnp.float32(half))
    leaves = create_leaf_list(cfg.leaf_capacity, cfg.node_capacity)

    def stack(x):
        import numpy as np
        return jnp.asarray(np.broadcast_to(np.asarray(x)[None],
                                           (m,) + np.asarray(x).shape))

    smap = ShardedMap(pool=jax.tree_util.tree_map(stack, pool),
                      leaves=jax.tree_util.tree_map(stack, leaves))
    shardings = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1)))),
        smap)
    return jax.device_put(smap, shardings)


def insert_sharded(smap: ShardedMap, points, colors, cfg: SLAMConfig,
                   mesh: Mesh, axis_name: str = "map"
                   ) -> Tuple[ShardedMap, jnp.ndarray]:
    """Morton-range-sharded map insert: every device sees the (replicated)
    frame's world points, keeps exactly those in its own key range (keys
    arrive pre-sorted by construction of the range split — the
    shard-local-filter routing; no all_to_all needed when the frame is
    replicated), and runs the standard batched insert into its LOCAL pool.
    Shards are disjoint by key, so the union of shard contents is
    bit-identical to the replicated single-pool insert
    (tests/test_parallel.py proves it on the 8-device mesh).

    Returns (updated ShardedMap, global unique count — one psum over ICI).
    """
    from jax import shard_map

    bits = _axis_bits(mesh, axis_name)

    def local(pool_s, leaves_s, pts, cols):
        pool = SVONodePool(*(x[0] for x in pool_s))
        leaves = LeafList(*(x[0] for x in leaves_s))
        d = jax.lax.axis_index(axis_name)
        # level-1 octant = (x>cx) + 2(y>cy) + 4(z>cz) (computeKey,
        # svo.cu:50-57); its top `bits` are the owning device index
        gt = pts > pool.center[None, :]
        oct1 = (gt[:, 0].astype(jnp.int32) + 2 * gt[:, 1].astype(jnp.int32)
                + 4 * gt[:, 2].astype(jnp.int32))
        mine = (oct1 >> (3 - bits)) == d
        pool, stats = svo.insert(pool, pts, cols, valid=mine,
                                 depth=cfg.max_depth,
                                 unique_cap=cfg.insert_unique_cap)
        leaves = append_new_leaves(leaves, stats)

        # Unique-cap remainder, per shard: a frame concentrated in one
        # device's key range can exceed insert_unique_cap; page through
        # the rest in sorted key order (same lossless protocol as
        # pipeline.step). Trip counts differ per device — fine, the only
        # collective (psum) is after the loop.
        def _more(c):
            return c[0]

        def _page(c):
            _, lk, p, lv, n = c
            p, st = svo.insert(p, pts, cols, valid=mine,
                               depth=cfg.max_depth,
                               unique_cap=cfg.insert_unique_cap,
                               min_key=lk)
            return (st.unique_overflow, st.last_key, p,
                    append_new_leaves(lv, st), n + st.n_unique)

        _, _, pool, leaves, n_unique = jax.lax.while_loop(
            _more, _page, (stats.unique_overflow, stats.last_key, pool,
                           leaves, stats.n_unique))
        total = jax.lax.psum(n_unique, axis_name)
        return (jax.tree_util.tree_map(lambda x: x[None], pool),
                jax.tree_util.tree_map(lambda x: x[None], leaves),
                total)

    spec_map = jax.tree_util.tree_map(lambda _: P(axis_name), smap.pool), \
        jax.tree_util.tree_map(lambda _: P(axis_name), smap.leaves)
    pool, leaves, total = shard_map(
        local, mesh=mesh,
        in_specs=(spec_map[0], spec_map[1], P(), P()),
        out_specs=(spec_map[0], spec_map[1], P()),
    )(smap.pool, smap.leaves, points, colors)
    return ShardedMap(pool=pool, leaves=leaves), total


def grow_sharded(smap: ShardedMap, cfg: SLAMConfig, mesh: Mesh, *,
                 grow_nodes: bool = True, grow_leaves: bool = False,
                 axis_name: str = "map") -> Tuple[ShardedMap, SLAMConfig]:
    """Double every shard's pool and/or leaf-registry capacity, preserving
    all content — pipeline.grow_state for the Morton-sharded map (shapes
    are uniform across shards, so all grow together). Within a dense-
    prealloc regime the stacked arrays pad in place (child pointers are
    absolute); a doubling that crosses a prealloc boundary rebuilds each
    shard from its own leaf registry via the value-verbatim insert
    (svo.insert_exact, the same machinery as the single-pool rebuild),
    entirely shard-local — no cross-chip traffic."""
    import dataclasses

    from octree_slam_tpu.core import packing

    new_cfg = dataclasses.replace(
        cfg,
        node_capacity=cfg.node_capacity * (2 if grow_nodes else 1),
        leaf_capacity=cfg.leaf_capacity * (2 if grow_leaves else 1))
    m = mesh.shape[axis_name]
    leaves = smap.leaves
    rebuild = grow_nodes and (svo.prealloc_levels(new_cfg.node_capacity)
                              != svo.prealloc_levels(cfg.node_capacity))
    if bool(jnp.any(leaves.overflowed)):
        # An overflowed registry dropped registrations (appends are
        # first-write-only): rebuild every shard's registry from its own
        # POOL by doubling extraction (pipeline.grow_state's overflow
        # path, per shard at host level — growth is rare). All shards
        # must share one static leaf capacity, so size to the largest.
        import dataclasses as _dc
        exs, caps = [], []
        for d in range(m):
            pool_d = jax.tree_util.tree_map(lambda x: x[d], smap.pool)
            ex, cap = svo.extract_all_leaves(
                pool_d, depth=cfg.max_depth,
                start_capacity=new_cfg.leaf_capacity)
            exs.append((pool_d, ex))
            caps.append(cap)
        final_cap = max(caps)
        new_cfg = _dc.replace(new_cfg, leaf_capacity=final_cap)
        shards = []
        for pool_d, ex in exs:
            if ex.keys.shape[0] != final_cap:
                ex = svo.extract_voxels(pool_d, depth=cfg.max_depth,
                                        capacity=final_cap)
            shards.append(leaf_list_from_extraction(
                ex, pool_d.value, node_capacity=cfg.node_capacity))
        leaves = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *shards)
        smap = ShardedMap(pool=smap.pool, leaves=leaves)

    if rebuild:
        from jax import shard_map
        shallow = max(1, min(cfg.accel_level, cfg.max_depth - 2))

        def local(pool_s, leaves_s):
            pool = SVONodePool(*(x[0] for x in pool_s))
            lv = LeafList(*(x[0] for x in leaves_s))
            fresh = svo.create(new_cfg.node_capacity, pool.center,
                               pool.half_size)
            out = create_leaf_list(new_cfg.leaf_capacity,
                                   new_cfg.node_capacity)
            keys = lv.keys  # insert_exact skips negatives itself
            fresh, st = svo.insert_exact(
                fresh, keys, lv.vals, depth=cfg.max_depth,
                unique_cap=cfg.insert_unique_cap, shallow_level=shallow,
                overwrite=True)
            out = append_new_leaves(out, st)

            def _more(c):
                return c[0]

            def _page(c):
                _, lk, p, o = c
                p, s2 = svo.insert_exact(
                    p, keys, lv.vals, depth=cfg.max_depth,
                    unique_cap=cfg.insert_unique_cap,
                    shallow_level=shallow, overwrite=True, min_key=lk)
                return (s2.unique_overflow, s2.last_key, p,
                        append_new_leaves(o, s2))

            _, _, fresh, out = jax.lax.while_loop(
                _more, _page,
                (st.unique_overflow, st.last_key, fresh, out))
            fresh = svo.refresh_interior(fresh, depth=cfg.max_depth)
            return (jax.tree_util.tree_map(lambda x: x[None], fresh),
                    jax.tree_util.tree_map(lambda x: x[None], out))

        specs = (jax.tree_util.tree_map(lambda _: P(axis_name), smap.pool),
                 jax.tree_util.tree_map(lambda _: P(axis_name),
                                        smap.leaves))
        pool, new_leaves = shard_map(
            local, mesh=mesh, in_specs=specs, out_specs=specs,
        )(smap.pool, smap.leaves)
        return ShardedMap(pool=pool, leaves=new_leaves), new_cfg

    pool = smap.pool
    if grow_nodes:
        pad = new_cfg.node_capacity - pool.child.shape[1]
        pool = pool._replace(
            child=jnp.concatenate(
                [pool.child, jnp.zeros((m, pad), jnp.int32)], axis=1),
            value=jnp.concatenate(
                [pool.value,
                 jnp.full((m, pad), packing.EMPTY_VALUE, jnp.uint32)],
                axis=1),
            overflowed=jnp.zeros((m,), bool))
    lc_pad = new_cfg.leaf_capacity - leaves.keys.shape[1]
    nc_pad = new_cfg.node_capacity - leaves.node2pos.shape[1]
    new_leaves = LeafList(
        keys=jnp.concatenate(
            [leaves.keys, jnp.full((m, lc_pad), -1, jnp.int32)], axis=1),
        nodes=jnp.concatenate(
            [leaves.nodes, jnp.zeros((m, lc_pad), jnp.int32)], axis=1),
        vals=jnp.concatenate(
            [leaves.vals, jnp.zeros((m, lc_pad), jnp.uint32)], axis=1),
        node2pos=jnp.concatenate(
            [leaves.node2pos, jnp.full((m, nc_pad), -1, jnp.int32)],
            axis=1),
        count=leaves.count,
        overflowed=leaves.overflowed,
    )
    smap2 = ShardedMap(pool=pool, leaves=new_leaves)
    shardings = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh,
                                P(axis_name, *([None] * (x.ndim - 1)))),
        smap2)
    return jax.device_put(smap2, shardings), new_cfg


def render_sharded_map(smap: ShardedMap, world_T_cam, fx, fy,
                       cfg: SLAMConfig, mesh: Mesh,
                       axis_name: str = "map") -> jnp.ndarray:
    """Render the Morton-sharded map: each device z-buffers its own leaf
    shard, one pmin of packed words over ICI composites (splat_sharded)."""
    # center/half_size are identical across shards; pass shard 0's
    return splat_sharded(
        smap.leaves.vals, smap.leaves.keys,
        smap.pool.center[0], smap.pool.half_size[0],
        world_T_cam, fx, fy, cfg, mesh, axis_name=axis_name)


def make_mesh2(n_px: int, n_map: int) -> Mesh:
    """2-D device mesh ("px", "map"): tracking parallelism on one axis,
    Morton-range map parallelism on the other — the DP x TP-style
    composite. Needs n_px * n_map devices."""
    import numpy as np
    devs = jax.devices()
    assert len(devs) >= n_px * n_map
    return Mesh(np.array(devs[:n_px * n_map]).reshape(n_px, n_map),
                ("px", "map"))


def slam_step_2d(cfg: SLAMConfig, mesh: Mesh):
    """The FULL distributed SLAM frame over a 2-D ("px", "map") mesh, one
    jitted program:

      * preprocessing + ICP tracking partition over image rows ("px");
        XLA inserts the halo exchanges for the window stencils and the
        42-float normal-equation reductions over ICI;
      * fusion routes the frame's world points into the Morton-range
        map shards ("map": shard-local key filter, per-shard batched
        insert + in-device unique-cap paging, one psum for the global
        unique count);
      * rendering z-buffers each map shard and composites with one pmin
        over the "map" axis.

    State = (last_pyramid, pose, initialized, ShardedMap). Tracking is
    identical math to pipeline.step (frame-to-frame ICP, divergence
    gates fusion per-frame); the map lives only in the shards.

    Returns step(state, frame) -> (state', (framebuffer, pose, total
    unique leaves this frame)).
    """
    from octree_slam_tpu import pipeline
    from octree_slam_tpu.sensor import tracking as tr

    def fn(state, frame):
        last_pyramid, pose, initialized, smap = state
        pyramid = tr.build_pyramid(frame.depth, frame.color, cfg)
        update_T, tstats = tr.track(list(last_pyramid), list(pyramid), cfg)
        eye = jnp.eye(4, dtype=jnp.float32)
        update_T = jnp.where(initialized, update_T, eye)
        new_pose = pose @ update_T

        v = pyramid[cfg.fuse_level].vertex.reshape(-1, 3)
        world_pts = v @ new_pose[:3, :3].T + new_pose[:3, 3]
        colors = pipeline._fuse_colors(frame, cfg)
        # per-frame divergence gate (pipeline.step semantics without the
        # sticky-recovery machinery: a bad frame is skipped, fusion
        # resumes when tracking re-locks)
        ok = ~(initialized & tstats.diverged)
        world_pts = jnp.where(ok, world_pts, jnp.inf)

        smap, total = insert_sharded(smap, world_pts, colors, cfg, mesh)
        fb = render_sharded_map(smap, new_pose, cfg.focal_x, cfg.focal_y,
                                cfg, mesh)
        new_state = (tuple(pyramid), new_pose, jnp.bool_(True), smap)
        return new_state, (fb, new_pose, total)

    # No in_shardings pins: the initial state is placed by slam_init_2d
    # (ShardedMap device_put over "map"; pose/flags replicated), frames by
    # the caller's device_put over "px", and the carried pyramid loops
    # back however the previous step's partitioner left it. Committed
    # argument shardings drive the SPMD partitioner directly.
    return jax.jit(fn)


def slam_init_2d(cfg: SLAMConfig, mesh: Mesh, map_center=(0.0, 0.0, 0.0),
                 initial_pose=None):
    """Initial (pyramid, pose, initialized, ShardedMap) for slam_step_2d."""
    from octree_slam_tpu import pipeline
    pose = (jnp.eye(4, dtype=jnp.float32) if initial_pose is None
            else jnp.asarray(initial_pose, jnp.float32))
    return (tuple(pipeline._empty_pyramid(cfg)), pose, jnp.bool_(False),
            make_sharded_map(cfg, mesh, map_center=map_center))


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
