"""A/B receipt: eager per-frame ops vs in-jit on the axon tunnel.

Root-caused the profile_stages render_splat anomaly (~450-550 ms/frame
"render" vs ~2 ms inside the step): the benchmark's anti-caching chain fed
the previous FRAMEBUFFER back through an EAGER `fb[0, 0]` slice, and eager
ops on large device arrays dispatch through the tunnel at ~100-500 ms each.
Measured 2026-08-18: render_splat 44 ms/frame with a plain pose argument
(the RTT floor plus the ~4 ms render) vs 547 ms with the eager-chained
pose. Rule: keep ALL per-frame math inside jitted functions (CLAUDE.md)."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from octree_slam_tpu.utils import runtime
runtime.setup()

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.map import svo
from octree_slam_tpu.render import splat as sp
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils.timing import sync


def timed(name, fn, n=6):
    fn(0)
    sync(fn(1))
    t0 = time.perf_counter()
    for i in range(n):
        sync(fn(i))
    print(f"{name:44s} {(time.perf_counter() - t0) / n * 1e3:8.1f} ms",
          flush=True)


def main():
    cfg = SLAMConfig(width=640, height=480, max_depth=9,
                     voxel_resolution=0.02, node_capacity=1 << 20)
    scene = sources.default_scene()
    pose = sources.orbit_pose(0.0, radius=2.0)
    f = sources.render_frame(scene, pose, cfg.focal_x, cfg.focal_y,
                             width=cfg.width, height=cfg.height)
    sync(f.depth)

    from octree_slam_tpu.sensor import tracking
    pyr = jax.jit(lambda d, c: tracking.build_pyramid(d, c, cfg))(
        f.depth, f.color)
    v = pyr[0].vertex.reshape(-1, 3)
    pts = v @ pose[:3, :3].T + pose[:3, 3]
    cols = f.color.reshape(-1, 3).astype(jnp.float32) / 255.0

    pool = svo.create(cfg.node_capacity, jnp.zeros(3), jnp.float32(5.12))
    pool, st = jax.jit(
        lambda p, x, c: svo.insert(p, x, c, depth=cfg.max_depth,
                                   unique_cap=cfg.insert_unique_cap))(
        pool, pts, cols)
    leaves = sp.create_leaf_list(cfg.leaf_capacity, cfg.node_capacity)
    leaves = sp.append_new_leaves(leaves, st)
    sync(pool, leaves)
    print("leaves:", int(leaves.count), flush=True)

    poses = [sources.orbit_pose(i * 0.01, radius=2.0) for i in range(4)]
    poses = [jnp.asarray(p) for p in poses]
    sync(poses)

    # 1. the full render_splat, pose varied WITHOUT feeding back the fb
    rs = jax.jit(lambda p, l, T: sp.render_splat(
        p, l, T, cfg.focal_x, cfg.focal_y, width=cfg.width,
        height=cfg.height, depth=cfg.max_depth))
    timed("render_splat (plain pose arg)", lambda i: rs(pool, leaves,
                                                        poses[i % 4]))

    # 2. zbuffer only
    lc = leaves.keys.shape[0]
    zb = jax.jit(lambda l, c, h, T: sp.splat_zbuffer(
        l.vals, l.keys, (jnp.arange(lc) < l.count) & (l.keys >= 0),
        c, h, T, cfg.focal_x, cfg.focal_y, width=cfg.width,
        height=cfg.height, depth=cfg.max_depth))
    timed("splat_zbuffer only", lambda i: zb(leaves, pool.center,
                                             pool.half_size, poses[i % 4]))

    # 3. finish only
    buf = zb(leaves, pool.center, pool.half_size, poses[0])
    sync(buf)
    fin = jax.jit(lambda b, T: sp.finish_zbuffer(
        b + (T[0, 0] * 0).astype(jnp.int32), width=cfg.width,
        height=cfg.height))
    timed("finish_zbuffer only", lambda i: fin(buf, poses[i % 4]))

    # 4. full render_splat with the fb fed back into the pose (the
    #    profile_stages chaining pattern)
    def chain(i, _s=[jnp.zeros((4, 4), jnp.float32)]):
        out = rs(pool, leaves, poses[i % 4] + _s[0].ravel()[0] * 1e-9)
        _s[0] = out
        return out
    timed("render_splat (fb-chained pose)", chain)


if __name__ == "__main__":
    main()
