"""Bisect the slow stages: scaling of cone_trace iterations and insert parts."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.map import morton, svo
from octree_slam_tpu.render import raycast
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils import compaction


def timeit(name, fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter() - t0) / n * 1e3:9.2f} ms")
    return out


def main():
    cfg = SLAMConfig(width=640, height=480, max_depth=9,
                     voxel_resolution=0.02, node_capacity=1 << 20)
    scene = sources.default_scene()
    pose = sources.orbit_pose(0.0, radius=2.0)
    frame = sources.render_frame(scene, pose, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
    from octree_slam_tpu.sensor import image_ops
    v = image_ops.generate_vertex_map(frame.depth, cfg.focal_x, cfg.focal_y,
                                      (cfg.width, cfg.height)).reshape(-1, 3)
    pts = v @ pose[:3, :3].T + pose[:3, 3]
    cols = frame.color.reshape(-1, 3).astype(jnp.float32) / 255.0
    pool = svo.create(cfg.node_capacity, jnp.zeros(3), jnp.float32(5.12))
    pool, _ = jax.block_until_ready(svo.insert(pool, pts, cols, depth=9))

    # --- cone_trace iteration scaling ---
    for iters in (1, 2, 4, 8, 16):
        fn = jax.jit(lambda p, T, it=iters: raycast.cone_trace(
            p, T, cfg.focal_x, cfg.focal_y, width=640, height=480,
            max_depth=9, max_iters=it))
        timeit(f"cone_trace max_iters={iters}", fn, pool, pose)

    # --- insert sub-stages ---
    n = pts.shape[0]
    keys, valid = morton.encode(pts, pool.center, pool.half_size, 9)

    timeit("morton encode", jax.jit(
        lambda p: morton.encode(p, pool.center, pool.half_size, 9)), pts)
    timeit("argsort + 2 gathers", jax.jit(
        lambda k, c: (lambda o: (k[o], c[o]))(jnp.argsort(k))), keys, cols)

    skeys = jnp.sort(keys)

    def levels_only(sk, child):
        cur = morton.octant_at(sk, 9, 1)
        out = cur
        for level in range(1, 9):
            tile = child[cur]
            octant = morton.octant_at(sk, 9, level + 1)
            cur = jnp.where(tile > 0, tile + octant, 0)
            out = out + cur
        return out
    timeit("descend 9 levels (gathers)", jax.jit(levels_only), skeys, pool.child)

    def alloc_level(sk, child, n_nodes):
        prefix = morton.level_prefix(sk, 9, 4)
        first = compaction.first_occurrence(prefix)
        cur = prefix & 0x7
        need = first & (child[cur] == 0)
        ranks, _ = compaction.exclusive_ranks(need)
        tile = n_nodes + 8 * ranks
        idx = jnp.where(need, cur, child.shape[0])
        return child.at[idx].set(tile, mode="drop")
    timeit("one alloc level (mask+cumsum+scatter)", jax.jit(alloc_level),
           skeys, pool.child, pool.n_nodes)

    def segmean(sk, c):
        first = compaction.first_occurrence(sk)
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        s = jax.ops.segment_sum(c, seg, num_segments=n)
        cnt = jax.ops.segment_sum(jnp.ones((n,)), seg, num_segments=n)
        return s[seg] / jnp.maximum(cnt[seg], 1)[:, None]
    timeit("segment mean", jax.jit(segmean), skeys, cols)

    def mip_level(child, value, sk):
        prefix = morton.level_prefix(sk, 9, 5)
        cur = jnp.clip(prefix, 0, child.shape[0] - 1)
        tile = child[cur]
        kid = tile[:, None] + jnp.arange(8, dtype=jnp.int32)[None]
        kv = value[kid]
        return jnp.sum(kv, axis=1)
    timeit("one mipmap level ([N,8] gather)", jax.jit(mip_level),
           pool.child, pool.value, skeys)

    timeit("full insert", jax.jit(lambda p, x, c: svo.insert(p, x, c, depth=9)),
           pool, pts, cols)


if __name__ == "__main__":
    main()
