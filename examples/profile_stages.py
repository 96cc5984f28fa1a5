"""Per-stage TPU timing of the SLAM step (SURVEY.md section 5 tracing).

Uses chained/donated calls so the axon result cache can't fake timings.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from octree_slam_tpu.utils import runtime
runtime.setup()

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.map import svo
from octree_slam_tpu.render import raycast
from octree_slam_tpu.render.splat import render_splat
from octree_slam_tpu.sensor import sources, tracking


def timeit_frames(name, fn, state0, frames, n=6):
    """fn(state, frame) -> (state, out); chained through state."""
    state, out = fn(state0, frames[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        state, out = fn(state, frames[(i + 1) % len(frames)])
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter() - t0) / n * 1000:9.2f} ms",
          flush=True)
    return state


def main():
    cfg = SLAMConfig(width=640, height=480, max_depth=9,
                     voxel_resolution=0.02, node_capacity=1 << 20)
    scene = sources.default_scene()
    frames = []
    poses = []
    for i in range(4):
        pose = sources.orbit_pose(i * 0.01, radius=2.0)
        f = sources.render_frame(scene, pose, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        jax.block_until_ready(f.depth)
        frames.append(f)
        poses.append(pose)

    # pyramid (chained via a running bias so calls differ)
    pyr_fn = jax.jit(lambda d, c: tracking.build_pyramid(d, c, cfg))

    def pyr_chain(s, f):
        p = pyr_fn(f.depth + s[1].astype(jnp.uint16), f.color)
        return (p, s[1] + 1), p[0].vertex
    timeit_frames("build_pyramid", pyr_chain, (None, jnp.int32(0)), frames)

    pyrs = [pyr_fn(f.depth, f.color) for f in frames]
    track_fn = jax.jit(lambda a, b: tracking.track(list(a), list(b), cfg))

    def track_chain(s, i):
        T, st = track_fn(tuple(pyrs[s % 4]), tuple(pyrs[(s + 1) % 4]))
        return s + 1, T
    state, out = 0, None
    jax.block_until_ready(track_fn(tuple(pyrs[0]), tuple(pyrs[1])))
    t0 = time.perf_counter()
    for i in range(6):
        _, T = track_chain(i, None)
    jax.block_until_ready(T)
    print(f"{'track (3 lvl, 19 iters)':34s} {(time.perf_counter() - t0) / 6 * 1000:9.2f} ms", flush=True)

    # insert chained through the pool
    insert_fn = jax.jit(
        lambda p, x, c: svo.insert(p, x, c, depth=cfg.max_depth,
                                   unique_cap=cfg.insert_unique_cap),
        donate_argnums=0)
    pool = svo.create(cfg.node_capacity, jnp.zeros(3), jnp.float32(5.12))

    def ins_chain(pool, f):
        i = int(jnp.sum(f.depth) % 4)
        v = pyrs[i][0].vertex.reshape(-1, 3)
        pts = v @ poses[i][:3, :3].T + poses[i][:3, 3]
        cols = f.color.reshape(-1, 3).astype(jnp.float32) / 255.0
        pool, st = insert_fn(pool, pts, cols)
        return pool, st.n_unique
    pool = timeit_frames("svo.insert (307k pts)", ins_chain, pool, frames)

    # splat render chained via pose jitter
    from octree_slam_tpu.render.splat import LeafList, append_new_leaves, \
        create_leaf_list
    leaves = create_leaf_list(cfg.leaf_capacity)
    _, st = svo.insert(pool, pyrs[0][0].vertex.reshape(-1, 3) @ poses[0][:3, :3].T
                       + poses[0][:3, 3],
                       frames[0].color.reshape(-1, 3).astype(jnp.float32) / 255.0,
                       depth=cfg.max_depth, unique_cap=cfg.insert_unique_cap)
    leaves = append_new_leaves(leaves, st)
    splat_fn = jax.jit(lambda T: render_splat(
        pool, leaves, T, cfg.focal_x, cfg.focal_y, width=cfg.width,
        height=cfg.height, depth=cfg.max_depth))

    def splat_chain(s, f):
        T = poses[s % 4]
        return s + 1, splat_fn(T + (s % 3) * 1e-6)
    _ = None
    jax.block_until_ready(splat_fn(poses[0]))
    t0 = time.perf_counter()
    for i in range(6):
        _, fb = splat_chain(i, None)
    jax.block_until_ready(fb)
    print(f"{'render_splat 640x480':34s} {(time.perf_counter() - t0) / 6 * 1000:9.2f} ms", flush=True)

    # cone trace with accel grid
    accel = jax.block_until_ready(raycast.build_accel(pool, level=6))
    cone_fn = jax.jit(lambda T: raycast.cone_trace(
        pool, T, cfg.focal_x, cfg.focal_y, width=cfg.width, height=cfg.height,
        max_depth=cfg.max_depth, max_iters=cfg.max_march_iters,
        accel=accel, accel_level=6))
    jax.block_until_ready(cone_fn(poses[0]))
    t0 = time.perf_counter()
    for i in range(3):
        fb = cone_fn(poses[i % 4] + (i % 3) * 1e-6)
    jax.block_until_ready(fb)
    print(f"{'cone_trace+accel 640x480':34s} {(time.perf_counter() - t0) / 3 * 1000:9.2f} ms", flush=True)

    # build_accel cost
    ba = jax.jit(lambda p, b: raycast.build_accel(
        p._replace(n_nodes=p.n_nodes + b), level=6))
    jax.block_until_ready(ba(pool, jnp.int32(0)))
    t0 = time.perf_counter()
    for i in range(3):
        a = ba(pool, jnp.int32(i))
    jax.block_until_ready(a)
    print(f"{'build_accel level 6':34s} {(time.perf_counter() - t0) / 3 * 1000:9.2f} ms", flush=True)

    # full step, donated
    step_fn = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="splat"),
                      donate_argnums=0)
    state = pipeline.init_state(cfg)
    state = state._replace(pose=jnp.array(poses[0], copy=True))
    timeit_frames("full step (splat)", step_fn, state, frames)

    step_cone = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="cone"),
                        donate_argnums=0)
    state = pipeline.init_state(cfg)
    state = state._replace(pose=jnp.array(poses[0], copy=True))
    timeit_frames("full step (cone)", step_cone, state, frames, n=3)


if __name__ == "__main__":
    main()
