"""Per-stage TPU timing of the SLAM step (SURVEY.md section 5 tracing)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.map import svo
from octree_slam_tpu.render import raycast
from octree_slam_tpu.sensor import sources, tracking


def timeit(name, fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt * 1000:9.2f} ms")
    return out


def main():
    cfg = SLAMConfig(width=640, height=480, max_depth=9,
                     voxel_resolution=0.02, node_capacity=1 << 20)
    scene = sources.default_scene()
    pose = sources.orbit_pose(0.0, radius=2.0)
    frame = sources.render_frame(scene, pose, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
    jax.block_until_ready(frame.depth)

    pyr = timeit("build_pyramid",
                 jax.jit(lambda d, c: tracking.build_pyramid(d, c, cfg)),
                 frame.depth, frame.color)

    track_fn = jax.jit(lambda a, b: tracking.track(list(a), list(b), cfg))
    timeit("track (3 lvl, 19 iters)", track_fn, tuple(pyr), tuple(pyr))

    pool = svo.create(cfg.node_capacity, jnp.zeros(3), jnp.float32(5.12))
    pts = (pyr[0].vertex.reshape(-1, 3) @ pose[:3, :3].T + pose[:3, 3])
    cols = frame.color.reshape(-1, 3).astype(jnp.float32) / 255.0
    insert_fn = jax.jit(lambda p, x, c: svo.insert(p, x, c, depth=cfg.max_depth))
    pool2, _ = timeit("svo.insert (307k pts)", insert_fn, pool, pts, cols)

    trace_fn = jax.jit(lambda p, T: raycast.cone_trace(
        p, T, cfg.focal_x, cfg.focal_y, width=cfg.width, height=cfg.height,
        max_depth=cfg.max_depth, max_iters=cfg.max_march_iters))
    timeit("cone_trace 640x480", trace_fn, pool2, pose)

    state = pipeline.init_state(cfg)
    state = state._replace(pose=pose)
    step_fn = jax.jit(lambda s, f: pipeline.step(s, f, cfg))
    state, _ = step_fn(state, frame)
    jax.block_until_ready(state.pool.child)
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        state, out = step_fn(state, frame)
    jax.block_until_ready(out.framebuffer)
    print(f"{'full step':28s} {(time.perf_counter() - t0) / n * 1000:9.2f} ms")


if __name__ == "__main__":
    main()
