"""Per-stage TPU timing of the SLAM step (SURVEY.md section 5 tracing).

Timing on the axon remote platform MUST force a host fetch per measurement
(utils.timing.sync): block_until_ready returns before the computation runs.
Calls are chained through state so results can't be served from any cache.
"""

import functools
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
from octree_slam_tpu.utils.timing import sync


def bench_chain(name, fn, state0, n=4):
    """fn(state, i) -> state', where state' depends on the whole stage.
    Syncs (host fetch) once per iteration; reports mean ms."""
    state = fn(state0, 0)
    sync(state)
    t0 = time.perf_counter()
    for i in range(n):
        state = fn(state, i + 1)
        sync(state)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt * 1000:9.1f} ms", flush=True)
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
        sync(f.depth)
        frames.append(f)
        poses.append(pose)
    print("frames ready", flush=True)

    # --- pyramid ---
    # All chain perturbations and output probes live INSIDE the jit: any
    # eager op on a large device array per iteration (a `fb[0, 0]` slice,
    # a full-size astype) dispatches through the tunnel at ~100-500 ms —
    # orders of magnitude over the stage being measured (see the splat
    # block's receipts below).
    pyr_fn = jax.jit(lambda d, c: tracking.build_pyramid(d, c, cfg))
    pyr_probe = jax.jit(lambda d, c: tracking.build_pyramid(d, c, cfg)[0]
                        .vertex.astype(jnp.uint16)[:1, :1, 0])
    bench_chain(
        "build_pyramid",
        lambda s, i: pyr_probe(frames[i % 4].depth + s, frames[i % 4].color),
        jnp.zeros((1, 1), jnp.uint16))

    pyrs = [pyr_fn(f.depth, f.color) for f in frames]
    sync(pyrs)

    # --- track ---
    track_fn = jax.jit(
        lambda a, b, eps: tracking.track(
            [l._replace(vertex=l.vertex + eps) for l in a], list(b), cfg))
    bench_chain(
        "track (3 lvl, 19 GN iters)",
        lambda s, i: track_fn(tuple(pyrs[i % 3]), tuple(pyrs[(i + 1) % 3]),
                              s[0, 0] * 1e-9)[0],
        jnp.zeros((4, 4), jnp.float32))

    # --- insert ---
    def _ins_body(p, vtx, T, color, **kw):
        # the world transform + color scaling run IN-JIT, as in the
        # pipeline (eager per-frame math pays tunnel dispatch, see above)
        pts = vtx.reshape(-1, 3) @ T[:3, :3].T + T[:3, 3]
        cols = color.reshape(-1, 3).astype(jnp.float32) / 255.0
        return svo.insert(p, pts, cols, depth=cfg.max_depth,
                          unique_cap=cfg.insert_unique_cap, **kw)

    insert_fn = jax.jit(_ins_body, donate_argnums=0)
    pool0 = svo.create(cfg.node_capacity, jnp.zeros(3), jnp.float32(5.12))

    def ins(pool, i):
        pool, st = insert_fn(pool, pyrs[i % 4][0].vertex, poses[i % 4],
                             frames[i % 4].color)
        return pool
    pool = bench_chain("svo.insert eager (307k pts)", ins, pool0)

    # the production SLAM loop inserts lazily (cfg.lazy_interior): the
    # bottom-up mipmap + mirror emission are deferred
    insert_lazy_fn = jax.jit(
        functools.partial(_ins_body, update_interior=False),
        donate_argnums=0)

    def ins_lazy(pool, i):
        pool, st = insert_lazy_fn(pool, pyrs[i % 4][0].vertex, poses[i % 4],
                                  frames[i % 4].color)
        return pool
    pool = bench_chain("svo.insert lazy-interior", ins_lazy, pool)
    # lazy inserts leave interiors stale; the marcher below reads them
    # (CLAUDE.md invariant: refresh before any BFS/march)
    pool = svo.refresh_interior(pool, depth=cfg.max_depth)

    # --- splat render ---
    from octree_slam_tpu.render.splat import append_new_leaves, \
        create_leaf_list
    leaves = create_leaf_list(cfg.leaf_capacity, cfg.node_capacity)
    _, st = jax.jit(_ins_body)(pool, pyrs[0][0].vertex, poses[0],
                               frames[0].color)
    leaves = append_new_leaves(leaves, st)
    sync(leaves)
    # Two measured hazards shaped this block (receipts in the repo log):
    #  * the map state must be an ARGUMENT, not a closure capture — a
    #    jit-captured pool/registry is embedded as a constant;
    #  * the anti-caching chain perturbation must happen INSIDE the jit:
    #    an EAGER `prev_fb[0, 0]` slice of the previous framebuffer
    #    dispatched through the axon tunnel measured ~500 ms/frame
    #    (547 ms chained vs 44 ms unchained), 100x the render itself.
    splat_fn = jax.jit(lambda p, l, T, prev: render_splat(
        p, l, T + prev.ravel()[0] * 1e-9, cfg.focal_x, cfg.focal_y,
        width=cfg.width, height=cfg.height, depth=cfg.max_depth))
    # seed the chain with an output-SHAPED zero: a shape change in `prev`
    # between warmup and the timed loop would put a recompile on the clock
    fb0 = jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)
    bench_chain("render_splat 640x480",
                lambda s, i: splat_fn(pool, leaves, poses[i % 4], s), fb0)

    # --- slab-cone render (the production cone path) ---
    from octree_slam_tpu.render import conesplat
    spec = conesplat.make_slab_spec(
        width=cfg.width, height=cfg.height, fx=cfg.focal_x,
        leaf_size=cfg.voxel_resolution, z_near=cfg.cone_znear,
        z_far=cfg.max_range, n_slabs=cfg.cone_slabs,
        max_scale=cfg.cone_max_scale)
    cone_splat_fn = jax.jit(lambda l, c, h, T: conesplat.render_cone_splat(
        l, c, h, T, cfg.focal_x, cfg.focal_y,
        spec=spec, depth=cfg.max_depth))
    cone_splat_fn2 = jax.jit(
        lambda l, c, h, T, prev: conesplat.render_cone_splat(
            l, c, h, T + prev.ravel()[0] * 1e-9, cfg.focal_x, cfg.focal_y,
            spec=spec, depth=cfg.max_depth))
    bench_chain("cone splat (slab) 640x480",
                lambda s, i: cone_splat_fn2(leaves, pool.center,
                                            pool.half_size, poses[i % 4], s),
                fb0)

    # --- exact cone march (reference-semantics control) ---
    accel = raycast.build_accel(pool, level=6)
    sync(accel)
    cone_fn = jax.jit(lambda p, a, T, prev: raycast.cone_trace(
        p, T + prev.ravel()[0] * 1e-9, cfg.focal_x, cfg.focal_y,
        width=cfg.width, height=cfg.height,
        max_depth=cfg.max_depth, max_iters=cfg.max_march_iters,
        accel=a, accel_level=6))
    bench_chain("cone_trace+accel 640x480",
                lambda s, i: cone_fn(pool, accel, poses[i % 4], s),
                fb0, n=2)

    ba = jax.jit(lambda p, b: raycast.build_accel(
        p._replace(n_nodes=p.n_nodes + b[0, 0]), level=6))

    def ba_chain(s, i):
        out = ba(pool, s)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return (leaf.reshape(-1)[:1].astype(jnp.int32) * 0).reshape(1, 1)
    bench_chain("build_accel level 6", ba_chain,
                jnp.zeros((1, 1), jnp.int32), n=2)

    # --- full steps ---
    step_fn = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="splat"),
                      donate_argnums=0)
    state = pipeline.init_state(cfg)
    state = state._replace(pose=jnp.array(poses[0], copy=True))
    bench_chain("full step (splat)",
                lambda s, i: step_fn(s, frames[i % 4])[0], state)

    step_cone = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="cone"),
                        donate_argnums=0)
    state = pipeline.init_state(cfg)
    state = state._replace(pose=jnp.array(poses[0], copy=True))
    bench_chain("full step (cone)",
                lambda s, i: step_cone(s, frames[i % 4])[0], state, n=2)


if __name__ == "__main__":
    main()
