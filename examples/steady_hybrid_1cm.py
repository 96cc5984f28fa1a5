"""Quality mode in the production steady-state regime: cone_hybrid on a
SATURATED strict-1 cm map (the saturation-gate methodology of
bench_configs --config satgate, render=cone_hybrid).

At steady state no frame adds leaves, so the hybrid's whole
mirror-maintenance bill (the 5.6 ms scatter, the ~8.5 ms stamp sweep,
the dist refresh) vanishes — the regime the fused single-gather design
targets. Round-5 measured (real TPU, 2026-08-20): see BASELINE.md
"steady-state hybrid" entry.

Run (real TPU): python examples/steady_hybrid_1cm.py
"""
import sys, time, json, pathlib, dataclasses
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from octree_slam_tpu.utils import runtime
runtime.setup()
import jax, jax.numpy as jnp, numpy as np
from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils.timing import sync

N_WARM, N_TIMED = 72, 8
cfg = SLAMConfig(width=640, height=480, max_depth=9,
                 voxel_resolution=0.01, fuse_level=0,
                 node_capacity=1 << 21, leaf_capacity=1 << 19,
                 insert_unique_cap=1 << 16, saturation_gate=True,
                 cone_band_cap=57600, cone_band_iters=24)
scene = sources.default_scene()
n = N_WARM + N_TIMED
frames, gts = [], []
for i in range(n):
    gt = sources.orbit_pose(i * 0.004, radius=2.0)
    f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                             width=cfg.width, height=cfg.height)
    sync(f.depth)
    frames.append(f)
    gts.append(gt)

def floor():
    fj = jax.jit(lambda x: x + 1); x = fj(jnp.zeros((8,128))); sync(x)
    t0 = time.perf_counter()
    for _ in range(8): x = fj(x); sync(x)
    return (time.perf_counter()-t0)/8

out_line = {}
for mode in ("cone_hybrid", "cone"):
    state = pipeline.init_state(cfg, initial_pose=gts[0])
    step = jax.jit(lambda s, f, m=mode: pipeline.step(s, f, cfg, render=m),
                   donate_argnums=0)
    t0 = time.perf_counter()
    for i in range(N_WARM):
        state, out = step(state, frames[i])
    sync(out.framebuffer)
    warm_s = time.perf_counter() - t0
    fl = floor()
    t0 = time.perf_counter()
    for i in range(N_WARM, n):
        state, out = step(state, frames[i])
    sync(out.framebuffer)
    dt = (time.perf_counter() - t0 - fl) / N_TIMED
    out_line[f"{mode}_steady_fps"] = round(1.0 / dt, 2)
    out_line[f"{mode}_steady_ms"] = round(dt * 1e3, 1)
    out_line[f"{mode}_warm_fps"] = round(N_WARM / warm_s, 2)
    assert not bool(out.diverged)
out_line.update({"config": "steady_hybrid_1cm", "voxel_m": 0.01,
                 "band_cap": 57600, "band_iters": 24,
                 "map_leaves": int(out.map_leaves)})
print(json.dumps(out_line))
