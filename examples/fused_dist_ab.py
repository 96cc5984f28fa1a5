"""Fresh-stream full-pipeline A/B: fused-dist stamps vs two-gather trips
(round-5 measured: fused 54.7 ms vs two-gather 52.1 ms per frame at the
57600/24 knee — a wash; BASELINE.md round-5)."""
import sys, time, json, dataclasses
sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parents[1]))
from octree_slam_tpu.utils import runtime
runtime.setup()
import jax, jax.numpy as jnp, numpy as np
from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils.timing import sync

base = SLAMConfig(width=640, height=480, max_depth=9, voxel_resolution=0.02,
                  node_capacity=1 << 20, leaf_capacity=1 << 17,
                  cone_band_cap=57600, cone_band_iters=24)
scene = sources.default_scene()
warm, fresh = [], []
for i in range(14):
    gt = sources.orbit_pose(i * 0.01, radius=2.0)
    f = sources.render_frame(scene, gt, base.focal_x, base.focal_y,
                             width=base.width, height=base.height)
    sync(f.depth); warm.append((gt, f))
for i in range(32):
    gt = sources.orbit_pose(0.14 + i * 0.01, radius=2.0)
    f = sources.render_frame(scene, gt, base.focal_x, base.focal_y,
                             width=base.width, height=base.height)
    sync(f.depth); fresh.append(f)

def floor():
    fj = jax.jit(lambda x: x + 1); x = fj(jnp.zeros((8,128))); sync(x)
    t0 = time.perf_counter()
    for _ in range(8): x = fj(x); sync(x)
    return (time.perf_counter()-t0)/8

out = {}
for name, fused in [("fused", True), ("two_gather", False)]:
    cfg = dataclasses.replace(base, cone_band_fused_dist=fused)
    step = jax.jit(lambda s, f, c=cfg: pipeline.step(s, f, c,
                                                     render="cone_hybrid"),
                   donate_argnums=0)
    state = pipeline.init_state(cfg, initial_pose=warm[0][0])
    for gt, f in warm:
        state, o = step(state, f)
    sync(o.framebuffer)
    fl = floor()
    t0 = time.perf_counter()
    for f in fresh:
        state, o = step(state, f)
    sync(o.framebuffer)
    dt = (time.perf_counter() - t0 - fl) / len(fresh)
    out[f"{name}_fresh_fps"] = round(1.0/dt, 2)
    out[f"{name}_ms"] = round(dt*1e3, 1)
print(json.dumps(out))
