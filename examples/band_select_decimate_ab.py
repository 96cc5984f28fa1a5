"""Band-select decimation A/B: full-pipeline fresh FPS + PSNR at the knee
(round-5 measured: decimate=False 18.58 FPS / 29.09 dB vs True 17.89 /
29.03 — REJECTED as default; config.py cone_band_sel_decimate)."""
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
for i in range(24):
    gt = sources.orbit_pose(0.14 + i * 0.01, radius=2.0)
    f = sources.render_frame(scene, gt, base.focal_x, base.focal_y,
                             width=base.width, height=base.height)
    sync(f.depth); fresh.append(f)

def floor():
    fj = jax.jit(lambda x: x + 1); x = fj(jnp.zeros((8,128))); sync(x)
    t0 = time.perf_counter()
    for _ in range(8): x = fj(x); sync(x)
    return (time.perf_counter()-t0)/8

state0 = pipeline.init_state(base, initial_pose=warm[0][0])
stepn = jax.jit(lambda s, f: pipeline.step(s, f, base, render="splat"),
                donate_argnums=0)
for gt, f in warm[:-1]:
    state0, _ = stepn(state0, f)
sync(state0.pose)
sm = jax.tree_util.tree_map(jnp.copy, state0)
_, out_m = pipeline.step(sm, warm[-1][1], base, render="cone_march")
ref = np.asarray(out_m.framebuffer)[..., :3]

for dec in (False, True):
    cfg = dataclasses.replace(base, cone_band_sel_decimate=dec)
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
    sh = jax.tree_util.tree_map(jnp.copy, state0)
    _, out_h = pipeline.step(sh, warm[-1][1], cfg, render="cone_hybrid")
    d = np.asarray(out_h.framebuffer)[..., :3] - ref
    psnr = 10.0 * np.log10(1.0 / max(float((d ** 2).mean()), 1e-12))
    print(json.dumps({"sel_decimate": dec, "fresh_fps": round(1.0/dt, 2),
                      "ms": round(dt*1e3, 1), "psnr_db": round(psnr, 2)}),
          flush=True)
