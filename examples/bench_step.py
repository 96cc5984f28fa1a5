import sys; sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import time
import jax, jax.numpy as jnp
import numpy as np
from octree_slam_tpu.utils import runtime
runtime.setup()
from octree_slam_tpu.utils.timing import sync
from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.sensor import sources

cfg = SLAMConfig(width=640, height=480, max_depth=9, voxel_resolution=0.02,
                 node_capacity=1 << 20)
scene = sources.default_scene()
frames, poses = [], []
for i in range(6):
    p = sources.orbit_pose(i*0.01, radius=2.0)
    f = sources.render_frame(scene, p, cfg.focal_x, cfg.focal_y,
                             width=cfg.width, height=cfg.height)
    sync(f); frames.append(f); poses.append(p)

def floor_ms(n=8):
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.float32); x = f(x); sync(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x); sync(x)
    return (time.perf_counter()-t0)/n*1e3

print(f"sync floor: {floor_ms():.1f} ms", flush=True)
step = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="splat"), donate_argnums=0)
st = pipeline.init_state(cfg, initial_pose=poses[0])
st, out = step(st, frames[0]); sync(out.framebuffer)
for trial in range(3):
    t0 = time.perf_counter()
    for i in range(4):
        st, out = step(st, frames[(i+1) % 6])
        sync(out.framebuffer)
    print(f"step(splat) trial{trial}: {(time.perf_counter()-t0)/4*1e3:.1f} ms (incl floor)", flush=True)
print(f"sync floor after: {floor_ms():.1f} ms", flush=True)
