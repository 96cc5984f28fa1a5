"""Trace the 1 cm FULL-RES (fuse_level=0) step: where do the ms go?"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import sys, time
import numpy as np, jax, jax.numpy as jnp
from octree_slam_tpu.utils import runtime
runtime.setup()
from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils.timing import sync

depth = int(sys.argv[1]) if len(sys.argv) > 1 else 9
# EXACTLY bench_configs.config_depth10's shapes so the persistent compile
# cache from a prior bench run answers instantly (a fresh tunnel compile
# of this program measured >30 min)
cfg = SLAMConfig(width=640, height=480, max_depth=depth,
                 voxel_resolution=0.01, use_dense_mips=False,
                 fuse_level=0, node_capacity=1 << 21,
                 leaf_capacity=1 << 19,
                 insert_unique_cap=1 << 18)
scene = sources.default_scene()
frames, gts = [], []
for i in range(8):
    gt = sources.orbit_pose(i * 0.01, radius=2.0)
    f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                             width=cfg.width, height=cfg.height)
    sync(f.depth)
    frames.append(f); gts.append(gt)
state = pipeline.init_state(cfg, initial_pose=gts[0])
step = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="cone"),
               donate_argnums=0)
for i in range(6):
    state, out = step(state, frames[i])
sync(out.framebuffer)
t0 = time.perf_counter()
state, out = step(state, frames[6])
sync(out.framebuffer)
print(f"warm frame: {(time.perf_counter()-t0)*1e3:.1f} ms (incl fetch)",
      flush=True)
tdir = f"/tmp/trace_fullres_d{depth}"
with jax.profiler.trace(tdir):
    state, out = step(state, frames[7])
    sync(out.framebuffer)
print("uniques last frame:", int(out.map_leaves), "nodes:",
      int(out.map_nodes), "uo:", bool(out.unique_overflow), flush=True)
print("trace:", tdir)
