"""Slab-cone quality/speed tradeoff: PSNR vs (n_slabs, max_scale).

The slab compositor approximates the exact per-ray march (its divergences
are documented in render/conesplat.py); `cone_slabs` and `cone_max_scale`
trade fidelity for composite-chain length and raster footprint. This sweep
builds the headline bench map once, renders the exact march as the
reference image, then measures each knob setting's PSNR against it and its
steady-state render rate. Output: one JSON line per setting.

Run on the real TPU: python examples/cone_quality_sweep.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from octree_slam_tpu.utils import runtime

runtime.setup()

import numpy as np
import jax
import jax.numpy as jnp

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.render import conesplat
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils.timing import sync

SETTINGS = [(8, 8), (16, 8), (24, 8), (16, 4), (32, 4)]


def main():
    cfg = SLAMConfig(width=640, height=480, max_depth=9,
                     voxel_resolution=0.02, node_capacity=1 << 20,
                     leaf_capacity=1 << 17)
    scene = sources.default_scene()
    frames = []
    for i in range(14):
        gt = sources.orbit_pose(i * 0.01, radius=2.0)
        f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        sync(f.depth)
        frames.append(f)

    # build the map + reference image with the exact march
    state = pipeline.init_state(cfg, initial_pose=sources.orbit_pose(0.0,
                                                                     radius=2.0))
    step = jax.jit(lambda s, f: pipeline.step(s, f, cfg,
                                              render="cone_march"),
                   donate_argnums=0)
    for f in frames:
        state, out = step(state, f)
    sync(out.framebuffer)
    ref = np.asarray(out.framebuffer)[..., :3]
    pose = state.pose
    leaves = state.leaves

    for n_slabs, max_scale in SETTINGS:
        spec = conesplat.make_slab_spec(
            width=cfg.width, height=cfg.height, fx=cfg.focal_x,
            leaf_size=cfg.voxel_resolution, z_near=cfg.cone_znear,
            z_far=cfg.max_range, n_slabs=n_slabs, max_scale=max_scale)
        render = jax.jit(lambda T, _spec=spec: conesplat.render_cone_splat(
            leaves, state.pool.center, state.pool.half_size, T,
            cfg.focal_x, cfg.focal_y, spec=_spec, depth=cfg.max_depth))
        fb = render(pose)
        sync(fb)
        img = np.asarray(fb)[..., :3]
        d = img - ref
        psnr = 10.0 * np.log10(1.0 / max(float((d ** 2).mean()), 1e-12))
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            fb = render(pose)
        sync(fb)
        dt = (time.perf_counter() - t0) / n
        print(json.dumps({
            "n_slabs": n_slabs, "max_scale": max_scale,
            "psnr_db_vs_exact_march": round(psnr, 2),
            "render_ms": round(dt * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
