"""Hybrid band-march knob sweep: (band_cap, band_iters) -> PSNR + fps.

Round-4 tuning for the >=30 dB at >=30 FPS headline bar: the first hybrid
measurement (band_cap=n/4=76800, band_iters=24) hit 30.21 dB but only
14.3 FPS full-pipeline — the band march costs ~1.9 ms/trip at quarter-image
width. This sweeps the two knobs on ONE map built in-process (each variant
is its own jit; the map + the exact-march reference render once), printing
one JSON line per variant plus a summary, so the production default can sit
at the measured knee.

Run (real TPU): python examples/hybrid_sweep.py
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from octree_slam_tpu.utils import runtime

runtime.setup()

import jax
import jax.numpy as jnp

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.render import conesplat, hybrid
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils.timing import sync


def sync_floor(n=8):
    f = jax.jit(lambda x: x + 1)
    x = f(jnp.zeros((8, 128), jnp.float32))
    sync(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
        sync(x)
    return (time.perf_counter() - t0) / n


def psnr_db(a, b):
    d = np.asarray(a)[..., :3] - np.asarray(b)[..., :3]
    return 10.0 * np.log10(1.0 / max(float((d ** 2).mean()), 1e-12))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default=None,
                   help="comma list of cap:iters[:crawl] triples, "
                        "e.g. 76800:12,38400:8:4")
    p.add_argument("--accel-level", type=int, default=6,
                   help="dist-grid level for both the map build and the "
                        "band march (7 = 4x finer occupied blocks)")
    p.add_argument("--fused", action="store_true",
                   help="single-gather band trips (fused_dist; the "
                        "pipeline stamped the map's free cells)")
    p.add_argument("--depth-prio", type=float, default=0.0,
                   help="z_first-discontinuity band-priority weight")
    args = p.parse_args()

    cfg = SLAMConfig(width=640, height=480, max_depth=9,
                     voxel_resolution=0.02, node_capacity=1 << 20,
                     leaf_capacity=1 << 17, accel_level=args.accel_level)
    scene = sources.default_scene()
    frames = []
    for i in range(14):
        gt = sources.orbit_pose(i * 0.01, radius=2.0)
        f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        sync(f.depth)
        frames.append(f)

    # clean single-pass map (bench.py fidelity methodology)
    state = pipeline.init_state(cfg, initial_pose=sources.orbit_pose(0.0))
    step = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="splat"),
                   donate_argnums=0)
    for i in range(13):
        state, out = step(state, frames[i])
    sync(out.pose)
    import dataclasses
    s_march = jax.tree_util.tree_map(jnp.copy, state)
    _, out_m = pipeline.step(s_march, frames[13], cfg, render="cone_march")
    ref = np.asarray(out_m.framebuffer)
    # track the last frame once so every variant renders from its pose on
    # the SAME fused map
    s_h = jax.tree_util.tree_map(jnp.copy, state)
    st_h, out_h = pipeline.step(s_h, frames[13], cfg, render="cone_hybrid")
    sync(out_h.framebuffer)
    pose = out_h.pose
    lvl = pipeline._accel_level(cfg)

    spec = conesplat.make_slab_spec(
        width=cfg.width, height=cfg.height, fx=cfg.focal_x,
        leaf_size=cfg.voxel_resolution, z_near=cfg.cone_znear,
        z_far=cfg.max_range, n_slabs=cfg.cone_slabs,
        max_scale=cfg.cone_max_scale)

    # slab baseline (cap 0 handled as pure conesplat)
    fn_s = jax.jit(lambda st, T: conesplat.render_cone_splat(
        st.leaves, st.pool.center, st.pool.half_size, T, cfg.focal_x,
        cfg.focal_y, spec=spec, depth=cfg.max_depth))
    fb = fn_s(st_h, pose)
    sync(fb)
    fl = sync_floor()
    t0 = time.perf_counter()
    for _ in range(5):
        fb = fn_s(st_h, pose)
    sync(fb)
    dt = (time.perf_counter() - t0 - fl) / 5
    print(json.dumps({"variant": "slab", "render_ms": round(dt * 1e3, 2),
                      "psnr_db": round(psnr_db(fb, ref), 2)}), flush=True)

    if args.variants:
        variants = [tuple(int(x) for x in v.split(":"))
                    for v in args.variants.split(",")]
        variants = [v if len(v) == 3 else (v[0], v[1], 1) for v in variants]
    else:
        variants = [(76800, 12, 1), (38400, 24, 1), (38400, 16, 1),
                    (38400, 12, 1), (38400, 8, 1), (19200, 24, 1),
                    (19200, 12, 1)]

    rows = []
    for cap, iters, crawl in variants:
        def rh(st, T, _c=cap, _i=iters, _k=crawl):
            return hybrid.render_cone_hybrid(
                st.leaves, st.accel, st.pool.center, st.pool.half_size, T,
                cfg.focal_x, cfg.focal_y, spec=spec, depth=cfg.max_depth,
                dist_level=lvl, band_cap=_c, band_iters=_i, crawl=_k,
                fused_dist=args.fused, depth_prio=args.depth_prio,
                compact_after=cfg.cone_band_compact_after)

        fn = jax.jit(rh)
        fb = fn(st_h, pose)
        sync(fb)
        fl = sync_floor()
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            fb = fn(st_h, pose)
        sync(fb)
        dt = (time.perf_counter() - t0 - fl) / n
        row = {"variant": f"cap{cap}_it{iters}_k{crawl}"
                          f"{'_fused' if args.fused else ''}"
                          f"{'_dp%g' % args.depth_prio if args.depth_prio else ''}",
               "band_cap": cap,
               "band_iters": iters, "crawl": crawl, "fused": args.fused,
               "depth_prio": args.depth_prio,
               "accel_level": args.accel_level,
               "render_ms": round(dt * 1e3, 2),
               "render_fps": round(1.0 / dt, 2),
               "psnr_db": round(psnr_db(fb, ref), 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"config": "hybrid_sweep", "slab_ref": True,
                      "accel_level": args.accel_level,
                      "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
