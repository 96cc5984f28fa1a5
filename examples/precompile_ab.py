"""A/B: growth-stall with and without compile-ahead (cfg.precompile_ahead).

Map growth doubles node capacity, which changes shapes and recompiles the
jitted step — minutes through the axon tunnel (unstable compile-cache
keys). Compile-ahead (app.precompile_step) starts that compile in a
background thread when the pool crosses HALF full, so by the time the 3/4
growth trigger fires the executable is ready and the swap is free.

The scenario gives the background compile realistic lead time: the camera
sweeps to just under the growth threshold, DWELLS revisiting seen space
(SLAM cameras linger and loop — node count stays flat, only leaf alphas
update), then sweeps on, crossing 3/4 and triggering growth. With the
flag on, the dwell hides the compile and the growth frame costs one step
(growth_frame_s ~ steady frame time); with it off, the growth frame
stalls for the full remote compile.

Run: python examples/precompile_ab.py [--dwell-s 300] [--skip-off|--skip-on]
     [--mode serial|concurrent]
Prints one JSON line per arm.

--mode serial (default): the ON arm AOT-compiles the post-growth step and
JOINS it before the run starts, then sweeps straight through the growth —
isolating the question "does the ready executable make the growth swap
free?" from tunnel concurrency. On the axon tunnel this is the safe
variant: a minutes-long background compile racing a stream of step
executions has been observed to wedge the remote orchestrator (the toy
concurrency measurement in app.py's compile-ahead comment used a 1.8 s
compile and behaved; the full-step compile did not). --mode concurrent
exercises the production path (trigger at half-full, dwell hides the
compile) and is the honest end-to-end test on real, untunneled hardware.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from octree_slam_tpu.utils import runtime

runtime.setup()

from octree_slam_tpu import app
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.sensor import sources


def _fresh_caches():
    """Each arm must pay its own compiles: drop in-process step caches and
    the on-disk persistent cache (otherwise the OFF arm's growth recompile
    silently reuses what the ON arm just built, and the A/B collapses)."""
    import jax
    # an ON-arm background compile still in flight must finish before the
    # OFF arm's timed region starts, or it competes for CPU during the
    # baseline's growth-stall measurement
    for ev in list(app._aot_inflight.values()):
        ev.wait(timeout=1800)
    app._step_cache.clear()
    app._aot_cache.clear()
    try:
        jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        pass


def run_arm_serial(precompile: bool, sweep_step: float = 0.06):
    """Growth-stall A/B with the precompile joined BEFORE the run: sweep
    30 frames straight through the 3/4 threshold; growth_frame_s is the
    swap cost (ON: executable ready -> ~one step; OFF: full recompile)."""
    import dataclasses
    _fresh_caches()
    cfg = SLAMConfig(width=320, height=240, max_depth=8,
                     voxel_resolution=0.02, node_capacity=1 << 17,
                     leaf_capacity=1 << 17, precompile_ahead=False)
    if precompile:
        nxt = dataclasses.replace(cfg, node_capacity=cfg.node_capacity * 2)
        t0 = time.perf_counter()
        th = app.precompile_step(nxt, "none")
        if th is not None:
            th.join()
        print(json.dumps({"event": "precompile_joined",
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    scene = sources.default_scene()

    def frame_fn(i):
        return sources.render_frame(
            scene, sources.orbit_pose(i * sweep_step),
            cfg.focal_x, cfg.focal_y, width=cfg.width, height=cfg.height)

    t0 = time.perf_counter()
    res = app.run_slam(frame_fn, 30, cfg,
                       initial_pose=sources.orbit_pose(0.0),
                       render_every=0)
    wall = time.perf_counter() - t0
    print(json.dumps({
        "arm": "precompile_on" if precompile else "precompile_off",
        "mode": "serial",
        "wall_s": round(wall, 1),
        "steady_fps": round(res.steady_fps, 2),
        "frames": res.frames,
        "grew": res.final_cfg.node_capacity > cfg.node_capacity,
        "final_node_capacity": res.final_cfg.node_capacity,
        "max_frame_s": round(res.max_frame_s, 3),
        "growth_frame_s": round(res.growth_frame_s, 3)
        if res.growth_frame_s is not None else None,
        "diverged": res.diverged,
    }), flush=True)


def run_arm(precompile: bool, dwell_s: float, sweep_step: float = 0.06):
    # 1<<17-node pool at 320x240/depth 8/2 cm: frame 0 lands just under
    # HALF full (~64.7k nodes -> the compile-ahead trigger fires at frame
    # 1), frames 0-7 stay under 3/4 (98.3k; ~+3.7k nodes/frame while
    # sweeping), so growth fires a few frames after the dwell ends
    _fresh_caches()
    cfg = SLAMConfig(width=320, height=240, max_depth=8,
                     voxel_resolution=0.02, node_capacity=1 << 17,
                     leaf_capacity=1 << 17,
                     precompile_ahead=precompile)
    scene = sources.default_scene()

    st = {"dwell_t0": None, "dwell_frames": 0, "sweep2_base": None}

    def orbit_index(i):
        """Three phases: sweep 8 frames, dwell by wall clock, sweep on."""
        if i < 8:
            return i
        if st["sweep2_base"] is not None:
            return 8 + (i - st["sweep2_base"])
        if st["dwell_t0"] is None:
            st["dwell_t0"] = time.perf_counter()
            print(json.dumps({"event": "dwell_start", "frame": i}),
                  flush=True)
        if time.perf_counter() - st["dwell_t0"] < dwell_s:
            st["dwell_frames"] += 1
            return 7
        st["sweep2_base"] = i
        print(json.dumps({"event": "dwell_end", "frame": i,
                          "dwell_frames": st["dwell_frames"]}), flush=True)
        return 8

    def frame_fn(i):
        return sources.render_frame(
            scene, sources.orbit_pose(orbit_index(i) * sweep_step),
            cfg.focal_x, cfg.focal_y, width=cfg.width, height=cfg.height)

    def stop_fn(i):
        # run enough frames past the dwell to cross 3/4 AND step through
        # the growth swap (the swap lands on the frame after the grow
        # event, which itself trails the threshold by the packed-read lag)
        return st["sweep2_base"] is not None and i > st["sweep2_base"] + 18

    t0 = time.perf_counter()
    res = app.run_slam(frame_fn, 10 ** 7, cfg,
                       initial_pose=sources.orbit_pose(0.0),
                       render_every=0, stop_fn=stop_fn)
    wall = time.perf_counter() - t0
    grew = res.final_cfg.node_capacity > cfg.node_capacity
    print(json.dumps({
        "arm": "precompile_on" if precompile else "precompile_off",
        "wall_s": round(wall, 1),
        "steady_fps": round(res.steady_fps, 2),
        "dwell_frames": st["dwell_frames"],
        "frames": res.frames,
        "grew": grew,
        "final_node_capacity": res.final_cfg.node_capacity,
        "max_frame_s": round(res.max_frame_s, 3),
        "growth_frame_s": round(res.growth_frame_s, 3)
        if res.growth_frame_s is not None else None,
        "diverged": res.diverged,
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dwell-s", type=float, default=300.0)
    p.add_argument("--mode", choices=["serial", "concurrent"],
                   default="serial")
    p.add_argument("--skip-off", action="store_true")
    p.add_argument("--skip-on", action="store_true")
    args = p.parse_args()
    if args.mode == "serial":
        if not args.skip_on:
            run_arm_serial(True)
        if not args.skip_off:
            run_arm_serial(False)
        return
    if not args.skip_on:
        run_arm(True, args.dwell_s)
    if not args.skip_off:
        run_arm(False, args.dwell_s)


if __name__ == "__main__":
    main()
