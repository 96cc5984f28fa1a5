"""Headline benchmark: track + fuse + render FPS at 640x480 on one chip.

Runs the full SLAM step (point-to-plane ICP over a 3-level pyramid with the
reference's {10,5,4} iteration schedule, SVO fusion at depth 9, map render)
on a synthetic orbit stream, steady-state, and prints ONE JSON line.
Baseline: the driver target of 30 FPS (BASELINE.json north_star; the
reference publishes no numbers, BASELINE.md).

Timing notes: jax.block_until_ready does NOT block on this environment's
axon remote-TPU platform, so every timed frame is closed by an actual
host fetch (utils.timing.sync) and the measured per-frame sync round-trip
floor (~30 ms of tunnel latency, not TPU work) is reported separately and
subtracted: `value` is the device-side frame rate 1/(t_frame - t_sync).

The headline value uses the real-time voxel-splat map render; the
cone-traced render mode (slab-volume splatting, render/conesplat.py) is
measured alongside (`cone_trace_fps`), with the exact per-ray march as the
semantics control (`cone_march_fps`) and the PSNR between the two final
images as the quality evidence (`cone_psnr_db`).
"""

from __future__ import annotations

import json
import os
import threading
import time

# Watchdog BEFORE any backend touch (started by main(), so merely
# importing this module has no side effects): the axon tunnel's relay has
# been observed to die (local ports 8082-8117 stop listening), and then
# even backend initialization hangs forever — which to a benchmark driver
# looks like an infinite benchmark. If the first device op hasn't
# completed within the budget, emit ONE parseable diagnostic line and
# exit. NOTE: runtime.setup() itself touches the backend (its cache gate
# reads jax.default_backend()), so it too runs under the watchdog, from
# main().
_DEVICE_READY = threading.Event()


def _watchdog(budget_s: float = 600.0):
    if not _DEVICE_READY.wait(timeout=budget_s):
        print(json.dumps({
            "metric": "track_fuse_render_fps_640x480", "value": 0.0,
            "unit": "fps", "vs_baseline": 0.0,
            "error": f"device unreachable: no trivial op completed within "
                     f"{budget_s:.0f}s of startup (tunnel relay down? "
                     f"check `ss -tln | grep 8082`)",
        }), flush=True)
        os._exit(1)


import jax
import jax.numpy as jnp

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils import metrics
from octree_slam_tpu.utils.timing import sync


def probe_device() -> None:
    """Release the startup watchdog once a trivial op round-trips."""
    import numpy as np
    y = jax.jit(lambda a: a * 2)(jnp.ones((8, 128)))
    np.asarray(y)
    _DEVICE_READY.set()


def measure_sync_floor(n=10):
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.float32)
    x = f(x)
    sync(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
        sync(x)
    return (time.perf_counter() - t0) / n


_steppers = {}


def stepper(cfg, render_mode):
    """One donated jit per render mode, shared across passes (a fresh
    lambda per call would be a fresh jit cache entry = a recompile)."""
    key = (cfg, render_mode)
    if key not in _steppers:
        _steppers[key] = jax.jit(
            lambda s, f, _m=render_mode: pipeline.step(s, f, cfg, render=_m),
            donate_argnums=0)
    return _steppers[key]


def run(cfg, frames, gt_poses, render_mode, sync_floor, n_warmup=2):
    state = pipeline.init_state(cfg, initial_pose=gt_poses[0])
    step = stepper(cfg, render_mode)
    for i in range(n_warmup):
        state, out = step(state, frames[i])
    sync(out.framebuffer)

    est_poses = []
    n_timed = len(frames) - n_warmup

    # latency: every frame closed by a host fetch, tunnel floor subtracted
    t0 = time.perf_counter()
    for i in range(n_warmup, len(frames)):
        state, out = step(state, frames[i])
        sync(out.framebuffer)
        est_poses.append(out.pose)
    dt = time.perf_counter() - t0
    frame_s = max(dt / n_timed - sync_floor, 1e-6)
    fps = 1.0 / frame_s

    # throughput: frames chained through donated state, ONE fetch at the
    # end forces the whole chain (streaming deployments don't sync per
    # frame; the reference pipelines the same way via async CUDA)
    t0 = time.perf_counter()
    for i in range(n_warmup, len(frames)):
        state, out = step(state, frames[i])
    sync(out.framebuffer)
    dt2 = time.perf_counter() - t0
    fps_tp = 1.0 / max(dt2 / n_timed - sync_floor / n_timed, 1e-6)

    import numpy as np
    ate = metrics.ate_rmse(np.stack([np.asarray(p) for p in est_poses]),
                           np.stack([np.asarray(p) for p in gt_poses[n_warmup:]]))
    return fps, fps_tp, ate, out


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    from octree_slam_tpu.utils import runtime
    runtime.setup()
    probe_device()
    cfg = SLAMConfig(
        width=640, height=480,
        max_depth=9, voxel_resolution=0.02,  # 10.24 m volume at 2 cm leaves
        node_capacity=1 << 20,
        # the 14-frame orbit map tops out ~77k leaves; the splat gather and
        # packed scatter-min scale with this capacity (overflow is flagged)
        leaf_capacity=1 << 17,
    )
    scene = sources.default_scene()

    n_stream = 14
    step_angle = 0.01

    frames = []
    gt_poses = []
    for i in range(n_stream):
        gt = sources.orbit_pose(i * step_angle, radius=2.0)
        f = sources.render_frame(scene, gt, cfg.focal_x, cfg.focal_y,
                                 width=cfg.width, height=cfg.height)
        sync(f.depth)
        frames.append(f)
        gt_poses.append(gt)

    # the tunnel round-trip drifts tens of ms between runs; use the
    # smaller of before/after measurements so the subtraction can only
    # under-correct (reported fps errs low, never high)
    floor_a = measure_sync_floor()

    fps_splat, tp_splat, ate, out = run(cfg, frames, gt_poses, "splat",
                                        floor_a)
    floor_b = measure_sync_floor()
    sync_floor = min(floor_a, floor_b)
    fps_splat, tp_splat, ate, out = run(cfg, frames, gt_poses, "splat",
                                        sync_floor)
    fps_cone, tp_cone, ate_cone, out_cone = run(cfg, frames, gt_poses,
                                                "cone", sync_floor)
    fps_march, tp_march, ate_m, out_march = run(cfg, frames, gt_poses,
                                                "cone_march", sync_floor)
    # hybrid production cone mode (render/hybrid.py): slab + fused
    # single-gather edge-band march at the measured knee (round-4 sweep:
    # cap 57600 / 24 trips = 29.93 dB vs the exact march at 35 FPS
    # render-only; BASELINE.md round-4 frontier table)
    import dataclasses
    cfg_h = dataclasses.replace(cfg, cone_band_cap=57600,
                                cone_band_iters=24)
    fps_hyb, tp_hyb, ate_h, out_hyb = run(cfg_h, frames, gt_poses,
                                          "cone_hybrid", sync_floor)

    # Renderer fidelity on a CLEAN single-pass map: the timed runs above
    # replay the stream through donated state (throughput methodology), so
    # the replayed frames re-track from the final pose — a deliberate
    # misregistration that ghost-fuses the map. Comparing renderers on
    # that dirtied map understated PSNR by ~4 dB (round-3 sweep: 23.8
    # there vs 28.0 on a map built the way production builds one).
    state = pipeline.init_state(cfg, initial_pose=gt_poses[0])
    for i in range(len(frames) - 1):
        state, _ = stepper(cfg, "splat")(state, frames[i])
    state2 = jax.tree_util.tree_map(jnp.copy, state)
    state3 = jax.tree_util.tree_map(jnp.copy, state)
    _, out_cone = stepper(cfg, "cone")(state, frames[-1])
    _, out_march = stepper(cfg, "cone_march")(state2, frames[-1])
    _, out_hyb = stepper(cfg_h, "cone_hybrid")(state3, frames[-1])

    import numpy as np
    ref_fb = np.asarray(out_march.framebuffer)[..., :3]
    d = np.asarray(out_cone.framebuffer)[..., :3] - ref_fb
    cone_psnr = 10.0 * np.log10(1.0 / max(float((d ** 2).mean()), 1e-12))
    dh = np.asarray(out_hyb.framebuffer)[..., :3] - ref_fb
    hyb_psnr = 10.0 * np.log10(1.0 / max(float((dh ** 2).mean()), 1e-12))

    result = {
        "metric": "track_fuse_render_fps_640x480",
        "value": round(tp_splat, 3),
        "unit": "fps",
        "vs_baseline": round(tp_splat / 30.0, 3),
        "latency_fps": round(fps_splat, 3),
        "cone_trace_fps": round(tp_cone, 3),
        "cone_latency_fps": round(fps_cone, 3),
        "cone_march_fps": round(tp_march, 3),
        "cone_psnr_db": round(cone_psnr, 2),
        "cone_hybrid_fps": round(tp_hyb, 3),
        "cone_hybrid_psnr_db": round(hyb_psnr, 2),
        "ate_rmse_m": round(ate, 5),
        "sync_floor_ms": round(sync_floor * 1e3, 2),
        "diverged": bool(out.diverged),
        "map_overflowed": bool(out.map_overflowed),
        "map_nodes": int(out.map_nodes),
        "map_leaves": int(out.map_leaves),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
