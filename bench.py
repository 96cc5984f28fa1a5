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

Resilience (round-5): the axon tunnel's relay has died mid-round before
(BENCH_r04 was one error line — the whole round's perf record lost to one
outage). This run is therefore staged and self-monitoring:
  * startup gates on the relay LISTENING (bounded port-poll, not a blind
    600 s hang) and on a trivial-op round trip with bounded retry+backoff;
  * every measurement arm runs under a deadline; results land in the
    output dict AS they are measured;
  * if any arm wedges past its deadline, the monitor prints the PARTIAL
    result line (everything measured so far + an `error` naming the wedged
    arm) and exits 0 — partial numbers beat a zeroed round.
"""

from __future__ import annotations

import json
import os
import socket
import threading
import time

RELAY_PORTS = (8082, 8083, 8100, 8117)


def relay_listening() -> bool:
    """True if any axon relay port accepts a TCP connect (CLAUDE.md: the
    relay listens on 8082-8117; `ss -tln | grep 8082` is the manual
    check)."""
    for port in RELAY_PORTS:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2.0):
                return True
        except OSError:
            continue
    return False


class Monitor:
    """Arm-scoped deadline watchdog.

    The main thread calls begin(arm, budget_s) before each stage and
    stamps measured fields into `self.result` as they land. If the
    deadline passes (a fetch through a dead tunnel blocks forever), the
    watchdog thread prints the partial result line and exits the process
    with rc 0 so the driver records what WAS measured.
    """

    def __init__(self, result: dict):
        self.result = result
        self.lock = threading.Lock()
        self.arm = "startup"
        self.deadline = time.time() + 120.0
        self.done = False
        self.thread = threading.Thread(target=self._watch, daemon=True)
        self.thread.start()

    def begin(self, arm: str, budget_s: float) -> None:
        with self.lock:
            self.arm = arm
            self.deadline = time.time() + budget_s

    def finish(self) -> None:
        with self.lock:
            self.done = True

    def _watch(self) -> None:
        while True:
            time.sleep(2.0)
            with self.lock:
                if self.done:
                    return
                if time.time() > self.deadline:
                    self.result["error"] = (
                        f"arm '{self.arm}' exceeded its deadline "
                        f"(tunnel wedge? check `ss -tln | grep 8082`); "
                        f"emitting partial results")
                    print(json.dumps(self.result), flush=True)
                    os._exit(0)


import jax
import jax.numpy as jnp

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.sensor import sources
from octree_slam_tpu.utils import metrics
from octree_slam_tpu.utils.timing import sync


def probe_device(attempts: int = 3, attempt_budget_s: float = 240.0) -> bool:
    """Bounded-retry trivial-op round trip.

    Each attempt dispatches a fresh tiny jit in a worker thread and waits
    up to attempt_budget_s; a hung fetch strands only its daemon worker,
    and the next attempt starts clean (if the relay came back, the fresh
    dispatch succeeds). Cold startup through the tunnel measures ~45 s,
    so the first attempt's budget must stay generous.
    """
    import numpy as np

    for i in range(attempts):
        ok = threading.Event()

        def _try():
            y = jax.jit(lambda a: a * 2.0 + i)(jnp.ones((8, 128)))
            np.asarray(y)
            ok.set()

        threading.Thread(target=_try, daemon=True).start()
        if ok.wait(timeout=attempt_budget_s):
            return True
        time.sleep(10.0 * (i + 1))
    return False


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
    result = {
        "metric": "track_fuse_render_fps_640x480",
        "value": 0.0,
        "unit": "fps",
        "vs_baseline": 0.0,
    }
    mon = Monitor(result)

    # Stage 0: relay port gate — fail fast (or wait out a brief outage)
    # instead of hanging minutes in backend init against a dead relay.
    mon.begin("relay_gate", 620.0)
    t0 = time.time()
    while not relay_listening():
        if time.time() - t0 > 600.0:
            result["error"] = ("relay not listening on any of "
                               f"{RELAY_PORTS} after 600s "
                               "(tunnel down; nothing local can respawn it)")
            print(json.dumps(result), flush=True)
            return
        time.sleep(15.0)

    # Stage 1: backend init + trivial-op round trip, bounded retries.
    mon.begin("device_probe", 900.0)
    from octree_slam_tpu.utils import runtime
    runtime.setup()
    if not probe_device():
        result["error"] = ("relay listening but no trivial op completed "
                           "in 3 bounded attempts (orchestrator wedged?)")
        print(json.dumps(result), flush=True)
        return

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

    mon.begin("frame_synth", 600.0)
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

    # Each render arm gets its own deadline: warm maps compile in tens of
    # seconds, cold first-compiles through the tunnel take minutes. A
    # wedge in any arm emits everything measured so far.
    mon.begin("splat", 900.0)
    fps_splat, tp_splat, ate, out = run(cfg, frames, gt_poses, "splat",
                                        floor_a)
    floor_b = measure_sync_floor()
    sync_floor = min(floor_a, floor_b)
    result["sync_floor_ms"] = round(sync_floor * 1e3, 2)

    fps_splat, tp_splat, ate, out = run(cfg, frames, gt_poses, "splat",
                                        sync_floor)
    result.update({
        "value": round(tp_splat, 3),
        "vs_baseline": round(tp_splat / 30.0, 3),
        "latency_fps": round(fps_splat, 3),
        "ate_rmse_m": round(ate, 5),
        "diverged": bool(out.diverged),
        "map_overflowed": bool(out.map_overflowed),
        "map_nodes": int(out.map_nodes),
        "map_leaves": int(out.map_leaves),
        "device": str(jax.devices()[0]),
    })

    mon.begin("cone_slab", 900.0)
    fps_cone, tp_cone, _ate_c, _out_c = run(cfg, frames, gt_poses,
                                            "cone", sync_floor)
    result["cone_trace_fps"] = round(tp_cone, 3)
    result["cone_latency_fps"] = round(fps_cone, 3)

    mon.begin("cone_march", 900.0)
    _fps_m, tp_march, _ate_m, _out_m = run(cfg, frames, gt_poses,
                                           "cone_march", sync_floor)
    result["cone_march_fps"] = round(tp_march, 3)

    # hybrid production cone mode (render/hybrid.py): slab + fused
    # single-gather edge-band march at the measured knee (round-4 sweep:
    # cap 57600 / 24 trips = 29.93 dB vs the exact march at 35 FPS
    # render-only; BASELINE.md round-4 frontier table)
    import dataclasses
    cfg_h = dataclasses.replace(cfg, cone_band_cap=57600,
                                cone_band_iters=24)
    mon.begin("cone_hybrid", 900.0)
    _fps_h, tp_hyb, _ate_h, _out_h = run(cfg_h, frames, gt_poses,
                                         "cone_hybrid", sync_floor)
    result["cone_hybrid_fps"] = round(tp_hyb, 3)

    # Renderer fidelity on a CLEAN single-pass map: the timed runs above
    # replay the stream through donated state (throughput methodology), so
    # the replayed frames re-track from the final pose — a deliberate
    # misregistration that ghost-fuses the map. Comparing renderers on
    # that dirtied map understated PSNR by ~4 dB (round-3 sweep: 23.8
    # there vs 28.0 on a map built the way production builds one).
    mon.begin("fidelity", 900.0)
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
    result["cone_psnr_db"] = round(cone_psnr, 2)
    result["cone_hybrid_psnr_db"] = round(hyb_psnr, 2)

    mon.finish()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
