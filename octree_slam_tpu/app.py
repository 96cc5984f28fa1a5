"""Application loop and CLI: the main.cpp equivalent.

The reference's mainLoop (main.cpp:31-84) reads a frame, tracks, fuses, and
renders into a GLFW window with compile-time mode flags (main.h:28-32).
Here the loop is a host driver around the jitted pipeline step, render modes
are runtime config, frames come from any FrameSource (synthetic orbit, TUM
replay), and output goes to image files / arrays + structured logs
(FPS, ATE, residuals — SURVEY.md section 5 observability).
"""

from __future__ import annotations

import argparse
import json
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core.types import Frame
from octree_slam_tpu.utils import metrics


# Module-level jit caches: pipeline.step is cached by (cfg, render) across
# run_slam CALLS, not per call — a fresh jit wrapper per invocation would
# re-trace (and on the axon tunnel, whose persistent-cache keys are
# unstable, fully recompile) at the first frame of every run.
_step_cache: dict = {}

# Compile-ahead (cfg.precompile_ahead): map growth doubles a capacity,
# which changes shapes and recompiles the step — minutes through a
# remote-TPU tunnel whose persistent-cache keys are unstable, and the
# dominant wall-clock cost of long runs (the 200-frame soak's wall fps is
# recompile-bound while its steady fps is 22+). Compilation releases the
# GIL (measured: a background compile leaves concurrent step latency at
# its 48 ms median), so when the pool crosses HALF full the app compiles
# the post-growth step in a daemon thread — by warm-up execution on a
# throwaway state (see precompile_step for why not AOT) — and by the time
# the 3/4 growth threshold fires, the pre-warmed wrapper is usually
# sitting in _aot_cache and the swap is free.
import threading as _threading

_aot_cache: dict = {}      # (cfg, render) -> PRE-WARMED jit wrapper
_aot_inflight: dict = {}   # (cfg, render) -> threading.Event (compile done)
_aot_lock = _threading.Lock()
_aot_drain_registered = False


def _build_jit(cfg: SLAMConfig, render: str):
    return jax.jit(
        lambda s, f, _c=cfg, _r=render: pipeline.step(s, f, _c, render=_r),
        donate_argnums=0)


def _dummy_frame(cfg: SLAMConfig) -> Frame:
    return Frame(
        depth=jnp.zeros((cfg.height, cfg.width), jnp.uint16),
        color=jnp.zeros((cfg.height, cfg.width, 3), jnp.uint8),
        timestamp=jnp.float32(0.0))


def precompile_step(cfg: SLAMConfig, render: str):
    """Compile the donated step for (cfg, render) in a background daemon
    thread by WARM-UP EXECUTION: build the jit wrapper, run it once on a
    throwaway init_state + zero frame (donated and discarded), and publish
    the pre-warmed wrapper for _donated_step to adopt when that config
    becomes live. Warm-up-by-execution rather than AOT lower().compile():
    the XLA:CPU AOT path produces executables with different target
    machine features than the jit path (the loader warns about the
    mismatch, and a process that accumulated such executables has
    segfaulted in later compiles), and a plain jit wrapper needs no
    aval-mismatch fallback — a mispredicted shape simply recompiles.

    Returns the thread (for tests), or None if the config is already
    compiled/in flight. Never raises: a failed precompile just leaves the
    normal recompile path."""
    global _aot_drain_registered
    if not _aot_drain_registered:
        _aot_drain_registered = True
        # A daemon thread killed mid-XLA-compile aborts process teardown
        # ("FATAL: exception not rethrown"); wait out in-flight compiles
        # at exit instead (bounded — they are seconds on CPU, and the
        # axon trigger is gated off entirely).
        import atexit

        def _drain():
            with _aot_lock:
                pending = list(_aot_inflight.values())
            for ev in pending:
                ev.wait(timeout=600)

        atexit.register(_drain)
    key = (cfg, render)
    done = _threading.Event()
    with _aot_lock:
        if key in _step_cache or key in _aot_cache or key in _aot_inflight:
            return None
        _aot_inflight[key] = done

    def worker():
        try:
            t0 = time.perf_counter()
            fn = _build_jit(cfg, render)
            state = pipeline.init_state(cfg)  # throwaway; donated below
            new_state, out = fn(state, _dummy_frame(cfg))
            jax.block_until_ready(out.pose)
            del new_state, out
            with _aot_lock:
                _aot_cache[key] = fn
            print(json.dumps({
                "event": "precompile_ready", "render": render,
                "node_capacity": cfg.node_capacity,
                "compile_s": round(time.perf_counter() - t0, 1)}),
                flush=True)
        except Exception as e:  # tunnel hiccup, OOM, ...
            print(json.dumps({"event": "precompile_failed",
                              "error": str(e)[:200]}), flush=True)
        finally:
            with _aot_lock:
                _aot_inflight.pop(key, None)
            done.set()

    th = _threading.Thread(target=worker, daemon=True,
                          name=f"precompile-{cfg.node_capacity}")
    th.start()
    return th

# _pack_signals vector layout; consume() reads by these offsets
_SIG_POSE = slice(0, 16)
_SIG_UO, _SIG_NODES, _SIG_LEAVES, _SIG_OVF, _SIG_DIV = 16, 17, 18, 19, 20
_SIG_STATS = 21  # then pyramid_depth inlier counts + residuals


def _donated_step(cfg: SLAMConfig, render: str):
    key = (cfg, render)
    fn = _step_cache.get(key)
    if fn is None:
        with _aot_lock:
            inflight = _aot_inflight.get(key)
        if inflight is not None:
            # growth fired before the compile-ahead finished: waiting
            # out the remainder is strictly cheaper than launching a
            # second identical compile — but bounded, so a wedged
            # remote compile service can only stall the run for as
            # long as one recompile would have, not forever
            if not inflight.wait(timeout=1800):
                print(json.dumps({"event": "precompile_wait_timeout"}),
                      flush=True)
        with _aot_lock:
            fn = _aot_cache.pop(key, None)  # pre-warmed jit wrapper
            # capacities only grow: predictions for smaller-or-equal pools
            # that were never adopted (mispredicted combos — e.g. a leaf
            # overflow doubled BOTH capacities where the trigger predicted
            # one) can never become live; drop them so their executables
            # don't pin memory for the process lifetime
            caps = (cfg.node_capacity, cfg.leaf_capacity)
            for k in [k for k in _aot_cache
                      if (k[0].node_capacity, k[0].leaf_capacity) != caps
                      and k[0].node_capacity <= caps[0]
                      and k[0].leaf_capacity <= caps[1]]:
                del _aot_cache[k]
        if fn is None:
            fn = _build_jit(cfg, render)
        _step_cache[key] = fn
    return fn


@jax.jit
def _pack_signals(o: "pipeline.StepOutput") -> jnp.ndarray:
    """Everything the host loop reads per frame, as ONE fetched vector:
    separate bool()/int() reads each cost a full device round trip
    (30-90 ms through a remote-TPU tunnel) and serialize the pipeline."""
    return jnp.concatenate([
        o.pose.ravel(),
        jnp.stack([o.unique_overflow.astype(jnp.float32),
                   o.map_nodes.astype(jnp.float32),
                   o.map_leaves.astype(jnp.float32),
                   o.map_overflowed.astype(jnp.float32),
                   o.diverged.astype(jnp.float32)]),
        o.track_inliers.astype(jnp.float32),
        o.track_residual.astype(jnp.float32),
    ])


@dataclass
class RunResult:
    poses: List[np.ndarray] = field(default_factory=list)
    gt_poses: List[np.ndarray] = field(default_factory=list)
    fps: float = 0.0
    steady_fps: float = 0.0     # 1/median(frame time): excludes compile /
                                # growth-recompile spikes (see run_slam)
    ate_rmse: Optional[float] = None
    diverged: bool = False
    map_nodes: int = 0
    frames: int = 0
    spilled_leaves: int = 0     # host-tier traffic (cfg.host_spill)
    restored_leaves: int = 0
    archived_cells: int = 0     # cells still in host RAM at run end
    relocalizations: int = 0    # successful tracking-loss recoveries
    max_frame_s: float = 0.0    # worst single frame (excluding frame 0's
                                # initial compile)
    archive: Optional[object] = None  # the HostArchive when cfg.host_spill
                                # (exports must include spilled regions)
    growth_frame_s: Optional[float] = None  # wall cost of the first
                                # growth's swap frame: ~a step when
                                # compile-ahead hid the recompile, minutes
                                # when it could not
    final_cfg: Optional[SLAMConfig] = None  # cfg after any auto-growth —
                                            # pass to save_state


def _validate_dircache(pre: "pipeline.SLAMState", post: "pipeline.SLAMState",
                       frame: Frame, cfg: SLAMConfig, j: int) -> None:
    """Executable form of the dircache invariant contract (CLAUDE.md):
    re-run frame j UNCACHED from the pre-step snapshot and assert the two
    maps hold the identical leaf content. Raw tile/registry ORDER may
    legitimately differ (miss overflow defers tail uniques to the pager),
    so the comparison is the canonical sorted (key, value) union.
    Raises RuntimeError on the first divergence — a pool-mutating feature
    that skipped its pipeline.reset_dircache obligation fails loudly here
    instead of silently blending into wrong nodes."""
    pre_uc = pre._replace(
        dir_keys=jnp.zeros((0,), jnp.int32),
        dir_nodes=jnp.zeros((0,), jnp.int32),
        dir_vals=jnp.zeros((0,), jnp.uint32),
        dir_pos=jnp.zeros((0,), jnp.int32))
    # "none" render: content comparison reads leaves only, and the lazy
    # render modes share the same fusion path
    ref, _ = pipeline.step(pre_uc, frame, cfg, render="none")

    def canon(s):
        k = np.asarray(s.leaves.keys)
        v = np.asarray(s.leaves.vals)
        live = k >= 0
        o = np.argsort(k[live], kind="stable")
        return k[live][o], v[live][o]

    kc, vc = canon(post)
    kr, vr = canon(ref)
    if kc.shape != kr.shape or not (np.array_equal(kc, kr)
                                    and np.array_equal(vc, vr)):
        nk = int(min(kc.size, kr.size))
        bad = (np.flatnonzero((kc[:nk] != kr[:nk])
                              | (vc[:nk] != vr[:nk]))[:8].tolist()
               if kc.size == kr.size else [])
        raise RuntimeError(
            f"dircache validation FAILED at frame {j}: cached map holds "
            f"{kc.size} leaves vs {kr.size} uncached; first divergent "
            f"sorted rows {bad}. A pool/registry/value mutation bypassed "
            f"pipeline.reset_dircache (see CLAUDE.md invariant).")
    print(json.dumps({"frame": j, "event": "dircache_validated",
                      "leaves": int(kc.size)}), flush=True)


def run_slam(frame_fn: Callable[[int], Frame], n_frames: int,
             cfg: SLAMConfig, initial_pose=None, gt_fn=None,
             render_every: int = 1, render_mode: str = "splat",
             save_dir: str | None = None,
             log_every: int = 0,
             initial_state: "pipeline.SLAMState | None" = None,
             state_out: list | None = None,
             auto_grow: bool = True,
             map_center=(0.0, 0.0, 0.0),
             stop_fn: Callable[[int], bool] | None = None) -> RunResult:
    """Drive the SLAM pipeline over a frame stream.

    frame_fn(i) -> Frame; gt_fn(i) -> optional ground-truth world_T_cam.
    stop_fn(i) -> True ends the run before frame i (open-ended sources:
    live sensors, wall-clock-bounded soaks).
    initial_state resumes a checkpoint (load_state); if state_out is a
    list, the final SLAMState is appended for checkpointing. With
    auto_grow, the node pool / leaf registry double when 3/4 full (the
    reference's per-insert realloc, svo.cu:609-614, amortized; each
    doubling recompiles the step since shapes change). With
    cfg.host_spill, filling the pool first archives cold regions to host
    RAM (map/tiering.py — the pushToGPU/pullToCPU analog) and only grows
    when everything is hot; archived regions restore as the camera nears.
    """
    if initial_state is not None:
        # defensive copy: the hot loop DONATES state buffers — without
        # this, the caller's arrays (e.g. a loaded checkpoint reused
        # across runs) would be invalidated by the first step
        state = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True)
            if isinstance(x, jax.Array) else x, initial_state)
    else:
        state = pipeline.init_state(cfg, map_center=map_center,
                                    initial_pose=initial_pose)
    archive = None
    if cfg.host_spill:
        from octree_slam_tpu.map import tiering
        if cfg.restore_radius >= cfg.spill_keep_radius:
            # inverted hysteresis THRASHES: a cell spills (every leaf
            # farther than spill_keep_radius) and its center is already
            # within restore_radius, so the next frame pulls the whole
            # archive straight back — measured as a full spill+restore
            # round trip per frame at 1080p before this guard existed
            raise ValueError(
                f"host_spill needs restore_radius < spill_keep_radius "
                f"(got restore {cfg.restore_radius} >= keep "
                f"{cfg.spill_keep_radius}): spilled cells would restore "
                f"immediately, thrashing the host tier every frame")
        archive = tiering.HostArchive(cfg.tier_level)
    keyposes: list = []  # relocalization anchors (relocalize.py)
    # frames stepped BEFORE a growth still carry the pre-growth sticky
    # overflow flag in their (lagged) packed vectors; ignore it for them
    # or one overflow would double capacity twice
    ovf_ignore_until = [-1]
    # render strings this run can hand to _donated_step — the set of
    # step variants compile-ahead must cover (consume's growth policy)
    renders_used = ({"none"} if render_every <= 0 else
                    {render_mode} if render_every == 1 else
                    {render_mode, "none"})
    # Compile-ahead is unsafe on the axon remote-compile tunnel: a
    # minutes-long compile racing the per-frame execution stream has
    # wedged the orchestrator (and killed the relay) twice. Real PJRT
    # backends compile service-side without that hazard, and the CPU
    # path is how tests exercise the machinery.
    precompile_ok = cfg.precompile_ahead and jax.default_backend() != "axon"
    # Donating hot-loop step: the previous state's buffers are recycled
    # in place (map updates without a 12MB pool copy per frame). Safe here
    # because this loop is the only holder of `state`. The compiled fn is
    # memoized at module level (_donated_step), so repeated run_slam calls
    # under the same config never re-trace.
    if save_dir:
        import os
        os.makedirs(save_dir, exist_ok=True)
    result = RunResult()

    def consume(item, state, cfg):
        """Host-side handling of one stepped frame: read the packed
        vector, finish remainders (legacy mode), record poses, save the
        render, and run the growth/tiering policy. Returns (state, cfg)."""
        j, dev, fb, frame, last_key = item
        host = np.asarray(dev)
        pose_np = host[_SIG_POSE].reshape(4, 4)
        n_lvl = cfg.pyramid_depth
        uo_flag, map_nodes, map_leaves = \
            host[_SIG_UO], host[_SIG_NODES], host[_SIG_LEAVES]
        # unique-cap remainder: a close-range/fast-sweep frame can touch
        # more distinct voxels than one insert pass handles. With
        # cfg.device_remainder (default) the step already paged through
        # the rest in a lax.while_loop and uo_flag is clear; the legacy
        # host loop below requires synchronous consumption (lag 0) because
        # insert_remainder reads state.last_pyramid — frame j's maps.
        if uo_flag > 0 and not cfg.device_remainder:
            more = True
            while more:
                state, (uo, last_key) = pipeline.insert_remainder(
                    state, frame, cfg, last_key)
                more = bool(uo)
        result.poses.append(pose_np)
        if gt_fn is not None:
            gt = gt_fn(j)
            if gt is not None:
                result.gt_poses.append(np.asarray(gt))
        if bool(host[_SIG_DIV]):
            # tracking lost (sticky flag): try to re-anchor against map
            # renders at recent keyposes; fusion is gated off until this
            # succeeds (pipeline.step). The reference only prints "Camera
            # tracking is lost" (rgbd_camera.cpp:148-151).
            # the packed flag is frame j's; the LIVE state may already
            # have been recovered by a previous consume (lag) — check it
            # (a device read, but only on already-diverged frames)
            if cfg.recovery_enabled and bool(state.diverged):
                from octree_slam_tpu import relocalize as reloc
                # empty ring (e.g. a checkpoint saved while diverged):
                # the frozen pose itself is the only available anchor
                pose_new, ok, diag = reloc.relocalize(
                    state, cfg, keyposes or [pose_np])
                if ok:
                    state = state._replace(
                        pose=jnp.asarray(pose_new, jnp.float32),
                        diverged=jnp.bool_(False))
                    if cfg.track_keyframe:
                        # the anchor predates the tracking loss: re-seed
                        # it at the recovered pose with the most recent
                        # frame's maps, or the next step would ICP the
                        # live frame against a pre-loss keyframe across
                        # the recovery jump
                        state = state._replace(
                            key_pyramid=state.last_pyramid,
                            key_pose=jnp.asarray(pose_new, jnp.float32),
                            key_T_cam=jnp.eye(4, dtype=jnp.float32))
                    result.relocalizations += 1
                print(json.dumps({
                    "frame": j,
                    "event": "relocalize" if ok else "relocalize_failed",
                    **diag}), flush=True)
        elif cfg.recovery_enabled and j % cfg.keypose_every == 0:
            keyposes.append(pose_np)
            del keyposes[:-cfg.reloc_candidates]
        if fb is not None:
            from octree_slam_tpu.io.bmp import save_image
            save_image(f"{save_dir}/frame_{j:05d}.png", np.asarray(fb))
        if log_every and j % log_every == 0:
            print(json.dumps({
                "frame": j,
                "inliers": host[_SIG_STATS:_SIG_STATS + n_lvl]
                .astype(int).tolist(),
                "residual":
                host[_SIG_STATS + n_lvl:_SIG_STATS + 2 * n_lvl].tolist(),
                "map_nodes": int(map_nodes),
                "diverged": bool(host[_SIG_DIV]),
            }), flush=True)
        if archive is not None and len(archive):
            # archived-cell restore check: pure host math (no device read)
            from octree_slam_tpu.map import tiering
            state, cfg, n_rest = tiering.restore_due(
                state, cfg, archive, camera_pos=pose_np[:3, 3])
            if n_rest:
                result.restored_leaves += n_rest
                print(json.dumps({
                    "frame": j, "event": "map_restore", "leaves": n_rest,
                    "archived_cells": len(archive)}), flush=True)
        if auto_grow:
            grow_nodes = (map_nodes > cfg.node_capacity * 3 // 4
                          or (host[_SIG_OVF] > 0
                              and j > ovf_ignore_until[0]))
            grow_leaves = map_leaves > cfg.leaf_capacity * 3 // 4
            if grow_nodes and archive is not None:
                # HBM pressure: archive cold regions before growing
                from octree_slam_tpu.map import tiering
                state, cfg, n_spill = tiering.spill_cold(
                    state, cfg, archive, camera_pos=pose_np[:3, 3])
                if n_spill:
                    result.spilled_leaves += n_spill
                    grow_nodes = (int(state.pool.n_nodes)
                                  > cfg.node_capacity * 3 // 4)
                    grow_leaves = (int(state.leaves.count)
                                   > cfg.leaf_capacity * 3 // 4)
                    print(json.dumps({
                        "frame": j, "event": "map_spill",
                        "leaves": n_spill, "archived_cells": len(archive),
                        "map_nodes": int(state.pool.n_nodes)}), flush=True)
            if grow_nodes or grow_leaves:
                # shape change = new cfg = new _donated_step cache key
                state, cfg = pipeline.grow_state(
                    state, cfg, grow_nodes=grow_nodes,
                    grow_leaves=grow_leaves)
                ovf_ignore_until[0] = j + lag
                # the recompile (or AOT swap) lands on the NEXT loop
                # iteration's step; record where so growth_frame_s can
                # report the swap cost
                growth_at.append(len(frame_s) + 1)
                print(json.dumps({
                    "frame": j, "event": "map_grow",
                    "node_capacity": cfg.node_capacity,
                    "leaf_capacity": cfg.leaf_capacity,
                }), flush=True)
            elif precompile_ok:
                # Half-full: growth is coming — compile the doubled
                # config now, in the background, so the 3/4 trigger swaps
                # executables instead of stalling the run for a remote
                # compile (see _aot_cache). This predicts ONE combo (the
                # dimensions past half); growths that double a different
                # combination — an overflow-triggered node doubling while
                # only leaves were predicted, or a leaf-overflow rebuild
                # picking a non-doubled registry cap — miss the cache and
                # pay the normal recompile (correct, just unaccelerated).
                # Other mispredictions (spill avoids growth) just waste a
                # background compile; stale entries are evicted on the
                # next adoption.
                pred_n = map_nodes > cfg.node_capacity // 2
                pred_l = map_leaves > cfg.leaf_capacity // 2
                if pred_n or pred_l:
                    import dataclasses
                    nxt = dataclasses.replace(
                        cfg,
                        node_capacity=cfg.node_capacity * (2 if pred_n
                                                           else 1),
                        leaf_capacity=cfg.leaf_capacity * (2 if pred_l
                                                           else 1))
                    for r in renders_used:
                        precompile_step(nxt, r)
        return state, cfg

    # With the remainder on device, the packed host read can TRAIL one
    # frame: frame j's vector transfers while frame j+1 executes, so the
    # steady state pays max(step, tunnel round trip) instead of their sum
    # (~2x e2e on a remote-TPU link). Growth/tiering decisions lag one
    # frame, which the proactive 3/4 thresholds absorb.
    lag = 1 if cfg.device_remainder else 0
    queue: list = []
    frame_s: list = []   # per-frame wall time: median -> steady-state fps
    growth_at: list = []  # frame_s indices carrying a growth swap
    t_start = time.perf_counter()
    t_prev = t_start
    out = None
    n_run = n_frames
    for i in range(n_frames):
        if stop_fn is not None and stop_fn(i):
            n_run = i
            break
        frame = frame_fn(i)
        render = (render_mode if render_every > 0 and (i % render_every == 0)
                  else "none")
        check = (cfg.insert_dircache and cfg.debug_validate_dircache > 0
                 and i > 0 and i % cfg.debug_validate_dircache == 0)
        if check:
            # pre-step snapshot: the hot step donates its input buffers
            pre_state = jax.tree_util.tree_map(jnp.copy, state)
        state, out = _donated_step(cfg, render)(state, frame)
        if check:
            _validate_dircache(pre_state, state, frame, cfg, i)
        dev = _pack_signals(out)
        if lag:
            try:
                dev.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass
        fb = (out.framebuffer if save_dir and render != "none" else None)
        queue.append((i, dev, fb, frame, out.last_insert_key))
        while len(queue) > lag:
            state, cfg = consume(queue.pop(0), state, cfg)
        t_now = time.perf_counter()
        frame_s.append(t_now - t_prev)
        t_prev = t_now
    while queue:
        state, cfg = consume(queue.pop(0), state, cfg)
    # no explicit sync needed: the drain's last consume() fetched the
    # final frame's packed vector, which forces the whole chain (and
    # block_until_ready is a no-op on the axon platform anyway)
    dt = time.perf_counter() - t_start
    result.fps = n_run / dt if n_run else 0.0
    # Long runs hit events whose cost is environment, not pipeline: each
    # pool growth changes shapes and recompiles the step (minutes through
    # a remote-TPU tunnel with unstable compile-cache keys), and frame 0
    # carries the initial compile. The median frame time is immune to
    # those spikes, so steady_fps is the sustained production rate; fps
    # stays the honest wall-clock figure.
    if frame_s:
        result.steady_fps = 1.0 / max(float(np.median(frame_s)), 1e-9)
        if len(frame_s) > 1:
            result.max_frame_s = float(np.max(frame_s[1:]))
        if growth_at and growth_at[0] < len(frame_s):
            result.growth_frame_s = float(frame_s[growth_at[0]])
    result.frames = n_run
    # read the LIVE flag, not the last StepOutput's: a drain-time
    # relocalization (the packed fetch trails one frame) clears
    # state.diverged after the final step already ran
    result.diverged = bool(state.diverged) if n_run else False
    result.map_nodes = int(out.map_nodes) if out is not None else 0
    if archive is not None:
        result.archived_cells = len(archive)
        result.archive = archive
    if result.gt_poses and len(result.gt_poses) == len(result.poses):
        result.ate_rmse = metrics.ate_rmse(
            np.stack(result.poses), np.stack(result.gt_poses))
    result.final_cfg = cfg
    if state_out is not None:
        state_out.append(state)
    return result


def save_state(path: str, state: pipeline.SLAMState,
               cfg: SLAMConfig | None = None) -> None:
    """Checkpoint the full SLAM state (map + pose + pyramids) to npz —
    the serialization the reference lacks (SURVEY.md section 5). Pass the
    RUN-END cfg: auto-growth changes capacities mid-run, and load_state
    needs them to rebuild the template (CLI flags only know the initial
    sizes)."""
    from octree_slam_tpu.map import svo
    flat, treedef = jax.tree_util.tree_flatten(state)
    caps = ({"node_capacity": cfg.node_capacity,
             "leaf_capacity": cfg.leaf_capacity,
             # the dense-prealloc layout is part of the pool's on-disk
             # meaning: a checkpoint replayed under a different
             # prealloc_levels schedule would silently misindex the
             # shallow levels, so record and validate it
             "prealloc": svo.prealloc_levels(cfg.node_capacity),
             # every other shape- or semantics-bearing knob, so ANY
             # consumer (app resume, viewers) can rebuild the exact
             # template without knowing the writing run's CLI flags
             "width": cfg.width, "height": cfg.height,
             "pyramid_depth": cfg.pyramid_depth,
             "track_finest_level": cfg.track_finest_level,
             "fuse_level": cfg.fuse_level,
             "max_depth": cfg.max_depth,
             "use_dense_mips": int(cfg.use_dense_mips),
             "track_keyframe": int(cfg.track_keyframe),
             "insert_dircache": int(cfg.insert_dircache),
             "saturation_gate": int(cfg.saturation_gate),
             "insert_unique_cap": cfg.insert_unique_cap,
             "voxel_resolution": cfg.voxel_resolution}
            if cfg else {})
    np.savez_compressed(path, n=len(flat), **caps,
                        **{f"a{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_state(path: str, cfg: SLAMConfig
               ) -> tuple[pipeline.SLAMState, SLAMConfig]:
    """Returns (state, cfg): capacities stored by save_state override the
    caller's (a checkpoint written after auto-growth would otherwise fail
    the shape check against CLI-derived sizes)."""
    import dataclasses
    z = np.load(path)
    if "node_capacity" in z:
        cfg = dataclasses.replace(
            cfg, node_capacity=int(z["node_capacity"]),
            leaf_capacity=int(z["leaf_capacity"]))
    # newer checkpoints stamp the remaining shape/semantics knobs too
    # (older ones fall back to the caller's cfg + the checks below)
    overrides = {}
    for key, cast in (("width", int), ("height", int),
                      ("pyramid_depth", int), ("track_finest_level", int),
                      ("fuse_level", int), ("max_depth", int),
                      ("use_dense_mips", lambda v: bool(int(v))),
                      ("track_keyframe", lambda v: bool(int(v))),
                      ("insert_dircache", lambda v: bool(int(v))),
                      ("saturation_gate", lambda v: bool(int(v))),
                      ("insert_unique_cap", int),
                      ("voxel_resolution", float)):
        if key in z:
            overrides[key] = cast(z[key])
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
        # pyramid_iters must still cover the tracked sub-pyramid when the
        # stored depth exceeds the caller's schedule
        need = cfg.pyramid_depth - cfg.track_finest_level
        if len(cfg.pyramid_iters) < need:
            cfg = dataclasses.replace(
                cfg, pyramid_iters=cfg.pyramid_iters
                + (4,) * (need - len(cfg.pyramid_iters)))
    from octree_slam_tpu.map import svo
    cur = svo.prealloc_levels(cfg.node_capacity)
    # missing stamp = pre-stamp build = the legacy schedule (a missing key
    # must NOT mean "skip validation": those checkpoints are exactly the
    # ones a schedule change silently corrupts)
    stored = (int(z["prealloc"]) if "prealloc" in z
              else svo.prealloc_levels_legacy(cfg.node_capacity))
    if stored != cur:
        raise ValueError(
            f"checkpoint {path!r} was written with {stored} "
            f"dense-preallocated octree levels but this build uses {cur} "
            f"for capacity {cfg.node_capacity} — the pool layout is "
            f"incompatible (re-map from the source data or use the "
            f"writing build)")
    template = pipeline.init_state(cfg)
    flat, treedef = jax.tree_util.tree_flatten(template)
    n_stored = int(z["n"])
    # SLAMState appends new fields LAST, so older checkpoints line up with
    # the template's prefix and the missing tail is filled cold from the
    # template: pre-saturation-gate builds lack sat_mask (1 array);
    # pre-dircache builds additionally lack the dir_* arrays (4; 2 for the
    # short-lived keys/nodes-only layout). A PARTIAL directory — keys
    # without their value mirror — must never be used, so any legacy tail
    # resets the whole cache below.
    missing = len(flat) - n_stored
    legacy_tail = missing in (1, 2) or (
        cfg.insert_dircache and missing in (3, 4, 5, 6))
    if n_stored != len(flat) and not legacy_tail:
        raise ValueError(
            f"checkpoint {path!r} has {n_stored} arrays but the current "
            f"config expects {len(flat)} — it was written under a different "
            f"SLAMConfig (capacities / pyramid_depth / use_dense_mips)")
    paths = jax.tree_util.tree_flatten_with_path(template)[0]
    loaded = []
    for i, ((kp, t), _) in enumerate(zip(paths, flat)):
        if i >= n_stored:  # legacy tail: keep the template's cold cache
            loaded.append(t)
            continue
        a = z[f"a{i}"]
        if tuple(a.shape) != tuple(t.shape) or a.dtype != t.dtype:
            name = jax.tree_util.keystr(kp)
            raise ValueError(
                f"checkpoint {path!r} field {name}: stored "
                f"{a.dtype}{list(a.shape)} vs expected "
                f"{t.dtype}{list(t.shape)} — config mismatch (likely "
                f"node/leaf capacity, image size, or use_dense_mips)")
        loaded.append(jnp.asarray(a))
    state = jax.tree_util.tree_unflatten(treedef, loaded)
    if legacy_tail:
        # the v1 (keys/nodes-only) layout may have loaded live dir keys
        # with no value mirror — a partial directory corrupts blends
        state = pipeline.reset_dircache(state)
        # a cold saturation mask is CORRECT (gating resumes as leaves
        # re-saturate) but slow; warm it from the registry in one scatter
        state = pipeline.rebuild_sat_mask(state, cfg)
    return state, cfg


def main(argv=None):
    p = argparse.ArgumentParser(description="octree-slam-tpu runner")
    p.add_argument("--source", choices=["orbit", "tum"], default="orbit")
    p.add_argument("--tum-root", type=str, default=None)
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--max-depth", type=int, default=9)
    p.add_argument("--resolution", type=float, default=0.02)
    p.add_argument("--render-every", type=int, default=1)
    p.add_argument("--render", choices=["splat", "cone", "cone_march",
                                        "none"],
                   default="splat",
                   help="map view: voxel splatting (real-time), cone "
                        "compositing via slab splatting (real-time), the "
                        "exact cone-tracing march (slow, reference "
                        "semantics), or none")
    p.add_argument("--track-fuse-level", type=int, default=0,
                   help="pyramid level for ICP + fusion (0 = native res). "
                        "At high sensor resolutions 1 keeps the tracking "
                        "work at ~VGA scale while rendering stays full-res "
                        "(sets track_finest_level and fuse_level; pyramid "
                        "gains one level so the tracked sub-pyramid keeps "
                        "the full {10,5,4} schedule)")
    p.add_argument("--node-capacity", type=int, default=None,
                   help="static SVO node-pool size (power of two; "
                        "default from SLAMConfig)")
    p.add_argument("--no-dense-mips", action="store_true",
                   help="disable the dense value-mip render cache "
                        "(613 MB HBM at depth 9, 4.9 GB at depth 10); "
                        "the exact marcher falls back to pointer descent, "
                        "splat/cone are unaffected (leaf-only)")
    p.add_argument("--host-spill", action="store_true",
                   help="archive cold map regions to host RAM when the "
                        "node pool fills instead of growing HBM use "
                        "(map/tiering.py); regions restore as the camera "
                        "approaches them")
    p.add_argument("--spill-keep-radius", type=float, default=None,
                   help="meters: cells with a leaf within this camera "
                        "distance stay resident (default SLAMConfig)")
    p.add_argument("--keyframe-tracking", action="store_true",
                   help="anchor ICP to the last keyframe instead of the "
                        "previous frame (cfg.track_keyframe): drift "
                        "accrues per keyframe, not per frame")
    p.add_argument("--no-precompile-ahead", action="store_true",
                   help="disable background AOT compilation of the "
                        "post-growth step (cfg.precompile_ahead); growth "
                        "then stalls for the full recompile. Use on "
                        "platforms where a compile concurrent with "
                        "execution is unsafe (the axon tunnel)")
    p.add_argument("--save-dir", type=str, default=None)
    p.add_argument("--save-state", type=str, default=None,
                   help="write the full SLAM state (map + pose) to this "
                        ".npz when the run ends")
    p.add_argument("--save-mesh", type=str, default=None,
                   help="export the final map as a Wavefront OBJ of "
                        "colored voxel cubes (voxelGridToMesh + a writer "
                        "the reference lacks)")
    p.add_argument("--save-trajectory", type=str, default=None,
                   help="write the estimated trajectory in the TUM format "
                        "(timestamp tx ty tz qx qy qz qw) for external "
                        "evaluation tools (evo, TUM rgbd benchmark); "
                        "ground truth, when available, goes to "
                        "<path>.gt.txt")
    p.add_argument("--load-state", type=str, default=None,
                   help="resume from a state .npz written by --save-state "
                        "(config must match)")
    p.add_argument("--log-every", type=int, default=10)
    args = p.parse_args(argv)

    from octree_slam_tpu.utils import runtime
    runtime.setup()

    resume = None
    state_sink: list = []
    if args.node_capacity is not None:
        if args.node_capacity % 8 != 0 or args.node_capacity < 4096:
            p.error("--node-capacity must be a multiple of 8 and >= 4096 "
                    "(the pool is tiled in 8-child blocks and must hold the "
                    "dense-preallocated shallow levels)")
    cap = ({"node_capacity": args.node_capacity,
            "leaf_capacity": args.node_capacity // 4,
            "extract_capacity": args.node_capacity // 8}
           if args.node_capacity else {})
    if args.no_dense_mips:
        cap["use_dense_mips"] = False
    if args.track_fuse_level:
        lvl = args.track_fuse_level
        if lvl < 0 or lvl > 2:
            p.error("--track-fuse-level must be 0..2")
        cap.update(track_finest_level=lvl, fuse_level=lvl,
                   pyramid_depth=SLAMConfig.pyramid_depth + lvl,
                   pyramid_iters=SLAMConfig.pyramid_iters)
    if args.keyframe_tracking:
        cap["track_keyframe"] = True
    if args.no_precompile_ahead:
        cap["precompile_ahead"] = False
    if args.host_spill:
        cap["host_spill"] = True
        if args.spill_keep_radius is not None:
            cap["spill_keep_radius"] = args.spill_keep_radius
            cap["restore_radius"] = max(0.0, args.spill_keep_radius - 1.0)
    if args.source == "orbit":
        from octree_slam_tpu.sensor import sources
        cfg = SLAMConfig(width=args.width, height=args.height,
                         max_depth=args.max_depth,
                         voxel_resolution=args.resolution, **cap)
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.01, radius=2.0)
              for i in range(args.frames)]

        def frame_fn(i):
            return sources.render_frame(scene, gt[i], cfg.focal_x, cfg.focal_y,
                                        width=cfg.width, height=cfg.height)

        if args.load_state:
            resume, cfg = load_state(args.load_state, cfg)
        res = run_slam(frame_fn, args.frames, cfg, initial_pose=gt[0],
                       gt_fn=lambda i: gt[i], render_every=args.render_every,
                       render_mode=args.render,
                       save_dir=args.save_dir, log_every=args.log_every,
                       initial_state=resume, state_out=state_sink)
    else:
        if not args.tum_root:
            p.error("--source tum requires --tum-root <dataset dir>")
        from octree_slam_tpu.io.tum import TUMDataset
        ds = TUMDataset(args.tum_root, max_frames=args.frames)
        cfg = SLAMConfig(width=args.width, height=args.height,
                         focal_x=ds.FX, focal_y=ds.FY,
                         max_depth=args.max_depth,
                         voxel_resolution=args.resolution, **cap)
        init = ds.gt_pose(0)
        frames = ds.prefetched()
        if args.load_state:
            resume, cfg = load_state(args.load_state, cfg)
        res = run_slam(lambda i: next(frames), len(ds), cfg,
                       initial_pose=init,
                       gt_fn=ds.gt_pose, render_every=args.render_every,
                       render_mode=args.render,
                       save_dir=args.save_dir, log_every=args.log_every,
                       initial_state=resume, state_out=state_sink)

    if args.save_state and state_sink:
        save_state(args.save_state, state_sink[0], res.final_cfg)
    if args.save_trajectory:
        from octree_slam_tpu.io.tum import write_trajectory
        # real dataset timestamps when available — evo/TUM-benchmark
        # association needs them (frame indices would associate zero
        # pairs against an epoch-stamped groundtruth.txt)
        ts = None
        if args.source == "tum":
            ts = [ds.pairs[i][0][0] for i in range(len(res.poses))]
        write_trajectory(args.save_trajectory, res.poses, timestamps=ts)
        if res.gt_poses and len(res.gt_poses) == len(res.poses):
            write_trajectory(args.save_trajectory + ".gt.txt",
                             res.gt_poses, timestamps=ts)
    if args.save_mesh and state_sink:
        from octree_slam_tpu.core import packing
        from octree_slam_tpu.core.types import BoundingBox, VoxelGrid
        from octree_slam_tpu.io.obj import save_obj
        from octree_slam_tpu.map import morton
        from octree_slam_tpu.map import svo as svo_mod
        from octree_slam_tpu.map import voxelization

        fcfg = res.final_cfg
        st = state_sink[0]
        pool = (svo_mod.refresh_interior(st.pool, depth=fcfg.max_depth)
                if bool(st.interior_stale) else st.pool)  # BFS needs interiors
        # extract_all_leaves doubles the buffer until the WHOLE map fits
        # (extract_voxels at a fixed capacity silently truncates big maps)
        ex, _ = svo_mod.extract_all_leaves(
            pool, depth=fcfg.max_depth,
            start_capacity=fcfg.extract_capacity)
        n_live = int(ex.count)
        centers = np.asarray(ex.centers)[:n_live]
        colors = np.asarray(ex.colors)[:n_live]
        if res.archive is not None and len(res.archive):
            # host-spilled regions are part of "the final map": decode
            # their archived leaves and append them to the export
            ak, av = res.archive.take(list(res.archive.cells.keys()))
            a_centers = np.asarray(morton.decode_centers(
                jnp.asarray(ak), pool.center, pool.half_size,
                fcfg.max_depth))
            a_colors = np.asarray(packing.unpack_rgba_unit(
                jnp.asarray(av)))
            centers = np.concatenate([centers, a_centers])
            colors = np.concatenate([colors, a_colors])
        grid = VoxelGrid(
            centers=jnp.asarray(centers), colors=jnp.asarray(colors),
            count=jnp.int32(centers.shape[0]),
            scale=fcfg.voxel_resolution / 2.0,
            bbox=BoundingBox(pool.center - pool.half_size,
                             pool.center + pool.half_size))
        save_obj(args.save_mesh, voxelization.voxel_grid_to_mesh(grid))

    print(json.dumps({
        "fps": round(res.fps, 3),
        "steady_fps": round(res.steady_fps, 3),
        "ate_rmse": res.ate_rmse,
        "frames": res.frames,
        "map_nodes": res.map_nodes,
        "diverged": res.diverged,
    }), flush=True)


if __name__ == "__main__":
    main()
