"""TUM ingest pipeline A/B: where do the e2e-vs-staged 23 ms/frame go?
(round-3 verdict item #4: TUM replay is 37 FPS staged but 19-23 FPS
including PNG decode + upload.)

Phases measured separately, then composed arms:
  decode      — native prefetcher pf.next() wait alone (no device work)
  upload      — jnp.asarray of (depth, color) alone (dispatch + transfer)
  staged      — SLAM steps over pre-uploaded frames (the known 37 FPS)
  e2e         — decode + upload + step serially (the current path)
  e2e_ahead   — a feeder thread decodes AND device_puts ONE frame ahead,
                so ingest of frame i+1 overlaps frame i's step
  e2e_packed  — depth+color shipped as ONE packed u8 buffer per frame
                (1 upload instead of 2), split on device inside the step's
                process via a tiny jit

Run (real TPU): python examples/tum_ingest_ab.py [--frames 40]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from octree_slam_tpu.utils import runtime

runtime.setup()

import jax
import jax.numpy as jnp

from octree_slam_tpu import pipeline
from octree_slam_tpu.config import SLAMConfig
from octree_slam_tpu.core.types import Frame
from octree_slam_tpu.io.tum import TUMDataset
from octree_slam_tpu.utils.timing import sync
from examples.make_tum_sequence import write_sequence


def measure_floor(n=8):
    f = jax.jit(lambda x: x + 1)
    x = f(jnp.zeros((8, 128), jnp.float32))
    sync(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
        sync(x)
    return (time.perf_counter() - t0) / n


@jax.jit
def unpack_frame(buf: jnp.ndarray, ts: jnp.ndarray) -> Frame:
    """One packed u8[H*W*5] buffer -> Frame (depth u16 LE + rgb)."""
    n = buf.shape[0] // 5
    d = buf[: 2 * n].reshape(n, 2).astype(jnp.uint16)
    depth = (d[:, 0] | (d[:, 1] << 8)).reshape(480, 640)
    color = buf[2 * n:].reshape(480, 640, 3)
    return Frame(depth=depth, color=color, timestamp=ts)


def pack_host(depth_mm: np.ndarray, rgb: np.ndarray) -> np.ndarray:
    return np.concatenate([depth_mm.astype("<u2").view(np.uint8).ravel(),
                           rgb.ravel()])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--threads", type=int, default=3)
    p.add_argument("--capacity", type=int, default=8)
    args = p.parse_args()

    root = "/tmp/tum_synth_bench_ab"
    if not pathlib.Path(root, "depth.txt").exists():
        write_sequence(root, args.frames)
    ds = TUMDataset(root, max_frames=args.frames)
    n = len(ds)
    cfg = SLAMConfig(width=640, height=480, focal_x=ds.FX, focal_y=ds.FY,
                     max_depth=9, voxel_resolution=0.02,
                     node_capacity=1 << 20, leaf_capacity=1 << 17)
    step = jax.jit(lambda s, f: pipeline.step(s, f, cfg, render="splat"),
                   donate_argnums=0)
    init = ds.gt_pose(0)
    results = {"n_frames": n, "threads": args.threads,
               "capacity": args.capacity}

    # --- decode only (native prefetcher, NO device work: ds.prefetched
    # uploads inside its generator, so it can't attribute decode alone) ---
    import os
    from octree_slam_tpu.io import native
    from octree_slam_tpu.io.tum import DEPTH_FACTOR_TO_MM
    assert native.available(), "native prefetcher required for this A/B"
    dps = [os.path.join(ds.root, fd) for (_, fd), _ in ds.pairs]
    rps = [os.path.join(ds.root, fr) for _, (_, fr) in ds.pairs]
    tss = [p[0][0] for p in ds.pairs]

    def raw_decoded(threads=None, cap=None):
        with native.FramePrefetcher(
                dps, rps, 640, 480, depth_to_mm=1.0 / DEPTH_FACTOR_TO_MM,
                n_threads=threads or args.threads,
                capacity=cap or args.capacity) as pf:
            for i in range(n):
                nxt = pf.next()
                if nxt is None:
                    return
                yield nxt[0], nxt[1], tss[i]

    host_frames = []
    t0 = time.perf_counter()
    for d, c, ts in raw_decoded():
        host_frames.append((d, c, ts))
    results["decode_ms_per_frame"] = round(
        (time.perf_counter() - t0) / n * 1e3, 2)

    floor = measure_floor()
    results["sync_floor_ms"] = round(floor * 1e3, 2)

    # --- upload only (per-frame jnp.asarray x2, one final sync) ---
    t0 = time.perf_counter()
    last = None
    for d, c, ts in host_frames:
        last = (jnp.asarray(d), jnp.asarray(c))
    sync(last[0])
    results["upload_ms_per_frame"] = round(
        (time.perf_counter() - t0 - floor) / n * 1e3, 2)

    # --- packed upload only ---
    packed = [(pack_host(d, c), ts) for d, c, ts in host_frames]
    t0 = time.perf_counter()
    for buf, ts in packed:
        last = jnp.asarray(buf)
    sync(last)
    results["upload_packed_ms_per_frame"] = round(
        (time.perf_counter() - t0 - floor) / n * 1e3, 2)

    def run_arm(frame_iter, tag, n_run):
        state = pipeline.init_state(cfg, initial_pose=init)
        it = iter(frame_iter)
        f0 = next(it)
        state, out = step(state, f0)       # compile outside the timing
        sync(out.framebuffer)
        t0 = time.perf_counter()
        k = 0
        for f in it:
            state, out = step(state, f)
            k += 1
        sync(out.framebuffer)
        dt = (time.perf_counter() - t0 - floor) / max(k, 1)
        results[f"{tag}_fps"] = round(1.0 / dt, 2)

    # --- staged: pre-uploaded device frames ---
    dev_frames = [Frame(depth=jnp.asarray(d), color=jnp.asarray(c),
                        timestamp=jnp.float32(ts))
                  for d, c, ts in host_frames]
    sync(dev_frames[-1].depth)
    run_arm(dev_frames, "staged", n)

    # --- e2e serial: decode + upload + step (the current tum.py path) ---
    def e2e_gen():
        for d, c, ts in raw_decoded():
            yield Frame(depth=jnp.asarray(d), color=jnp.asarray(c),
                        timestamp=jnp.float32(ts))
    run_arm(e2e_gen(), "e2e_serial", n)

    # --- e2e with a device-ahead feeder thread (decode + upload of frame
    # i+1 overlap frame i's step) ---
    def ahead_gen(depth_q=2):
        q = queue.Queue(maxsize=depth_q)

        def feeder():
            for d, c, ts in raw_decoded():
                q.put(Frame(depth=jnp.asarray(d), color=jnp.asarray(c),
                            timestamp=jnp.float32(ts)))
            q.put(None)

        threading.Thread(target=feeder, daemon=True).start()
        while True:
            f = q.get()
            if f is None:
                return
            yield f
    run_arm(ahead_gen(), "e2e_ahead", n)

    # --- e2e packed single-buffer upload (1 transfer/frame instead of 2) ---
    def packed_gen():
        for d, c, ts in raw_decoded():
            yield unpack_frame(jnp.asarray(pack_host(d, c)),
                               jnp.float32(ts))
    run_arm(packed_gen(), "e2e_packed", n)

    # --- e2e packed + ahead (both) ---
    def packed_ahead_gen(depth_q=2):
        q = queue.Queue(maxsize=depth_q)

        def feeder():
            for d, c, ts in raw_decoded():
                q.put((jnp.asarray(pack_host(d, c)), jnp.float32(ts)))
            q.put(None)

        threading.Thread(target=feeder, daemon=True).start()
        while True:
            item = q.get()
            if item is None:
                return
            yield unpack_frame(*item)
    run_arm(packed_ahead_gen(), "e2e_packed_ahead", n)

    # --- e2e with YUV 4:2:0 color ingest: the upload is the measured
    # bottleneck (35.8 ms/frame for 1.5 MB through the tunnel), and RGB
    # cameras natively deliver chroma-subsampled streams anyway
    # (openni_device.cpp:96-156 converts from the sensor format). Host
    # packs depth u16 + Y full-res + U,V at 2x2 (1.06 MB total, -30%);
    # device reconstructs RGB in the unpack jit. Lossy in chroma only
    # (~+-2 levels roundtrip), reported as the color MAE below. ---
    hw = 640 * 480

    def pack_yuv(depth_mm, rgb):
        f = rgb.astype(np.float32)
        y = (0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2])
        u = ((f[..., 2] - y) * 0.564 + 128.0)
        v = ((f[..., 0] - y) * 0.713 + 128.0)
        u = u.reshape(240, 2, 320, 2).mean(axis=(1, 3))
        v = v.reshape(240, 2, 320, 2).mean(axis=(1, 3))
        return np.concatenate([
            depth_mm.astype("<u2").view(np.uint8).ravel(),
            np.clip(y + 0.5, 0, 255).astype(np.uint8).ravel(),
            np.clip(u + 0.5, 0, 255).astype(np.uint8).ravel(),
            np.clip(v + 0.5, 0, 255).astype(np.uint8).ravel()])

    @jax.jit
    def unpack_yuv(buf, ts):
        d = buf[: 2 * hw].reshape(hw, 2).astype(jnp.uint16)
        depth = (d[:, 0] | (d[:, 1] << 8)).reshape(480, 640)
        y = buf[2 * hw: 3 * hw].reshape(480, 640).astype(jnp.float32)
        u = buf[3 * hw: 3 * hw + hw // 4].reshape(240, 320).astype(
            jnp.float32) - 128.0
        v = buf[3 * hw + hw // 4:].reshape(240, 320).astype(
            jnp.float32) - 128.0
        u = jnp.repeat(jnp.repeat(u, 2, axis=0), 2, axis=1)
        v = jnp.repeat(jnp.repeat(v, 2, axis=0), 2, axis=1)
        r = y + 1.403 * v
        b = y + 1.773 * u
        g = (y - 0.299 * r - 0.114 * b) / 0.587
        color = jnp.clip(jnp.stack([r, g, b], axis=-1) + 0.5,
                         0, 255).astype(jnp.uint8)
        return Frame(depth=depth, color=color, timestamp=ts)

    # chroma roundtrip fidelity on one frame
    d0, c0, _ = host_frames[0]
    rt = np.asarray(unpack_yuv(jnp.asarray(pack_yuv(d0, c0)),
                               jnp.float32(0.0)).color)
    results["yuv_color_mae_levels"] = round(
        float(np.abs(rt.astype(int) - c0.astype(int)).mean()), 3)
    results["yuv_depth_bit_equal"] = bool(
        np.array_equal(np.asarray(unpack_yuv(
            jnp.asarray(pack_yuv(d0, c0)), jnp.float32(0.0)).depth), d0))

    def yuv_gen():
        for d, c, ts in raw_decoded():
            yield unpack_yuv(jnp.asarray(pack_yuv(d, c)), jnp.float32(ts))
    run_arm(yuv_gen(), "e2e_yuv420", n)

    def yuv_ahead_gen(depth_q=2):
        q = queue.Queue(maxsize=depth_q)

        def feeder():
            for d, c, ts in raw_decoded():
                q.put((jnp.asarray(pack_yuv(d, c)), jnp.float32(ts)))
            q.put(None)

        threading.Thread(target=feeder, daemon=True).start()
        while True:
            item = q.get()
            if item is None:
                return
            yield unpack_yuv(*item)
    run_arm(yuv_ahead_gen(), "e2e_yuv420_ahead", n)

    print(json.dumps({"config": "tum_ingest_ab", **results}), flush=True)


if __name__ == "__main__":
    main()
