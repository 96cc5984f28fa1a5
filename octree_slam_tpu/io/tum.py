"""TUM RGB-D dataset loader (the file-based FrameSource of SURVEY.md
section 4: replaces OpenNIDevice for benchmark replay).

Dataset layout (vision.in.tum.de/data/datasets/rgbd-dataset):
  rgb.txt / depth.txt: "timestamp filename" listings
  groundtruth.txt: "timestamp tx ty tz qx qy qz qw"
Depth PNGs are 16-bit with 5000 units per meter -> mm = value / 5.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from octree_slam_tpu.core.types import Frame

DEPTH_FACTOR_TO_MM = 5.0  # TUM: 5000 per meter; sensor path wants mm


def pack_frame(depth_mm: np.ndarray, rgb: np.ndarray) -> np.ndarray:
    """One u8[H*W*5] ingest buffer: depth as u16 little-endian bytes,
    then rgb — a single host->device transfer per frame (the measured
    win over two per-array uploads; see TUMDataset.prefetched)."""
    return np.concatenate([depth_mm.astype("<u2").view(np.uint8).ravel(),
                           rgb.ravel()])


def _unpack_packed_frame(buf, ts, *, h: int, w: int) -> Frame:
    """Device-side split of pack_frame's buffer back into a Frame."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("h", "w"))
    def _split(buf, ts, h, w):
        n = h * w
        d = buf[: 2 * n].reshape(n, 2).astype(jnp.uint16)
        depth = (d[:, 0] | (d[:, 1] << 8)).reshape(h, w)
        color = buf[2 * n:].reshape(h, w, 3)
        return Frame(depth=depth, color=color, timestamp=ts)

    return _split(buf, ts, h, w)


def _read_list(path: str) -> List[Tuple[float, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def _read_groundtruth(path: str) -> List[Tuple[float, np.ndarray]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(x) for x in line.split()]
            t, tx, ty, tz, qx, qy, qz, qw = vals[:8]
            # quaternion -> rotation matrix
            n = np.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
            qx, qy, qz, qw = qx / n, qy / n, qz / n, qw / n
            R = np.array([
                [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
                [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
                [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
            ])
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R
            T[:3, 3] = [tx, ty, tz]
            out.append((t, T))
    return out


def _associate(a: List[Tuple[float, str]], b: List[Tuple[float, str]],
               max_dt: float = 0.02):
    """Nearest-timestamp association (the TUM associate.py algorithm)."""
    pairs = []
    bi = 0
    for ta, fa in a:
        while bi + 1 < len(b) and abs(b[bi + 1][0] - ta) <= abs(b[bi][0] - ta):
            bi += 1
        if abs(b[bi][0] - ta) <= max_dt:
            pairs.append(((ta, fa), b[bi]))
    return pairs


class TUMDataset:
    """Replay source over a TUM RGB-D sequence directory.

    Kinect intrinsics default to the TUM fr1 calibration.
    """

    FX, FY, CX, CY = 517.3, 516.5, 318.6, 255.3

    def __init__(self, root: str, max_frames: int | None = None):
        self.root = root
        rgb = _read_list(os.path.join(root, "rgb.txt"))
        depth = _read_list(os.path.join(root, "depth.txt"))
        self.pairs = _associate(depth, rgb)
        if max_frames:
            self.pairs = self.pairs[:max_frames]
        gt_path = os.path.join(root, "groundtruth.txt")
        self.groundtruth = _read_groundtruth(gt_path) if os.path.exists(gt_path) else []

    def __len__(self):
        return len(self.pairs)

    def frame(self, i: int) -> Frame:
        import jax.numpy as jnp

        (td, fd), (tr, fr) = self.pairs[i]
        depth_path = os.path.join(self.root, fd)
        rgb_path = os.path.join(self.root, fr)
        try:
            from octree_slam_tpu.io import native
            if native.available():
                depth_raw = native.read_png(depth_path)
                color = native.read_png(rgb_path)
            else:
                raise ImportError
        except (ImportError, OSError):
            from PIL import Image
            depth_raw = np.asarray(Image.open(depth_path))
            color = np.asarray(Image.open(rgb_path).convert("RGB"))
        depth_mm = (depth_raw.astype(np.float32) / DEPTH_FACTOR_TO_MM)
        depth_mm = np.clip(depth_mm, 0, 65535).astype(np.uint16)
        return Frame(depth=jnp.asarray(depth_mm), color=jnp.asarray(color),
                     timestamp=jnp.float32(td))

    def prefetched(self, n_threads: int = 3, capacity: int = 8,
                   packed: bool = True, ahead: int = 2):
        """Generator of Frames decoded ahead by the native threaded
        prefetcher (native/src/prefetch.cpp): PNG inflate overlaps the TPU
        step instead of serializing with it. Falls back to sequential
        frame() decoding when the native runtime is unavailable.

        Default ingest is PACKED + AHEAD (the round-5 A/B winner,
        examples/tum_ingest_ab.py on the real TPU, 40 frames at 640x480):
        depth (u16 LE bytes) + rgb ship as ONE u8 buffer per frame — one
        transfer instead of two — split on device by a tiny jit, and a
        feeder thread decodes AND uploads `ahead` frames in front so
        ingest of frame i+1 overlaps frame i's step. Measured e2e incl.
        PNG decode: serial per-array 48.2 fps, +ahead 49.9, +packed 51.5,
        packed+ahead 53.4 (staged ceiling 90.5; decode alone 8.6
        ms/frame, split uploads 22.6 ms vs packed 18.6). A YUV 4:2:0
        chroma-subsampled variant (-30% bytes) measured SLOWER (46.0 /
        41.2) — the host-side pack math eats the transfer savings — and
        is lossy, so it was rejected. packed=False, ahead=0 restores the
        plain per-array path.

        Per-frame uploads (no K-frame batching) remain ON PURPOSE: a
        feeder variant that stacked K decoded frames into one
        [K,H,W(,3)] transfer and yielded device-side slices was measured
        same-tunnel (A/B, 2 reps): batch 1 = {12.4, 27.4} fps e2e,
        batch 4 = {12.4, 26.0}, batch 8 = {7.9, 20.5} — at best neutral
        (per-frame jnp.asarray already overlaps the step via async
        dispatch), large batches actively stall the stream."""
        import queue
        import threading

        import jax.numpy as jnp
        from octree_slam_tpu.io import native

        if not self.pairs:
            return
        if not native.available():
            for i in range(len(self.pairs)):
                yield self.frame(i)
            return
        probe = np.asarray(self.frame(0).depth)
        h, w = probe.shape
        dps = [os.path.join(self.root, fd) for (_, fd), _ in self.pairs]
        rps = [os.path.join(self.root, fr) for _, (_, fr) in self.pairs]
        tss = [p[0][0] for p in self.pairs]

        def decoded():
            with native.FramePrefetcher(dps, rps, w, h,
                                        depth_to_mm=1.0 / DEPTH_FACTOR_TO_MM,
                                        n_threads=n_threads,
                                        capacity=capacity) as pf:
                for i in range(len(self.pairs)):
                    nxt = pf.next()
                    if nxt is None:
                        return
                    yield nxt[0], nxt[1], tss[i]

        def upload(depth_mm, rgb, ts):
            if packed:
                return _unpack_packed_frame(
                    jnp.asarray(pack_frame(depth_mm, rgb)),
                    jnp.float32(ts), h=h, w=w)
            return Frame(depth=jnp.asarray(depth_mm),
                         color=jnp.asarray(rgb),
                         timestamp=jnp.float32(ts))

        if ahead <= 0:
            for d, c, ts in decoded():
                yield upload(d, c, ts)
            return

        q: "queue.Queue" = queue.Queue(maxsize=ahead)

        def feeder():
            for d, c, ts in decoded():
                q.put(upload(d, c, ts))
            q.put(None)

        threading.Thread(target=feeder, daemon=True).start()
        while True:
            f = q.get()
            if f is None:
                return
            yield f

    def gt_pose(self, i: int) -> np.ndarray | None:
        """Ground-truth world_T_cam nearest to frame i's timestamp."""
        if not self.groundtruth:
            return None
        t = self.pairs[i][0][0]
        times = np.array([g[0] for g in self.groundtruth])
        j = int(np.argmin(np.abs(times - t)))
        return self.groundtruth[j][1]


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> (qx, qy, qz, qw), Shepperd's branch-stable
    method (inverse of the parser above)."""
    R = np.asarray(R, np.float64)
    tr = R[0, 0] + R[1, 1] + R[2, 2]
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        qw = (R[2, 1] - R[1, 2]) / s
        qx = 0.25 * s
        qy = (R[0, 1] + R[1, 0]) / s
        qz = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        qw = (R[0, 2] - R[2, 0]) / s
        qx = (R[0, 1] + R[1, 0]) / s
        qy = 0.25 * s
        qz = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        qw = (R[1, 0] - R[0, 1]) / s
        qx = (R[0, 2] + R[2, 0]) / s
        qy = (R[1, 2] + R[2, 1]) / s
        qz = 0.25 * s
    return np.array([qx, qy, qz, qw], np.float64)


def write_trajectory(path: str, poses, timestamps=None) -> None:
    """Write world_T_cam poses in the TUM trajectory format
    ('timestamp tx ty tz qx qy qz qw' per line), consumable by the TUM
    RGB-D benchmark tools and evo for external ATE/RPE evaluation — the
    export half of _read_groundtruth. timestamps default to the frame
    index in seconds."""
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for i, T in enumerate(poses):
            T = np.asarray(T, np.float64)
            t = float(timestamps[i]) if timestamps is not None else float(i)
            q = rotmat_to_quat(T[:3, :3])
            f.write("%.6f %.6f %.6f %.6f %.6f %.6f %.6f %.6f\n"
                    % (t, T[0, 3], T[1, 3], T[2, 3], q[0], q[1], q[2], q[3]))
