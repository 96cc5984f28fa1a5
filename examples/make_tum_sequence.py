"""Generate a TUM-RGB-D-format sequence from the synthetic orbit scene.

The environment has no network access and no real TUM download, so the
fr1/desk replay config runs against a synthetic sequence written in the
EXACT on-disk format (vision.in.tum.de/data/datasets/rgbd-dataset):
16-bit depth PNGs at 5000 units/m, 8-bit RGB PNGs, `depth.txt`/`rgb.txt`
timestamp listings with deliberately offset clocks (exercises the
nearest-timestamp association), and `groundtruth.txt` with
tx ty tz qx qy qz qw rows. Running `--source tum` over it drives the real
file path end to end: association, quaternion ground truth, PNG decode
through the native threaded prefetcher, 5000-per-meter conversion.

Usage: python examples/make_tum_sequence.py --out /tmp/tum_synth --frames 30
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from octree_slam_tpu.utils import runtime

runtime.setup()

import numpy as np

from octree_slam_tpu.io.tum import TUMDataset
from octree_slam_tpu.sensor import sources


def rot_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> (qx, qy, qz, qw), TUM order."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k]) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[3] = (R[k, j] - R[j, k]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        qx, qy, qz, qw = q
    return np.array([qx, qy, qz, qw])


def write_sequence(out: str, n_frames: int = 30, width: int = 640,
                   height: int = 480) -> str:
    from PIL import Image

    root = pathlib.Path(out)
    (root / "depth").mkdir(parents=True, exist_ok=True)
    (root / "rgb").mkdir(parents=True, exist_ok=True)

    scene = sources.default_scene()
    fx, fy = TUMDataset.FX, TUMDataset.FY
    d_lines, r_lines, g_lines = [], [], []
    t0 = 1305031102.175304  # fr1-style epoch timestamps
    for i in range(n_frames):
        t = t0 + i / 30.0
        pose = np.asarray(sources.orbit_pose(i * 0.01, radius=2.0))
        f = sources.render_frame(scene, pose, fx, fy,
                                 width=width, height=height)
        depth_mm = np.asarray(f.depth).astype(np.float64)
        depth_tum = np.clip(depth_mm * 5.0, 0, 65535).astype(np.uint16)
        rgb = np.asarray(f.color)
        dname = f"depth/{t:.6f}.png"
        rname = f"rgb/{t + 0.011:.6f}.png"  # offset clock: association work
        Image.fromarray(depth_tum).save(root / dname)
        Image.fromarray(rgb).save(root / rname)
        d_lines.append(f"{t:.6f} {dname}")
        r_lines.append(f"{t + 0.011:.6f} {rname}")
        q = rot_to_quat(pose[:3, :3])
        tr = pose[:3, 3]
        g_lines.append(f"{t:.6f} {tr[0]:.6f} {tr[1]:.6f} {tr[2]:.6f} "
                       f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}")

    hdr = "# synthetic orbit sequence in TUM RGB-D format\n"
    (root / "depth.txt").write_text(hdr + "\n".join(d_lines) + "\n")
    (root / "rgb.txt").write_text(hdr + "\n".join(r_lines) + "\n")
    (root / "groundtruth.txt").write_text(hdr + "\n".join(g_lines) + "\n")
    return str(root)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="/tmp/tum_synth")
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    args = p.parse_args()
    root = write_sequence(args.out, args.frames, args.width, args.height)
    print(f"wrote {args.frames} TUM-format frames to {root}")
    print(f"replay: python -m octree_slam_tpu.app --source tum "
          f"--tum-root {root} --frames {args.frames}")


if __name__ == "__main__":
    main()
