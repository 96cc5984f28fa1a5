"""Fly-camera map viewer: the interactive display loop, offline.

The reference couples a GLFW window to a fly camera and re-renders the map
every tick (main.cpp:47,115-124 + glfw_camera_controller.cpp:38-106). This
environment has no display, so the viewer is keyboard-SCRIPT driven: a
movement script expands to per-tick CameraInputs, render/camera_controller
integrates them into poses exactly like the GLFW handler would, and every
tick's map render is written as a PNG frame (a video of the flight).

Script DSL (semicolon-separated, times in seconds at --fps ticks):
    w 1.0            fly forward 1 s        (arrows/WASD, :52-67)
    s | a | d        back / strafe left / right
    up 0.5 | down    vertical
    look 0.4 -0.1    mouse drag by (dx, dy) normalized units (:69-80)
    zoom -10         scroll FoV change in degrees (:94-99)
    wait 0.5         hold position (renders frames)

Usage:
    python -m octree_slam_tpu.viewer --load-state map.npz --out flight/ \
        --script "look 0.3 0; w 1.5; look 0 -0.2; s 0.5"
    (no --load-state: builds a small synthetic-orbit map first)
"""

from __future__ import annotations

import argparse
import math
from typing import Iterator, List, Tuple

import numpy as np

from octree_slam_tpu.render import camera_controller as fly


def parse_script(script: str, fps: float
                 ) -> List[fly.CameraInputs]:
    """Expand the movement script into one CameraInputs per tick."""
    ticks: List[fly.CameraInputs] = []
    for cmd in script.split(";"):
        parts = cmd.strip().split()
        if not parts:
            continue
        op = parts[0].lower()
        args = [float(x) for x in parts[1:]]
        dur = args[0] if op in ("w", "s", "a", "d", "up", "down", "wait") \
            and args else 0.5
        n = max(1, round(dur * fps))
        if op == "w":
            ticks += [fly.CameraInputs(forward=1.0)] * n
        elif op == "s":
            ticks += [fly.CameraInputs(forward=-1.0)] * n
        elif op == "d":
            ticks += [fly.CameraInputs(strafe=1.0)] * n
        elif op == "a":
            ticks += [fly.CameraInputs(strafe=-1.0)] * n
        elif op == "up":
            ticks += [fly.CameraInputs(rise=1.0)] * n
        elif op == "down":
            ticks += [fly.CameraInputs(rise=-1.0)] * n
        elif op == "wait":
            ticks += [fly.CameraInputs()] * n
        elif op == "look":
            dx, dy = args[0], args[1] if len(args) > 1 else 0.0
            n = max(1, round(0.5 * fps))
            ticks += [fly.CameraInputs(drag_x=dx / n, drag_y=dy / n)] * n
        elif op == "zoom":
            ticks.append(fly.CameraInputs(scroll=args[0]))
        else:
            raise ValueError(f"unknown viewer command {op!r}")
    return ticks


def fly_poses(start: fly.FlyCameraState, ticks: List[fly.CameraInputs],
              dt: float) -> Iterator[Tuple[fly.FlyCameraState, np.ndarray]]:
    """Integrate the script into sensor-convention world_T_cam poses.

    camera_controller follows the GL look-at convention (view looks down
    -z); the renderers use the sensor convention (+z forward, x right), so
    flip the x/z basis columns of camera->world (see examples/
    voxelize_demo.py for the same adapter)."""
    state = start
    for inp in ticks:
        state = fly.update(state, inp, dt)
        cam = fly.camera(state, aspect=4.0 / 3.0)
        pose = np.linalg.inv(np.asarray(cam.view)).astype(np.float32)
        pose[:3, 0] *= -1.0
        pose[:3, 2] *= -1.0
        yield state, pose


def run_viewer(pool, leaves, cfg, *, script: str, out_dir: str,
               start: fly.FlyCameraState | None = None,
               mode: str = "cone", fps: float = 10.0) -> int:
    """Render the scripted flight over a map; returns the frame count."""
    import pathlib

    import jax.numpy as jnp

    from octree_slam_tpu.io.bmp import save_image
    from octree_slam_tpu.render import conesplat
    from octree_slam_tpu.render.splat import render_splat

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if start is None:
        c = np.asarray(pool.center)
        start = fly.FlyCameraState(
            position=(float(c[0]), float(c[1]),
                      float(c[2]) + 0.6 * float(pool.half_size)),
            yaw=math.pi)
    spec = conesplat.make_slab_spec(
        width=cfg.width, height=cfg.height, fx=cfg.focal_x,
        leaf_size=2.0 * float(pool.half_size) / (1 << cfg.max_depth),
        z_near=cfg.cone_znear, z_far=cfg.max_range,
        n_slabs=cfg.cone_slabs, max_scale=cfg.cone_max_scale)

    ticks = parse_script(script, fps)
    n = 0
    for state, pose in fly_poses(start, ticks, 1.0 / fps):
        # scroll-FoV maps to the focal length, like the reference's
        # perspective(fov) rebuild each tick (glfw_camera_controller.cpp:85)
        f = cfg.height / 2.0 / math.tan(math.radians(state.fov) / 2.0)
        if mode == "cone":
            fb = conesplat.render_cone_splat(
                leaves, pool.center, pool.half_size, jnp.asarray(pose),
                f, f, spec=spec, depth=cfg.max_depth)
        else:
            fb = render_splat(pool, leaves, jnp.asarray(pose), f, f,
                              width=cfg.width, height=cfg.height,
                              depth=cfg.max_depth, max_range=cfg.max_range)
        save_image(str(out / f"fly_{n:05d}.png"), np.asarray(fb))
        n += 1
    return n


DEFAULT_SCRIPT = "wait 0.3; look 0.25 0; w 0.4; look -0.5 0; w 0.4; " \
                 "look 0.25 -0.1; up 0.25; zoom -8; wait 0.3"


def main(argv=None):
    p = argparse.ArgumentParser(description="scripted fly-camera viewer")
    p.add_argument("--load-state", type=str, default=None,
                   help="SLAM state .npz from the app's --save-state")
    p.add_argument("--out", type=str, default="out_fly")
    p.add_argument("--script", type=str, default=DEFAULT_SCRIPT)
    p.add_argument("--mode", choices=["cone", "splat"], default="cone")
    p.add_argument("--fps", type=float, default=10.0)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--max-depth", type=int, default=9)
    p.add_argument("--resolution", type=float, default=0.02)
    p.add_argument("--node-capacity", type=int, default=1 << 20)
    p.add_argument("--orbit-frames", type=int, default=8,
                   help="without --load-state: frames of synthetic orbit "
                        "SLAM used to build a map to fly through")
    args = p.parse_args(argv)

    from octree_slam_tpu.utils import runtime
    runtime.setup()

    from octree_slam_tpu import app, pipeline
    from octree_slam_tpu.config import SLAMConfig

    cfg = SLAMConfig(width=args.width, height=args.height,
                     max_depth=args.max_depth,
                     voxel_resolution=args.resolution,
                     node_capacity=args.node_capacity,
                     leaf_capacity=args.node_capacity >> 3)
    if args.load_state:
        state, cfg = app.load_state(args.load_state, cfg)
    else:
        from octree_slam_tpu.sensor import sources
        scene = sources.default_scene()
        gt = [sources.orbit_pose(i * 0.01, radius=2.0)
              for i in range(args.orbit_frames)]
        sink: list = []
        app.run_slam(
            lambda i: sources.render_frame(scene, gt[i], cfg.focal_x,
                                           cfg.focal_y, width=cfg.width,
                                           height=cfg.height),
            args.orbit_frames, cfg, initial_pose=gt[0], render_every=0,
            state_out=sink)
        state = sink[0]

    n = run_viewer(state.pool, state.leaves, cfg, script=args.script,
                   out_dir=args.out, mode=args.mode, fps=args.fps)
    print(f"wrote {n} flight frames to {args.out}/")


if __name__ == "__main__":
    main()
