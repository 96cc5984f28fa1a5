"""LIVE interactive map viewer in the terminal (no display server).

The reference's presentation layer is a GLFW window whose main loop polls
keyboard/mouse, re-renders the map every tick, and prints the frame rate
into the window title (main.cpp:47,68-78,115-124 +
glfw_camera_controller.cpp:38-106). This environment has no GL/display, so
the live loop runs in the terminal instead:

  * the framebuffer draws as 24-bit-color ANSI half-blocks (U+2580 upper
    half block: two image rows per character cell, foreground = top pixel,
    background = bottom pixel);
  * the keyboard is read raw (termios cbreak + select poll): W/S/A/D move,
    R/F rise/sink, arrow keys look, +/- zoom (FoV), TAB switches
    splat <-> cone rendering, Q quits;
  * the status line carries the live FPS exactly where the reference put
    it in the window title.

Camera semantics are camera_controller.update — the same per-tick
integration the scripted viewer (viewer.py) uses, which mirrors the GLFW
handler it replaces. The render path is the production one (render_splat /
conesplat.render_cone_splat on the SLAM map state).

Usage:
    python -m octree_slam_tpu.live_viewer --load-state map.npz
    python -m octree_slam_tpu.live_viewer            # synthetic-orbit map

The core is tty-free and test-driven: LiveViewer.feed(keys) + .tick()
advance the camera and return the frame; only main() touches termios.
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from typing import Tuple

import numpy as np

from octree_slam_tpu.render import camera_controller as fly

# key -> CameraInputs field deltas (held-key emulation via autorepeat)
_MOVES = {
    "w": ("forward", 1.0), "s": ("forward", -1.0),
    "d": ("strafe", 1.0), "a": ("strafe", -1.0),
    "r": ("rise", 1.0), "f": ("rise", -1.0),
    "UP": ("drag_y", 1.0), "DOWN": ("drag_y", -1.0),
    "LEFT": ("drag_x", 1.0), "RIGHT": ("drag_x", -1.0),
    "+": ("scroll", -2.0), "-": ("scroll", 2.0),
}

_CSI_KEYS = {"A": "UP", "B": "DOWN", "C": "RIGHT", "D": "LEFT"}


def decode_keys(raw: bytes) -> list:
    """Decode a raw stdin chunk into key tokens ('w', 'UP', 'q', ...)."""
    keys = []
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0x1B and i + 2 < len(raw) and raw[i + 1:i + 2] == b"[":
            tok = _CSI_KEYS.get(chr(raw[i + 2]))
            if tok:
                keys.append(tok)
            i += 3
            continue
        ch = chr(b)
        keys.append(ch.lower() if ch.isalpha() else ch)
        i += 1
    return keys


def ansi_frame(rgb8: np.ndarray, home: bool = True) -> str:
    """Render u8[H, W, 3] (H even) as truecolor half-block rows.

    Consecutive cells reuse the previous SGR when both colors repeat, so
    flat regions cost 1 byte/cell instead of ~40."""
    h, w, _ = rgb8.shape
    top = rgb8[0::2]
    bot = rgb8[1::2]
    out = ["\x1b[H"] if home else []
    last = None
    for y in range(h // 2):
        row = []
        for x in range(w):
            fg = (int(top[y, x, 0]), int(top[y, x, 1]), int(top[y, x, 2]))
            bg = (int(bot[y, x, 0]), int(bot[y, x, 1]), int(bot[y, x, 2]))
            if (fg, bg) != last:
                row.append("\x1b[38;2;%d;%d;%d;48;2;%d;%d;%dm"
                           % (fg + bg))
                last = (fg, bg)
            row.append("▀")
        row.append("\x1b[0m\n")
        last = None
        out.append("".join(row))
    return "".join(out)


class LiveViewer:
    """tty-free interactive core: feed keys, tick, get frames."""

    def __init__(self, pool, leaves, cfg, *, width: int, height: int,
                 mode: str = "splat",
                 start: fly.FlyCameraState | None = None):
        from octree_slam_tpu.render import conesplat

        assert height % 2 == 0, "half-block drawing needs an even height"
        self.pool, self.leaves, self.cfg = pool, leaves, cfg
        self.width, self.height = width, height
        self.mode = mode
        self.quit = False
        self._pending: dict = {}
        if start is None:
            c = np.asarray(pool.center)
            start = fly.FlyCameraState(
                position=(float(c[0]), float(c[1]),
                          float(c[2]) + 0.6 * float(pool.half_size)),
                yaw=math.pi)
        self.state = start
        self._spec = conesplat.make_slab_spec(
            width=width, height=height, fx=self._focal(),
            leaf_size=2.0 * float(pool.half_size) / (1 << cfg.max_depth),
            z_near=cfg.cone_znear, z_far=cfg.max_range,
            n_slabs=cfg.cone_slabs, max_scale=cfg.cone_max_scale)

    def _focal(self) -> float:
        return (self.height / 2.0
                / math.tan(math.radians(self.state.fov) / 2.0))

    def feed(self, keys) -> None:
        """Accumulate key tokens for the next tick."""
        for k in keys:
            if k == "q":
                self.quit = True
            elif k == "\t":
                self.mode = "cone" if self.mode == "splat" else "splat"
            elif k in _MOVES:
                field, amount = _MOVES[k]
                self._pending[field] = self._pending.get(field, 0.0) + amount

    def tick(self, dt: float = 0.1) -> np.ndarray:
        """Integrate pending inputs and render one frame -> f32[H, W, 4].

        drag/scroll are per-event (not time-scaled), movement is m/s * dt
        -- the same split as the GLFW handler (drags arrive as deltas,
        glfw_camera_controller.cpp:69-80)."""
        import jax.numpy as jnp

        from octree_slam_tpu.render import conesplat
        from octree_slam_tpu.render.splat import render_splat

        p = self._pending
        self._pending = {}
        inp = fly.CameraInputs(
            forward=p.get("forward", 0.0), strafe=p.get("strafe", 0.0),
            rise=p.get("rise", 0.0),
            drag_x=0.35 * p.get("drag_x", 0.0),
            drag_y=0.35 * p.get("drag_y", 0.0),
            scroll=p.get("scroll", 0.0))
        self.state = fly.update(self.state, inp, dt)
        # GL look-at convention -> sensor convention (see viewer.fly_poses)
        cam = fly.camera(self.state, aspect=self.width / self.height)
        pose = np.linalg.inv(np.asarray(cam.view)).astype(np.float32)
        pose[:3, 0] *= -1.0
        pose[:3, 2] *= -1.0
        f = self._focal()
        if self.mode == "cone":
            fb = conesplat.render_cone_splat(
                self.leaves, self.pool.center, self.pool.half_size,
                jnp.asarray(pose), f, f, spec=self._spec,
                depth=self.cfg.max_depth)
        else:
            fb = render_splat(self.pool, self.leaves, jnp.asarray(pose),
                              f, f, width=self.width, height=self.height,
                              depth=self.cfg.max_depth,
                              max_range=self.cfg.max_range)
        return np.asarray(fb)

    def status(self, fps: float) -> str:
        """The reference's title-bar line (main.cpp:68-78)."""
        x, y, z = self.state.position
        return ("\x1b[0m octree-slam-tpu | %4.1f fps | %s | "
                "pos (%.2f %.2f %.2f) yaw %.2f pitch %.2f fov %.0f | "
                "WASD move RF rise arrows look +- zoom TAB mode Q quit\x1b[K"
                % (fps, self.mode, x, y, z, self.state.yaw,
                   self.state.pitch, self.state.fov))


def pick_size(cols: int, rows: int) -> Tuple[int, int]:
    """Largest render size fitting the terminal: one char column per
    pixel, two image rows per text row (minus the status line), shaved to
    multiples of 8 (lane-friendly, and conesplat's slab scales divide)."""
    w = max(32, (cols // 8) * 8)
    h = max(32, ((2 * (rows - 2)) // 8) * 8)
    return w, h


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="live terminal map viewer")
    p.add_argument("--load-state", type=str, default=None,
                   help="SLAM state .npz from the app's --save-state")
    p.add_argument("--mode", choices=["splat", "cone"], default="splat")
    p.add_argument("--fps", type=float, default=15.0,
                   help="tick rate cap")
    p.add_argument("--max-depth", type=int, default=9)
    p.add_argument("--resolution", type=float, default=0.02)
    p.add_argument("--node-capacity", type=int, default=1 << 20)
    p.add_argument("--orbit-frames", type=int, default=8,
                   help="without --load-state: frames of synthetic orbit "
                        "SLAM used to build a map to fly through")
    p.add_argument("--ticks", type=int, default=0,
                   help="exit after N ticks (0 = until Q); for smoke runs")
    args = p.parse_args(argv)

    from octree_slam_tpu.utils import runtime
    runtime.setup()

    from octree_slam_tpu import app
    from octree_slam_tpu.config import SLAMConfig

    import shutil
    size = shutil.get_terminal_size((100, 40))
    w, h = pick_size(size.columns, size.lines)

    cfg = SLAMConfig(width=w, height=h,
                     focal_x=0.8 * w, focal_y=0.8 * w,
                     max_depth=args.max_depth,
                     voxel_resolution=args.resolution,
                     node_capacity=args.node_capacity,
                     leaf_capacity=args.node_capacity >> 3)
    if args.load_state:
        state, cfg = app.load_state(args.load_state, cfg)
    else:
        from octree_slam_tpu.sensor import sources
        scene = sources.default_scene()
        build = SLAMConfig(width=320, height=240, focal_x=265.0,
                           focal_y=265.0, max_depth=args.max_depth,
                           voxel_resolution=args.resolution,
                           node_capacity=args.node_capacity,
                           leaf_capacity=args.node_capacity >> 3)
        gt = [sources.orbit_pose(i * 0.01, radius=2.0)
              for i in range(args.orbit_frames)]
        sink: list = []
        app.run_slam(
            lambda i: sources.render_frame(scene, gt[i], build.focal_x,
                                           build.focal_y, width=build.width,
                                           height=build.height),
            args.orbit_frames, build, initial_pose=gt[0], render_every=0,
            state_out=sink)
        state = sink[0]

    viewer = LiveViewer(state.pool, state.leaves, cfg, width=w, height=h,
                        mode=args.mode)

    interactive = sys.stdin.isatty()
    if interactive:
        import termios
        import tty
        fd = sys.stdin.fileno()
        saved = termios.tcgetattr(fd)
        tty.setcbreak(fd)
    sys.stdout.write("\x1b[2J\x1b[?25l")  # clear, hide cursor
    fps = 0.0
    n = 0
    try:
        while not viewer.quit:
            t0 = time.perf_counter()
            if interactive:
                import os
                import select
                while select.select([sys.stdin], [], [], 0)[0]:
                    viewer.feed(decode_keys(os.read(fd, 64)))
            fb = viewer.tick(dt=1.0 / args.fps)
            rgb8 = np.clip(fb[..., :3] * 255.0, 0, 255).astype(np.uint8)
            sys.stdout.write(ansi_frame(rgb8))
            sys.stdout.write(viewer.status(fps))
            sys.stdout.flush()
            n += 1
            if args.ticks and n >= args.ticks:
                break
            dt = time.perf_counter() - t0
            if dt < 1.0 / args.fps:
                time.sleep(1.0 / args.fps - dt)
            fps = 1.0 / max(time.perf_counter() - t0, 1e-6)
    finally:
        sys.stdout.write("\x1b[0m\x1b[?25h\n")
        sys.stdout.flush()
        if interactive:
            termios.tcsetattr(fd, termios.TCSADRAIN, saved)
    return n


if __name__ == "__main__":
    main()
