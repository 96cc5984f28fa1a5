"""Virtual fly camera.

Replaces GLFWCameraController (glfw_camera_controller.cpp:16-106): WASD/
arrow translation, click-drag look, scroll FoV — as a pure state-update
function on host floats (no window system; inputs come from whatever UI
drives the framebuffer). Fixes the reference's deltaTime bug
(glfw_camera_controller.cpp:45 assigns instead of subtracting).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from typing import Tuple

import numpy as np

from octree_slam_tpu.core import camera as cam_mod
from octree_slam_tpu.core.types import Camera


@dataclass(frozen=True)
class FlyCameraState:
    position: Tuple[float, float, float] = (0.0, 0.0, 3.0)
    yaw: float = math.pi          # radians; pi looks down -z
    pitch: float = 0.0
    fov: float = 45.0             # degrees, scroll-adjustable
    move_speed: float = 2.0       # m/s
    look_speed: float = 0.2       # rad per normalized drag unit


@dataclass(frozen=True)
class CameraInputs:
    forward: float = 0.0   # +1 W / -1 S
    strafe: float = 0.0    # +1 D / -1 A
    rise: float = 0.0      # +1 up / -1 down
    drag_x: float = 0.0    # normalized mouse drag
    drag_y: float = 0.0
    scroll: float = 0.0    # FoV delta


def update(state: FlyCameraState, inputs: CameraInputs,
           dt: float) -> FlyCameraState:
    """Advance the fly camera by one tick (the reference's update(),
    glfw_camera_controller.cpp:38-80)."""
    yaw = state.yaw + inputs.drag_x * state.look_speed
    pitch = float(np.clip(state.pitch + inputs.drag_y * state.look_speed,
                          -1.5, 1.5))
    fwd = np.array([math.sin(yaw) * math.cos(pitch),
                    math.sin(pitch),
                    math.cos(yaw) * math.cos(pitch)])
    # right = normalize(cross(forward, up)) — matching look_at's
    # s = f x up convention (flat-pitch closed form)
    right = np.array([-math.cos(yaw), 0.0, math.sin(yaw)])
    up = np.array([0.0, 1.0, 0.0])
    pos = np.asarray(state.position) + state.move_speed * dt * (
        inputs.forward * fwd + inputs.strafe * right + inputs.rise * up)
    fov = float(np.clip(state.fov + inputs.scroll, 10.0, 120.0))
    return replace(state, position=tuple(pos), yaw=yaw, pitch=pitch, fov=fov)


def camera(state: FlyCameraState, aspect: float,
           z_near: float = 0.001, z_far: float = 10000.0) -> Camera:
    """Build view/projection matrices (glfw_camera_controller.cpp:82-88)."""
    pos = np.asarray(state.position)
    fwd = np.array([math.sin(state.yaw) * math.cos(state.pitch),
                    math.sin(state.pitch),
                    math.cos(state.yaw) * math.cos(state.pitch)])
    return cam_mod.make_camera(pos, pos + fwd, (0.0, 1.0, 0.0),
                               state.fov, aspect, z_near, z_far)
