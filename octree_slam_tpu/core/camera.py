"""Pinhole camera model and view/projection matrix builders.

Replaces the glm::lookAt/perspective usage of the GLFW fly-camera
(glfw_camera_controller.cpp:82-88) and the pinhole backprojection constants
of the sensor path (image_kernels.cu:49-51).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from octree_slam_tpu.core.types import Camera


class Intrinsics(NamedTuple):
    fx: jnp.ndarray  # f32[]
    fy: jnp.ndarray  # f32[]
    cx: jnp.ndarray  # f32[] principal point (pixels)
    cy: jnp.ndarray  # f32[]


def intrinsics_from_fov(width: int, height: int, h_fov_deg: float, v_fov_deg: float) -> Intrinsics:
    """Focal length from field-of-view, as OpenNIDevice does
    (openni_device.cpp:64-65: f = size / (2 tan(fov/2)))."""
    fx = width / (2.0 * math.tan(math.radians(h_fov_deg) / 2.0))
    fy = height / (2.0 * math.tan(math.radians(v_fov_deg) / 2.0))
    return Intrinsics(
        fx=jnp.float32(fx),
        fy=jnp.float32(fy),
        cx=jnp.float32(width / 2.0),
        cy=jnp.float32(height / 2.0),
    )


def look_at(eye: jnp.ndarray, center: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """Right-handed view matrix (glm::lookAt semantics)."""
    f = center - eye
    f = f / jnp.linalg.norm(f)
    s = jnp.cross(f, up)
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, f)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[0, :3].set(s)
    m = m.at[1, :3].set(u)
    m = m.at[2, :3].set(-f)
    m = m.at[0, 3].set(-jnp.dot(s, eye))
    m = m.at[1, 3].set(-jnp.dot(u, eye))
    m = m.at[2, 3].set(jnp.dot(f, eye))
    return m


def perspective(fov_y_deg, aspect: float, z_near: float = 0.001, z_far: float = 10000.0) -> jnp.ndarray:
    """Right-handed perspective projection (glm::perspective semantics;
    zNear/zFar defaults from glfw_camera_controller.cpp:20-21)."""
    fov_y = jnp.deg2rad(jnp.asarray(fov_y_deg, jnp.float32))
    t = 1.0 / jnp.tan(fov_y / 2.0)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(t / aspect)
    m = m.at[1, 1].set(t)
    m = m.at[2, 2].set(-(z_far + z_near) / (z_far - z_near))
    m = m.at[2, 3].set(-(2.0 * z_far * z_near) / (z_far - z_near))
    m = m.at[3, 2].set(-1.0)
    return m


def make_camera(eye, center, up, fov_y_deg: float, aspect: float,
                z_near: float = 0.001, z_far: float = 10000.0) -> Camera:
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    return Camera(
        model=jnp.eye(4, dtype=jnp.float32),
        view=look_at(eye, center, up),
        projection=perspective(fov_y_deg, aspect, z_near, z_far),
        fov=jnp.float32(fov_y_deg),
    )
