"""SE(3) utilities: exp map, composition, point/normal transforms.

The reference composes incremental ICP updates from per-axis glm::rotate calls
with a radians-interpreted-as-degrees quirk (rgbd_camera.cpp:154-158) and a
non-standard skew packing in the Jacobian (localization_kernels.cu:131-132).
Per SURVEY.md section 7 we implement the mathematically correct exponential
map and validate trajectories against ground truth instead of bug-for-bug.

Conventions: transforms are 4x4 row-major matrices acting on column vectors,
T = [[R, t], [0, 1]]. A twist is x = [omega(3), v(3)].
"""

from __future__ import annotations

import jax.numpy as jnp


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of w: hat(w) @ v == cross(w, v)."""
    zero = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zero, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation from an axis-angle vector (safe at theta -> 0)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-30)
    K = hat(w)
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks near zero
    small = theta < 1e-5
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def exp_se3(twist: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential of [omega, v] -> 4x4 transform."""
    w, v = twist[..., :3], twist[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-30)
    K = hat(w)
    small = theta < 1e-5
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2)
    eye = jnp.eye(3, dtype=twist.dtype)
    R = eye + a[..., None, None] * K + b[..., None, None] * (K @ K)
    V = eye + b[..., None, None] * K + c[..., None, None] * (K @ K)
    t = (V @ v[..., None])[..., 0]
    T = jnp.zeros(twist.shape[:-1] + (4, 4), twist.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def make_transform(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -(Rt @ t[..., None])[..., 0]
    out = jnp.zeros_like(T)
    out = out.at[..., :3, :3].set(Rt)
    out = out.at[..., :3, 3].set(ti)
    out = out.at[..., 3, 3].set(1.0)
    return out


def transform_points(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply T to points, w=1 (transformVertexMap, image_kernels.cu:206-219)."""
    return p @ jnp.swapaxes(T[..., :3, :3], -1, -2) + T[..., :3, 3]


def transform_dirs(T: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Apply T to directions, w=0 (transformNormalMap, image_kernels.cu:221-234)."""
    return d @ jnp.swapaxes(T[..., :3, :3], -1, -2)
