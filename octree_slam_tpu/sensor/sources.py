"""Frame sources: synthetic RGB-D camera and replay streams.

The reference's only sensor is a live OpenNI device (openni_device.cpp) — a
hardware dependency. Per SURVEY.md section 4 the rebuild replaces it with a
`FrameSource` abstraction:

  * SyntheticScene renders exact depth+color frames from analytic geometry
    (spheres / axis-aligned boxes / planes) by closed-form ray casting —
    the ground-truth-trajectory test harness for ICP and fusion.
  * Replay-style dataset sources (TUM RGB-D) live in io/tum.py.

Conventions match the sensor path: camera looks down +z in its own frame,
pixel (x, y) backprojects to ((x - W/2) d/fx, (H/2 - y) d/fy, d) — the
inverse of generateVertexMap (image_kernels.cu:49-51). Depth images are
uint16 millimeters; zero = no return.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from octree_slam_tpu.core import se3
from octree_slam_tpu.core.types import Frame

_BIG = 1.0e9


class SyntheticScene(NamedTuple):
    """Analytic scene: spheres [n,4] (cx,cy,cz,r), boxes [m,6] (lo,hi),
    planes [k,4] (normal, offset: n.p = off), each with an RGB albedo."""

    spheres: jnp.ndarray        # f32[ns, 4]
    sphere_albedo: jnp.ndarray  # f32[ns, 3]
    boxes: jnp.ndarray          # f32[nb, 6]
    box_albedo: jnp.ndarray     # f32[nb, 3]
    planes: jnp.ndarray         # f32[np, 4]
    plane_albedo: jnp.ndarray   # f32[np, 3]


def default_scene() -> SyntheticScene:
    """A small 'desk' scene: floor + back wall + three colored spheres + box."""
    return SyntheticScene(
        spheres=jnp.array(
            [
                [0.0, 0.2, 0.0, 0.45],
                [0.9, 0.0, 0.4, 0.3],
                [-0.8, -0.1, -0.3, 0.25],
            ],
            jnp.float32,
        ),
        sphere_albedo=jnp.array(
            [[0.9, 0.2, 0.15], [0.2, 0.8, 0.25], [0.2, 0.3, 0.9]], jnp.float32),
        boxes=jnp.array([[0.3, -0.5, -0.9, 0.9, 0.1, -0.4]], jnp.float32),
        box_albedo=jnp.array([[0.9, 0.8, 0.2]], jnp.float32),
        planes=jnp.array(
            [
                [0.0, 1.0, 0.0, -0.5],   # floor y = -0.5
                [0.0, 0.0, 1.0, -2.5],   # back wall z = -2.5
            ],
            jnp.float32,
        ),
        plane_albedo=jnp.array([[0.55, 0.5, 0.45], [0.6, 0.6, 0.65]], jnp.float32),
    )


def _intersect(scene: SyntheticScene, origin: jnp.ndarray, dirs: jnp.ndarray):
    """Closed-form ray casting. dirs need not be normalized — the returned t
    is in units of |dirs| (we pass z=1 camera rays so t IS the z-depth).

    origin: f32[3]; dirs: f32[..., 3]. Returns (t, albedo, normal)."""
    t_best = jnp.full(dirs.shape[:-1], _BIG, jnp.float32)
    alb = jnp.zeros(dirs.shape[:-1] + (3,), jnp.float32)
    nrm = jnp.zeros(dirs.shape[:-1] + (3,), jnp.float32)

    def take(t_new, ok, a_new, n_new):
        nonlocal t_best, alb, nrm
        better = ok & (t_new < t_best) & (t_new > 1e-4)
        t_best = jnp.where(better, t_new, t_best)
        alb = jnp.where(better[..., None], a_new, alb)
        nrm = jnp.where(better[..., None], n_new, nrm)

    # Spheres
    for i in range(scene.spheres.shape[0]):
        c = scene.spheres[i, :3]
        r = scene.spheres[i, 3]
        oc = origin - c
        a = jnp.sum(dirs * dirs, axis=-1)
        b = 2.0 * jnp.sum(dirs * oc, axis=-1)
        cc = jnp.dot(oc, oc) - r * r
        disc = b * b - 4 * a * cc
        ok = disc > 0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (-b - sq) / (2 * a)
        t1 = (-b + sq) / (2 * a)
        t = jnp.where(t0 > 1e-4, t0, t1)
        hit = origin + t[..., None] * dirs
        n = (hit - c) / r
        take(t, ok, scene.sphere_albedo[i], n)

    # Axis-aligned boxes (slab method)
    for i in range(scene.boxes.shape[0]):
        lo = scene.boxes[i, :3]
        hi = scene.boxes[i, 3:]
        inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)
        t0s = (lo - origin) * inv
        t1s = (hi - origin) * inv
        tmin = jnp.max(jnp.minimum(t0s, t1s), axis=-1)
        tmax = jnp.min(jnp.maximum(t0s, t1s), axis=-1)
        ok = (tmax >= tmin) & (tmax > 1e-4)
        t = jnp.where(tmin > 1e-4, tmin, tmax)
        hit = origin + t[..., None] * dirs
        center = 0.5 * (lo + hi)
        half = 0.5 * (hi - lo)
        rel = (hit - center) / half
        axis = jnp.argmax(jnp.abs(rel), axis=-1)
        n = jnp.sign(jnp.take_along_axis(rel, axis[..., None], -1)) * jax.nn.one_hot(
            axis, 3, dtype=jnp.float32)
        take(t, ok, scene.box_albedo[i], n)

    # Planes n.p = off
    for i in range(scene.planes.shape[0]):
        n = scene.planes[i, :3]
        off = scene.planes[i, 3]
        denom = jnp.sum(dirs * n, axis=-1)
        ok = jnp.abs(denom) > 1e-9
        t = (off - jnp.dot(origin, n)) / jnp.where(ok, denom, 1.0)
        take(t, ok, scene.plane_albedo[i], jnp.broadcast_to(n, dirs.shape))

    return t_best, alb, nrm


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render_frame(scene: SyntheticScene, world_T_cam: jnp.ndarray,
                 fx, fy, *, width: int, height: int,
                 light_dir=(0.4, 0.8, 0.45)) -> Frame:
    """Render an exact RGB-D frame from a camera pose.

    Rays use z-depth parameterization so t == sensor depth (meters),
    matching what generateVertexMap inverts. Lambertian shading gives the
    color stream structure for photometric terms.
    """
    x = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    d_cam = jnp.stack(
        [(x - width / 2.0) / fx, (height / 2.0 - y) / fy, jnp.ones_like(x)],
        axis=-1,
    )
    R = world_T_cam[:3, :3]
    origin = world_T_cam[:3, 3]
    d_world = d_cam @ R.T
    t, alb, nrm = _intersect(scene, origin, d_world)

    hit = t < _BIG
    depth_mm = jnp.where(hit, jnp.round(t * 1000.0), 0.0)
    depth_mm = jnp.clip(depth_mm, 0, 65535).astype(jnp.uint16)

    l = jnp.asarray(light_dir, jnp.float32)
    l = l / jnp.linalg.norm(l)
    lam = 0.25 + 0.75 * jnp.clip(jnp.sum(nrm * l, axis=-1), 0.0, 1.0)
    rgb = jnp.clip(alb * lam[..., None], 0.0, 1.0)
    color = jnp.where(hit[..., None], jnp.round(rgb * 255.0), 0.0).astype(jnp.uint8)
    return Frame(depth=depth_mm, color=color, timestamp=jnp.float32(0.0))


def orbit_pose(angle, radius: float = 2.0, height: float = 0.3,
               target=(0.0, 0.0, 0.0)) -> jnp.ndarray:
    """world_T_cam for a camera orbiting `target`, looking at it.

    Drives the synthetic-orbit benchmark config (BASELINE.json configs[2]).
    """
    angle = jnp.asarray(angle, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    eye = target + jnp.stack(
        [radius * jnp.sin(angle), jnp.float32(height), radius * jnp.cos(angle)])
    z = target - eye
    z = z / jnp.linalg.norm(z)
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    xaxis = jnp.cross(up, z)
    xaxis = xaxis / jnp.linalg.norm(xaxis)
    # camera convention: x right, y up, z forward
    yaxis = jnp.cross(z, xaxis)
    R = jnp.stack([xaxis, yaxis, z], axis=1)
    return se3.make_transform(R, eye)


class ReplaySource:
    """Host-side iterator over pre-recorded frames (numpy arrays), the
    file-based analog of OpenNIDevice::readFrame."""

    def __init__(self, depths: np.ndarray, colors: np.ndarray,
                 timestamps: np.ndarray | None = None):
        assert depths.shape[0] == colors.shape[0]
        self.depths = depths
        self.colors = colors
        self.timestamps = (
            timestamps if timestamps is not None
            else np.arange(depths.shape[0], dtype=np.float32) / 30.0)

    def __len__(self):
        return self.depths.shape[0]

    def frame(self, i: int) -> Frame:
        return Frame(
            depth=jnp.asarray(self.depths[i]),
            color=jnp.asarray(self.colors[i]),
            timestamp=jnp.float32(self.timestamps[i]),
        )
