"""Morton (octree) key encoding/decoding.

Matches the key semantics of the reference's computeKey (svo.cu:34-66):
a key of depth D is D octant triples, most-significant level first, where
octant = (x > cx) + 2*(y > cy) + 4*(z > cz) against the running cell center.
The reference prepends a leading-1 sentinel to carry depth inside a single
int (svo.cu:42-43, depthFromKey svo.cu:68-78); here depth is static so keys
are plain int32 (depth <= 10 -> 30 bits).

`half_size` is the half edge length of the octree cell (the "edge_length"
passed through Octree::addCloud, octree.cpp:283 — the root bbox is
center +- size, octree.cpp:274-275).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

# Sentinel for invalid points: sorts after every real key (max int32).
INVALID_KEY = np.int32(0x7FFFFFFF)


def encode(points: jnp.ndarray, center: jnp.ndarray, half_size,
           depth: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Morton keys of points at a static depth.

    points: f32[N, 3]; center: f32[3]; half_size: f32[].
    Returns (keys i32[N], valid bool[N]). Non-finite points get INVALID_KEY
    (computeKey returns the empty key for those, svo.cu:37-40).
    Out-of-bounds points clamp into the nearest octant chain, exactly like
    the reference's unbounded octant test.
    """
    n = points.shape[0]
    valid = jnp.all(jnp.isfinite(points), axis=-1)
    p = jnp.where(valid[:, None], points, 0.0)
    c = jnp.broadcast_to(jnp.asarray(center, jnp.float32), (n, 3))
    e = jnp.asarray(half_size, jnp.float32)
    key = jnp.zeros((n,), jnp.int32)
    for _ in range(depth):
        e = e * 0.5
        gt = p > c
        octant = (
            gt[:, 0].astype(jnp.int32)
            + 2 * gt[:, 1].astype(jnp.int32)
            + 4 * gt[:, 2].astype(jnp.int32)
        )
        key = (key << 3) | octant
        c = c + jnp.where(gt, e, -e)
    key = jnp.where(valid, key, INVALID_KEY)
    return key, valid


def decode_centers(keys: jnp.ndarray, center: jnp.ndarray, half_size,
                   depth: int) -> jnp.ndarray:
    """Cell centers for keys of static depth (voxelGridFromKeys walk,
    svo.cu:553-571: halve edge, offset along each octant)."""
    n = keys.shape[0]
    c = jnp.broadcast_to(jnp.asarray(center, jnp.float32), (n, 3)).astype(jnp.float32)
    e = jnp.asarray(half_size, jnp.float32)
    for level in range(depth):
        octant = (keys >> (3 * (depth - 1 - level))) & 7
        sx = jnp.where((octant & 1) > 0, 1.0, -1.0)
        sy = jnp.where((octant & 2) > 0, 1.0, -1.0)
        sz = jnp.where((octant & 4) > 0, 1.0, -1.0)
        e = e * 0.5
        c = c + e * jnp.stack([sx, sy, sz], axis=-1)
    return c


def level_prefix(keys: jnp.ndarray, depth: int, level: int) -> jnp.ndarray:
    """Key prefix identifying the ancestor node at `level` (1..depth)."""
    return keys >> (3 * (depth - level))


def octant_at(keys: jnp.ndarray, depth: int, level: int) -> jnp.ndarray:
    """Octant digit consumed when descending from level-1 to `level`."""
    return (keys >> (3 * (depth - level))) & 7
