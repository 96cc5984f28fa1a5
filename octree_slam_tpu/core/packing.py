"""RGBA8 voxel value packing.

The reference packs node color as a single uint32 word
r | g<<8 | b<<16 | a<<24 (svo.cu:332, octree.cpp:156-168). The alpha channel
is a fusion confidence: fresh children are initialized to a=127
(svo.cu:274), "occupied" means a>127 (svo.cu:528), and every leaf update
bumps a by 2 saturating at 255 (svo.cu:332).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Fresh node: rgb=0, alpha=127 (svo.cu:274). A host-side int, not a
# jnp scalar: creating a device array at import time would initialize the
# JAX backend before the app can pick a platform (utils/runtime.py).
EMPTY_VALUE = np.uint32(127 << 24)
OCCUPIED_ALPHA = 127                 # occupied iff alpha > 127 (svo.cu:528)


def pack_rgba8(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Pack integer channels (0..255) into a uint32 word."""
    r = jnp.clip(r, 0, 255).astype(jnp.uint32)
    g = jnp.clip(g, 0, 255).astype(jnp.uint32)
    b = jnp.clip(b, 0, 255).astype(jnp.uint32)
    a = jnp.clip(a, 0, 255).astype(jnp.uint32)
    return r | (g << 8) | (b << 16) | (a << 24)


def unpack_rgba8(value: jnp.ndarray):
    """Unpack a uint32 word into integer channels (0..255) as int32."""
    value = value.astype(jnp.uint32)
    r = (value & 0xFF).astype(jnp.int32)
    g = ((value >> 8) & 0xFF).astype(jnp.int32)
    b = ((value >> 16) & 0xFF).astype(jnp.int32)
    a = ((value >> 24) & 0xFF).astype(jnp.int32)
    return r, g, b, a


def unpack_rgba_unit(value: jnp.ndarray) -> jnp.ndarray:
    """Unpack to float rgba in [0,1], stacked on the last axis
    (voxelGridFromKeys semantics, svo.cu:577-580)."""
    r, g, b, a = unpack_rgba8(value)
    return jnp.stack([r, g, b, a], axis=-1).astype(jnp.float32) / 255.0


def alpha_of(value: jnp.ndarray) -> jnp.ndarray:
    return ((value.astype(jnp.uint32) >> 24) & 0xFF).astype(jnp.int32)


def is_occupied(value: jnp.ndarray) -> jnp.ndarray:
    """Occupancy test: alpha > 127 (svo.cu:528)."""
    return alpha_of(value) > OCCUPIED_ALPHA


def blend_value(old_value: jnp.ndarray, new_rgb: jnp.ndarray) -> jnp.ndarray:
    """Pseudo low-pass fusion of a new color sample into a node value.

    Reference rule (svo.cu:326-332): with a = old alpha,
      out_rgb = new_rgb*255 * (1 - a/256) + old_rgb * (a/256)
      out_a   = min(255, a + 2)
    `new_rgb` is float in [0,1], shape [..., 3]; `old_value` uint32[...].
    """
    r, g, b, a = unpack_rgba8(old_value)
    old_rgb = jnp.stack([r, g, b], axis=-1).astype(jnp.float32)
    af = a.astype(jnp.float32)[..., None]
    f2 = af / 256.0
    f1 = 1.0 - f2
    out = new_rgb * 255.0 * f1 + old_rgb * f2
    out = out.astype(jnp.int32)
    new_a = jnp.minimum(a + 2, 255)
    return pack_rgba8(out[..., 0], out[..., 1], out[..., 2], new_a)
