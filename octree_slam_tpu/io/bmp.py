"""BMP texture loader (Scene::loadBMP analog, scene.cpp:36-62).

The reference hand-parses a 54-byte header and reads BGR bytes without row
padding (a bug for widths not divisible by 4); here we parse the pixel-data
offset and honor 4-byte row alignment. Returns a Texture with float RGB
in [0,1], top row first.
"""

from __future__ import annotations

import struct

import numpy as np
import jax.numpy as jnp

from octree_slam_tpu.core.types import Texture


def load_bmp(path: str) -> Texture:
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"BM":
        raise ValueError(f"{path}: not a BMP file")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    width = struct.unpack_from("<i", data, 18)[0]
    height = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp not in (24, 32):
        raise ValueError(f"{path}: only 24/32-bit BMP supported (got {bpp})")
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression == 3:  # BI_BITFIELDS: masks may reorder the channels
        masks = struct.unpack_from("<III", data, 54)
        if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise ValueError(
                f"{path}: BI_BITFIELDS with non-BGRA channel masks "
                f"{tuple(hex(m) for m in masks)} is not supported")
    elif compression != 0:  # BI_RGB
        raise ValueError(f"{path}: compressed BMP (type {compression}) "
                         "is not supported")
    ch = bpp // 8
    flip = height > 0  # positive height = bottom-up storage
    height = abs(height)
    row_bytes = (width * ch + 3) & ~3  # 32-bit rows are already aligned
    img = np.frombuffer(
        data, np.uint8, count=row_bytes * height, offset=pixel_offset)
    img = img.reshape(height, row_bytes)[:, : width * ch] \
        .reshape(height, width, ch)
    if flip:
        img = img[::-1]
    # BGR(A) -> RGB; the alpha byte of 32-bit texels is ignored (textures
    # here are diffuse color sources, voxelization.cu:135 writes its own)
    rgb = img[..., 2::-1].astype(np.float32) / 255.0
    return Texture(data=jnp.asarray(rgb))


def save_image(path: str, rgba) -> None:
    """Write a framebuffer array ([H,W,3|4] float [0,1] or uint8) to disk —
    the replacement for the GL window presentation path."""
    arr = np.asarray(rgba)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    if path.endswith(".png"):
        try:
            from octree_slam_tpu.io import native
            if native.available():
                native.write_png(path, arr)
                return
        except Exception:
            pass
    from PIL import Image
    Image.fromarray(arr).save(path)
