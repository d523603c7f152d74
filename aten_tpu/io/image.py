"""Image loading/saving into scene textures.

Counterpart of the reference's `ImageLoader` (src/libatenscene/
ImageLoader.{h,cpp}: stb-based LDR/HDR load, creates `texture` objects
in the context) and visualizer screenshot/HDR export.  LDR formats go
through PIL; Radiance .hdr through io/hdr.py.  Loaded images become
linear float32 RGB arrays ready for TextureTable.add.
"""
from __future__ import annotations

import os

import numpy as np

from aten_tpu.io.hdr import read_hdr, write_hdr


def load_image(path, srgb_to_linear=True):
    """Load an image file -> [H,W,3] float32.

    LDR files (png/jpg/tga/bmp/...) are optionally converted from sRGB
    to linear (the reference samples LDR albedo textures as-is, but all
    our shading is linear — pass srgb_to_linear=False for data maps
    like normals/roughness).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".hdr":
        return read_hdr(path)
    import PIL.Image as I

    img = np.asarray(I.open(path).convert("RGB"), np.float32) / 255.0
    if srgb_to_linear:
        img = np.where(
            img <= 0.04045, img / 12.92, ((img + 0.055) / 1.055) ** 2.4
        ).astype(np.float32)
    return img


def save_image(path, img):
    """Save [H,W,3] float32: .hdr keeps linear radiance; LDR formats get
    the sRGB OETF (visualizer::takeScreenshot counterpart)."""
    ext = os.path.splitext(path)[1].lower()
    img = np.asarray(img, np.float32)
    if ext == ".hdr":
        write_hdr(path, img)
        return
    import PIL.Image as I

    x = np.clip(img, 0.0, 1.0)
    x = np.where(x <= 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)
    I.fromarray((x * 255.0 + 0.5).astype(np.uint8)).save(path)


def load_texture(builder, path, srgb_to_linear=True):
    """ImageLoader::load semantics: load + register with the scene
    builder, returning the texture id."""
    return builder.add_texture(load_image(path, srgb_to_linear))
