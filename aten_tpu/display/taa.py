"""Temporal anti-aliasing.

Counterpart of the reference's TAA pass (src/libaten/filter/taa.{h,cpp}
+ shader/taa_fs.glsl): reproject the previous frame through the motion
buffer, weigh the 3x3 neighborhood by color distance, clip history to
the neighborhood color bounds, and blend.  The reference gets its
motion-depth buffer from an OpenGL raster pre-pass; here motion is
computed analytically from the first-hit world positions + previous
camera matrices (same data SVGF uses, denoise/svgf.py) — no raster
needed.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aten_tpu.denoise.svgf import _project, _shift


@dataclasses.dataclass(frozen=True)
class TAAParams:
    blend: float = 0.2          # weight of the current frame
    clip_gamma: float = 1.0     # neighborhood box scale for history clip


def init_history(height, width):
    return {
        "color": jnp.zeros((height, width, 3), jnp.float32),
        "valid": jnp.zeros((height, width), jnp.bool_),
    }


def _neighborhood_bounds(img):
    mn = img
    mx = img
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            s = _shift(img, dy, dx)
            mn = jnp.minimum(mn, s)
            mx = jnp.maximum(mx, s)
    return mn, mx


def taa_step(cur, pos_aov, depth_aov, history, prev_w2v, prev_v2c, params=None):
    """One TAA step.

    cur [H,W,3] current frame; pos_aov [H,W,3] first-hit world
    positions; depth_aov [H,W] (<0 where no hit); history from
    init_history; prev_w2v/prev_v2c previous-frame camera matrices
    (aten_tpu.core.camera.camera_matrices).  Returns (output, new
    history).
    """
    if params is None:
        params = TAAParams()
    H, W = cur.shape[:2]
    # Reproject: where did this pixel's world point land last frame?
    px, py, ok = _project(pos_aov, prev_w2v, prev_v2c, W, H)
    ix = jnp.clip(px.astype(jnp.int32), 0, W - 1)
    iy = jnp.clip(py.astype(jnp.int32), 0, H - 1)
    in_view = (px >= 0) & (px < W) & (py >= 0) & (py < H) & ok
    hist_col = history["color"][iy, ix]
    hist_ok = history["valid"][iy, ix] & in_view & (depth_aov > 0)

    # Clip history to the current 3x3 neighborhood color box
    # (the reference's neighbor-weighted clamp, taa_fs.glsl:179-252).
    mn, mx = _neighborhood_bounds(cur)
    c = 0.5 * (mn + mx)
    e = 0.5 * (mx - mn) * params.clip_gamma + 1e-6
    hist_clipped = jnp.clip(hist_col, c - e, c + e)

    a = jnp.where(hist_ok, params.blend, 1.0)[..., None]
    out = a * cur + (1.0 - a) * hist_clipped
    new_hist = {
        "color": out,
        "valid": jnp.ones((H, W), jnp.bool_),
    }
    return out, new_hist
