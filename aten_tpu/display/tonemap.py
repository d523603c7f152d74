"""Tone mapping / transfer-function post ops.

Counterpart of the reference's GLSL post-process chain
(src/libaten/display/gamma.h + shader/gamma_fs.glsl, GT tonemapper
display/gt_tonemapper.h:10 + shader/gt_tonemapper_fs.glsl, sRGB OETF
shader/srgb_oetf_fs.glsl).  Here each pass is a pure batched jnp
function over the [H,W,3] image — jittable, fusible, differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp

_SRGB_TO_XYZ = jnp.asarray(
    [[0.4124, 0.3576, 0.1805],
     [0.2126, 0.7152, 0.0722],
     [0.0193, 0.1192, 0.9505]], jnp.float32,
)
_XYZ_TO_SRGB = jnp.asarray(
    [[3.2406, -1.5372, -0.4986],
     [-0.9689, 1.8758, 0.0415],
     [0.0557, -0.2040, 1.0570]], jnp.float32,
)


def gamma(img, g=2.2):
    """Simple gamma correction (shader/gamma_fs.glsl)."""
    return jnp.power(jnp.clip(img, 0.0, None), 1.0 / g)


def srgb_oetf(img):
    """Piecewise sRGB opto-electronic transfer (shader/srgb_oetf_fs.glsl)."""
    x = jnp.clip(img, 0.0, 1.0)
    lo = 12.92 * x
    hi = 1.055 * jnp.power(jnp.maximum(x, 1e-8), 1.0 / 2.4) - 0.055
    return jnp.where(x <= 0.0031308, lo, hi)


def exposure(img, ev=0.0):
    return img * (2.0 ** ev)


def gt_tonemap(
    img,
    end_of_toe=0.22,
    contrast=1.0,
    max_luminance=1.0,
    range_of_linear=0.4,
):
    """Gran Turismo 7 tonemapper applied to luminance in XYZ
    (shader/gt_tonemapper_fs.glsl: toe = power curve, linear segment,
    exponential shoulder, blended by smoothstep/step weights; X and Z
    are rescaled by Y'/Y to preserve chromaticity)."""
    rgb = jnp.clip(img, 0.0, None)
    xyz = jnp.einsum("ij,...j->...i", _SRGB_TO_XYZ, rgb)
    x = xyz  # per-channel curves, weights from each channel (as reference)

    l0 = (max_luminance - end_of_toe) * range_of_linear / contrast
    c = 1.33
    T = end_of_toe * jnp.power(
        jnp.maximum(x / end_of_toe, 1e-8), c
    )
    L = end_of_toe + contrast * (x - end_of_toe)
    S0 = end_of_toe + l0
    S1 = end_of_toe + contrast * l0
    C2 = contrast * max_luminance / jnp.maximum(max_luminance - S1, 1e-6)
    S = max_luminance - (max_luminance - S1) * jnp.exp(
        -C2 * (x - S0) / max_luminance
    )

    def smoothstep(e0, e1, v):
        t = jnp.clip((v - e0) / (e1 - e0), 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)

    w0 = 1.0 - smoothstep(0.0, end_of_toe, x)
    w2 = (x >= S0).astype(img.dtype)
    w1 = 1.0 - w0 - w2
    mapped = T * w0 + L * w1 + S * w2

    Y = xyz[..., 1:2]
    Y_dash = mapped[..., 1:2]
    scale = Y_dash / jnp.maximum(Y, 1e-8)
    xyz_out = jnp.concatenate(
        [xyz[..., 0:1] * scale, Y_dash, xyz[..., 2:3] * scale], axis=-1
    )
    return jnp.einsum("ij,...j->...i", _XYZ_TO_SRGB, xyz_out)


def magnifier(
    img,
    center_px,
    magnification=0.5,
    radius=64.0,
    line_width=2.0,
    line_color=(1.0, 0.0, 0.0),
):
    """Circular magnifier inset (shader/magnifier_fs.glsl: uv pulled
    toward the center inside the radius, ring drawn at the boundary).
    center_px is (x, y) in pixels."""
    H, W = img.shape[:2]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    cx, cy = center_px
    d = jnp.sqrt((xs - cx) ** 2 + (ys - cy) ** 2)
    inside = d <= radius

    mx = xs * (1 - magnification) + magnification * cx
    my = ys * (1 - magnification) + magnification * cy
    sx = jnp.where(inside, mx, xs)
    sy = jnp.where(inside, my, ys)
    xi = jnp.clip(sx.astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(sy.astype(jnp.int32), 0, H - 1)
    out = img[yi, xi]

    ring = (d >= radius - line_width) & (d <= radius + line_width)
    return jnp.where(
        ring[..., None], jnp.asarray(line_color, img.dtype), out
    )
