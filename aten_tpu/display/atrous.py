"""Standalone edge-aware a-trous filter post-op.

Counterpart of the reference's standalone A-trous display filter
(src/libaten/filter/atrous.{h,cpp} + shader/atrous_fs.glsl /
atrous_final_fs.glsl) — the same 5x5 B3-spline dilated stencil as the
SVGF wavelet pass but driven purely by color/normal/depth weights (no
variance), usable on any rendered image with a G-buffer.
"""
from __future__ import annotations

import jax.numpy as jnp

from aten_tpu.core.vecmath import luminance
from aten_tpu.denoise.svgf import _B3, _shift


def atrous(color, normal, depth, iters=5, sigma_c=0.3, sigma_n=128.0,
           sigma_z=1.0):
    """Edge-aware multi-pass a-trous blur of [H,W,3] color."""
    for it in range(iters):
        step = 1 << it
        lum_p = luminance(color)[..., 0]
        csum = jnp.zeros_like(color)
        wsum = jnp.zeros_like(lum_p)
        for ky in range(-2, 3):
            for kx in range(-2, 3):
                dy, dx = ky * step, kx * step
                hk = _B3[ky + 2] * _B3[kx + 2]
                c_q = _shift(color, dy, dx)
                l_q = luminance(c_q)[..., 0]
                z_q = _shift(depth, dy, dx)
                n_q = _shift(normal, dy, dx)
                w_z = jnp.exp(-jnp.abs(z_q - depth) / (sigma_z * step + 1e-4))
                w_n = jnp.maximum(jnp.sum(n_q * normal, axis=-1), 0.0) ** sigma_n
                w_c = jnp.exp(-jnp.abs(l_q - lum_p) / (sigma_c + 1e-4))
                w = hk * w_z * w_n * w_c
                csum = csum + w[..., None] * c_q
                wsum = wsum + w
        color = csum / jnp.maximum(wsum[..., None], 1e-6)
    return color
