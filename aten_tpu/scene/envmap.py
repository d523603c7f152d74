"""Image-based lighting (IBL) with 2D-CDF importance sampling.

Counterpart of src/libaten/light/ibl.{h,cpp}: the reference builds a
row CDF (cdfV) over row luminance and per-row column CDFs (cdfU)
(ibl.cpp:10-118), samples by two inverse-CDF lookups, and normalizes
MIS pdfs with the average illuminance (ibl.h:44-50,161-165).  Here the
CDFs are flat device arrays and the inverse CDF is a vectorized
searchsorted; sin(theta) weighting makes the pdf exact in solid-angle
measure for the equirect parameterization.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from aten_tpu.core import vecmath as vm


def build_env_tables(img: np.ndarray):
    """img: [H, W, 3] float32 equirect radiance map -> CDF arrays."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    lum = 0.2126 * img[..., 0] + 0.7152 * img[..., 1] + 0.0722 * img[..., 2]
    theta = (np.arange(h, dtype=np.float32) + 0.5) / h * np.pi
    weight = lum * np.sin(theta)[:, None]
    row_w = weight.sum(axis=1)
    total = max(row_w.sum(), 1e-20)
    cdf_v = np.cumsum(row_w) / total
    cdf_u = np.cumsum(weight, axis=1) / np.maximum(row_w[:, None], 1e-20)
    avg_illum = float(lum.mean())
    return {
        "envmap": jnp.asarray(img),
        "env_weight": jnp.asarray(weight / total),  # normalized p(row,col)
        "env_cdf_v": jnp.asarray(cdf_v.astype(np.float32)),
        "env_cdf_u": jnp.asarray(cdf_u.astype(np.float32)),
        "env_avg_illum": jnp.float32(avg_illum),
    }


def dir_to_uv(d):
    """Equirect mapping. d: [..., 3] unit -> (u, v) in [0,1)."""
    phi = jnp.arctan2(d[..., 2], d[..., 0])  # [-pi, pi]
    u = phi / (2.0 * np.pi) + 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / np.pi
    return u, v


def uv_to_dir(u, v):
    phi = (u - 0.5) * (2.0 * np.pi)
    theta = v * np.pi
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), jnp.cos(theta), st * jnp.sin(phi)], axis=-1)


def eval_env(scene, d):
    """Bilinear radiance lookup for direction d."""
    img = scene["envmap"]
    h, w = img.shape[0], img.shape[1]
    u, v = dir_to_uv(d)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def fetch(xi, yi):
        xi = jnp.mod(xi, w)
        yi = jnp.clip(yi, 0, h - 1)
        return img[yi, xi]

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def pdf_env(scene, d):
    """Solid-angle pdf of sampling direction d from the 2D CDF."""
    pw = scene["env_weight"]
    h, w = pw.shape
    u, v = dir_to_uv(d)
    xi = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    p_cell = pw[yi, xi]  # probability of the texel
    theta = jnp.clip(v * np.pi, 1e-4, np.pi - 1e-4)
    jac = (2.0 * np.pi / w) * (np.pi / h) * jnp.sin(theta)
    return p_cell / jnp.maximum(jac, 1e-12)


def sample_ibl(scene, p, uv):
    """Inverse-CDF sample of the envmap; returns a light-sample dict."""
    cdf_v = scene["env_cdf_v"]
    cdf_u = scene["env_cdf_u"]
    h, w = cdf_u.shape
    u1, u2 = uv
    row = jnp.clip(jnp.searchsorted(cdf_v, u1), 0, h - 1)
    rows_cdf = jnp.take(cdf_u, row, axis=0)  # [N, W]
    col = jnp.clip(
        jnp.sum((u2[..., None] > rows_cdf).astype(jnp.int32), axis=-1), 0, w - 1
    )
    uu = (col.astype(jnp.float32) + 0.5) / w
    vv = (row.astype(jnp.float32) + 0.5) / h
    d = uv_to_dir(uu, vv)
    le = eval_env(scene, d)
    pdf = pdf_env(scene, d)
    big = jnp.full(p.shape[:-1], 1e30, jnp.float32)
    return {
        "pos": p + d * 1e30,
        "nml": -d,
        "dir": d,
        "dist": big,
        "le": le,
        "pdf": pdf,  # solid-angle measure
        "singular": jnp.zeros(p.shape[:-1], bool),
        "infinite": jnp.ones(p.shape[:-1], bool),
        "area_measure": jnp.zeros(p.shape[:-1], bool),
    }
