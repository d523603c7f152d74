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

import jax
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

    # Walker/Vose alias table over the texel distribution: the inverse-
    # CDF search costs ~17 wavefront gathers (row search + column
    # search + le + pdf) at ~5 ms/M indices on v5e; alias sampling of
    # the SAME distribution costs exactly two (alias row + packed
    # payload row).  The reference's cdfU/cdfV semantics (ibl.cpp:10-118)
    # are preserved: identical texel probabilities, identical pdf.
    prob = (weight / total).ravel().astype(np.float64)
    n = prob.size
    scaled = prob * n
    alias = np.arange(n, dtype=np.int64)
    cut = np.ones(n, np.float64)
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        g = large.pop()
        cut[s] = scaled[s]
        alias[s] = g
        scaled[g] = (scaled[g] + scaled[s]) - 1.0
        (small if scaled[g] < 1.0 else large).append(g)
    # packed per-texel payload: rgb radiance + p(texel)
    payload = np.concatenate(
        [img.reshape(n, -1)[:, :3], (weight / total).reshape(n, 1)], axis=1
    ).astype(np.float32)
    alias_rows = np.stack(
        [cut.astype(np.float32),
         alias.astype(np.int32).view(np.float32)], axis=1)
    # Pre-staged bilinear quad rows: one 12-wide gather fetches all four
    # taps of eval_env (4 separate takes cost ~15 ms each per bounce at
    # 8.4M lanes; gather cost is index-count-bound).  Row yq in [0, h]
    # encodes base y0 = yq-1 so the pole clamp (both taps -> row 0 when
    # y0 = -1) is baked in exactly; x wraps.
    y0v = np.arange(-1, h)                      # base y0 per table row
    c00y = np.clip(y0v, 0, h - 1)
    c01y = np.clip(y0v + 1, 0, h - 1)
    xs = np.arange(w)
    x1 = (xs + 1) % w
    quad = np.concatenate([
        img[c00y][:, xs], img[c00y][:, x1],     # c00 | c10
        img[c01y][:, xs], img[c01y][:, x1],     # c01 | c11
    ], axis=-1).astype(np.float32)              # [h+1, w, 12]
    return {
        "envmap": jnp.asarray(img),
        "env_weight": jnp.asarray(weight / total),  # normalized p(row,col)
        "env_cdf_v": jnp.asarray(cdf_v.astype(np.float32)),
        "env_cdf_u": jnp.asarray(cdf_u.astype(np.float32)),
        "env_alias": jnp.asarray(alias_rows),       # [HW, 2] cut|alias
        "env_payload": jnp.asarray(payload),        # [HW, 4] rgb|p
        "env_quad": jnp.asarray(quad.reshape((h + 1) * w, 12)),
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
    """Bilinear radiance lookup for direction d.

    All taps are FLAT takes on a [H*W, 3] view: 2D fancy indexing
    (img[yi, xi]) lowers to a 2D XLA gather that measured ~15x a flat
    take at wavefront width on v5e (zoo frame: 3.7 s -> ~1 s)."""
    img = scene["envmap"]
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(-1, img.shape[-1])
    u, v = dir_to_uv(d)
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    if "env_quad" in scene:
        # all four taps in ONE staged 12-wide gather (see build_env_tables)
        qi, fx, fy = jax.lax.optimization_barrier(
            ((y0 + 1) * w + jnp.mod(x0, w), fx, fy))
        q = jnp.take(scene["env_quad"], qi, axis=0)
        return (
            q[..., 0:3] * (1 - fx) * (1 - fy)
            + q[..., 3:6] * fx * (1 - fy)
            + q[..., 6:9] * (1 - fx) * fy
            + q[..., 9:12] * fx * fy
        )

    def idx(xi, yi):
        xi = jnp.mod(xi, w)
        yi = jnp.clip(yi, 0, h - 1)
        return yi * w + xi

    # barrier: keep the transcendental uv math OUT of the gather kernels
    # (fused indices re-run per tap on the slow path; measured in-frame)
    i00, i10, i01, i11, fx, fy = jax.lax.optimization_barrier(
        (idx(x0, y0), idx(x0 + 1, y0), idx(x0, y0 + 1),
         idx(x0 + 1, y0 + 1), fx, fy))
    c00 = jnp.take(flat, i00, axis=0)
    c10 = jnp.take(flat, i10, axis=0)
    c01 = jnp.take(flat, i01, axis=0)
    c11 = jnp.take(flat, i11, axis=0)
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
    p_cell = jnp.take(pw.reshape(-1), yi * w + xi)  # texel probability
    theta = jnp.clip(v * np.pi, 1e-4, np.pi - 1e-4)
    jac = (2.0 * np.pi / w) * (np.pi / h) * jnp.sin(theta)
    return p_cell / jnp.maximum(jac, 1e-12)


def sample_ibl(scene, p, uv):
    """Alias-table sample of the envmap; returns a light-sample dict.

    Exactly TWO wavefront gathers (alias row, payload row) for a sample
    of the same texel distribution the reference draws via cdfV/cdfU
    inverse transforms (ibl.cpp:10-118); le is the sampled texel's
    radiance (== bilinear at the texel center) and pdf the exact texel
    probability over the equirect solid-angle Jacobian."""
    h, w = scene["envmap"].shape[0], scene["envmap"].shape[1]
    n = h * w
    u1, u2 = uv
    cell0 = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
    ar = jnp.take(scene["env_alias"], cell0, axis=0)  # [N, 2]
    cut = ar[..., 0]
    alt = jax.lax.bitcast_convert_type(ar[..., 1], jnp.int32)
    cell = jnp.where(u2 <= cut, cell0, alt)
    pay = jnp.take(scene["env_payload"], cell, axis=0)  # [N, 4]
    le = pay[..., 0:3]
    p_cell = pay[..., 3]
    row = cell // w
    col = cell - row * w
    uu = (col.astype(jnp.float32) + 0.5) / w
    vv = (row.astype(jnp.float32) + 0.5) / h
    d = uv_to_dir(uu, vv)
    theta = jnp.clip(vv * np.pi, 1e-4, np.pi - 1e-4)
    jac = (2.0 * np.pi / w) * (np.pi / h) * jnp.sin(theta)
    pdf = p_cell / jnp.maximum(jac, 1e-12)
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
