"""Procedural flakes: normal-map baking tool + shade-time generator.

Counterpart of the reference's FlakesNormalMapMaker tool and the
procedural `FlakesNormal` used by the CarPaint material
(src/libaten/material/FlakesNormal.{h,cpp}, src/FlakesNormalMapMaker):
a jittered-grid Voronoi cell pattern where each cell is a metallic
flake with a random (cone-limited) normal; pixels outside the flake
disc fall back to flat (0,0,1).

`flakes_gen` is the shade-time JAX version (FlakesNormal::gen,
FlakesNormal.cpp:118-185): batched over uv lanes, it returns each
lane's tangent-space flake normal and coverage alpha, consumed by the
CarPaint BRDF (shading/brdf.py).  The hash is Jenkins lookup3
(public-domain, the same one the reference uses) vectorized over uint32
lanes.

`make_flakes_normal_map` keeps the offline baking tool: an [S,S,3]
0.5-biased tangent-space normal map ready for TextureTable.add.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _rotl(x, k):
    return (x << jnp.uint32(k)) | (x >> jnp.uint32(32 - k))


def _bjfinal(a, b, c):
    """Jenkins lookup3 final mix (FlakesNormal.cpp:33-43)."""
    c = c ^ b
    c = c - _rotl(b, 14)
    a = a ^ c
    a = a - _rotl(c, 11)
    b = b ^ a
    b = b - _rotl(a, 25)
    c = c ^ b
    c = c - _rotl(b, 16)
    a = a ^ c
    a = a - _rotl(c, 4)
    b = b ^ a
    b = b - _rotl(a, 14)
    c = c ^ b
    c = c - _rotl(b, 24)
    return c


def _bjmix(a, b, c):
    a = a - c
    a = a ^ _rotl(c, 4)
    c = c + b
    b = b - a
    b = b ^ _rotl(a, 6)
    a = a + c
    c = c - b
    c = c ^ _rotl(b, 8)
    b = b + a
    a = a - c
    a = a ^ _rotl(c, 16)
    c = c + b
    b = b - a
    b = b ^ _rotl(a, 19)
    a = a + c
    c = c - b
    c = c ^ _rotl(b, 4)
    b = b + a
    return a, b, c


def _inthash4(k0, k1, k2, k3):
    """lookup3 hash of 4 uint32 lanes (FlakesNormal.cpp:46-88)."""
    init = jnp.uint32(0xDEADBEEF + (4 << 2) + 13)
    a = init + k0
    b = init + k1
    c = init + k2
    a, b, c = _bjmix(a, b, c)
    a = a + k3
    return _bjfinal(a, b, c)


def _cellnoise3(px, py, pz):
    """3 decorrelated uniforms in [0,1] per integer cell
    (hash3/cellnoise, FlakesNormal.cpp:91-118)."""
    kx = jnp.floor(px).astype(jnp.int32).astype(jnp.uint32)
    ky = jnp.floor(py).astype(jnp.int32).astype(jnp.uint32)
    kz = jnp.floor(pz).astype(jnp.int32).astype(jnp.uint32)
    inv = 1.0 / 4294967295.0
    r0 = _inthash4(kx, ky, kz, jnp.uint32(0)).astype(jnp.float32) * inv
    r1 = _inthash4(kx, ky, kz, jnp.uint32(1)).astype(jnp.float32) * inv
    r2 = _inthash4(kx, ky, kz, jnp.uint32(2)).astype(jnp.float32) * inv
    return r0, r1, r2


_CELL_CENTERS = np.array(
    [[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5], [-0.5, 1.5],
     [-0.5, 0.5], [-0.5, -0.5], [0.5, -0.5], [1.5, -0.5]], np.float32
)


def flakes_gen(u, v, flake_scale, flake_size, flake_size_variance,
               flake_normal_orientation):
    """Per-lane flake lookup (FlakesNormal::gen, FlakesNormal.cpp:118-185).

    u, v [N]; scale/size/variance/orientation [N] or scalars.
    Returns (nml [N,3] tangent-space flake normal, alpha [N] 1 where the
    uv lies on a flake).  Branchless 9-cell scan replaces the loop.
    """
    var = jnp.clip(flake_size_variance, 0.1, 1.0)
    px = flake_scale * u
    py = flake_scale * v
    bx = jnp.floor(px)
    by = jnp.floor(py)

    best_cz = jnp.full_like(px, 1.0)   # nearestCell z (cpp:145)
    best_cx = jnp.zeros_like(px)
    best_cy = jnp.zeros_like(px)
    found = jnp.zeros_like(px, bool)
    for cx0, cy0 in _CELL_CENTERS:
        ccx = bx + cx0
        ccy = by + cy0
        r0, r1, r2 = _cellnoise3(ccx, ccy, jnp.zeros_like(ccx))
        ox = r0 * 2.0 - 1.0
        oy = r1 * 2.0 - 1.0
        oz = (r2 * 2.0 - 1.0) * var
        inv_len = 1.0 / jnp.sqrt(jnp.maximum(ox * ox + oy * oy + oz * oz, 1e-12))
        fx = ccx + 0.5 * ox * inv_len
        fy = ccy + 0.5 * oy * inv_len
        fz = 0.5 * oz * inv_len
        d = jnp.sqrt((px - fx) ** 2 + (py - fy) ** 2 + fz * fz)
        take = (d < flake_size) & (fz < best_cz)
        best_cz = jnp.where(take, fz, best_cz)
        best_cx = jnp.where(take, ccx, best_cx)
        best_cy = jnp.where(take, ccy, best_cy)
        found = found | take

    # random flake normal of the winning cell (cpp:164-178)
    r0, r1, r2 = _cellnoise3(best_cx, best_cy, jnp.full_like(best_cx, 1.5))
    nx = r0 * 2.0 - 1.0
    ny = r1 * 2.0 - 1.0
    nz = r2 * 2.0 - 1.0
    # faceforward against +z
    flip = jnp.where(nz < 0, -1.0, 1.0)
    nx, ny, nz = nx * flip, ny * flip, nz * flip
    # mix toward the surface normal (0,0,1)
    t = flake_normal_orientation
    nx = nx * (1.0 - t)
    ny = ny * (1.0 - t)
    nz = nz * (1.0 - t) + t
    inv_len = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-12))
    nml = jnp.stack([nx * inv_len, ny * inv_len, nz * inv_len], axis=-1)
    flat = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    nml = jnp.where(found[..., None], nml, flat)
    return nml, found.astype(jnp.float32)


def flake_density(flake_size, aspect=1.0):
    """Expected flake coverage (FlakesNormal::computeFlakeDensity,
    FlakesNormal.h:21-55): D = min(pi * size^2 / aspect, 1)."""
    return jnp.minimum(np.pi * flake_size * flake_size / aspect, 1.0)


def make_flakes_normal_map(
    size=256, flake_scale=24.0, flake_size=0.35, normal_cone=0.35, seed=0
):
    """flake_scale: cells per texture edge; flake_size: flake disc radius
    within its cell (0..0.5); normal_cone: max normal tilt (radians-ish
    tangent deviation)."""
    rng = np.random.default_rng(seed)
    n_cells = int(flake_scale)
    # per-cell jittered centers + random flake normals
    jitter = rng.uniform(0.2, 0.8, (n_cells, n_cells, 2))
    tilt = rng.uniform(-normal_cone, normal_cone, (n_cells, n_cells, 2))

    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    u = (xs + 0.5) / size * n_cells
    v = (ys + 0.5) / size * n_cells
    ci = np.clip(u.astype(int), 0, n_cells - 1)
    cj = np.clip(v.astype(int), 0, n_cells - 1)
    cx = ci + jitter[cj, ci, 0]
    cy = cj + jitter[cj, ci, 1]
    d = np.hypot(u - cx, v - cy)
    in_flake = d < flake_size

    nx = np.where(in_flake, tilt[cj, ci, 0], 0.0)
    ny = np.where(in_flake, tilt[cj, ci, 1], 0.0)
    nz = np.sqrt(np.maximum(1.0 - nx * nx - ny * ny, 1e-6))
    n = np.stack([nx, ny, nz], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return (n * 0.5 + 0.5).astype(np.float32)
