"""Procedural flakes normal-map generation.

Counterpart of the reference's FlakesNormalMapMaker tool and the
procedural `FlakesNormal` used by the CarPaint material
(src/libaten/material/FlakesNormal.{h,cpp}, src/FlakesNormalMapMaker):
a jittered-grid Voronoi cell pattern where each cell is a metallic
flake with a random (cone-limited) normal; pixels outside the flake
disc fall back to flat (0,0,1).

Output is an [S,S,3] array in [0,1] (0.5-biased tangent-space normal
map) ready for TextureTable.add / material normal_map slots.
"""
from __future__ import annotations

import numpy as np


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
