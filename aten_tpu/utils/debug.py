"""Observability: AOV debug views, pixel picking, traversal heatmaps.

Counterparts (SURVEY.md §5):
  * AOV debug visualizations — SVGFAovMode normal/depth/albedo/ids/
    wireframe views (src/libidaten/svgf/svgf.h AovMode, svgf_types.h:14-29,
    kernel/renderer.h:28-33, debug_viewer.cu).
  * SVGF pixel picking — color/normal/depth/meshid/triid/mtrlid under
    the cursor (svgf.h:25-100).
  * Per-ray time heatmap — PathTimeProfiler %globaltimer + temperature
    colormap (renderer/pathtracing/path_time_profiler.h:15-97).  Per-ray
    wall clocks are not portable to TPU; the analogue here is the
    traversal STEP COUNT each lane executed (hit["steps"], counted in
    the while_loop), rendered with the same temperature ramp.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _id_colors(ids):
    """Stable pseudo-random color per id (negative -> black)."""
    x = ids.astype(jnp.uint32) * jnp.uint32(2654435761)
    r = ((x >> 16) & 0xFF).astype(jnp.float32) / 255.0
    g = ((x >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = (x & 0xFF).astype(jnp.float32) / 255.0
    col = jnp.stack([r, g, b], axis=-1)
    return jnp.where((ids >= 0)[..., None], col, 0.0)


def aov_debug_image(aovs, mode):
    """Render an AOV debug view [H,W,3] in display range [0,1].

    modes: normal | depth | albedo | prim_id | mtl_id | position
    """
    if mode == "normal":
        return aovs["normal"] * 0.5 + 0.5
    if mode == "albedo":
        return jnp.clip(aovs["albedo"], 0.0, 1.0)
    if mode == "depth":
        d = aovs["depth"]
        valid = d > 0
        dmax = jnp.max(jnp.where(valid, d, 0.0))
        x = jnp.where(valid, d / jnp.maximum(dmax, 1e-6), 1.0)
        return jnp.repeat((1.0 - x)[..., None], 3, axis=-1)
    if mode == "prim_id":
        return _id_colors(aovs["prim"])
    if mode == "mtl_id":
        return _id_colors(aovs["mtl"])
    if mode == "position":
        p = aovs["pos"]
        lo = jnp.min(p, axis=(0, 1), keepdims=True)
        hi = jnp.max(p, axis=(0, 1), keepdims=True)
        return (p - lo) / jnp.maximum(hi - lo, 1e-6)
    raise ValueError(f"unknown AOV debug mode '{mode}'")


def pick_pixel(img, aovs, x, y):
    """Probe the G-buffer under a pixel (SVGF pixel picking)."""
    return {
        "color": np.asarray(img[y, x]),
        "normal": np.asarray(aovs["normal"][y, x]),
        "depth": float(aovs["depth"][y, x]),
        "prim_id": int(aovs["prim"][y, x]),
        "mtl_id": int(aovs["mtl"][y, x]),
        "position": np.asarray(aovs["pos"][y, x]),
    }


def temperature(x):
    """[0,1] -> blue..red temperature ramp (ComputeTemperature,
    path_time_profiler.h:63-97 style piecewise ramp)."""
    x = jnp.clip(x, 0.0, 1.0)[..., None]
    # blue -> cyan -> green -> yellow -> red
    r = jnp.clip(jnp.where(x < 0.5, 0.0, (x - 0.5) * 4.0), 0.0, 1.0)
    g = jnp.clip(
        jnp.where(x < 0.25, x * 4.0, jnp.where(x < 0.75, 1.0, (1.0 - x) * 4.0)),
        0.0, 1.0,
    )
    b = jnp.clip(jnp.where(x < 0.25, 1.0, 1.0 - (x - 0.25) * 4.0), 0.0, 1.0)
    return jnp.concatenate([r, g, b], axis=-1)


def traversal_heatmap(scene, ro, rd, width, height, impl="jax"):
    """Primary-ray traversal cost heatmap [H,W,3] (the per-ray time
    profile heatmap analogue).  Uses the jax threaded path (the only
    backend that counts steps)."""
    from aten_tpu.accel.traverse import traverse

    hit = traverse(scene, ro, rd, impl=impl)
    steps = hit.get("steps")
    if steps is None:
        steps = jnp.zeros(ro.shape[0], jnp.int32)
    s = steps.astype(jnp.float32)
    norm = s / jnp.maximum(jnp.max(s), 1.0)
    return temperature(norm.reshape(height, width))
