"""Instrumented treelet-kernel run: per-tile node iterations + leaf rows."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from aten_tpu.scene import scenedefs
from aten_tpu.core import camera as cam_mod
from aten_tpu.ops import traverse_pallas as tp


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "dragon"
    mk = {"dragon": scenedefs.dragon_scene,
          "sponza": scenedefs.sponza_scene,
          "crytek": scenedefs.crytek_class_scene}[which]
    res = 1024
    scene, cam = mk(res, res)
    x = (np.arange(res) + 0.5) / res
    y = (res - 1 - np.arange(res) + 0.5) / res
    s, t = np.meshgrid(x, y)
    ro, rd = cam_mod.generate_ray(
        cam.arrays(), jnp.asarray(s.ravel(), jnp.float32),
        jnp.asarray(t.ravel(), jnp.float32))
    ids = []
    for y0 in range(0, res, 32):
        for x0 in range(0, res, 32):
            yy, xx = np.mgrid[y0:y0 + 32, x0:x0 + 32]
            ids.append((yy * res + xx).ravel())
    perm = np.concatenate(ids)
    ro = np.asarray(ro)[perm]
    rd = np.asarray(rd)[perm]
    N = ro.shape[0]

    prep = lambda v, f=0.0: jnp.asarray(v).reshape(-1, tp.LANES)
    t0 = jnp.full((N,), 3.4e38, jnp.float32).reshape(-1, tp.LANES)
    pool_mb = (scene["trl_nodes"].size + scene["trl_prims"].size) * 4e-6
    print(f"pool {pool_mb:.1f} MB nodes {scene['trl_nodes'].shape} "
          f"prims {scene['trl_prims'].shape} resident={pool_mb <= 10}")
    fn = tp._traverse_treelet_tiles
    out = fn(
        scene["trl_nodes"], scene["trl_prims"],
        prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
        prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]), t0,
        has_spheres=scene["num_spheres"] > 0,
        resident=pool_mb <= 10.0, stats=True)
    ns = np.asarray(out[2]).reshape(-1, tp.TILE)[:, 0]
    lr = np.asarray(out[3]).reshape(-1, tp.TILE)[:, 0]
    print(f"tiles={len(ns)}")
    print(f"node iters/tile: mean {ns.mean():.0f} p50 {np.percentile(ns,50):.0f} "
          f"p90 {np.percentile(ns,90):.0f} max {ns.max()}")
    print(f"leaf rows/tile:  mean {lr.mean():.0f} p50 {np.percentile(lr,50):.0f} "
          f"p90 {np.percentile(lr,90):.0f} max {lr.max()}")
    print(f"total node iters {ns.sum()}  total leaf rows {lr.sum()}")


if __name__ == "__main__":
    main()
