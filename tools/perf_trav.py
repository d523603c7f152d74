"""Quick traversal-kernel perf probe (dragon/sponza primary rays).

Usage: python tools/perf_trav.py [dragon|sponza|crytek] [n_frames]
Prints Mrays/s with the honest chained-frame protocol from bench.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from aten_tpu.scene import scenedefs
from aten_tpu.accel.traverse import traverse
from aten_tpu.core import camera as cam_mod


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "dragon"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6
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
    perm = jnp.asarray(np.concatenate(ids))
    ro, rd = ro[perm], rd[perm]
    N = ro.shape[0]

    @jax.jit
    def chained():
        acc = jnp.float32(0)
        for i in range(n):
            h = traverse(scene, ro + 0 * acc, rd)
            acc = acc + h["t"][0]
        return acc

    t0 = time.perf_counter()
    _ = float(chained())
    print(f"compile+first: {time.perf_counter()-t0:.1f}s")
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(chained())
        best = min(best, time.perf_counter() - t0)
    sec = best / n
    print(f"{which}: {N/sec/1e6:.1f} Mrays/s  ({sec*1e3:.1f} ms / {N} rays)")


if __name__ == "__main__":
    main()
