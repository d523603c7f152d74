"""Kernel overhead lab: isolate per-iteration costs of the treelet walk.

Variants (pick with argv[1]):
  v3      -- the production kernel (baseline)
  nodes   -- node walk only, leaf cond removed entirely
  nodir   -- node walk only, fixed preorder links (no directional selects)
  noext   -- node walk only, links/starts from vector slices (1 extract)
  leafu   -- unconditional masked 1-row leaf consume per iteration (no cond)

All on dragon primary rays, 1024x1024, chained frames.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aten_tpu.ops.traverse_pallas import (
    ROWS, LANES, TILE, PACK, TRL_ROWS, _pick_ordering, _select_links,
    _traverse_treelet_tiles,
)

F2I = lambda x: pltpu.bitcast(x, jnp.int32)
T_MIN = 1e-4


def make_nodes_kernel(directional=True, vec_links=False):
    """Node walk only (no leaf intersection at all)."""

    def kernel(nodes_ref, rox_ref, roy_ref, roz_ref,
               rdx_ref, rdy_ref, rdz_ref, t0_ref, tout_ref, pout_ref):
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]

        def safe_inv(d):
            return jnp.where(jnp.abs(d) > 1e-12,
                             1.0 / jnp.where(d == 0, 1.0, d), 1e12)

        ivx, ivy, ivz = safe_inv(rdx), safe_inv(rdy), safe_inv(rdz)
        ordv = _pick_ordering(rdx, rdy, rdz)
        t_init = t0_ref[:]
        prim0 = jnp.full((ROWS, LANES), -1, jnp.int32)

        def cond(c):
            return c[0] >= 0

        def body(c):
            cur, t, prim = c
            row = nodes_ref[pl.ds(cur, 1), :]
            irow = F2I(row)
            if directional:
                hitl, missl = _select_links(irow, ordv)
            else:
                hitl, missl = irow[0, 6], irow[0, 7]
            bminx, bminy, bminz = row[0, 0], row[0, 1], row[0, 2]
            bmaxx, bmaxy, bmaxz = row[0, 3], row[0, 4], row[0, 5]
            t0x = (bminx - rox) * ivx
            t1x = (bmaxx - rox) * ivx
            t0y = (bminy - roy) * ivy
            t1y = (bmaxy - roy) * ivy
            t0z = (bminz - roz) * ivz
            t1z = (bmaxz - roz) * ivz
            tenter = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z))
            texit = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z))
            hitv = (tenter <= texit) & (texit > 0.0) & (tenter < t)
            anyhit = jnp.any(hitv)
            # fake "leaf" update so t changes: record tenter at fat leaves
            start = irow[0, 18]
            closer = hitv & (start >= 0) & (tenter > T_MIN) & (tenter < t)
            t = jnp.where(closer, tenter, t)
            prim = jnp.where(closer, start, prim)
            nxt = jnp.where(anyhit, hitl, missl)
            return (nxt, t, prim)

        _, t, prim = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t_init, prim0))
        tout_ref[:] = t
        pout_ref[:] = prim

    return kernel


def make_leafu_kernel():
    """Full traversal; leaf consume = ONE masked row per iteration, no cond.

    State: cur, prow (next prim row), pleft (prims left).  When pleft>0 the
    node step stalls (cursor frozen) and one packed row is consumed.
    """

    def kernel(nodes_ref, prims_ref, rox_ref, roy_ref, roz_ref,
               rdx_ref, rdy_ref, rdz_ref, t0_ref, tout_ref, pout_ref):
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]

        def safe_inv(d):
            return jnp.where(jnp.abs(d) > 1e-12,
                             1.0 / jnp.where(d == 0, 1.0, d), 1e12)

        ivx, ivy, ivz = safe_inv(rdx), safe_inv(rdy), safe_inv(rdz)
        ordv = _pick_ordering(rdx, rdy, rdz)
        t_init = t0_ref[:]
        prim0 = jnp.full((ROWS, LANES), -1, jnp.int32)

        def cond(c):
            return (c[0] >= 0) | (c[4] > 0)

        def body(c):
            cur, t, prim, pnext, pleft = c
            busy = pleft > 0
            # ---- node step (skipped while busy: cursor frozen) ----
            row = nodes_ref[pl.ds(jnp.maximum(cur, 0), 1), :]
            irow = F2I(row)
            hitl, missl = _select_links(irow, ordv)
            bminx, bminy, bminz = row[0, 0], row[0, 1], row[0, 2]
            bmaxx, bmaxy, bmaxz = row[0, 3], row[0, 4], row[0, 5]
            t0x = (bminx - rox) * ivx
            t1x = (bmaxx - rox) * ivx
            t0y = (bminy - roy) * ivy
            t1y = (bmaxy - roy) * ivy
            t0z = (bminz - roz) * ivz
            t1z = (bmaxz - roz) * ivz
            tenter = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z))
            texit = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z))
            hitv = (tenter <= texit) & (texit > 0.0) & (tenter < t)
            anyhit = jnp.any(hitv) & (cur >= 0) & jnp.logical_not(busy)
            start = irow[0, 18]
            count = irow[0, 19]
            enter = anyhit & (start >= 0) & (count > 0)
            nxt = jnp.where(anyhit, hitl, missl)
            nxt = jnp.where(busy | (cur < 0), cur, nxt)
            pnext = jnp.where(enter, start, pnext)
            pleft = jnp.where(enter, count, pleft)

            # ---- leaf step: one masked packed row ----
            prow = prims_ref[pl.ds(jnp.maximum(pnext, 0), 1), :]
            pirow = F2I(prow)
            for j in range(PACK):
                b = 16 * j
                ok = busy & (j < pleft)
                v0x, v0y, v0z = prow[0, b], prow[0, b + 1], prow[0, b + 2]
                e1x, e1y, e1z = prow[0, b + 3], prow[0, b + 4], prow[0, b + 5]
                e2x, e2y, e2z = prow[0, b + 6], prow[0, b + 7], prow[0, b + 8]
                pid = pirow[0, b + 9]
                px = rdy * e2z - rdz * e2y
                py = rdz * e2x - rdx * e2z
                pz = rdx * e2y - rdy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(
                    jnp.abs(det) > 1e-12,
                    1.0 / jnp.where(det == 0, 1.0, det), 0.0)
                tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
                uu = (tvx * px + tvy * py + tvz * pz) * inv_det
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                hp = ((jnp.abs(det) > 1e-12) & (uu >= 0.0) & (vv >= 0.0)
                      & (uu + vv <= 1.0) & (tt > T_MIN) & ok)
                closer = hp & (tt < t)
                t = jnp.where(closer, tt, t)
                prim = jnp.where(closer, pid, prim)
            pnext = jnp.where(busy, pnext + 1, pnext)
            pleft = jnp.where(busy, jnp.maximum(pleft - PACK, 0), pleft)
            return (nxt, t, prim, pnext, pleft)

        _, t, prim, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t_init, prim0,
                         jnp.int32(-1), jnp.int32(0)))
        tout_ref[:] = t
        pout_ref[:] = prim

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run(nodes, prims, rox, roy, roz, rdx, rdy, rdz, t0, variant="nodes"):
    g = rox.shape[0] // ROWS
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(rox.shape, jnp.float32),
                 jax.ShapeDtypeStruct(rox.shape, jnp.int32)]
    if variant in ("nodes", "nodir"):
        kern = make_nodes_kernel(directional=(variant == "nodes"))
        return pl.pallas_call(
            kern, grid=(g,), in_specs=[full] + [ray_spec] * 7,
            out_specs=[ray_spec] * 2, out_shape=out_shape,
        )(nodes, rox, roy, roz, rdx, rdy, rdz, t0)
    kern = make_leafu_kernel()
    return pl.pallas_call(
        kern, grid=(g,), in_specs=[full, full] + [ray_spec] * 7,
        out_specs=[ray_spec] * 2, out_shape=out_shape,
    )(nodes, prims, rox, roy, roz, rdx, rdy, rdz, t0)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "nodes"
    from aten_tpu.scene import scenedefs
    from aten_tpu.core import camera as cam_mod

    res = 1024
    scene, cam = scenedefs.dragon_scene(res, res)
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
    prep = lambda v: v.reshape(-1, LANES)
    t0 = jnp.full((N,), 3.4e38, jnp.float32).reshape(-1, LANES)
    args = (scene["trl_nodes"], scene["trl_prims"],
            prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
            prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]), t0)

    if variant == "v3":
        @jax.jit
        def chained():
            acc = jnp.float32(0)
            for i in range(6):
                o = _traverse_treelet_tiles(
                    args[0], args[1], args[2] + 0 * acc, *args[3:],
                    has_spheres=False, resident=True)
                acc = acc + o[0][0, 0]
            return acc
    else:
        @jax.jit
        def chained():
            acc = jnp.float32(0)
            for i in range(6):
                o = run(args[0], args[1], args[2] + 0 * acc, *args[3:],
                        variant=variant)
                acc = acc + o[0][0, 0]
            return acc

    tt0 = time.perf_counter()
    _ = float(chained())
    print(f"compile+first: {time.perf_counter()-tt0:.1f}s")
    best = 1e9
    for _ in range(3):
        tt0 = time.perf_counter()
        _ = float(chained())
        best = min(best, time.perf_counter() - tt0)
    sec = best / 6
    print(f"{variant}: {N/sec/1e6:.1f} Mrays/s ({sec*1e3:.2f} ms)")
    # correctness cross-check for leafu
    if variant == "leafu":
        o = run(*args, variant="leafu")
        ref = _traverse_treelet_tiles(*args, has_spheres=False, resident=True)
        agree = (np.asarray(o[1]) == np.asarray(ref[1])).mean()
        print(f"prim agreement vs v3: {agree:.6f}")


if __name__ == "__main__":
    main()
