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

    if variant == "plk":
        nodes2, E, pids = build_plucker_leaves(scene, 0)
        nodes2 = jnp.asarray(nodes2)
        E = jnp.asarray(E)

        @jax.jit
        def chained():
            acc = jnp.float32(0)
            for i in range(6):
                o = run_plk(nodes2, E, pids, args[2] + 0 * acc, *args[3:],
                            tile_rows=16)
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
        print(f"plk: {N/sec/1e6:.1f} Mrays/s ({sec*1e3:.2f} ms)")
        o = run_plk(nodes2, E, pids, *args[2:], tile_rows=16)
        ref = _traverse_treelet_tiles(*args, has_spheres=False, resident=True)
        po = np.asarray(o[1]).ravel()
        pr = np.asarray(ref[1]).ravel()
        agree = (po == pr).mean()
        to = np.asarray(o[0]).ravel(); trf = np.asarray(ref[0]).ravel()
        hit_both = (po >= 0) & (pr >= 0)
        terr = np.abs(to[hit_both] - trf[hit_both]).max() if hit_both.any() else 0
        print(f"prim agreement vs v3: {agree:.6f}  max|dt| on hits: {terr:.2e}")
        return
    if variant.startswith("spec"):
        tr = int(variant[4:]) if len(variant) > 4 else 8

        @jax.jit
        def chained():
            acc = jnp.float32(0)
            for i in range(6):
                o = run_spec(args[0], args[1], args[2] + 0 * acc, *args[3:],
                             tile_rows=tr)
                acc = acc + o[0][0, 0]
            return acc
    elif variant.startswith("wide"):
        parts = variant[4:].split("_")
        tr = int(parts[0])
        lc = "nc" not in parts
        dr = TRL_ROWS
        for p in parts[1:]:
            if p.startswith("t"):
                dr = int(p[1:]) // PACK

        @jax.jit
        def chained():
            acc = jnp.float32(0)
            for i in range(6):
                o = run_wide(args[0], args[1], args[2] + 0 * acc, *args[3:],
                             tile_rows=tr, leaf_cond=lc, drain_rows=dr)
                acc = acc + o[0][0, 0]
            return acc
    elif variant == "v3":
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




def make_wide_kernel(tile_rows, leaf_cond=True, drain_rows=TRL_ROWS):
    """v3-style resident treelet kernel with TILE_ROWS rows per walk
    (tile = tile_rows*128 rays).  Wider tiles amortize the ~330ns serial
    node-step latency over more rays; the cost is a larger visited-node
    union per tile.  leaf_cond=False makes the drain branch-free
    (always-run masked rows)."""

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
        prim0 = jnp.full((tile_rows, LANES), -1, jnp.int32)

        def test_slot(prow, pirow, j, ok, t, prim):
            b = 16 * j
            v0x, v0y, v0z = prow[0, b], prow[0, b + 1], prow[0, b + 2]
            e1x, e1y, e1z = prow[0, b + 3], prow[0, b + 4], prow[0, b + 5]
            e2x, e2y, e2z = prow[0, b + 6], prow[0, b + 7], prow[0, b + 8]
            pid = pirow[0, b + 9]
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-12,
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
            return t, prim

        def drain(pstart, pcount, t, prim):
            for r in range(drain_rows):
                prow = prims_ref[pl.ds(jnp.maximum(pstart, 0) + r, 1), :]
                pirow = F2I(prow)
                for j in range(PACK):
                    ok = (r * PACK + j) < pcount
                    t, prim = test_slot(prow, pirow, j, ok, t, prim)
            return t, prim

        def cond(c):
            return (c[0] >= 0) | (c[3] >= 0)

        def body(c):
            cur, t, prim, pstart, pcount = c
            active = cur >= 0
            curc = jnp.maximum(cur, 0)
            row = nodes_ref[pl.ds(curc, 1), :]
            irow = F2I(row)
            hitl, missl = _select_links(irow, ordv)
            start, count = irow[0, 18], irow[0, 19]
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
            anyhit = jnp.any(hitv) & active
            enter = (start >= 0) & anyhit
            if leaf_cond:
                t, prim = jax.lax.cond(
                    pstart >= 0,
                    lambda tp: drain(pstart, pcount, tp[0], tp[1]),
                    lambda tp: tp, (t, prim))
            else:
                t, prim = drain(pstart, pcount, t, prim)
            pstart = jnp.where(enter, start, -1)
            pcount = jnp.where(enter, count, 0)
            nxt = jnp.where(anyhit, hitl, missl)
            nxt = jnp.where(active, nxt, cur)
            return (nxt, t, prim, pstart, pcount)

        _, t, prim, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), t_init, prim0, jnp.int32(-1), jnp.int32(0)))
        tout_ref[:] = t
        pout_ref[:] = prim

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rows", "leaf_cond",
                                              "drain_rows"))
def run_wide(nodes, prims, rox, roy, roz, rdx, rdy, rdz, t0, tile_rows=16,
             leaf_cond=True, drain_rows=TRL_ROWS):
    g = rox.shape[0] // tile_rows
    ray_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(rox.shape, jnp.float32),
                 jax.ShapeDtypeStruct(rox.shape, jnp.int32)]
    kern = make_wide_kernel(tile_rows, leaf_cond, drain_rows)
    return pl.pallas_call(
        kern, grid=(g,), in_specs=[full, full] + [ray_spec] * 7,
        out_specs=[ray_spec] * 2, out_shape=out_shape,
    )(nodes, prims, rox, roy, roz, rdx, rdy, rdz, t0)




def make_spec_kernel(tile_rows):
    """Speculative two-row prefetch: each step loads BOTH the hit-link
    and miss-link node rows while the current row's slab/vote computes;
    the next row is then a cheap (1,128) vector select instead of a
    dependent dynamic load.  Critical chain per step drops from
    load->extract->slab->reduce->select->load to extract->load (the
    loads overlap the vector math)."""

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
        prim0 = jnp.full((tile_rows, LANES), -1, jnp.int32)

        def test_slot(prow, pirow, j, ok, t, prim):
            b = 16 * j
            v0x, v0y, v0z = prow[0, b], prow[0, b + 1], prow[0, b + 2]
            e1x, e1y, e1z = prow[0, b + 3], prow[0, b + 4], prow[0, b + 5]
            e2x, e2y, e2z = prow[0, b + 6], prow[0, b + 7], prow[0, b + 8]
            pid = pirow[0, b + 9]
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-12,
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
            return t, prim

        def drain(pstart, pcount, t, prim):
            for r in range(TRL_ROWS):
                prow = prims_ref[pl.ds(jnp.maximum(pstart, 0) + r, 1), :]
                pirow = F2I(prow)
                for j in range(PACK):
                    ok = (r * PACK + j) < pcount
                    t, prim = test_slot(prow, pirow, j, ok, t, prim)
            return t, prim

        def cond(c):
            return (c[0] >= 0) | (c[6] >= 0)

        def body(c):
            cur, take_hit, rowH, rowM, t, prim, pstart, pcount = c
            active = cur >= 0
            # current row: vector select of the two prefetched rows
            row = jnp.where(take_hit, rowH, rowM)
            irow = F2I(row)
            hitl, missl = _select_links(irow, ordv)
            start, count = irow[0, 18], irow[0, 19]
            # prefetch BOTH successors now; loads overlap the math below
            rH = nodes_ref[pl.ds(jnp.maximum(hitl, 0), 1), :]
            rM = nodes_ref[pl.ds(jnp.maximum(missl, 0), 1), :]
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
            anyhit = jnp.any(hitv) & active
            enter = (start >= 0) & anyhit
            t, prim = jax.lax.cond(
                pstart >= 0,
                lambda tp: drain(pstart, pcount, tp[0], tp[1]),
                lambda tp: tp, (t, prim))
            pstart = jnp.where(enter, start, -1)
            pcount = jnp.where(enter, count, 0)
            nxt = jnp.where(anyhit, hitl, missl)
            nxt = jnp.where(active, nxt, cur)
            return (nxt, anyhit, rH, rM, t, prim, pstart, pcount)

        row0 = nodes_ref[pl.ds(0, 1), :]
        _, _, _, _, t, prim, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.bool_(True), row0, row0, t_init, prim0,
             jnp.int32(-1), jnp.int32(0)))
        tout_ref[:] = t
        pout_ref[:] = prim

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def run_spec(nodes, prims, rox, roy, roz, rdx, rdy, rdz, t0, tile_rows=8):
    g = rox.shape[0] // tile_rows
    ray_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(rox.shape, jnp.float32),
                 jax.ShapeDtypeStruct(rox.shape, jnp.int32)]
    kern = make_spec_kernel(tile_rows)
    return pl.pallas_call(
        kern, grid=(g,), in_specs=[full, full] + [ray_spec] * 7,
        out_specs=[ray_spec] * 2, out_shape=out_shape,
    )(nodes, prims, rox, roy, roz, rdx, rdy, rdz, t0)




# ---------------------------------------------------------------------------
# plk: Plücker/MXU leaf phase.
#
# Möller-Trumbore per prim slot is ~40 VPU ops; at wide tiles the drain
# dominates.  The inside-triangle test is 3 Plücker side signs, each a
# 6-dot of (rd, ro x rd) against a per-EDGE constant 6-vector, and
# t = (d - n.ro)/(n.rd) — ALL bilinear forms, so one MXU matmul computes
# every (ray, prim) pair: S[3P+2P rows, 6] @ R6^T[6, TILE].
# ---------------------------------------------------------------------------


def build_plucker_leaves(scene, num_tris):
    """Per-treelet Plücker matrices from the packed trl prim rows.

    Returns (E [Ntrl, 8, 5*PADP] f32, meta) where E rows are the 6-vector
    constants (padded to 8 sublanes) and columns are 5 planes per prim:
    3 edge-sides + (n, -n.v0 -> t numerator via [n, d] . [ro, 1]) ... we
    store: edge sides e0,e1,e2 cols (6-vec), n col (3 + d in row 3),
    pid col (row 0).  Layout contract documented in the kernel.
    """
    import numpy as np

    nodes = np.asarray(scene["trl_nodes"])
    prims = np.asarray(scene["trl_prims"])
    ints = nodes[:, 6:21].view(np.int32)
    starts = ints[:, 12]
    counts = ints[:, 13]
    sel = (starts >= 0) & (counts > 0)
    tre_ids = np.nonzero(sel)[0]
    P = TRL_ROWS * PACK  # 64 prim slots per treelet
    NT = len(tre_ids)
    # E layout: [NT, 8, 4*P]: col groups [e0|e1|e2|plane] each P wide;
    # rows 0..5 = the 6-vector (d_e ; m_e) for edges, rows 0..3 = (n; d)
    # for the plane group; row 6 of plane group = pid (bitcast int).
    E = np.zeros((NT, 8, 4 * P), np.float32)
    pidtab = np.full((NT, P), -1, np.int32)
    for k, n in enumerate(tre_ids):
        s, c = int(starts[n]), int(counts[n])
        for j in range(c):
            row = prims[s + j // PACK]
            b = 16 * (j % PACK)
            v0 = row[b:b + 3].astype(np.float64)
            e1 = row[b + 3:b + 6].astype(np.float64)
            e2 = row[b + 6:b + 9].astype(np.float64)
            pid = row[b + 9:b + 10].view(np.int32)[0]
            A, B, C3 = v0, v0 + e1, v0 + e2
            for ei, (a, bb) in enumerate(((A, B), (B, C3), (C3, A))):
                d_e = bb - a
                m_e = np.cross(a, bb)
                # side(ray; edge) = rd . m_e + (ro x rd) . d_e
                E[k, 0:3, ei * P + j] = m_e
                E[k, 3:6, ei * P + j] = d_e
            nrm = np.cross(e1, e2)
            E[k, 0:3, 3 * P + j] = nrm
            E[k, 3, 3 * P + j] = -np.dot(nrm, v0)
            pidtab[k, j] = pid
    # node -> treelet index (dense remap for lane 21)
    remap = np.full(nodes.shape[0], -1, np.int32)
    remap[tre_ids] = np.arange(NT, dtype=np.int32)
    # rewrite node rows: lane 21 carries the treelet id
    nodes2 = nodes.copy()
    i21 = np.zeros((nodes.shape[0], 1), np.int32)
    i21[:, 0] = remap
    nodes2[:, 21:22] = i21.view(np.float32)
    return nodes2, E.reshape(NT * 8, 4 * P), jnp.asarray(pidtab)


def make_plk_kernel(tile_rows, n_prim=TRL_ROWS * PACK):
    """Streamed Plücker/MXU leaf kernel: on entering a fat leaf, DMA its
    E-matrix block [8, 4P] from HBM; the drain computes every
    (ray, prim) side/plane bilinear form in TWO MXU matmuls and keeps
    only ~12 VPU ops per pair (vs ~47 for Möller-Trumbore)."""
    P = n_prim

    def kernel(nodes_ref, emat_hbm, pid_ref,
               rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
               t0_ref, tout_ref, pout_ref, escr_ref, esem_ref):
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]

        def safe_inv(d):
            return jnp.where(jnp.abs(d) > 1e-12,
                             1.0 / jnp.where(d == 0, 1.0, d), 1e12)

        ivx, ivy, ivz = safe_inv(rdx), safe_inv(rdy), safe_inv(rdz)
        ordv = _pick_ordering(rdx, rdy, rdz)
        t_init = t0_ref[:]
        prim0 = jnp.full((tile_rows, LANES), -1, jnp.int32)
        N = tile_rows * LANES
        mx = roy * rdz - roz * rdy
        my = roz * rdx - rox * rdz
        mz = rox * rdy - roy * rdx
        R6 = jnp.concatenate([
            rdx.reshape(1, N), rdy.reshape(1, N), rdz.reshape(1, N),
            mx.reshape(1, N), my.reshape(1, N), mz.reshape(1, N),
            jnp.zeros((2, N), jnp.float32),
        ], axis=0)
        R4 = jnp.concatenate([
            rox.reshape(1, N), roy.reshape(1, N), roz.reshape(1, N),
            jnp.ones((1, N), jnp.float32), jnp.zeros((4, N), jnp.float32),
        ], axis=0)

        def drain(tid, t, prim):
            pltpu.make_async_copy(
                emat_hbm.at[pl.ds(tid * 8, 8), :], escr_ref, esem_ref
            ).wait()
            eb = escr_ref[:]
            S = jax.lax.dot_general(
                eb, R6, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # [4P, N]
            NUM = jax.lax.dot_general(
                eb[:, 3 * P:4 * P], R4, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # [P, N]
            for j in range(P):
                s0 = S[0 * P + j].reshape(tile_rows, LANES)
                s1 = S[1 * P + j].reshape(tile_rows, LANES)
                s2 = S[2 * P + j].reshape(tile_rows, LANES)
                den = S[3 * P + j].reshape(tile_rows, LANES)
                num = NUM[j].reshape(tile_rows, LANES)
                inside = ((s0 >= 0) & (s1 >= 0) & (s2 >= 0)) | (
                    (s0 <= 0) & (s1 <= 0) & (s2 <= 0))
                tt = -num / jnp.where(jnp.abs(den) > 1e-12, den,
                                      jnp.float32(1e12))
                pid = pid_ref[tid, j]
                ok = inside & (jnp.abs(den) > 1e-12) & (tt > T_MIN) \
                    & (pid >= 0)
                closer = ok & (tt < t)
                t = jnp.where(closer, tt, t)
                prim = jnp.where(closer, pid, prim)
            return t, prim

        def cond(c):
            return (c[0] >= 0) | (c[3] >= 0)

        def body(c):
            cur, t, prim, pend = c
            active = cur >= 0
            curc = jnp.maximum(cur, 0)
            row = nodes_ref[pl.ds(curc, 1), :]
            irow = F2I(row)
            hitl, missl = _select_links(irow, ordv)
            start = irow[0, 18]
            tre = irow[0, 21]
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
            anyhit = jnp.any(hitv) & active
            enter = (start >= 0) & anyhit & (tre >= 0)

            t, prim = jax.lax.cond(
                pend >= 0,
                lambda tp: drain(pend, tp[0], tp[1]),
                lambda tp: tp, (t, prim))

            @pl.when(enter)
            def _():
                pltpu.make_async_copy(
                    emat_hbm.at[pl.ds(jnp.maximum(tre, 0) * 8, 8), :],
                    escr_ref, esem_ref,
                ).start()

            pend = jnp.where(enter, tre, -1)
            nxt = jnp.where(anyhit, hitl, missl)
            nxt = jnp.where(active, nxt, cur)
            return (nxt, t, prim, pend)

        _, t, prim, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t_init, prim0, jnp.int32(-1)))
        tout_ref[:] = t
        pout_ref[:] = prim

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def run_plk(nodes, emat, pids, rox, roy, roz, rdx, rdy, rdz, t0,
            tile_rows=16):
    g = rox.shape[0] // tile_rows
    ray_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(rox.shape, jnp.float32),
                 jax.ShapeDtypeStruct(rox.shape, jnp.int32)]
    kern = make_plk_kernel(tile_rows)
    P = TRL_ROWS * PACK
    return pl.pallas_call(
        kern, grid=(g,),
        in_specs=[full, pl.BlockSpec(memory_space=pltpu.ANY), full]
        + [ray_spec] * 7,
        out_specs=[ray_spec] * 2, out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((8, 4 * P), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(nodes, emat, pids, rox, roy, roz, rdx, rdy, rdz, t0)


if __name__ == "__main__":
    main()
