"""Pallas TPU kernel: tile-coherent shared BVH traversal.

The reference's hottest kernel is per-thread stackless BVH traversal
(`hitTest`, src/libidaten/kernel/pt_standard_impl.cu:57-229, shared
traverser threaded_bvh_traverser.h:99).  A literal port (one lane = one
ray chasing its own node cursor) is hostile to the TPU: every node step
becomes a 1024-wide vector gather.  The TPU-native design instead gives
each 1024-ray tile ONE scalar node cursor: the tile walks the threaded
BVH once, taking the hit-link whenever ANY live ray wants the subtree
(a traversal "vote"), and intersects every visited leaf against the
whole tile with dense vector ops.

Mosaic only allows dynamic indexing on the sublane axis, so the node
and primitive pools are stored row-per-record as [K, 128] f32 arrays
(fields in the leading lanes, ints bitcast into f32): each step is one
(1,128) vector load at a dynamic row + static lane extracts + (8,128)
VPU math — no gathers at all.

Rays in a tile share camera/bounce coherence, so the union of visited
nodes stays close to a single ray's working set for primary/shadow
rays; incoherent bounces degrade gracefully (more nodes visited, never
wrong results, since per-ray acceptance is still exact).

Parity gate: tests/test_pallas.py allclose vs accel.traverse (the JAX
oracle), mirroring the aten/idaten dual-path contract (SURVEY.md §0).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aten_tpu.accel.build import LEAF_MAX

TILE = 1024  # (8, 128) rays per grid step
ROWS = 8
LANES = 128

try:  # Pallas is TPU/Mosaic; tolerate cpu-only environments
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

# node row lanes: 0-2 bmin, 3-5 bmax, 6 hit, 7 miss, 8 start, 9 count (ints
# bitcast to f32). prim row lanes: 0-8 v0/e1/e2, 9-11 center, 12 radius,
# 13 pid, 14 is_tri (ints bitcast).


def build_pallas_layout(bvh, tri_v0, tri_e1, tri_e2, sph_center, sph_radius, num_tris):
    """Precompute row-per-record VMEM arrays (numpy, build time).

    Primitive data is pre-gathered into BVH leaf order (prim_order), so the
    kernel's leaf loop reads rows [start+k] directly with no indirection.
    """
    order = np.asarray(bvh["prim_order"], np.int64)
    P = order.shape[0]
    K = bvh["nodes_bmin"].shape[0]
    Kp = -(-K // ROWS) * ROWS
    Pp = -(-P // ROWS) * ROWS

    nodes = np.zeros((Kp, LANES), np.float32)
    nodes[:K, 0:3] = np.asarray(bvh["nodes_bmin"], np.float32)
    nodes[:K, 3:6] = np.asarray(bvh["nodes_bmax"], np.float32)
    ints = np.full((Kp, 4), -1, np.int32)
    ints[:K, 0] = bvh["nodes_hit"]
    ints[:K, 1] = bvh["nodes_miss"]
    ints[:K, 2] = bvh["nodes_prim_start"]
    ints[:K, 3] = bvh["nodes_prim_count"]
    nodes[:, 6:10] = ints.view(np.float32)

    prims = np.zeros((Pp, LANES), np.float32)
    is_tri = order < num_tris
    tid = np.clip(order, 0, max(len(tri_v0) - 1, 0))
    sid = np.clip(order - num_tris, 0, max(len(sph_center) - 1, 0))
    prims[:P, 0:3] = np.where(is_tri[:, None], np.asarray(tri_v0)[tid], 0.0)
    prims[:P, 3:6] = np.where(is_tri[:, None], np.asarray(tri_e1)[tid], 0.0)
    prims[:P, 6:9] = np.where(is_tri[:, None], np.asarray(tri_e2)[tid], 0.0)
    prims[:P, 9:12] = np.where(~is_tri[:, None], np.asarray(sph_center)[sid], 0.0)
    prims[:P, 12] = np.where(~is_tri, np.asarray(sph_radius)[sid], 0.0)
    pints = np.zeros((Pp, 2), np.int32)
    pints[:P, 0] = order
    pints[:P, 1] = is_tri.astype(np.int32)
    prims[:, 13:15] = pints.view(np.float32)
    return {"pl_nodes": nodes, "pl_prims": prims}


def _make_kernel(any_hit: bool, t_min: float):
    def f2i(x):
        return pltpu.bitcast(x, jnp.int32)

    def kernel(
        nodes_ref, prims_ref,
        rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref, t0_ref,
        tout_ref, pout_ref, uout_ref, vout_ref,
    ):
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]

        def safe_inv(d):
            return jnp.where(
                jnp.abs(d) > 1e-12, 1.0 / jnp.where(d == 0, 1.0, d), 1e12
            )

        ivx, ivy, ivz = safe_inv(rdx), safe_inv(rdy), safe_inv(rdz)

        t_init = t0_ref[:]
        prim0 = jnp.full((ROWS, LANES), -1, jnp.int32)
        zero = jnp.zeros((ROWS, LANES), jnp.float32)

        def cond(c):
            return c[0] >= 0

        def body(c):
            cur, t, prim, u, v = c
            row = nodes_ref[pl.ds(cur, 1), :]  # (1, 128) dynamic sublane
            bminx = row[0, 0]
            bminy = row[0, 1]
            bminz = row[0, 2]
            bmaxx = row[0, 3]
            bmaxy = row[0, 4]
            bmaxz = row[0, 5]
            irow = f2i(row)
            hitl = irow[0, 6]
            missl = irow[0, 7]
            start = irow[0, 8]
            count = irow[0, 9]

            t0x = (bminx - rox) * ivx
            t1x = (bmaxx - rox) * ivx
            t0y = (bminy - roy) * ivy
            t1y = (bmaxy - roy) * ivy
            t0z = (bminz - roz) * ivz
            t1z = (bmaxz - roz) * ivz
            tenter = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            texit = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            if any_hit:
                want = prim < 0
            else:
                want = jnp.full_like(prim, True, dtype=jnp.bool_)
            hitv = (tenter <= texit) & (texit > 0.0) & (tenter < t) & want
            anyhit = jnp.any(hitv)
            is_leaf = start >= 0

            for k in range(LEAF_MAX):
                ok = (k < count) & is_leaf & anyhit  # scalar
                j = jnp.maximum(start, 0) + k
                prow = prims_ref[pl.ds(j, 1), :]
                v0x = prow[0, 0]
                v0y = prow[0, 1]
                v0z = prow[0, 2]
                e1x = prow[0, 3]
                e1y = prow[0, 4]
                e1z = prow[0, 5]
                e2x = prow[0, 6]
                e2y = prow[0, 7]
                e2z = prow[0, 8]
                cx = prow[0, 9]
                cy = prow[0, 10]
                cz = prow[0, 11]
                rr = prow[0, 12]
                pirow = f2i(prow)
                pid = pirow[0, 13]
                istri = pirow[0, 14] > 0  # scalar

                # Moller-Trumbore, vector over the tile
                px = rdy * e2z - rdz * e2y
                py = rdz * e2x - rdx * e2z
                pz = rdx * e2y - rdy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(
                    jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
                )
                tvx = rox - v0x
                tvy = roy - v0y
                tvz = roz - v0z
                uu = (tvx * px + tvy * py + tvz * pz) * inv_det
                qx = tvy * e1z - tvz * e1y
                qy = tvz * e1x - tvx * e1z
                qz = tvx * e1y - tvy * e1x
                vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                h_tri = (
                    (jnp.abs(det) > 1e-12)
                    & (uu >= 0.0)
                    & (vv >= 0.0)
                    & (uu + vv <= 1.0)
                    & (tt > t_min)
                )

                # sphere, vector over the tile
                ocx = rox - cx
                ocy = roy - cy
                ocz = roz - cz
                b = ocx * rdx + ocy * rdy + ocz * rdz
                cc = ocx * ocx + ocy * ocy + ocz * ocz - rr * rr
                disc = b * b - cc
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                ts0 = -b - sq
                ts1 = -b + sq
                ts = jnp.where(ts0 > t_min, ts0, ts1)
                h_sph = (disc > 0.0) & (ts > t_min)

                tp = jnp.where(istri, tt, ts)
                # (Mosaic cannot select between i1 vectors -> logical ops)
                hp = ((h_tri & istri) | (h_sph & jnp.logical_not(istri))) & ok
                closer = hp & (tp < t)
                t = jnp.where(closer, tp, t)
                prim = jnp.where(closer, pid, prim)
                u = jnp.where(closer, jnp.where(istri, uu, 0.0), u)
                v = jnp.where(closer, jnp.where(istri, vv, 0.0), v)

            nxt = jnp.where(anyhit, hitl, missl)
            if any_hit:
                nxt = jnp.where(jnp.all(prim >= 0), -1, nxt)
            return (nxt, t, prim, u, v)

        cur0 = jnp.int32(0)
        _, t, prim, u, v = jax.lax.while_loop(
            cond, body, (cur0, t_init, prim0, zero, zero)
        )
        tout_ref[:] = t
        pout_ref[:] = prim
        uout_ref[:] = u
        vout_ref[:] = v

    return kernel


@functools.partial(jax.jit, static_argnames=("any_hit", "t_min"))
def _traverse_tiles(nodes, prims, rox, roy, roz, rdx, rdy, rdz, t0,
                    any_hit=False, t_min=1e-4):
    g = rox.shape[0] // ROWS
    kernel = _make_kernel(any_hit, float(t_min))
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct(rox.shape, jnp.float32),
        jax.ShapeDtypeStruct(rox.shape, jnp.int32),
        jax.ShapeDtypeStruct(rox.shape, jnp.float32),
        jax.ShapeDtypeStruct(rox.shape, jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[full, full] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
    )(nodes, prims, rox, roy, roz, rdx, rdy, rdz, t0)


def traverse_pallas(scene, ro, rd, t_max=None, any_hit=False, t_min=1e-4):
    """Drop-in replacement for accel.traverse.traverse on TPU.

    Requires the scene to carry the pallas layout (SceneBuilder adds it).
    """
    ro = jax.lax.stop_gradient(ro)
    rd = jax.lax.stop_gradient(rd)
    N = ro.shape[0]
    Np = -(-N // TILE) * TILE
    padn = Np - N

    if t_max is None:
        t0 = jnp.full((N,), 3.4e38, jnp.float32)
    else:
        t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))

    def prep(x, fill=0.0):
        x = jnp.pad(x, ((0, padn),), constant_values=fill)
        return x.reshape(-1, LANES)

    rox = prep(ro[:, 0])
    roy = prep(ro[:, 1])
    roz = prep(ro[:, 2])
    rdx = prep(rd[:, 0])
    rdy = prep(rd[:, 1])
    rdz = prep(rd[:, 2], fill=1.0)
    t0p = prep(t0, fill=-1.0)  # padded rays: t<0 -> never hit

    t, prim, u, v = _traverse_tiles(
        scene["pl_nodes"], scene["pl_prims"],
        rox, roy, roz, rdx, rdy, rdz, t0p,
        any_hit=any_hit, t_min=t_min,
    )
    flat = lambda x: x.reshape(-1)[:N]
    prim = flat(prim)
    return {"t": flat(t), "prim": prim, "u": flat(u), "v": flat(v), "hit": prim >= 0}
