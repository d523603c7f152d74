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


def _seed_dead(prim0, t_init, any_hit, t_min):
    """Any-hit: lanes whose t0 <= t_min can never hit; seed prim=0 so
    they (a) drop out of the `want` tile votes and (b) satisfy the
    all(prim>=0) early exit instead of pinning the tile to a full walk
    (advisor r3).  Wrappers mask these lanes back to prim=-1."""
    if any_hit:
        return jnp.where(t_init <= t_min, 0, prim0)
    return prim0


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


def _make_kernel(any_hit: bool, t_min: float, tile_rows: int = ROWS):
    """tile_rows: rays per walk = tile_rows*128.  For the dense resident
    kernel every tile's visited union IS the whole (small) tree, so
    wider tiles amortize the ~330 ns serial node-step latency with NO
    union growth — cornell/zoo wavefronts run millions of lanes through
    thousands of tiles (zoo shadow batch measured ~540 ms/launch at 8
    rows from tile count alone)."""
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
        prim0 = _seed_dead(jnp.full((tile_rows, LANES), -1, jnp.int32),
                           t_init, any_hit, t_min)
        zero = jnp.zeros((tile_rows, LANES), jnp.float32)

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
                # closest: a dead lane (t0 <= t_min) can never accept a
                # hit, yet boxes containing its stale origin still have
                # tenter < 0 < ... <= t and would vote; mask it out.
                want = t_init > t_min
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


@functools.partial(jax.jit, static_argnames=("any_hit", "t_min", "tile_rows"))
def _traverse_tiles(nodes, prims, rox, roy, roz, rdx, rdy, rdz, t0,
                    any_hit=False, t_min=1e-4, tile_rows=ROWS):
    g = rox.shape[0] // tile_rows
    kernel = _make_kernel(any_hit, float(t_min), tile_rows)
    ray_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
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


# ---------------------------------------------------------------------------
# Treelet variant: scales past VMEM.
#
# The resident kernel above needs node+prim pools in VMEM (~512 B/record,
# ceiling measured at ~8 MB on this chip -> toy scenes only).  For large
# scenes the BVH is CUT into treelets of <= TREELET_MAX primitives: the
# small top tree stays resident in VMEM, treelet roots become "fat
# leaves" carrying a contiguous primitive-block range (preorder leaf
# order makes every subtree's prims contiguous already), and the blocks
# live in HBM, DMA-streamed into a VMEM scratch in CHUNK-row pieces when
# a tile's traversal vote enters the treelet.  This trades pointer-chase
# latency for bulk DMA bandwidth — the TPU-native answer to the
# reference's tex1Dfetch node cache (threaded_bvh_traverser.h:61-82).
#
# v2 additions (the round-2 throughput push):
#   * SIX direction-ordered link sets: hit/miss links re-threaded at
#     build time so the near child is visited first for rays travelling
#     +x/-x/+y/-y/+z/-z; the kernel picks the ordering from the tile's
#     mean direction.  Front-to-back order makes the per-ray
#     `tenter < t` term of the traversal vote actually prune: subtrees
#     and treelets behind the tile's closest hits are skipped.  (The
#     reference's fixed preorder links, threaded_bvh.h:178-191, have no
#     such ordering — a CUDA thread hides the cost with a stack; the
#     tile-vote design cannot.)
#   * triangle-only leaf test when the scene has no spheres (drops ~1/3
#     of the leaf VPU ops), and no u/v tracking in the kernel — the
#     winner's barycentrics are recomputed in JAX afterwards from the
#     (t, prim) result, one triangle per ray instead of per visited prim.
#
# v3 additions (instrumented: leaf streaming was 8x the node-walk cost):
#   * PACKED prim rows: 8 primitives per 128-lane row (16 lanes each)
#     instead of one -> a 64-prim treelet is one fixed 8-row (4 KB) DMA,
#     not a 32 KB one, and the intersect loop is count-aligned (a
#     fori_loop over ceil(count/8) rows replaces the always-64-row
#     unrolled chunk loop that wasted ~1/3 of its work on padding).
#   * PIPELINED leaf DMA: entering a treelet only *issues* the copy; the
#     walk continues and the intersection runs one node-step later, when
#     the data has landed — the reference hides this latency with CUDA
#     warp switching (pt_standard_impl.cu:57-229); a Pallas tile hides
#     it behind its own slab math.
# ---------------------------------------------------------------------------

# Kernel-variant knobs, snapshotted ONCE at import: they are baked into
# traced programs (padding quantum + kernel choice), so late env mutation
# would silently desync the two (advisor r3 finding).
import os as _os

# fat-leaf capacity = the kernel's fixed drain window.  Bigger leaves
# shrink the top tree (fewer serial ~330 ns walk steps — the dominant
# cost for direction-incoherent bounce tiles whose vote union nears the
# whole tree) at the price of more statically-unrolled drain slots.
TREELET_MAX = int(_os.environ.get("ATEN_TRL_WINDOW", "64"))

_ENV_KERNEL = _os.environ.get("ATEN_TPU_KERNEL", "v3")
_ENV_CHAINS = int(_os.environ.get("ATEN_TPU_CHAINS", "4"))
# v3 treelet walk tile height (rays per walk = rows*128); 16 measured
# +27% over 8 on dragon primaries (see _make_treelet_kernel docstring)
_ENV_TILE_ROWS = int(_os.environ.get("ATEN_TPU_TILE_ROWS", "16"))
# dense resident kernel walk height: every tile walks the whole small
# tree, so wide tiles shrink the tile count at zero union cost (32
# measured vs 8 on cornell/zoo wavefronts, round 5)
_ENV_DENSE_ROWS = int(_os.environ.get("ATEN_TPU_DENSE_ROWS", "32"))
# resident-pool VMEM budget (MB): node+prim pools at or under this stay
# VMEM-resident (no leaf DMA).  v5e VMEM holds ~30 MB of pool next to
# the tile buffers once the Mosaic scoped-vmem cap is raised (see the
# CompilerParams below); crytek-class (29.4 MB pools) measured 0.22
# resident vs 0.15 plk-streamed Mrays/s full-PT (bounce waves visit
# most leaves, so streaming re-DMAs the pool once per tile) and its
# wide-tile compile drops from >20 min (streamed MT) to ~3 min.
_ENV_RESIDENT_MB = float(_os.environ.get("ATEN_TPU_RESIDENT_MB", "32"))
PACK = 8          # prims per 128-lane row (16 lanes each)
TRL_ROWS = TREELET_MAX // PACK  # rows per fixed-size leaf DMA
CHUNK = 64  # prim rows per DMA piece (32 KB) — legacy tt_ kernel only


def _directional_links(cent, hit, miss, start):
    """Re-thread a preorder threaded tree for 6 axis-sign traversal orders.

    cent [K,3]: node box centers; hit/miss/start: the default threaded
    arrays (interior hit = n+1 preorder; leaf start >= 0).  Returns
    links [6, K, 2] int32 where ordering o = 2*axis + (1 if the rays
    travel toward -axis): the child whose center is nearer the ray
    origin side is visited first.
    """
    K = hit.shape[0]
    links = np.full((6, K, 2), -1, np.int32)
    # children of interior n: c1 = n+1 (preorder), c2 = skip of c1
    for o in range(6):
        axis, neg = o >> 1, o & 1
        h = links[o, :, 0]
        m = links[o, :, 1]
        stack = [(0, -1)]
        while stack:
            n, skip = stack.pop()
            # leaf = prim-carrying fat leaf OR zero-prim voxel leaf from
            # bake_lod_tree (start=-1 but hit==miss==skip; an interior
            # node always has hit=n+1 != miss)
            if start[n] >= 0 or hit[n] == miss[n]:
                h[n] = skip
                m[n] = skip
                continue
            c1 = n + 1
            c2 = int(miss[c1])
            first, second = c1, c2
            if (cent[c2, axis] < cent[c1, axis]) != bool(neg):
                first, second = c2, c1
            h[n] = first
            m[n] = skip
            stack.append((second, skip))
            stack.append((first, second))
    return links


def bake_lod_tree(bvh, vox_mtl, depth, lod_depth):
    """Prune a threaded BVH at its voxel nodes (SBVH voxel LOD baked for
    the kernel layout): annotated interior nodes with depth >= lod_depth
    become zero-prim VOXEL LEAVES and their subtrees vanish.  Returns
    (pruned threaded dict, voxid [K'] = original node index of each
    voxel leaf, else -1).  The kernel records tenter hits with prim =
    vox_base + voxid — matching the traced-knob oracle rule
    (accel/traverse.py) exactly for the SAME lod_depth.
    """
    nhit = np.asarray(bvh["nodes_hit"], np.int64)
    nmiss = np.asarray(bvh["nodes_miss"], np.int64)
    nps = np.asarray(bvh["nodes_prim_start"], np.int64)
    npc = np.asarray(bvh["nodes_prim_count"], np.int64)
    is_vox = (np.asarray(vox_mtl) >= 0) & (np.asarray(depth) >= lod_depth)

    keep = []
    i = 0
    while i != -1:
        keep.append(i)
        if is_vox[i] or nps[i] >= 0:
            i = int(nmiss[i])
        else:
            i = i + 1
    keep = np.asarray(keep, np.int64)
    new_of = {int(o): n for n, o in enumerate(keep)}
    Kt = len(keep)

    def remap(old):
        return -1 if old < 0 else new_of[int(old)]

    out = {
        "nodes_bmin": np.asarray(bvh["nodes_bmin"], np.float32)[keep],
        "nodes_bmax": np.asarray(bvh["nodes_bmax"], np.float32)[keep],
        "prim_order": np.asarray(bvh["prim_order"], np.int64),
    }
    hit = np.full(Kt, -1, np.int64)
    miss = np.full(Kt, -1, np.int64)
    start = np.full(Kt, -1, np.int64)
    count = np.zeros(Kt, np.int64)
    voxid = np.full(Kt, -1, np.int64)
    for n, o in enumerate(keep):
        skip = remap(nmiss[o])
        if is_vox[o]:
            hit[n] = skip
            miss[n] = skip
            voxid[n] = o  # ORIGINAL node index = the oracle's vox prim id
        elif nps[o] >= 0:
            hit[n] = skip
            miss[n] = skip
            start[n] = nps[o]
            count[n] = npc[o]
        else:
            hit[n] = new_of[int(o) + 1]
            miss[n] = skip
    out["nodes_hit"] = hit
    out["nodes_miss"] = miss
    out["nodes_prim_start"] = start
    out["nodes_prim_count"] = count
    return out, voxid


def treelet_cut(bvh, treelet_max=TREELET_MAX, protect=None):
    """Cut a threaded BVH at subtrees of <= treelet_max prims.

    Returns cut-tree arrays over kept nodes (preorder): bmin/bmax [Kt,3],
    hit/miss [Kt] (default preorder links), start/count [Kt] (fat leaves
    carry their subtree's contiguous prim range; interior -1/0), and
    keep (original index per kept node).

    protect [K] bool: nodes that must survive as their OWN node (voxel
    leaves) — subtrees containing one are never collapsed into a fat
    leaf, and the protected node itself becomes a zero-prim fat leaf.
    """
    nhit = np.asarray(bvh["nodes_hit"], np.int64)
    nmiss = np.asarray(bvh["nodes_miss"], np.int64)
    nps = np.asarray(bvh["nodes_prim_start"], np.int64)
    npc = np.asarray(bvh["nodes_prim_count"], np.int64)
    K = nhit.shape[0]
    P = int(np.sum(np.where(nps >= 0, npc, 0)))

    prefix = np.zeros(K + 1, np.int64)
    prefix[1:] = np.cumsum(np.where(nps >= 0, npc, 0))
    if protect is None:
        protect = np.zeros(K, bool)
    pcum = np.zeros(K + 1, np.int64)
    pcum[1:] = np.cumsum(protect.astype(np.int64))

    keep, is_fat = [], []
    i = 0
    while i != -1:
        skip = nmiss[i]
        end = P if skip < 0 else prefix[skip]
        cnt = end - prefix[i]
        sub_end = K if skip < 0 else int(skip)
        # protected descendants STRICTLY below i block collapsing
        has_protected = (pcum[sub_end] - pcum[i + 1]) > 0
        if protect[i] or nps[i] >= 0 or (cnt <= treelet_max and not has_protected):
            keep.append(i)
            is_fat.append(True)
            i = int(nmiss[i])
        else:
            keep.append(i)
            is_fat.append(False)
            i = i + 1  # preorder child
    keep = np.asarray(keep, np.int64)
    new_of = {int(o): n for n, o in enumerate(keep)}
    Kt = len(keep)

    # original prim offset of the FIRST leaf at/after each node: leaf
    # ranges are preorder-monotonic, so this is the subtree's range
    # start in prim_order.  (For an unpruned tree it equals prefix[i];
    # for LOD-BAKED trees pruned subtrees leave holes in prim_order, so
    # the compacted prefix would point fat leaves at the WRONG prims.)
    next_leaf = np.full(K + 1, -1, np.int64)
    for i in range(K - 1, -1, -1):
        next_leaf[i] = nps[i] if nps[i] >= 0 else next_leaf[i + 1]

    bmin = np.asarray(bvh["nodes_bmin"], np.float32)[keep]
    bmax = np.asarray(bvh["nodes_bmax"], np.float32)[keep]
    hit = np.full(Kt, -1, np.int64)
    miss = np.full(Kt, -1, np.int64)
    start = np.full(Kt, -1, np.int64)
    count = np.zeros(Kt, np.int64)
    for n, (o, fat) in enumerate(zip(keep, is_fat)):
        ms = int(nmiss[o])
        ms_new = -1 if ms < 0 else new_of[ms]
        if fat:
            hit[n] = ms_new
            miss[n] = ms_new
            end = P if ms < 0 else prefix[ms]
            count[n] = end - prefix[o]
            start[n] = next_leaf[o] if count[n] > 0 else -1
        else:
            hit[n] = new_of[int(o) + 1]
            miss[n] = ms_new
    return bmin, bmax, hit, miss, start, count, keep


def _pack_prim_rows(order, tri_v0, tri_e1, tri_e2, sph_center, sph_radius,
                    num_tris, pad_to=CHUNK):
    """Row-per-prim [Pp, 128] packing shared by the streaming layouts."""
    P = order.shape[0]
    Pp = (-(-P // pad_to) + 1) * pad_to
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
    return prims


def _pack_prims_8(order, tri_v0, tri_e1, tri_e2, sph_center, sph_radius,
                  num_tris, row_of_prim, n_rows):
    """Pack prims 8 per row, 16 lanes each.

    Per-slot lanes (base = 16*j): 0-2 v0 | sphere center, 3-5 e1
    (lane 3 = sphere radius), 6-8 e2, 9 pid (int), 10 is_tri (int).
    row_of_prim[i] gives (row, slot) flattened index for order[i].
    """
    P = order.shape[0]
    prims = np.zeros((n_rows, LANES), np.float32)
    is_tri = order < num_tris
    tid = np.clip(order, 0, max(len(tri_v0) - 1, 0))
    sid = np.clip(order - num_tris, 0, max(len(sph_center) - 1, 0))
    slot = row_of_prim % PACK
    row = row_of_prim // PACK
    base = slot * 16
    geo0 = np.where(is_tri[:, None], np.asarray(tri_v0, np.float32)[tid],
                    np.asarray(sph_center, np.float32)[sid] if len(sph_center)
                    else 0.0)
    geo1 = np.where(is_tri[:, None], np.asarray(tri_e1, np.float32)[tid], 0.0)
    if len(sph_radius):
        geo1 = geo1.copy()
        geo1[~is_tri, 0] = np.asarray(sph_radius, np.float32)[sid[~is_tri]]
    geo2 = np.where(is_tri[:, None], np.asarray(tri_e2, np.float32)[tid], 0.0)
    for a in range(3):
        prims[row, base + a] = geo0[:, a]
        prims[row, base + 3 + a] = geo1[:, a]
        prims[row, base + 6 + a] = geo2[:, a]
    pid_f = np.asarray(order, np.int32).view(np.float32)
    istri_f = is_tri.astype(np.int32).view(np.float32)
    prims[row, base + 9] = pid_f
    prims[row, base + 10] = istri_f
    return prims


def build_treelet_layout(bvh, tri_v0, tri_e1, tri_e2, sph_center, sph_radius,
                         num_tris, treelet_max=None, voxid=None,
                         vox_base=None):
    """Cut the threaded BVH into a VMEM top tree + HBM packed prim rows.

    Node row lanes: 0-2 bmin, 3-5 bmax, 6..17 (hit,miss) int links for
    the 6 direction orderings, 18 row_start, 19 prim count, 20 voxel
    prim id (-1 unless the node is a baked voxel leaf; ints bitcast to
    f32).  Every fat leaf's prims start on a row boundary and the kernel
    always DMAs a fixed TRL_ROWS-row window, so the pool carries a
    TRL_ROWS tail pad.

    voxid: per-node original indices from bake_lod_tree (voxel leaves);
    their rows get lane 20 = vox_base + voxid and no prim range.
    """
    order = np.asarray(bvh["prim_order"], np.int64)
    if treelet_max is None:
        import os

        treelet_max = int(os.environ.get("ATEN_TRL_MAX", "0"))
        if treelet_max <= 0:
            # 64 everywhere: 128-prim fat leaves were measured on both
            # sponza svgf (548 vs 550 ms — its 344-row top tree was
            # never walk-bound) and crytek-class full PT (0.294 vs
            # 0.319 Mrays/s resident — the doubled drain window costs
            # more than the halved 7600-row walk saves; the kernel is
            # drained-pair-bound, exact parity held).  The per-scene
            # window plumbing stays (ATEN_TRL_MAX=any multiple of 8).
            treelet_max = TREELET_MAX
    assert treelet_max % PACK == 0, (
        f"treelet_max={treelet_max} must be a multiple of PACK={PACK}")
    wrows = treelet_max // PACK  # kernel drain window rows (static)
    protect = None if voxid is None else (np.asarray(voxid) >= 0)
    bmin, bmax, hit, miss, start, count, keep = treelet_cut(
        bvh, treelet_max, protect=protect
    )
    Kt = hit.shape[0]
    if count.size:
        assert int(count.max()) <= wrows * PACK, (
            f"treelet cut produced a {int(count.max())}-prim leaf; kernel "
            f"window is {wrows * PACK}")
    links = _directional_links((bmin + bmax) * 0.5, hit, miss, start)

    vox_cut = np.full(Kt, -1, np.int64)
    if voxid is not None:
        vox_cut = np.asarray(voxid)[keep]
        # voxel leaves carry no prim range
        start = np.where(vox_cut >= 0, -1, start)
        count = np.where(vox_cut >= 0, 0, count)

    # row-align each treelet's prim range
    P = order.shape[0]
    row_start = np.full(Kt, -1, np.int64)
    row_of_prim = np.zeros(P, np.int64)
    nrows = 0
    for n in np.nonzero((start >= 0) & (count > 0))[0]:
        s, c = int(start[n]), int(count[n])
        row_start[n] = nrows
        idx = nrows * PACK + np.arange(c)
        row_of_prim[s:s + c] = idx
        nrows += -(-c // PACK)
    n_rows_padded = nrows + wrows  # fixed-window overread pad

    # Plücker/MXU leaf constants (triangle-only scenes): dense E-block
    # index per fat leaf, written to node lane 21 below.
    fat = np.nonzero((start >= 0) & (count > 0) & (row_start >= 0))[0]
    eblk = np.full(Kt, -1, np.int64)
    eblk[fat] = np.arange(fat.shape[0])

    Kp = -(-Kt // ROWS) * ROWS
    nodes = np.zeros((Kp, LANES), np.float32)
    nodes[:Kt, 0:3] = bmin
    nodes[:Kt, 3:6] = bmax
    ints = np.full((Kp, 16), -1, np.int32)
    ints[:, 13] = 0
    ints[:Kt, 0:12] = links.transpose(1, 0, 2).reshape(Kt, 12)
    ints[:Kt, 12] = row_start
    ints[:Kt, 13] = count
    if vox_base is not None:
        ints[:Kt, 14] = np.where(vox_cut >= 0, vox_base + vox_cut, -1)
    ints[:Kt, 15] = eblk
    nodes[:, 6:22] = ints.view(np.float32)

    prims = _pack_prims_8(order, tri_v0, tri_e1, tri_e2, sph_center,
                          sph_radius, num_tris, row_of_prim, n_rows_padded)
    out = {"trl_nodes": nodes, "trl_prims": prims, "_window": treelet_max}
    # triangle-only scenes get the Plücker E pool (sph arrays may carry
    # a dummy padding row — check the actual prim ids instead).  The
    # plk kernel's E layout is built for the default 64-prim window
    # only; wider-window scenes run the MT drain.
    tris_only = not (order >= num_tris).any()
    if tris_only and fat.shape[0] > 0 and treelet_max == TREELET_MAX:
        emat, slot2prim = _build_plucker_emat(
            order, tri_v0, tri_e1, tri_e2, start, count, fat,
            row_of_prim, n_rows_padded)
        out["trl_emat"] = emat
        out["trl_slot2prim"] = slot2prim
    return out


# Plücker/MXU leaf drain (the round-5 kernel push, VERDICT r4 #1).
#
# Möller-Trumbore costs ~47 VPU ops per (ray, prim) pair and dominated
# the wide-tile kernel (~60% of tile time in the 64-slot drain).  The
# in-triangle test is 3 Plücker side signs — each a permuted inner
# product of the ray line (rd, ro x rd) with a constant edge line
# (d_e, a x b) — and the plane t is (n.v0 - n.ro)/(n.rd): ALL bilinear
# in (per-prim constants, per-ray 10-vector).  One MXU matmul of the
# treelet's constant block E [16, 5P] against the tile's ray matrix
# R [16, N] therefore computes every form for every (ray, prim) pair,
# and the VPU tail drops to ~18 ops/pair IN [P, N] LAYOUT (the lab's
# 256x-per-drain lane->sublane relayout is replaced by a mantissa-LSB
# slot encode + ONE sublane min-reduce + one (1,N)->tile reshape).
#
# E column groups (P = TRL_ROWS*PACK prims, rows = contraction axis):
#   [0,P)   side0: rows 0-2 = a x b, rows 3-5 = d_e   (edge v0 -> v1)
#   [P,2P)  side1                                      (edge v1 -> v2)
#   [2P,3P) den:   rows 0-2 = n  (contracts rd)
#   [3P,4P) numn:  rows 6-8 = -n, row 9 = n.v0 (contracts ro, 1)
# R rows: 0-2 rd, 3-5 ro x rd, 6-8 ro, 9 ones, 10-15 zero.
# side2 is recovered in-kernel from the identity s0+s1+s2 = den (the
# Plücker sides ARE the barycentrics scaled by den), and the num group
# is stored NEGATED so tt = numn * (1/den) with no extra ops.  Padded
# columns are all-zero -> tt = 0 * inf = NaN -> self-excluded by the
# tt > t_min test (no count mask, no denok mask needed).
#
# Match: hitTest leaf loop
# (/root/reference/src/libidaten/kernel/pt_standard_impl.cu:57-229).

PLK_EW = 4 * TREELET_MAX  # E block lane width = 4P (2 lane-tiles at P=64)


def _build_plucker_emat(order, tri_v0, tri_e1, tri_e2, start, count, fat,
                        row_of_prim, n_rows_padded):
    """Vectorized E-pool build: [NT*16, PLK_EW] f32 + slot2prim[n_slots].

    Constants are computed in float64 and stored world-frame: with the
    den-group contracting rd alone (the lab's plk variant polluted den
    with d*m_x — the real source of its 25% prim agreement), f32 HIGHEST
    matmuls keep |dt| well inside the 1e-4 parity gate on scene-scale
    coordinates (measured 7.5e-6 rel on dragon)."""
    P = TRL_ROWS * PACK
    NT = fat.shape[0]
    c_arr = count[fat].astype(np.int64)
    s_arr = start[fat].astype(np.int64)
    tot = int(c_arr.sum())
    tre = np.repeat(np.arange(NT), c_arr)
    j_in = np.arange(tot) - np.repeat(np.cumsum(c_arr) - c_arr, c_arr)
    tid = order[s_arr[tre] + j_in]
    v0 = np.asarray(tri_v0, np.float64)[tid]
    e1 = np.asarray(tri_e1, np.float64)[tid]
    e2 = np.asarray(tri_e2, np.float64)[tid]
    A, B, C3 = v0, v0 + e1, v0 + e2
    n = np.cross(e1, e2)
    E = np.zeros((NT, 16, PLK_EW), np.float32)
    col = j_in
    for g, (a, b) in enumerate(((A, B), (B, C3))):
        m_e = np.cross(a, b)
        d_e = b - a
        for ax in range(3):
            E[tre, ax, g * P + col] = m_e[:, ax]
            E[tre, 3 + ax, g * P + col] = d_e[:, ax]
    for ax in range(3):
        E[tre, ax, 2 * P + col] = n[:, ax]
        E[tre, 6 + ax, 3 * P + col] = -n[:, ax]
    E[tre, 9, 3 * P + col] = np.einsum("ij,ij->i", n, v0)
    slot2prim = np.full(n_rows_padded * PACK, -1, np.int32)
    slot2prim[row_of_prim] = order.astype(np.int32)
    return E.reshape(NT * 16, PLK_EW), slot2prim


def _pick_ordering(rdx, rdy, rdz):
    """Tile's traversal ordering o = 2*axis + sign from the mean direction."""
    sx = jnp.sum(rdx)
    sy = jnp.sum(rdy)
    sz = jnp.sum(rdz)
    ax, ay, az = jnp.abs(sx), jnp.abs(sy), jnp.abs(sz)
    ox = jnp.where(sx >= 0, 0, 1)
    oy = jnp.where(sy >= 0, 2, 3)
    oz = jnp.where(sz >= 0, 4, 5)
    return jnp.where(
        (ax >= ay) & (ax >= az), ox, jnp.where(ay >= az, oy, oz)
    ).astype(jnp.int32)


def _select_links(irow, o):
    """Extract (hit, miss) for ordering o from node-row int lanes 6..17."""
    h = irow[0, 6]
    m = irow[0, 7]
    for k in range(1, 6):
        h = jnp.where(o == k, irow[0, 6 + 2 * k], h)
        m = jnp.where(o == k, irow[0, 7 + 2 * k], m)
    return h, m


def _make_treelet_kernel(any_hit: bool, t_min: float, has_spheres: bool,
                         resident: bool = False, has_lod: bool = False,
                         stats: bool = False, tile_rows: int = ROWS,
                         wrows: int = TRL_ROWS):
    """resident=True: the packed prim pool lives in VMEM and fat leaves
    read it directly (no DMA at all) — chosen when the scene fits; the
    streamed variant (prims in HBM, pipelined fixed-window copies) is the
    fallback for scenes beyond VMEM.

    tile_rows: rays per walk = tile_rows*128.  16 rows (2048 rays)
    measured 57.7 vs 45.3 Mrays/s at 8 rows on dragon primaries (v5e):
    the ~330 ns serial node-step latency amortizes over twice the rays
    while the visited-node union grows slower than 2x.

    (A shared-origin variant that moved tv and both Möller-Trumbore
    cross products to the scalar core was tried and measured SLOWER —
    35.5 vs 39.5 Mrays/s on dragon — the scalar pipe serializes; the
    kernel is vector-bound and stays fully vectorized.)
    """
    def f2i(x):
        return pltpu.bitcast(x, jnp.int32)

    def kernel(
        nodes_ref, prims_hbm,
        rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref, t0_ref,
        tout_ref, pout_ref,
        *rest,
    ):
        if stats:
            sout_ref, lout_ref, scratch_ref, sem_ref = rest
        else:
            scratch_ref, sem_ref = rest
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]

        def safe_inv(d):
            return jnp.where(
                jnp.abs(d) > 1e-12, 1.0 / jnp.where(d == 0, 1.0, d), 1e12
            )

        ivx, ivy, ivz = safe_inv(rdx), safe_inv(rdy), safe_inv(rdz)
        ordv = _pick_ordering(rdx, rdy, rdz)

        def test_prim_slot(prow, pirow, j, ok, t, prim):
            b = 16 * j
            v0x, v0y, v0z = prow[0, b + 0], prow[0, b + 1], prow[0, b + 2]
            e1x, e1y, e1z = prow[0, b + 3], prow[0, b + 4], prow[0, b + 5]
            e2x, e2y, e2z = prow[0, b + 6], prow[0, b + 7], prow[0, b + 8]
            pid = pirow[0, b + 9]
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(
                jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
            )
            tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
            uu = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            hp = (
                (jnp.abs(det) > 1e-12) & (uu >= 0.0) & (vv >= 0.0)
                & (uu + vv <= 1.0) & (tt > t_min) & ok
            )
            if has_spheres:
                # sphere slots: center in v0 lanes, radius in e1x lane
                cx, cy, cz, rr = v0x, v0y, v0z, e1x
                istri = pirow[0, b + 10] > 0
                ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
                cc = ocx * ocx + ocy * ocy + ocz * ocz - rr * rr
                bq = ocx * rdx + ocy * rdy + ocz * rdz
                disc = bq * bq - cc
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                ts0 = -bq - sq
                ts1 = -bq + sq
                ts = jnp.where(ts0 > t_min, ts0, ts1)
                h_sph = (disc > 0.0) & (ts > t_min)
                tp = jnp.where(istri, tt, ts)
                hp = ((hp & istri) | (h_sph & jnp.logical_not(istri) & ok))
            else:
                tp = tt
            closer = hp & (tp < t)
            t = jnp.where(closer, tp, t)
            prim = jnp.where(closer, pid, prim)
            return t, prim

        # (A per-8-row-group drain with lax.cond skip for non-voting
        # groups was built and measured here in round 5: dragon primary
        # 59.3 -> 48.6 Mrays/s, sponza svgf 550 -> 606 ms.  The per-group
        # cond overhead + (8,128) op splitting loses more than the skips
        # save — the same serialization that sank the SMT kernel's
        # per-chain leaf conds.  Full-tile drains stay.)
        def intersect_pending(pstart, pcount, t, prim):
            """Test a fat leaf's prims (waiting on its DMA if streamed).

            Statically unrolled over the fixed wrows-row window with
            per-slot masks: a dynamic-trip fori_loop here costs ~100 ns
            of loop overhead PER ROW (launch-amortized lab timing), more
            than the masked extra rows cost."""
            if not resident:
                pltpu.make_async_copy(
                    prims_hbm.at[pl.ds(pstart, wrows), :], scratch_ref,
                    sem_ref,
                ).wait()
            for r in range(wrows):
                if resident:
                    prow = prims_hbm[pl.ds(pstart + r, 1), :]
                else:
                    prow = scratch_ref[pl.ds(r, 1), :]
                pirow = f2i(prow)
                for j in range(PACK):
                    ok = (r * PACK + j) < pcount
                    t, prim = test_prim_slot(prow, pirow, j, ok, t, prim)
            return (t, prim)

        t_init = t0_ref[:]
        prim0 = _seed_dead(jnp.full((tile_rows, LANES), -1, jnp.int32),
                           t_init, any_hit, t_min)

        def cond(c):
            return (c[0] >= 0) | (c[3] >= 0)

        def body(c):
            cur, t, prim, pstart, pcount, ns, lr = c
            ns = ns + 1
            lr = lr + jnp.where(pstart >= 0, (pcount + PACK - 1) // PACK, 0)
            active = cur >= 0
            curc = jnp.maximum(cur, 0)
            row = nodes_ref[pl.ds(curc, 1), :]
            bminx, bminy, bminz = row[0, 0], row[0, 1], row[0, 2]
            bmaxx, bmaxy, bmaxz = row[0, 3], row[0, 4], row[0, 5]
            irow = f2i(row)
            hitl, missl = _select_links(irow, ordv)
            start, count = irow[0, 18], irow[0, 19]
            if has_lod:
                voxp = irow[0, 20]  # baked voxel-leaf prim id (else -1)

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
                # closest: a dead lane (t0 <= t_min) can never accept a
                # hit, yet boxes containing its stale origin still have
                # tenter < 0 < ... <= t and would vote; mask it out.
                want = t_init > t_min
            hitv = (tenter <= texit) & (texit > 0.0) & (tenter < t) & want
            anyhit = jnp.any(hitv) & active
            enter_block = (start >= 0) & anyhit

            if has_lod:
                # baked voxel leaf: the subtree was pruned at build; the
                # node hits as a solid box at tenter (oracle rule,
                # accel/traverse.py LOD branch / threaded_bvh_traverser
                # .h:221-277) and the walk takes the skip link.  Equal-
                # tenter ties between voxels break toward the smaller
                # node id (visit order differs from the oracle's).
                vtie = (
                    (tenter <= texit) & (texit > 0.0) & want
                    & (tenter == t) & (voxp < prim)
                )
                closer_v = (hitv | vtie) & (tenter > t_min) & (voxp >= 0)
                t = jnp.where(closer_v, tenter, t)
                prim = jnp.where(closer_v, voxp, prim)

            # drain the leaf DMA issued on a previous step (it has been
            # flying behind this step's slab math)
            t, prim = jax.lax.cond(
                pstart >= 0,
                lambda tp: intersect_pending(pstart, pcount, tp[0], tp[1]),
                lambda tp: tp,
                (t, prim),
            )

            # issue (not wait) this step's leaf copy
            if not resident:
                @pl.when(enter_block)
                def _():
                    pltpu.make_async_copy(
                        prims_hbm.at[pl.ds(start, wrows), :],
                        scratch_ref,
                        sem_ref,
                    ).start()

            pstart = jnp.where(enter_block, start, -1)
            pcount = jnp.where(enter_block, count, 0)
            nxt = jnp.where(anyhit, hitl, missl)
            nxt = jnp.where(active, nxt, cur)
            if any_hit:
                nxt = jnp.where(jnp.all(prim >= 0), -1, nxt)
            return (nxt, t, prim, pstart, pcount, ns, lr)

        cur0 = jnp.int32(0)
        _, t, prim, _, _, ns, lr = jax.lax.while_loop(
            cond, body,
            (cur0, t_init, prim0, jnp.int32(-1), jnp.int32(0),
             jnp.int32(0), jnp.int32(0)),
        )
        tout_ref[:] = t
        pout_ref[:] = prim
        if stats:
            sout_ref[:] = jnp.full((tile_rows, LANES), ns, jnp.int32)
            lout_ref[:] = jnp.full((tile_rows, LANES), lr, jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "t_min", "has_spheres", "resident", "has_lod",
                     "stats", "tile_rows", "wrows"),
)
def _traverse_treelet_tiles(nodes, prims, rox, roy, roz, rdx, rdy, rdz, t0,
                            any_hit=False, t_min=1e-4, has_spheres=True,
                            resident=False, has_lod=False, stats=False,
                            tile_rows=ROWS, wrows=TRL_ROWS):
    g = rox.shape[0] // tile_rows
    kernel = _make_treelet_kernel(any_hit, float(t_min), has_spheres, resident,
                                  has_lod, stats, tile_rows, wrows)
    ray_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct(rox.shape, jnp.float32),
        jax.ShapeDtypeStruct(rox.shape, jnp.int32),
    ]
    nout = 2
    if stats:
        out_shape += [
            jax.ShapeDtypeStruct(rox.shape, jnp.int32),
            jax.ShapeDtypeStruct(rox.shape, jnp.int32),
        ]
        nout = 4
    prim_space = pltpu.VMEM if resident else pltpu.ANY
    # Mosaic's default scoped-VMEM cap is 16 MB; crytek-class resident
    # pools (29.4 MB nodes+prims) need the cap raised to what the pools
    # + tile buffers actually use (v5e VMEM is far larger).
    pool_bytes = int(nodes.size + prims.size) * 4
    params = None
    if resident and pool_bytes > 12 * 1024 * 1024:
        params = pltpu.CompilerParams(
            vmem_limit_bytes=pool_bytes + 16 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # top tree resident
            pl.BlockSpec(memory_space=prim_space),   # prim rows
        ] + [ray_spec] * 7,
        out_specs=[ray_spec] * nout,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((wrows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        **({"compiler_params": params} if params is not None else {}),
    )(nodes, prims, rox, roy, roz, rdx, rdy, rdz, t0)


def _make_plk_treelet_kernel(any_hit: bool, t_min: float, has_lod: bool,
                             stats: bool, tile_rows: int, n_slots: int):
    """Treelet walk with the Plücker/MXU leaf drain (see the E-layout
    comment above _build_plucker_emat).  Node walk is identical to
    _make_treelet_kernel; fat leaves DMA their E block [16, PLK_EW] from
    HBM (issued on enter, drained one step later — same pipelining as
    the streamed MT kernel) and intersect the WHOLE tile against all P
    prims with one f32-HIGHEST matmul + an 18-op/pair [P, N] tail.

    The kernel reports winners in the SLOT namespace (pstart*PACK + j;
    voxel leaves shifted by n_slots) — the wrapper translates via
    trl_slot2prim with one fused gather.  Winner t carries the slot id
    in its 6 mantissa LSBs (rel. 2^-18 truncation, far inside the 1e-4
    parity gate); ties therefore break toward the smaller slot = leaf
    order, matching the oracle's first-strictly-closer rule."""
    P = TRL_ROWS * PACK
    assert P & (P - 1) == 0, "slot encode needs power-of-two P"
    NB = P - 1
    SENT = np.int32(0x7F800000)  # +inf bits, slot 0

    def f2i(x):
        return pltpu.bitcast(x, jnp.int32)

    def kernel(
        nodes_ref, emat_hbm,
        rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref, t0_ref,
        tout_ref, pout_ref,
        *rest,
    ):
        if stats:
            sout_ref, lout_ref, escr_ref, esem_ref = rest
        else:
            escr_ref, esem_ref = rest
        rox, roy, roz = rox_ref[:], roy_ref[:], roz_ref[:]
        rdx, rdy, rdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]

        def safe_inv(d):
            return jnp.where(
                jnp.abs(d) > 1e-12, 1.0 / jnp.where(d == 0, 1.0, d), 1e12
            )

        ivx, ivy, ivz = safe_inv(rdx), safe_inv(rdy), safe_inv(rdz)
        ordv = _pick_ordering(rdx, rdy, rdz)

        # ray 10-vector rows in [1, N] layout (one-time relayout per tile)
        N = tile_rows * LANES
        rs = lambda x: x.reshape(1, N)
        RDX, RDY, RDZ = rs(rdx), rs(rdy), rs(rdz)
        ROX, ROY, ROZ = rs(rox), rs(roy), rs(roz)
        MWX = ROY * RDZ - ROZ * RDY
        MWY = ROZ * RDX - ROX * RDZ
        MWZ = ROX * RDY - ROY * RDX
        R16 = jnp.concatenate(
            [RDX, RDY, RDZ, MWX, MWY, MWZ, ROX, ROY, ROZ,
             jnp.ones((1, N), jnp.float32),
             jnp.zeros((6, N), jnp.float32)], axis=0)
        jio = jax.lax.broadcasted_iota(jnp.int32, (P, N), 0)

        def drain(eblk):
            """Reduce one E block to per-ray winner codes (1, N).

            Does NOT touch t/prim: the merge is DEFERRED to the next
            drain (or loop exit), so this chain's ~2-4 us of latency
            overlaps the node steps that follow instead of serializing
            them (measured 40 -> 99 Mrays/s on dragon primaries)."""
            pltpu.make_async_copy(
                emat_hbm.at[pl.ds(eblk * 16, 16), :], escr_ref, esem_ref,
            ).wait()
            eb = escr_ref[:]
            S = jax.lax.dot_general(
                eb, R16, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # [PLK_EW, N]
            s0 = S[0:P]
            s1 = S[P:2 * P]
            den = S[2 * P:3 * P]
            numn = S[3 * P:4 * P]
            s2 = den - s0 - s1
            # inside = all sides share sign(den) (Plücker sides ARE the
            # barycentrics scaled by den) — sign-bit xor test, same
            # inclusive boundaries as MT's u>=0/v>=0/u+v<=1
            idn = f2i(den)
            signok = ((f2i(s0) ^ idn) | (f2i(s1) ^ idn)
                      | (f2i(s2) ^ idn)) >= 0
            tt = numn * (1.0 / den)  # den=0 -> inf/NaN -> self-excluded
            valid = signok & (tt > t_min)
            enc = (f2i(tt) & ~NB) | jio
            enc = jnp.where(valid, enc, SENT)
            return jnp.min(enc, axis=0, keepdims=True)  # (1, N) int32

        def merge(best, bstart, t, prim):
            """Fold a drain's (1, N) winner codes into the tile state."""
            bt = pltpu.bitcast(best & ~NB, jnp.float32).reshape(
                tile_rows, LANES)
            bs = ((best & NB) + bstart * PACK).reshape(tile_rows, LANES)
            closer = bt < t
            t = jnp.where(closer, bt, t)
            prim = jnp.where(closer, bs, prim)
            return t, prim

        t_init = t0_ref[:]
        prim0 = _seed_dead(jnp.full((tile_rows, LANES), -1, jnp.int32),
                           t_init, any_hit, t_min)

        best0 = jnp.full((1, tile_rows * LANES), SENT, jnp.int32)

        def cond(c):
            return (c[0] >= 0) | (c[3] >= 0)

        def body(c):
            cur, t, prim, pend, pstart, best, bstart, ns, dr = c
            ns = ns + 1
            dr = dr + jnp.where(pend >= 0, 1, 0)

            # fold the PREVIOUS drain's winners in first: that chain
            # completed while the walk advanced, so this is ~10 ready
            # vector ops and the vote below sees a fresh t
            t, prim = jax.lax.cond(
                bstart >= 0,
                lambda tp: merge(best, bstart, tp[0], tp[1]),
                lambda tp: tp,
                (t, prim),
            )

            active = cur >= 0
            curc = jnp.maximum(cur, 0)
            row = nodes_ref[pl.ds(curc, 1), :]
            bminx, bminy, bminz = row[0, 0], row[0, 1], row[0, 2]
            bmaxx, bmaxy, bmaxz = row[0, 3], row[0, 4], row[0, 5]
            irow = f2i(row)
            hitl, missl = _select_links(irow, ordv)
            start = irow[0, 18]
            ebn = irow[0, 21]

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
                want = t_init > t_min
            hitv = (tenter <= texit) & (texit > 0.0) & (tenter < t) & want
            anyhit = jnp.any(hitv) & active
            enter_block = (start >= 0) & anyhit & (ebn >= 0)

            if has_lod:
                # baked voxel leaf, shifted above the slot namespace so
                # the wrapper can tell slots from voxel prim ids
                voxp = irow[0, 20]
                voxs = voxp + n_slots
                vtie = (
                    (tenter <= texit) & (texit > 0.0) & want
                    & (tenter == t) & (voxs < prim)
                )
                closer_v = (hitv | vtie) & (tenter > t_min) & (voxp >= 0)
                t = jnp.where(closer_v, tenter, t)
                prim = jnp.where(closer_v, voxs, prim)

            # reduce the E block whose DMA was issued on a previous step
            best, bstart = jax.lax.cond(
                pend >= 0,
                lambda _: (drain(pend), pstart),
                lambda _: (best0, jnp.int32(-1)),
                None,
            )

            @pl.when(enter_block)
            def _():
                pltpu.make_async_copy(
                    emat_hbm.at[pl.ds(jnp.maximum(ebn, 0) * 16, 16), :],
                    escr_ref, esem_ref,
                ).start()

            pend = jnp.where(enter_block, ebn, -1)
            pstart = jnp.where(enter_block, start, -1)
            nxt = jnp.where(anyhit, hitl, missl)
            nxt = jnp.where(active, nxt, cur)
            if any_hit:
                nxt = jnp.where(jnp.all(prim >= 0), -1, nxt)
            return (nxt, t, prim, pend, pstart, best, bstart, ns, dr)

        _, t, prim, _, _, best, bstart, ns, dr = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), t_init, prim0, jnp.int32(-1), jnp.int32(-1),
             best0, jnp.int32(-1), jnp.int32(0), jnp.int32(0)),
        )
        # fold the final drain's winners (walk ended before a next drain)
        t, prim = jax.lax.cond(
            bstart >= 0,
            lambda tp: merge(best, bstart, tp[0], tp[1]),
            lambda tp: tp,
            (t, prim),
        )
        tout_ref[:] = t
        pout_ref[:] = prim
        if stats:
            sout_ref[:] = jnp.full((tile_rows, LANES), ns, jnp.int32)
            lout_ref[:] = jnp.full((tile_rows, LANES), dr, jnp.int32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "t_min", "has_lod", "stats", "tile_rows",
                     "n_slots"),
)
def _traverse_plk_tiles(nodes, emat, rox, roy, roz, rdx, rdy, rdz, t0,
                        any_hit=False, t_min=1e-4, has_lod=False,
                        stats=False, tile_rows=ROWS, n_slots=0):
    g = rox.shape[0] // tile_rows
    kernel = _make_plk_treelet_kernel(any_hit, float(t_min), has_lod, stats,
                                      tile_rows, n_slots)
    ray_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct(rox.shape, jnp.float32),
        jax.ShapeDtypeStruct(rox.shape, jnp.int32),
    ]
    nout = 2
    if stats:
        out_shape += [
            jax.ShapeDtypeStruct(rox.shape, jnp.int32),
            jax.ShapeDtypeStruct(rox.shape, jnp.int32),
        ]
        nout = 4
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # top tree resident
            pl.BlockSpec(memory_space=pltpu.ANY),    # E pool in HBM
        ] + [ray_spec] * 7,
        out_specs=[ray_spec] * nout,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((16, PLK_EW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(nodes, emat, rox, roy, roz, rdx, rdy, rdz, t0)


# ---------------------------------------------------------------------------
# v4: SMT treelet kernel (the round-3 throughput push).
#
# Lab measurement (tools/kernel_lab.py, dragon primary): one while-loop
# iteration of the v3 walk costs ~330 ns of pure LATENCY — the serial
# chain "dynamic row load -> scalar link extracts -> slab math ->
# cross-lane any() reduce -> scalar cursor select -> next load" — while
# its VPU work is only ~35 cycles (~37 ns).  The kernel is chain-
# latency-bound, not compute-bound (42 node steps + 25 leaf rows per
# tile = ~8 us of math inside a 23 us tile).
#
# v4 therefore walks C INDEPENDENT ray tiles per grid step ("SMT"):
# each iteration advances C separate cursors whose load/extract/reduce
# chains have no data dependencies on each other, in the hope that
# Mosaic's scheduler overlaps their latencies.  MEASURED OUTCOME: bare
# chains do overlap perfectly in isolation (tools/chase_lab.py smt4:
# 4 chases at the cost of 1), but the full kernel does NOT — the
# per-chain leaf lax.cond branches serialize the bodies (dragon: v3
# 53.5 vs smt-2 45.2 Mrays/s, launch-amortized) — so v3 stays the
# default (ATEN_TPU_KERNEL=smt selects this one).  Kept as the basis
# for a branch-free rework.
# ---------------------------------------------------------------------------


def _make_smt_kernel(any_hit: bool, t_min: float, has_spheres: bool,
                     resident: bool, has_lod: bool, chains: int):
    def f2i(x):
        return pltpu.bitcast(x, jnp.int32)

    C = chains

    def kernel(
        nodes_ref, prims_hbm,
        rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref, t0_ref,
        tout_ref, pout_ref,
        scratch_ref, sem_ref,
    ):
        def safe_inv(d):
            return jnp.where(
                jnp.abs(d) > 1e-12, 1.0 / jnp.where(d == 0, 1.0, d), 1e12
            )

        # per-chain ray blocks (static (8,128) slices of the (C*8,128) tile)
        RO, RD, IV, ORD = [], [], [], []
        for c in range(C):
            s = slice(c * ROWS, (c + 1) * ROWS)
            ro = (rox_ref[s, :], roy_ref[s, :], roz_ref[s, :])
            rd = (rdx_ref[s, :], rdy_ref[s, :], rdz_ref[s, :])
            iv = tuple(safe_inv(d) for d in rd)
            RO.append(ro)
            RD.append(rd)
            IV.append(iv)
            ORD.append(_pick_ordering(*rd))

        def test_prim_slot(c, prow, pirow, j, ok, t, prim):
            rox, roy, roz = RO[c]
            rdx, rdy, rdz = RD[c]
            b = 16 * j
            v0x, v0y, v0z = prow[0, b + 0], prow[0, b + 1], prow[0, b + 2]
            e1x, e1y, e1z = prow[0, b + 3], prow[0, b + 4], prow[0, b + 5]
            e2x, e2y, e2z = prow[0, b + 6], prow[0, b + 7], prow[0, b + 8]
            pid = pirow[0, b + 9]
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(
                jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
            )
            tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
            uu = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            hp = (
                (jnp.abs(det) > 1e-12) & (uu >= 0.0) & (vv >= 0.0)
                & (uu + vv <= 1.0) & (tt > t_min) & ok
            )
            if has_spheres:
                cx, cy, cz, rr = v0x, v0y, v0z, e1x
                istri = pirow[0, b + 10] > 0
                ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
                cc = ocx * ocx + ocy * ocy + ocz * ocz - rr * rr
                bq = ocx * rdx + ocy * rdy + ocz * rdz
                disc = bq * bq - cc
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                ts0 = -bq - sq
                ts1 = -bq + sq
                ts = jnp.where(ts0 > t_min, ts0, ts1)
                h_sph = (disc > 0.0) & (ts > t_min)
                tp = jnp.where(istri, tt, ts)
                hp = ((hp & istri) | (h_sph & jnp.logical_not(istri) & ok))
            else:
                tp = tt
            closer = hp & (tp < t)
            t = jnp.where(closer, tp, t)
            prim = jnp.where(closer, pid, prim)
            return t, prim

        def intersect_pending(c, pstart, pcount, t, prim):
            if not resident:
                pltpu.make_async_copy(
                    prims_hbm.at[pl.ds(pstart, TRL_ROWS), :],
                    scratch_ref.at[c], sem_ref.at[c],
                ).wait()
            nrows = (pcount + (PACK - 1)) // PACK

            def row_body(r, tp2):
                t, prim = tp2
                if resident:
                    prow = prims_hbm[pl.ds(pstart + r, 1), :]
                else:
                    prow = scratch_ref[c, pl.ds(r, 1), :]
                pirow = f2i(prow)
                for j in range(PACK):
                    ok = (r * PACK + j) < pcount
                    t, prim = test_prim_slot(c, prow, pirow, j, ok, t, prim)
                return (t, prim)

            return jax.lax.fori_loop(0, nrows, row_body, (t, prim))

        def chain_init(c):
            s = slice(c * ROWS, (c + 1) * ROWS)
            t_init = t0_ref[s, :]
            prim0 = _seed_dead(jnp.full((ROWS, LANES), -1, jnp.int32),
                               t_init, any_hit, t_min)
            return (jnp.int32(0), t_init, prim0,
                    jnp.int32(-1), jnp.int32(0))

        def cond(state):
            alive = None
            for c in range(C):
                cur, _, _, pstart, _ = state[c]
                a = (cur >= 0) | (pstart >= 0)
                alive = a if alive is None else (alive | a)
            return alive

        def chain_step(c, st):
            cur, t, prim, pstart, pcount = st
            rox, roy, roz = RO[c]
            rdx, rdy, rdz = RD[c]
            ivx, ivy, ivz = IV[c]
            t_init = t0_ref[c * ROWS:(c + 1) * ROWS, :]
            active = cur >= 0
            curc = jnp.maximum(cur, 0)
            row = nodes_ref[pl.ds(curc, 1), :]
            irow = f2i(row)
            hitl, missl = _select_links(irow, ORD[c])
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
                jnp.minimum(t0z, t1z),
            )
            texit = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            if any_hit:
                want = prim < 0
            else:
                # closest: a dead lane (t0 <= t_min) can never accept a
                # hit, yet boxes containing its stale origin still have
                # tenter < 0 < ... <= t and would vote; mask it out.
                want = t_init > t_min
            hitv = (tenter <= texit) & (texit > 0.0) & (tenter < t) & want
            anyhit = jnp.any(hitv) & active
            enter_block = (start >= 0) & anyhit

            if has_lod:
                voxp = irow[0, 20]
                vtie = (
                    (tenter <= texit) & (texit > 0.0) & want
                    & (tenter == t) & (voxp < prim)
                )
                closer_v = (hitv | vtie) & (tenter > t_min) & (voxp >= 0)
                t = jnp.where(closer_v, tenter, t)
                prim = jnp.where(closer_v, voxp, prim)

            # drain the leaf latched on a previous step
            t, prim = jax.lax.cond(
                pstart >= 0,
                lambda tp: intersect_pending(c, pstart, pcount, tp[0], tp[1]),
                lambda tp: tp,
                (t, prim),
            )

            if not resident:
                @pl.when(enter_block)
                def _():
                    pltpu.make_async_copy(
                        prims_hbm.at[pl.ds(start, TRL_ROWS), :],
                        scratch_ref.at[c], sem_ref.at[c],
                    ).start()

            pstart = jnp.where(enter_block, start, -1)
            pcount = jnp.where(enter_block, count, 0)
            nxt = jnp.where(anyhit, hitl, missl)
            nxt = jnp.where(active, nxt, cur)
            if any_hit:
                nxt = jnp.where(jnp.all(prim >= 0), -1, nxt)
            return (nxt, t, prim, pstart, pcount)

        def body(state):
            return tuple(chain_step(c, state[c]) for c in range(C))

        out = jax.lax.while_loop(
            cond, body, tuple(chain_init(c) for c in range(C))
        )
        for c in range(C):
            s = slice(c * ROWS, (c + 1) * ROWS)
            tout_ref[s, :] = out[c][1]
            pout_ref[s, :] = out[c][2]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("any_hit", "t_min", "has_spheres", "resident", "has_lod",
                     "chains"),
)
def _traverse_smt_tiles(nodes, prims, rox, roy, roz, rdx, rdy, rdz, t0,
                        any_hit=False, t_min=1e-4, has_spheres=True,
                        resident=False, has_lod=False, chains=4):
    C = chains
    g = rox.shape[0] // (C * ROWS)
    kernel = _make_smt_kernel(any_hit, float(t_min), has_spheres, resident,
                              has_lod, C)
    ray_spec = pl.BlockSpec((C * ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct(rox.shape, jnp.float32),
        jax.ShapeDtypeStruct(rox.shape, jnp.int32),
    ]
    prim_space = pltpu.VMEM if resident else pltpu.ANY
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # top tree resident
            pl.BlockSpec(memory_space=prim_space),   # prim rows
        ] + [ray_spec] * 7,
        out_specs=[ray_spec] * 2,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((C, TRL_ROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((C,)),
        ],
    )(nodes, prims, rox, roy, roz, rdx, rdy, rdz, t0)



def _recompute_uv(scene, ro, rd, prim):
    """Winner-only barycentrics: one Möller-Trumbore per ray in JAX for
    the triangle the kernel selected (spheres/misses get u = v = 0).

    Component form with the EXACT op order of the oracle traverser
    (accel/traverse.py leaf loop) so u/v are bitwise-stable between the
    kernel and oracle paths — 1e-5-level differences here butterfly
    whole bounce paths and fail the full-image radiance parity gate."""
    from aten_tpu.ops.gather import take_fields

    num_tris = scene["num_tris"]
    T = scene["tri_v0"].shape[0]
    is_tri = (prim >= 0) & (prim < num_tris)
    tid = jnp.clip(prim, 0, T - 1)
    # one packed gather for all 9 triangle components: the previous 9
    # per-component takes cost ~2.2 ms EACH per bounce at 262k lanes
    # (xplane-traced; gathers are index-count-bound, row width is free)
    tg = take_fields({"v0": scene["tri_v0"], "e1": scene["tri_e1"],
                      "e2": scene["tri_e2"]}, tid)
    v0x, v0y, v0z = tg["v0"][:, 0], tg["v0"][:, 1], tg["v0"][:, 2]
    e1x, e1y, e1z = tg["e1"][:, 0], tg["e1"][:, 1], tg["e1"][:, 2]
    e2x, e2y, e2z = tg["e2"][:, 0], tg["e2"][:, 1], tg["e2"][:, 2]
    rox, roy, roz = ro[:, 0], ro[:, 1], ro[:, 2]
    rdx, rdy, rdz = rd[:, 0], rd[:, 1], rd[:, 2]
    px = rdy * e2z - rdz * e2y
    py = rdz * e2x - rdx * e2z
    pz = rdx * e2y - rdy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    dx, dy, dz = rox - v0x, roy - v0y, roz - v0z
    u = (dx * px + dy * py + dz * pz) * inv
    qx = dy * e1z - dz * e1y
    qy = dz * e1x - dx * e1z
    qz = dx * e1y - dy * e1x
    v = (rdx * qx + rdy * qy + rdz * qz) * inv
    u = jnp.where(is_tri, u, 0.0)
    v = jnp.where(is_tri, v, 0.0)
    return u, v


# ---------------------------------------------------------------------------
# Instanced (TLAS/BLAS) treelet variant.
#
# Extends the treelet kernel with the two-level instance walk of
# accel/tlas.py: the TLAS and every BLAS top (treelet-cut at <=
# TREELET_MAX prims) are resident in VMEM as one node pool; TLAS leaves
# carry the instance id and link to their object's BLAS root.  Entering
# an instance latches {resume link, instance id} and transforms the
# whole TILE's rays by the instance W2L (rows resident in VMEM); BLAS
# "fell off" links (-2) restore the world-space rays and resume at the
# latched top-layer link.  Prim rows are OBJECT-LOCAL (matching the
# local rays) and stream from HBM exactly like the single-level treelet
# path.  Node row lanes add: 10 = inst (TLAS leaves, else -1).
# Matrix row lanes: 0-11 = W2L 3x4 row-major.
# ---------------------------------------------------------------------------


def _treelet_cut(bvh, P_total, treelet_max):
    """Preorder cut of one threaded-BVH dict: returns (keep old ids,
    is_fat flags, prefix[K+1] prim counts before each node)."""
    nhit = np.asarray(bvh["nodes_hit"], np.int64)
    nmiss = np.asarray(bvh["nodes_miss"], np.int64)
    nps = np.asarray(bvh["nodes_prim_start"], np.int64)
    npc = np.asarray(bvh["nodes_prim_count"], np.int64)
    K = nhit.shape[0]
    prefix = np.zeros(K + 1, np.int64)
    prefix[1:] = np.cumsum(np.where(nps >= 0, npc, 0))

    keep, is_fat = [], []
    i = 0
    while i != -1:
        skip = nmiss[i]
        end = P_total if skip < 0 else prefix[skip]
        cnt = end - prefix[i]
        if nps[i] >= 0 or cnt <= treelet_max:
            keep.append(i)
            is_fat.append(True)
            i = int(nmiss[i])
        else:
            keep.append(i)
            is_fat.append(False)
            i = i + 1
    return keep, is_fat, prefix, nhit, nmiss


def build_tlas_treelet_layout(pieces, tl_prim_order, inst_w2l,
                              tri_v0, tri_e1, tri_e2, sph_center, sph_radius,
                              num_tris, treelet_max=TREELET_MAX):
    """Build the instanced pool from build_two_level(return_pieces=True)."""
    blas = pieces["blas"]
    tlas = pieces["tlas"]
    prim_base = pieces["prim_base"]
    inst_obj = np.asarray(pieces["inst_obj"], np.int64)
    order = np.asarray(tl_prim_order, np.int64)
    P = order.shape[0]
    I = inst_obj.shape[0]

    # cut each BLAS; gather kept-node info
    cuts = []
    for o, b in enumerate(blas):
        P_obj = np.asarray(b["prim_order"]).shape[0]
        cuts.append(_treelet_cut(b, P_obj, treelet_max))

    Kt = tlas["nodes_bmin"].shape[0]
    top_base = np.empty(len(blas), np.int64)
    base = Kt
    for o, (keep, _, _, _, _) in enumerate(cuts):
        top_base[o] = base
        base += len(keep)
    K = base
    Kp = -(-K // ROWS) * ROWS

    nodes = np.zeros((Kp, LANES), np.float32)
    ints = np.full((Kp, 5), -1, np.int32)  # hit, miss, start, count, inst
    ints[:, 3] = 0

    # TLAS nodes
    nodes[:Kt, 0:3] = np.asarray(tlas["nodes_bmin"], np.float32)
    nodes[:Kt, 3:6] = np.asarray(tlas["nodes_bmax"], np.float32)
    ints[:Kt, 0] = tlas["nodes_hit"]
    ints[:Kt, 1] = tlas["nodes_miss"]
    for k in range(Kt):
        ps = tlas["nodes_prim_start"][k]
        if ps >= 0:  # leaf = one instance (leaf_max=1 at TLAS build)
            iid = int(tlas["prim_order"][ps])
            ints[k, 4] = iid
            ints[k, 0] = top_base[inst_obj[iid]]  # hit -> BLAS-top root

    for o, b in enumerate(blas):
        keep, is_fat, prefix, nhit, nmiss = cuts[o]
        new_of = {int(old): n for n, old in enumerate(keep)}
        s = int(top_base[o])
        bmin = np.asarray(b["nodes_bmin"], np.float32)
        bmax = np.asarray(b["nodes_bmax"], np.float32)
        P_obj = np.asarray(b["prim_order"]).shape[0]
        for n, (old, fat) in enumerate(zip(keep, is_fat)):
            g = s + n
            nodes[g, 0:3] = bmin[old]
            nodes[g, 3:6] = bmax[old]
            miss = int(nmiss[old])
            miss_new = -2 if miss < 0 else s + new_of[miss]
            if fat:
                end = P_obj if miss < 0 else prefix[miss]
                ints[g, 0] = miss_new
                ints[g, 1] = miss_new
                ints[g, 2] = prefix[old] + prim_base[o]
                ints[g, 3] = end - prefix[old]
            else:
                ints[g, 0] = s + new_of[int(old) + 1]
                ints[g, 1] = miss_new
    nodes[:, 6:11] = ints.view(np.float32)

    # prim rows in tl_prim_order (object-local coordinates), CHUNK-padded
    Pp = (-(-P // CHUNK) + 1) * CHUNK
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

    # instance W2L rows ([I+1,128], last row identity — unused by kernel
    # but keeps indexing safe); lanes 0-11 = 3x4 row-major
    w2l = np.asarray(inst_w2l, np.float32)  # [I+1,3,4]
    Ip = -(-(I + 1) // ROWS) * ROWS
    mats = np.zeros((Ip, LANES), np.float32)
    mats[: I + 1, 0:12] = w2l.reshape(I + 1, 12)
    return {"tt_nodes": nodes, "tt_prims": prims, "tt_mats": mats}


def _make_tlas_treelet_kernel(any_hit: bool, t_min: float):
    def f2i(x):
        return pltpu.bitcast(x, jnp.int32)

    def kernel(
        nodes_ref, mats_ref, prims_hbm,
        rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref, t0_ref,
        tout_ref, pout_ref, iout_ref, uout_ref, vout_ref,
        scratch_ref, sem_ref,
    ):
        wox, woy, woz = rox_ref[:], roy_ref[:], roz_ref[:]
        wdx, wdy, wdz = rdx_ref[:], rdy_ref[:], rdz_ref[:]

        def safe_inv(d):
            return jnp.where(
                jnp.abs(d) > 1e-12, 1.0 / jnp.where(d == 0, 1.0, d), 1e12
            )

        def bsel(cond_scalar, a, b):
            return jnp.where(
                jnp.broadcast_to(cond_scalar, a.shape), a, b
            )

        def test_prim_row(prow, ok, rox, roy, roz, rdx, rdy, rdz,
                          inst, t, prim, binst, u, v):
            v0x, v0y, v0z = prow[0, 0], prow[0, 1], prow[0, 2]
            e1x, e1y, e1z = prow[0, 3], prow[0, 4], prow[0, 5]
            e2x, e2y, e2z = prow[0, 6], prow[0, 7], prow[0, 8]
            cx, cy, cz, rr = prow[0, 9], prow[0, 10], prow[0, 11], prow[0, 12]
            pirow = f2i(prow)
            pid = pirow[0, 13]
            istri = pirow[0, 14] > 0
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(
                jnp.abs(det) > 1e-12, 1.0 / jnp.where(det == 0, 1.0, det), 0.0
            )
            tvx, tvy, tvz = rox - v0x, roy - v0y, roz - v0z
            uu = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            vv = (rdx * qx + rdy * qy + rdz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            h_tri = (
                (jnp.abs(det) > 1e-12) & (uu >= 0.0) & (vv >= 0.0)
                & (uu + vv <= 1.0) & (tt > t_min)
            )
            # sphere: general quadratic (local rays are non-unit)
            ocx, ocy, ocz = rox - cx, roy - cy, roz - cz
            a2 = rdx * rdx + rdy * rdy + rdz * rdz
            b2 = ocx * rdx + ocy * rdy + ocz * rdz
            cc = ocx * ocx + ocy * ocy + ocz * ocz - rr * rr
            disc = b2 * b2 - a2 * cc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv_a = 1.0 / jnp.maximum(a2, 1e-20)
            ts0 = (-b2 - sq) * inv_a
            ts1 = (-b2 + sq) * inv_a
            ts = jnp.where(ts0 > t_min, ts0, ts1)
            h_sph = (disc > 0.0) & (ts > t_min)
            tp = jnp.where(istri, tt, ts)
            hp = ((h_tri & istri) | (h_sph & jnp.logical_not(istri))) & ok
            closer = hp & (tp < t)
            t = jnp.where(closer, tp, t)
            prim = jnp.where(closer, pid, prim)
            binst = jnp.where(closer, inst, binst)
            u = jnp.where(closer, jnp.where(istri, uu, 0.0), u)
            v = jnp.where(closer, jnp.where(istri, vv, 0.0), v)
            return t, prim, binst, u, v

        t_init = t0_ref[:]
        prim0 = _seed_dead(jnp.full((ROWS, LANES), -1, jnp.int32),
                           t_init, any_hit, t_min)
        zero = jnp.zeros((ROWS, LANES), jnp.float32)

        def cond(c):
            return c[0] != -1

        def body(c):
            (cur, resume, inst, rox, roy, roz, rdx, rdy, rdz,
             t, prim, binst, u, v) = c
            # pop back to the top layer where a BLAS walk fell off (-2)
            pop = cur == -2
            cur = jnp.where(pop, resume, cur)
            inst = jnp.where(pop, -1, inst)
            rox = bsel(pop, wox, rox)
            roy = bsel(pop, woy, roy)
            roz = bsel(pop, woz, roz)
            rdx = bsel(pop, wdx, rdx)
            rdy = bsel(pop, wdy, rdy)
            rdz = bsel(pop, wdz, rdz)

            # a pop may land on resume == -1 (tree exhausted): everything
            # below must be inert or the clamped node-0 read would revive
            # the cursor and loop forever (TPU watchdog kill)
            active = cur >= 0
            curc = jnp.maximum(cur, 0)
            row = nodes_ref[pl.ds(curc, 1), :]
            bminx, bminy, bminz = row[0, 0], row[0, 1], row[0, 2]
            bmaxx, bmaxy, bmaxz = row[0, 3], row[0, 4], row[0, 5]
            irow = f2i(row)
            hitl, missl = irow[0, 6], irow[0, 7]
            start, count = irow[0, 8], irow[0, 9]
            inst_field = irow[0, 10]

            ivx, ivy, ivz = safe_inv(rdx), safe_inv(rdy), safe_inv(rdz)
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
                # closest: a dead lane (t0 <= t_min) can never accept a
                # hit, yet boxes containing its stale origin still have
                # tenter < 0 < ... <= t and would vote; mask it out.
                want = t_init > t_min
            hitv = (tenter <= texit) & (texit > 0.0) & (tenter < t) & want
            anyhit = jnp.any(hitv) & active
            enter_blk = (start >= 0) & anyhit
            enter_inst = (inst_field >= 0) & anyhit

            def stream_block(carry):
                t, prim, binst, u, v = carry

                def chunk_cond(cc):
                    return cc[0] * CHUNK < count

                def chunk_body(cc):
                    ci, t, prim, binst, u, v = cc
                    dma = pltpu.make_async_copy(
                        prims_hbm.at[pl.ds(start + ci * CHUNK, CHUNK), :],
                        scratch_ref,
                        sem_ref,
                    )
                    dma.start()
                    dma.wait()

                    def row_body(k, acc):
                        t, prim, binst, u, v = acc
                        ok = (ci * CHUNK + k) < count
                        prow = scratch_ref[pl.ds(k, 1), :]
                        return test_prim_row(
                            prow, ok, rox, roy, roz, rdx, rdy, rdz,
                            inst, t, prim, binst, u, v,
                        )

                    t, prim, binst, u, v = jax.lax.fori_loop(
                        0, CHUNK, row_body, (t, prim, binst, u, v),
                        unroll=CHUNK,
                    )
                    return (ci + 1, t, prim, binst, u, v)

                _, t, prim, binst, u, v = jax.lax.while_loop(
                    chunk_cond, chunk_body, (jnp.int32(0), t, prim, binst, u, v)
                )
                return t, prim, binst, u, v

            t, prim, binst, u, v = jax.lax.cond(
                enter_blk, stream_block, lambda x: x, (t, prim, binst, u, v)
            )

            # enter an instance: latch resume + transform the tile's rays
            mrow = mats_ref[pl.ds(jnp.maximum(inst_field, 0), 1), :]
            lox = mrow[0, 0] * wox + mrow[0, 1] * woy + mrow[0, 2] * woz + mrow[0, 3]
            loy = mrow[0, 4] * wox + mrow[0, 5] * woy + mrow[0, 6] * woz + mrow[0, 7]
            loz = mrow[0, 8] * wox + mrow[0, 9] * woy + mrow[0, 10] * woz + mrow[0, 11]
            ldx = mrow[0, 0] * wdx + mrow[0, 1] * wdy + mrow[0, 2] * wdz
            ldy = mrow[0, 4] * wdx + mrow[0, 5] * wdy + mrow[0, 6] * wdz
            ldz = mrow[0, 8] * wdx + mrow[0, 9] * wdy + mrow[0, 10] * wdz
            resume = jnp.where(enter_inst, missl, resume)
            inst = jnp.where(enter_inst, inst_field, inst)
            rox = bsel(enter_inst, lox, rox)
            roy = bsel(enter_inst, loy, roy)
            roz = bsel(enter_inst, loz, roz)
            rdx = bsel(enter_inst, ldx, rdx)
            rdy = bsel(enter_inst, ldy, rdy)
            rdz = bsel(enter_inst, ldz, rdz)

            nxt = jnp.where(active, jnp.where(anyhit, hitl, missl), cur)
            if any_hit:
                nxt = jnp.where(jnp.all(prim >= 0), -1, nxt)
            return (nxt, resume, inst, rox, roy, roz, rdx, rdy, rdz,
                    t, prim, binst, u, v)

        init = (
            jnp.int32(0), jnp.int32(-1), jnp.int32(-1),
            wox, woy, woz, wdx, wdy, wdz,
            t_init, prim0, prim0, zero, zero,
        )
        out = jax.lax.while_loop(cond, body, init)
        tout_ref[:] = out[9]
        pout_ref[:] = out[10]
        iout_ref[:] = out[11]
        uout_ref[:] = out[12]
        vout_ref[:] = out[13]

    return kernel


@functools.partial(jax.jit, static_argnames=("any_hit", "t_min"))
def _traverse_tlas_treelet_tiles(nodes, mats, prims, rox, roy, roz,
                                 rdx, rdy, rdz, t0, any_hit=False, t_min=1e-4):
    g = rox.shape[0] // ROWS
    kernel = _make_tlas_treelet_kernel(any_hit, float(t_min))
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct(rox.shape, jnp.float32),
        jax.ShapeDtypeStruct(rox.shape, jnp.int32),
        jax.ShapeDtypeStruct(rox.shape, jnp.int32),
        jax.ShapeDtypeStruct(rox.shape, jnp.float32),
        jax.ShapeDtypeStruct(rox.shape, jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # node pool
            pl.BlockSpec(memory_space=pltpu.VMEM),   # instance matrices
            pl.BlockSpec(memory_space=pltpu.ANY),    # prim rows in HBM
        ] + [ray_spec] * 7,
        out_specs=[ray_spec] * 5,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((CHUNK, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(nodes, mats, prims, rox, roy, roz, rdx, rdy, rdz, t0)


def traverse_pallas_tlas(scene, ro, rd, t_max=None, any_hit=False, t_min=1e-4):
    """Instanced-scene kernel entry (drop-in for tlas.traverse_two_level)."""
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
    t0p = prep(t0, fill=-1.0)

    t, prim, binst, u, v = _traverse_tlas_treelet_tiles(
        scene["tt_nodes"], scene["tt_mats"], scene["tt_prims"],
        rox, roy, roz, rdx, rdy, rdz, t0p,
        any_hit=any_hit, t_min=t_min,
    )
    flat = lambda x: x.reshape(-1)[:N]
    prim = flat(prim)
    if any_hit:  # undo the dead-lane seed (_seed_dead)
        prim = jnp.where(t0 <= t_min, -1, prim)
    return {"t": flat(t), "prim": prim, "u": flat(u), "v": flat(v),
            "hit": prim >= 0, "inst": flat(binst)}


def traverse_pallas(scene, ro, rd, t_max=None, any_hit=False, t_min=1e-4):
    """Drop-in replacement for accel.traverse.traverse on TPU.

    Requires the scene to carry the pallas layout (SceneBuilder adds it).
    """
    ro = jax.lax.stop_gradient(ro)
    rd = jax.lax.stop_gradient(rd)
    N = ro.shape[0]
    # module-import snapshot: the knobs select the traced program, so a
    # post-first-trace env mutation must not desync quantum vs kernel
    # (advisor r3) — the scope is "process", read once at import.
    kern = _ENV_KERNEL
    chains = _ENV_CHAINS
    # Kernel policy (measured, dragon primaries 1024² on v5e):
    #  - resident pools (<= 10 MB): MT wide-16 treelet kernel, 57.7
    #    Mrays/s.  The Plücker/MXU leaf measured 39.5 — the [16,4P] x
    #    [16,N] leaf matmul costs ceil(4P/128)*N MXU cycles (~4.4 us per
    #    2048-ray drain) vs ~3.2 us for the dual-issued VPU MT drain, so
    #    the MXU leaf LOSES on resident scenes (PERF_NOTES_R5).
    #  - beyond-VMEM pools: the plk kernel wins big — E blocks stream
    #    from HBM with no 64-slot unroll, so wide tiles compile fast
    #    where the streamed MT kernel was pinned to 8-row tiles by a
    #    >20-minute Mosaic compile (VERDICT r4 weak #5).
    #  - ATEN_TPU_KERNEL=plk/mt forces either for triangle-only scenes.
    if "trl_nodes" in scene:
        pool_mb = (scene["trl_nodes"].size + scene["trl_prims"].size) * 4e-6
        use_plk = "trl_emat" in scene and (
            kern == "plk"
            or (pool_mb > _ENV_RESIDENT_MB and kern not in ("smt", "mt")))
    else:
        use_plk = False
    if "pl_nodes" in scene:
        quantum = _ENV_DENSE_ROWS * LANES
    elif kern == "smt":
        quantum = TILE * chains
    elif use_plk:
        quantum = _ENV_TILE_ROWS * LANES
    else:
        # wide tiles only for RESIDENT pools (streamed MT compile blowup)
        quantum = (_ENV_TILE_ROWS if pool_mb <= _ENV_RESIDENT_MB
                   else ROWS) * LANES
    Np = -(-N // quantum) * quantum
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

    flat = lambda x: x.reshape(-1)[:N]
    if "pl_nodes" in scene:
        t, prim, u, v = _traverse_tiles(
            scene["pl_nodes"], scene["pl_prims"],
            rox, roy, roz, rdx, rdy, rdz, t0p,
            any_hit=any_hit, t_min=t_min, tile_rows=_ENV_DENSE_ROWS,
        )
        u, v = flat(u), flat(v)
    elif use_plk:
        s2p = scene["trl_slot2prim"]
        ns_ = int(s2p.shape[0])
        t, prim = _traverse_plk_tiles(
            scene["trl_nodes"], scene["trl_emat"],
            rox, roy, roz, rdx, rdy, rdz, t0p,
            any_hit=any_hit, t_min=t_min,
            has_lod=bool(scene.get("trl_has_lod")),
            tile_rows=_ENV_TILE_ROWS, n_slots=ns_,
        )
        raw = flat(prim)
        if any_hit:  # undo the dead-lane seed (_seed_dead)
            raw = jnp.where(t0 <= t_min, -1, raw)
        # slot -> prim id (one gather, fused into eval_hit's downstream
        # gathers by XLA); voxel winners come back shifted by n_slots
        slot_ok = (raw >= 0) & (raw < ns_)
        prim_f = jnp.where(
            slot_ok, jnp.take(s2p, jnp.clip(raw, 0, ns_ - 1)),
            jnp.where(raw >= ns_, raw - ns_, -1))
        if any_hit:  # occluded() reads only `hit` — skip UV recompute
            z = jnp.zeros_like(t0)
            return {"t": flat(t), "prim": prim_f, "u": z, "v": z,
                    "hit": prim_f >= 0}
        u, v = _recompute_uv(scene, ro, rd, prim_f)
        return {"t": flat(t), "prim": prim_f, "u": u, "v": v,
                "hit": prim_f >= 0}
    else:
        # packed pools that fit VMEM stay resident (no leaf DMA at all);
        # bigger scenes stream fat-leaf windows from HBM
        pool_mb = (scene["trl_nodes"].size + scene["trl_prims"].size) * 4e-6
        window = int(scene.get("trl_window", TREELET_MAX))
        kw = dict(
            any_hit=any_hit, t_min=t_min,
            has_spheres=scene["num_spheres"] > 0,
            resident=pool_mb <= _ENV_RESIDENT_MB,
            has_lod=bool(scene.get("trl_has_lod")),
        )
        if kern == "smt" and window == TREELET_MAX:
            impl_fn = _traverse_smt_tiles
            kw["chains"] = chains
        else:
            # (the SMT kernel's drain is hard-wired to the default
            # window; wider-window scenes always take the MT path)
            impl_fn = _traverse_treelet_tiles
            kw["tile_rows"] = _ENV_TILE_ROWS if kw["resident"] else ROWS
            kw["wrows"] = window // PACK
        t, prim = impl_fn(
            scene["trl_nodes"], scene["trl_prims"],
            rox, roy, roz, rdx, rdy, rdz, t0p, **kw,
        )
        prim_f = flat(prim)
        if any_hit:  # undo the dead-lane seed (_seed_dead)
            prim_f = jnp.where(t0 <= t_min, -1, prim_f)
            # any-hit consumers (occluded) read only `hit`: skip the
            # winner-UV packed gather + Möller-Trumbore recompute
            z = jnp.zeros_like(t0)
            return {"t": flat(t), "prim": prim_f, "u": z, "v": z,
                    "hit": prim_f >= 0}
        u, v = _recompute_uv(scene, ro, rd, prim_f)
        return {"t": flat(t), "prim": prim_f, "u": u, "v": v,
                "hit": prim_f >= 0}
    prim = flat(prim)
    if any_hit:  # undo the dead-lane seed (_seed_dead)
        prim = jnp.where(t0 <= t_min, -1, prim)
    return {"t": flat(t), "prim": prim, "u": u, "v": v, "hit": prim >= 0}
