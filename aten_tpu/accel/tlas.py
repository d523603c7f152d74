"""Two-level (TLAS/BLAS) acceleration with instance transforms.

Counterpart of the reference's two-level threaded BVH: a top-layer tree
over instances whose leaves jump into per-object bottom-layer node
lists via the `exid` field, transforming the ray into object space with
the W2L matrix stored at mtx_id+1 and memorizing the top-layer links to
resume at (src/libaten/accelerator/threaded_bvh.h:13-56,
threaded_bvh_traverser.h:99-304, bottom-layer entry :146-185, restore
:290-300).

TPU-native design: instead of nested traversers, the TLAS and every
BLAS are concatenated into ONE node pool so a batched `lax.while_loop`
walks both levels with a single gather set per iteration:

  * TLAS leaf nodes carry `inst >= 0`; their `hit` link points at the
    owning object's BLAS root inside the pool, `miss` is the usual
    top-layer skip link.  Entering the bottom layer = following `hit`
    while latching {instance id, resume link, object-space ray}.
  * BLAS links are offset into the pool; a BLAS "fell off the tree"
    link (-1) is re-encoded as -2, which the loop body turns into
    "restore the world ray and resume at the latched top-layer link".

Hit results gain an `inst` field; shading resolves world-space normals
with the instance normal matrix (W2L^T), mirroring
geometry/EvaluateHitResult.h:10-72's L2W transform of hit attributes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aten_tpu.accel.build import LEAF_MAX, build_bvh
from aten_tpu.core import vecmath as vm


def _transform_box(l2w: np.ndarray, bmin: np.ndarray, bmax: np.ndarray):
    """World AABB of a transformed local AABB (8-corner expansion)."""
    corners = np.array(
        [[bmin[0], bmin[1], bmin[2]], [bmax[0], bmin[1], bmin[2]],
         [bmin[0], bmax[1], bmin[2]], [bmax[0], bmax[1], bmin[2]],
         [bmin[0], bmin[1], bmax[2]], [bmax[0], bmin[1], bmax[2]],
         [bmin[0], bmax[1], bmax[2]], [bmax[0], bmax[1], bmax[2]]],
        np.float32,
    )
    w = corners @ l2w[:3, :3].T + l2w[:3, 3]
    return w.min(axis=0), w.max(axis=0)


def build_two_level(obj_prim_boxes, inst_obj, inst_l2w, leaf_max=LEAF_MAX,
                    return_pieces=False):
    """Build the unified two-level node pool.

    obj_prim_boxes: list over objects of (bmin [P,3], bmax [P,3],
        prim_ids [P] int32 global primitive ids) in OBJECT-LOCAL space.
    inst_obj: [I] object index per instance.
    inst_l2w: [I,4,4] local-to-world matrices.

    Returns dict of numpy arrays (all pool-indexed):
      tl_bmin/tl_bmax [K,3], tl_hit/tl_miss [K] (pool links; -1 done,
      -2 return-to-top), tl_ps/tl_pc [K] (ranges into tl_prim_order,
      global prim ids; -1/0 for non-leaf and TLAS nodes),
      tl_inst [K] (instance id at TLAS leaves, else -1),
      tl_prim_order [P], inst_obj [I], inst_w2l [I+1,3,4] (last row
      identity for the non-instanced sentinel), inst_nmtx [I+1,3,3].
    """
    inst_obj = np.asarray(inst_obj, np.int32)
    inst_l2w = np.asarray(inst_l2w, np.float32).reshape(-1, 4, 4)
    I = inst_obj.shape[0]
    assert I > 0

    # Per-object BLAS builds (object-local space).
    blas = []
    obj_bbox = []
    for bmin, bmax, _pids in obj_prim_boxes:
        b = build_bvh(np.asarray(bmin, np.float32), np.asarray(bmax, np.float32),
                      leaf_max=leaf_max)
        blas.append(b)
        obj_bbox.append((np.asarray(bmin).min(axis=0), np.asarray(bmax).max(axis=0)))

    # TLAS over instance world boxes; leaf_max=1 so a leaf == one instance.
    iw_min = np.empty((I, 3), np.float32)
    iw_max = np.empty((I, 3), np.float32)
    for i in range(I):
        lo, hi = obj_bbox[inst_obj[i]]
        iw_min[i], iw_max[i] = _transform_box(inst_l2w[i], lo, hi)
    tlas = build_bvh(iw_min, iw_max, leaf_max=1, use_native=False)

    Kt = tlas["nodes_bmin"].shape[0]
    blas_base = np.empty(len(blas), np.int64)
    prim_base = np.empty(len(blas), np.int64)
    base = Kt
    pbase = 0
    for o, b in enumerate(blas):
        blas_base[o] = base
        prim_base[o] = pbase
        base += b["nodes_bmin"].shape[0]
        pbase += b["prim_order"].shape[0]
    K = base

    tl_bmin = np.empty((K, 3), np.float32)
    tl_bmax = np.empty((K, 3), np.float32)
    tl_hit = np.empty(K, np.int32)
    tl_miss = np.empty(K, np.int32)
    tl_ps = np.full(K, -1, np.int32)
    tl_pc = np.zeros(K, np.int32)
    tl_inst = np.full(K, -1, np.int32)
    tl_prim_order = np.empty(pbase, np.int32)

    # TLAS nodes: leaves (one instance each) get inst + hit->BLAS root.
    tl_bmin[:Kt] = tlas["nodes_bmin"]
    tl_bmax[:Kt] = tlas["nodes_bmax"]
    tl_hit[:Kt] = tlas["nodes_hit"]
    tl_miss[:Kt] = tlas["nodes_miss"]
    for k in range(Kt):
        ps = tlas["nodes_prim_start"][k]
        if ps >= 0:
            iid = int(tlas["prim_order"][ps])
            tl_inst[k] = iid
            tl_hit[k] = blas_base[inst_obj[iid]]
            # miss keeps the top-layer skip link (already set)

    for o, b in enumerate(blas):
        kb = b["nodes_bmin"].shape[0]
        s = int(blas_base[o])
        tl_bmin[s : s + kb] = b["nodes_bmin"]
        tl_bmax[s : s + kb] = b["nodes_bmax"]
        for name, dst in (("nodes_hit", tl_hit), ("nodes_miss", tl_miss)):
            links = b[name].astype(np.int64)
            dst[s : s + kb] = np.where(links < 0, -2, links + s).astype(np.int32)
        ps = b["nodes_prim_start"].astype(np.int64)
        tl_ps[s : s + kb] = np.where(ps < 0, -1, ps + prim_base[o]).astype(np.int32)
        tl_pc[s : s + kb] = b["nodes_prim_count"]
        pids = np.asarray(obj_prim_boxes[o][2], np.int32)
        tl_prim_order[prim_base[o] : prim_base[o] + len(pids)] = pids[b["prim_order"]]

    # Instance matrices: W2L (3x4 affine rows) + normal matrix (W2L^T 3x3).
    # Row I is identity — the sentinel for "not instanced" lanes.
    inst_w2l = np.empty((I + 1, 3, 4), np.float32)
    inst_nmtx = np.empty((I + 1, 3, 3), np.float32)
    for i in range(I):
        w2l = np.linalg.inv(inst_l2w[i])
        inst_w2l[i] = w2l[:3, :4]
        inst_nmtx[i] = w2l[:3, :3].T
    inst_w2l[I] = np.eye(4, dtype=np.float32)[:3, :4]
    inst_nmtx[I] = np.eye(3, dtype=np.float32)

    out = {
        "tl_bmin": tl_bmin, "tl_bmax": tl_bmax,
        "tl_hit": tl_hit, "tl_miss": tl_miss,
        "tl_ps": tl_ps, "tl_pc": tl_pc, "tl_inst": tl_inst,
        "tl_prim_order": tl_prim_order,
        "inst_obj": inst_obj,
        "inst_w2l": inst_w2l, "inst_nmtx": inst_nmtx,
        "inst_l2w": inst_l2w.reshape(I, 4, 4)[:, :3, :4],
    }
    if return_pieces:
        # raw build pieces for the Pallas instanced-treelet layout:
        # per-object BLAS dicts, the TLAS dict, and the pool offsets
        out["_pieces"] = {
            "blas": blas, "tlas": tlas, "blas_base": blas_base,
            "prim_base": prim_base, "Kt": Kt, "inst_obj": inst_obj,
        }
    return out


def _safe_inv(rd):
    return jnp.where(jnp.abs(rd) > 1e-12, 1.0 / rd, jnp.sign(rd) * 1e12 + 1e12)


def _isect_sphere_general(ro, rd, center, radius, t_min):
    """Sphere quadratic for NON-unit rd (object-space rays): a t^2+2bt+c."""
    oc = ro - center
    a = vm.dot(rd, rd, keepdims=False)
    b = vm.dot(oc, rd, keepdims=False)
    c = vm.dot(oc, oc, keepdims=False) - radius * radius
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / jnp.maximum(a, 1e-20)
    t0 = (-b - sq) * inv_a
    t1 = (-b + sq) * inv_a
    t = jnp.where(t0 > t_min, t0, t1)
    hit = (disc > 0.0) & (t > t_min)
    return t, hit


def traverse_two_level(scene, ro, rd, t_max=None, any_hit=False, t_min=1e-4):
    """Batched two-level traversal over the unified node pool.

    Same contract as accel.traverse.traverse plus an `inst` result
    (instance id of the best hit; -1 when the hit is world geometry —
    possible only for the implicit identity instance, which still
    reports its instance id).  t is world-parameterized: object-space
    rays keep the unnormalized W2L-transformed direction so the ray
    parameter is shared across levels (the reference does the same —
    threaded_bvh_traverser.h:160 transforms without renormalizing).
    """
    if "tt_nodes" in scene and jax.default_backend() == "tpu":
        from aten_tpu.ops.traverse_pallas import traverse_pallas_tlas

        return traverse_pallas_tlas(
            scene, ro, rd, t_max=t_max, any_hit=any_hit, t_min=t_min
        )
    ro = jax.lax.stop_gradient(ro)
    rd = jax.lax.stop_gradient(rd)
    N = ro.shape[0]
    num_tris = scene["num_tris"]
    T = scene["tri_v0"].shape[0]
    S = scene["sph_center"].shape[0]
    n_inst = scene["num_instances"]

    nbmin, nbmax = scene["tl_bmin"], scene["tl_bmax"]
    nhit, nmiss = scene["tl_hit"], scene["tl_miss"]
    nps, npc = scene["tl_ps"], scene["tl_pc"]
    ninst = scene["tl_inst"]
    prim_order = scene["tl_prim_order"]
    w2l = scene["inst_w2l"]

    if t_max is None:
        t0 = jnp.full((N,), vm.INF, jnp.float32)
    else:
        t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))

    vz = ro[..., 0] * 0.0 + rd[..., 0] * 0.0
    iz = vz.astype(jnp.int32)
    init = (
        iz,                    # cur node (pool index); -1 done, -2 pop-to-top
        iz - 1,                # resume link after current BLAS
        iz - 1,                # current instance (-1 = top level)
        ro + vz[..., None],    # current-space ray origin
        rd + vz[..., None],    # current-space ray dir (non-unit in BLAS)
        t0 + vz,               # best t
        iz - 1,                # best prim
        iz - 1,                # best inst
        vz,                    # u
        vz,                    # v
    )

    def cond(state):
        return jnp.any(state[0] != -1)

    def body(state):
        cur, resume, inst, cro, crd, t, prim, binst, u, v = state
        # Pop back to the top layer where the BLAS walk fell off (-2).
        pop = cur == -2
        cur = jnp.where(pop, resume, cur)
        inst = jnp.where(pop, -1, inst)
        cro = jnp.where(pop[..., None], ro, cro)
        crd = jnp.where(pop[..., None], rd, crd)

        active = cur >= 0
        curc = jnp.maximum(cur, 0)
        bmin = jnp.take(nbmin, curc, axis=0)
        bmax = jnp.take(nbmax, curc, axis=0)
        crd_inv = _safe_inv(crd)
        ahit = vm.intersect_aabb(cro, crd_inv, bmin, bmax, t) & active

        ps = jnp.take(nps, curc)
        pc = jnp.take(npc, curc)
        leaf_inst = jnp.take(ninst, curc)
        hitl = jnp.take(nhit, curc)
        missl = jnp.take(nmiss, curc)

        # --- BLAS leaf: primitive tests with the current-space ray.
        do_leaf = ahit & (ps >= 0)
        for k in range(LEAF_MAX):
            pid = jnp.take(prim_order, jnp.clip(ps + k, 0, prim_order.shape[0] - 1))
            valid = do_leaf & (k < pc)
            is_tri = pid < num_tris
            tid = jnp.clip(pid, 0, T - 1)
            sid = jnp.clip(pid - num_tris, 0, S - 1)
            v0 = jnp.take(scene["tri_v0"], tid, axis=0)
            e1 = jnp.take(scene["tri_e1"], tid, axis=0)
            e2 = jnp.take(scene["tri_e2"], tid, axis=0)
            t_t, tu, tv, h_t = vm.intersect_tri(cro, crd, v0, e1, e2, t_min=t_min)
            c = jnp.take(scene["sph_center"], sid, axis=0)
            r = jnp.take(scene["sph_radius"], sid)
            t_s, h_s = _isect_sphere_general(cro, crd, c, r, t_min)
            t_p = jnp.where(is_tri, t_t, t_s)
            h_p = jnp.where(is_tri, h_t, h_s) & valid
            closer = h_p & (t_p < t)
            t = jnp.where(closer, t_p, t)
            prim = jnp.where(closer, pid, prim)
            binst = jnp.where(closer, inst, binst)
            u = jnp.where(closer, jnp.where(is_tri, tu, 0.0), u)
            v = jnp.where(closer, jnp.where(is_tri, tv, 0.0), v)

        # --- TLAS leaf entered: latch instance, transform ray, jump to BLAS.
        enter = ahit & (leaf_inst >= 0)
        einst = jnp.clip(leaf_inst, 0, n_inst - 1)
        m = jnp.take(w2l, einst, axis=0)  # [N,3,4]
        ro_l = jnp.einsum("nij,nj->ni", m[:, :, :3], ro) + m[:, :, 3]
        rd_l = jnp.einsum("nij,nj->ni", m[:, :, :3], rd)
        inst = jnp.where(enter, leaf_inst, inst)
        resume = jnp.where(enter, missl, resume)
        cro = jnp.where(enter[..., None], ro_l, cro)
        crd = jnp.where(enter[..., None], rd_l, crd)

        nxt = jnp.where(ahit, hitl, missl)
        cur = jnp.where(active, nxt, cur)
        if any_hit:
            cur = jnp.where(prim >= 0, -1, cur)
        return (cur, resume, inst, cro, crd, t, prim, binst, u, v)

    out = jax.lax.while_loop(cond, body, init)
    _, _, _, _, _, t, prim, binst, u, v = out
    return {"t": t, "prim": prim, "u": u, "v": v, "hit": prim >= 0, "inst": binst}
