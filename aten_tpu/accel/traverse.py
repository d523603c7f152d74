"""Batched stackless BVH traversal (pure-JAX reference path).

Counterpart of the reference's unified host/device traverser
`BvhTraverser::Traverse<Closest|Closer|Any>`
(src/libaten/accelerator/threaded_bvh_traverser.h:99-304).  The hit/miss
link encoding makes traversal a simple `next = hit if aabb_hit else
miss` walk — no stack — which maps directly onto a batched
`lax.while_loop`: every lane carries its own node cursor and the loop
runs until all lanes fall off the tree (cursor < 0).  Node/primitive
data is fetched with gathers; leaf ranges are intersected with a
statically unrolled loop of LEAF_MAX lanes.

This is the "CPU reference" implementation; `aten_tpu.ops` holds the
Pallas device kernels that must match it allclose.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from aten_tpu.accel.build import LEAF_MAX
from aten_tpu.core import vecmath as vm


def _safe_inv(rd):
    return jnp.where(jnp.abs(rd) > 1e-12, 1.0 / rd, jnp.sign(rd) * 1e12 + 1e12)


# Below this primitive count, skip the BVH entirely: testing every
# primitive against every ray is pure fused VPU work (no gathers, no
# data-dependent loop) and beats any traversal by an order of magnitude
# on TPU.  The reference has no analogue — a CUDA thread walks the tree
# even for tiny scenes — this is a TPU-first design decision.
DENSE_MAX_PRIMS = 512
_DENSE_CHUNK = 8


def _traverse_dense(scene, ro, rd, t0, any_hit, t_min):
    T = scene["tri_v0"].shape[0]
    S = scene["sph_center"].shape[0]
    num_tris = scene["num_tris"]
    num_sph = scene["num_spheres"]
    P = num_tris + num_sph

    # Stack per-prim data in global-prim-id order, padded to chunk size.
    Pp = -(-P // _DENSE_CHUNK) * _DENSE_CHUNK

    def pad(x, n):
        return jnp.concatenate(
            [x, jnp.zeros((n - x.shape[0],) + x.shape[1:], x.dtype)], axis=0
        ) if x.shape[0] < n else x[:n]

    v0 = pad(scene["tri_v0"][:num_tris] if num_tris else scene["tri_v0"][:0], Pp)
    e1 = pad(scene["tri_e1"][:num_tris] if num_tris else scene["tri_e1"][:0], Pp)
    e2 = pad(scene["tri_e2"][:num_tris] if num_tris else scene["tri_e2"][:0], Pp)
    # spheres occupy rows [num_tris, P)
    cen = jnp.zeros((Pp, 3), jnp.float32)
    rad = jnp.zeros((Pp,), jnp.float32)
    if num_sph:
        cen = cen.at[num_tris:P].set(scene["sph_center"][:num_sph])
        rad = rad.at[num_tris:P].set(scene["sph_radius"][:num_sph])
    valid = (jnp.arange(Pp) < P)
    is_tri = (jnp.arange(Pp) < num_tris)

    n_chunks = Pp // _DENSE_CHUNK
    vz = ro[..., 0] * 0.0  # vma seed (see note above)

    def chunk_body(carry, ci):
        t, prim, u, v = carry
        s = ci * _DENSE_CHUNK
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, s, _DENSE_CHUNK, 0)
        cv0, ce1, ce2 = sl(v0), sl(e1), sl(e2)
        ccen, crad = sl(cen), sl(rad)
        cvalid, cistri = sl(valid), sl(is_tri)
        t_t, tu, tv, h_t = vm.intersect_tri(
            ro[:, None, :], rd[:, None, :], cv0[None], ce1[None], ce2[None],
            t_min=t_min,
        )  # [N, C]
        t_s, h_s = vm.intersect_sphere(
            ro[:, None, :], rd[:, None, :], ccen[None], crad[None], t_min=t_min
        )
        tp = jnp.where(cistri[None], t_t, t_s)
        hp = jnp.where(cistri[None], h_t, h_s) & cvalid[None]
        tp = jnp.where(hp, tp, vm.INF)
        # best within chunk
        k = jnp.argmin(tp, axis=1)
        tk = jnp.take_along_axis(tp, k[:, None], axis=1)[:, 0]
        uk = jnp.take_along_axis(tu, k[:, None], axis=1)[:, 0]
        vk = jnp.take_along_axis(tv, k[:, None], axis=1)[:, 0]
        trik = jnp.take_along_axis(jnp.broadcast_to(cistri[None], tp.shape), k[:, None], axis=1)[:, 0]
        closer = tk < t
        t = jnp.where(closer, tk, t)
        prim = jnp.where(closer, (s + k).astype(jnp.int32), prim)
        u = jnp.where(closer, jnp.where(trik, uk, 0.0), u)
        v = jnp.where(closer, jnp.where(trik, vk, 0.0), v)
        return (t, prim, u, v), None

    init = (
        t0 + vz,
        vz.astype(jnp.int32) - 1,
        vz,
        vz,
    )
    if n_chunks <= 8:
        carry = init
        for ci in range(n_chunks):
            carry, _ = chunk_body(carry, ci)
    else:
        carry, _ = jax.lax.scan(
            chunk_body, init, jnp.arange(n_chunks, dtype=jnp.int32)
        )
    t, prim, u, v = carry
    hit = t < t0
    prim = jnp.where(hit, prim, -1)
    return {"t": t, "prim": prim, "u": u, "v": v, "hit": hit}


def traverse(scene, ro, rd, t_max=None, any_hit=False, t_min=1e-4, impl="auto"):
    """Find the closest (or any) primitive hit for a batch of rays.

    scene: SceneData dict (see aten_tpu.scene.scene).
    ro, rd: [N, 3] ray origin / unit direction.
    Returns dict {t, prim, u, v, hit} with [N] leaves.  `prim` is the
    global primitive id (tri ids first, then sphere ids offset by T).

    impl: "auto" uses the Pallas tile-coherent kernel on TPU when the
    scene carries the VMEM layout; "jax" forces the batched-gather
    reference path (the oracle); "pallas" forces the kernel.

    Traversal is discrete structure -> gradients are stopped, matching
    the detached-sampling differentiability design (hit *attributes* are
    re-derived differentiably by the shader, not here).
    """
    if "tl_bmin" in scene:
        from aten_tpu.accel.tlas import traverse_two_level

        return traverse_two_level(
            scene, ro, rd, t_max=t_max, any_hit=any_hit, t_min=t_min
        )
    num_prims = scene["num_tris"] + scene["num_spheres"]
    if impl == "dense" or (impl == "auto" and num_prims <= DENSE_MAX_PRIMS):
        ro = jax.lax.stop_gradient(ro)
        rd = jax.lax.stop_gradient(rd)
        if t_max is None:
            t0 = jnp.full((ro.shape[0],), vm.INF, jnp.float32)
        else:
            t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (ro.shape[0],))
        return _traverse_dense(scene, ro, rd, t0, any_hit, t_min)
    use_pallas = impl == "pallas" or (
        impl == "auto"
        and "pl_nodes" in scene
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from aten_tpu.ops.traverse_pallas import traverse_pallas

        return traverse_pallas(scene, ro, rd, t_max=t_max, any_hit=any_hit, t_min=t_min)
    ro = jax.lax.stop_gradient(ro)
    rd = jax.lax.stop_gradient(rd)
    N = ro.shape[0]
    T = scene["tri_v0"].shape[0]
    S = scene["sph_center"].shape[0]
    num_tris = scene["num_tris"]
    nbmin = scene["nodes_bmin"]
    nbmax = scene["nodes_bmax"]
    nhit = scene["nodes_hit"]
    nmiss = scene["nodes_miss"]
    nps = scene["nodes_prim_start"]
    npc = scene["nodes_prim_count"]
    prim_order = scene["prim_order"]

    rd_inv = _safe_inv(rd)
    if t_max is None:
        t0 = jnp.full((N,), vm.INF, jnp.float32)
    else:
        t0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))

    # Derive the carry from the ray arrays so the loop state inherits their
    # varying-manual-axes tag under shard_map (constants would be unvarying
    # and trip the while_loop vma check).
    vz = ro[..., 0] * 0.0 + rd[..., 0] * 0.0
    init = (
        vz.astype(jnp.int32),  # cursor (0)
        t0 + vz,  # best t
        vz.astype(jnp.int32) - 1,  # best prim (-1)
        vz,  # u
        vz,  # v
        vz.astype(jnp.int32),  # traversal step count (heatmap profiling)
    )

    def cond(state):
        cur = state[0]
        return jnp.any(cur >= 0)

    def body(state):
        cur, t, prim, u, v, steps = state
        steps = steps + (cur >= 0)
        active = cur >= 0
        curc = jnp.maximum(cur, 0)
        bmin = jnp.take(nbmin, curc, axis=0)
        bmax = jnp.take(nbmax, curc, axis=0)
        ahit = vm.intersect_aabb(ro, rd_inv, bmin, bmax, t) & active
        ps = jnp.take(nps, curc)
        pc = jnp.take(npc, curc)
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
            t_t, tu, tv, h_t = vm.intersect_tri(ro, rd, v0, e1, e2, t_min=t_min)
            c = jnp.take(scene["sph_center"], sid, axis=0)
            r = jnp.take(scene["sph_radius"], sid)
            t_s, h_s = vm.intersect_sphere(ro, rd, c, r, t_min=t_min)
            t_p = jnp.where(is_tri, t_t, t_s)
            h_p = jnp.where(is_tri, h_t, h_s) & valid
            closer = h_p & (t_p < t)
            t = jnp.where(closer, t_p, t)
            prim = jnp.where(closer, pid, prim)
            u = jnp.where(closer, jnp.where(is_tri, tu, 0.0), u)
            v = jnp.where(closer, jnp.where(is_tri, tv, 0.0), v)
        nxt = jnp.where(ahit, jnp.take(nhit, curc), jnp.take(nmiss, curc))
        cur = jnp.where(active, nxt, cur)
        if any_hit:
            cur = jnp.where(prim >= 0, -1, cur)
        return (cur, t, prim, u, v, steps)

    cur, t, prim, u, v, steps = jax.lax.while_loop(cond, body, init)
    return {"t": t, "prim": prim, "u": u, "v": v, "hit": prim >= 0,
            "steps": steps}


def occluded(scene, ro, rd, dist, eps=1e-3, impl="auto"):
    """Shadow-ray visibility: True where something blocks [eps, dist-eps].

    Counterpart of HitTestToTargetLight (pathtracing_impl.h:266-351)
    without the alpha punch-through loop (see occlusion_alpha).
    """
    res = traverse(scene, ro, rd, t_max=dist - eps, any_hit=True, t_min=eps, impl=impl)
    return res["hit"]


def occlusion_alpha(scene, ro, rd, dist, eps=1e-3, max_hits=4, impl="auto"):
    """Shadow occlusion THROUGH alpha-translucent surfaces: walks up to
    max_hits closest hits, multiplying (1 - alpha) per surface —
    HitTestToTargetLight's bounded punch-through loop
    (pathtracing_impl.h:266-351, max_lookups 10 capped here at 4 closest
    walks since each is a full traversal).  Material alpha only (the
    reference also reads the albedo-map alpha; shadow rays here skip the
    texture fetch).  Returns occlusion in [0,1]; 0 = fully visible.
    """
    from aten_tpu.scene.materials import gather_material

    trans = jnp.ones(ro.shape[0], jnp.float32)
    cur_ro = ro
    remaining = jnp.broadcast_to(
        jnp.asarray(dist, jnp.float32), (ro.shape[0],)
    ) - eps
    active = remaining > 0
    num_tris = scene["num_tris"]
    for _ in range(max_hits):
        res = traverse(
            scene, cur_ro, rd, t_max=remaining, any_hit=False, t_min=eps,
            impl=impl,
        )
        hit = res["hit"] & active
        prim = jnp.maximum(res["prim"], 0)
        is_tri = res["prim"] < num_tris
        mtl = jnp.where(
            is_tri,
            jnp.take(scene["tri_mtl"], jnp.clip(prim, 0, scene["tri_mtl"].shape[0] - 1)),
            jnp.take(scene["sph_mtl"], jnp.clip(prim - num_tris, 0, scene["sph_mtl"].shape[0] - 1)),
        )
        a = gather_material(scene["materials"], mtl)["alpha"]
        trans = jnp.where(hit, trans * (1.0 - a), trans)
        # advance past the hit; stop lanes blocked by opaque surfaces
        t_adv = jnp.where(hit, res["t"] + eps, 0.0)
        cur_ro = cur_ro + t_adv[..., None] * rd
        remaining = remaining - t_adv
        active = hit & (trans > 1e-4) & (remaining > 0)
    return 1.0 - trans
