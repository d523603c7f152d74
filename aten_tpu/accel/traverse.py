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


def traverse(scene, ro, rd, t_max=None, any_hit=False, t_min=1e-4):
    """Find the closest (or any) primitive hit for a batch of rays.

    scene: SceneData dict (see aten_tpu.scene.scene).
    ro, rd: [N, 3] ray origin / unit direction.
    Returns dict {t, prim, u, v, hit} with [N] leaves.  `prim` is the
    global primitive id (tri ids first, then sphere ids offset by T).

    Traversal is discrete structure -> gradients are stopped, matching
    the detached-sampling differentiability design (hit *attributes* are
    re-derived differentiably by the shader, not here).
    """
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
    )

    def cond(state):
        cur = state[0]
        return jnp.any(cur >= 0)

    def body(state):
        cur, t, prim, u, v = state
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
        return (cur, t, prim, u, v)

    cur, t, prim, u, v = jax.lax.while_loop(cond, body, init)
    return {"t": t, "prim": prim, "u": u, "v": v, "hit": prim >= 0}


def occluded(scene, ro, rd, dist, eps=1e-3):
    """Shadow-ray visibility: True where something blocks [eps, dist-eps].

    Counterpart of HitTestToTargetLight (pathtracing_impl.h:266-351)
    without the alpha punch-through loop (layered on by the integrator).
    """
    res = traverse(scene, ro, rd, t_max=dist - eps, any_hit=True, t_min=eps)
    return res["hit"]
