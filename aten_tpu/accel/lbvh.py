"""On-device LBVH build (morton -> sort -> Karras tree -> threaded links).

Counterpart of the reference's GPU builder for dynamic (skinned) meshes
(src/libidaten/kernel/LBVHBuilder.{h,cu}: morton codes + radix sort,
parallel tree construction buildTree/findSplit :269-314, bbox refit
computeBoudingBox :548, hit/miss link assignment applyTraverseOrder
:497; MortonCode.cuh).

TPU-native design: everything is batched `jnp` — the radix sort becomes
`jnp.argsort` (XLA's on-device sort), the per-node Karras range/split
searches are branchless vectorized binary searches over ALL internal
nodes at once (safe to over-iterate: the predicates are monotone, so
extra probes are no-ops), and the bottom-up refit / top-down link
propagation are fixed-depth gather loops (tree depth is bounded by the
key length).  The whole build is jittable, so a skinned mesh re-builds
its BVH every frame on-chip, mirroring the reference's Skinning ->
LBVHBuilder::build per-frame pipeline.

Outputs the SAME threaded node array schema as the host SAH builder
(accel/build.py) — traversal is agnostic to which builder produced the
arrays.  Layout: internal nodes at [0, P-1), leaves at [P-1, 2P-1),
root = node 0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MORTON_BITS = 10  # 10 bits/axis -> 30-bit codes in a uint32
                  # (the reference's 32-bit morton mode, LBVHBuilder.h:12;
                  # JAX here runs without x64, so keys are uint32 and code
                  # ties fall back to index bits in the augmented delta)


def _expand_bits32(v):
    """Interleave 10 bits of v with two zero bits (uint32 lanes)."""
    v = v.astype(jnp.uint32) & jnp.uint32((1 << MORTON_BITS) - 1)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(cent, bmin, bmax):
    """[P,3] centroids -> [P] uint32 morton codes within the scene box."""
    ext = jnp.maximum(bmax - bmin, 1e-12)
    q = jnp.clip((cent - bmin) / ext, 0.0, 1.0 - 1e-7)
    ql = (q * (1 << MORTON_BITS)).astype(jnp.uint32)
    return (
        (_expand_bits32(ql[:, 0]) << 2)
        | (_expand_bits32(ql[:, 1]) << 1)
        | _expand_bits32(ql[:, 2])
    )


def _popcount32(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _clz32(x):
    """Leading zeros of a uint32 (bit-smear + popcount)."""
    x = x | (x >> 1)
    x = x | (x >> 2)
    x = x | (x >> 4)
    x = x | (x >> 8)
    x = x | (x >> 16)
    return 32 - _popcount32(x)


def build_lbvh(bmin, bmax):
    """Build threaded-BVH arrays from P primitive AABBs, fully on device.

    bmin/bmax: [P,3] f32 device arrays; P >= 2 and static (baked shape).
    Returns the accel/build.py node-array schema (jnp arrays).
    """
    P = bmin.shape[0]
    assert P >= 2
    cent = (bmin + bmax) * 0.5
    scene_min = jnp.min(bmin, axis=0)
    scene_max = jnp.max(bmax, axis=0)
    codes = morton3d(cent, scene_min, scene_max)
    order = jnp.argsort(codes).astype(jnp.int32)
    codes = codes[order]
    prim_order = order

    n_int = P - 1
    i = jnp.arange(n_int, dtype=jnp.int32)
    idxu = jnp.arange(P, dtype=jnp.uint32)

    def delta(a, b):
        """Augmented common-prefix length (Karras: equal codes fall back
        to the index bits, making keys effectively unique); -1 if b is
        out of range."""
        ok = (b >= 0) & (b < P)
        bc = jnp.clip(b, 0, P - 1)
        x = codes[a] ^ codes[bc]
        d = _clz32(x)
        dup = 32 + _clz32(idxu[a] ^ idxu[bc])
        return jnp.where(ok, jnp.where(x == 0, dup, d), -1)

    # --- Karras 2012: per-node direction, range length, split position.
    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)
    delta_min = delta(i, i - d)

    steps = max(1, P.bit_length() + 1)
    # exponential upper bound on range length (idempotent once the probe
    # fails, so a fixed step count is safe)
    lmax = jnp.full((n_int,), 2, jnp.int32)
    for _ in range(steps):
        grow = delta(i, i + lmax * d) > delta_min
        lmax = jnp.where(grow, lmax * 2, lmax)
    # binary search exact length l (predicate monotone in l)
    l = jnp.zeros((n_int,), jnp.int32)
    t = lmax // 2
    for _ in range(steps + 1):
        go = (t > 0) & (delta(i, i + (l + t) * d) > delta_min)
        l = jnp.where(go, l + t, l)
        t = t // 2
    j = i + l * d
    delta_node = delta(i, j)
    # binary search split s: largest s with delta(i, i+s*d) > delta_node
    s = jnp.zeros((n_int,), jnp.int32)
    t = l
    for _ in range(steps + 1):
        t = (t + 1) // 2
        go = delta(i, i + (s + t) * d) > delta_node
        s = jnp.where(go & (s + t < l), s + t, s)
    gamma = i + s * d + jnp.minimum(d, 0)

    left_is_leaf = jnp.minimum(i, j) == gamma
    right_is_leaf = jnp.maximum(i, j) == gamma + 1
    left = jnp.where(left_is_leaf, (P - 1) + gamma, gamma)
    right = jnp.where(right_is_leaf, (P - 1) + gamma + 1, gamma + 1)

    K = 2 * P - 1
    parent = jnp.full((K,), -1, jnp.int32).at[left].set(i).at[right].set(i)
    is_left = jnp.zeros((K,), jnp.bool_).at[left].set(True)
    sibling = jnp.full((K,), -1, jnp.int32).at[left].set(right).at[right].set(left)

    # Depth bound: distinct-prefix chain (<= 30) + duplicate-group index
    # subtree (<= log2 P); over-iterating is harmless but wasteful.
    depth_bound = min(64, 31 + steps)

    # --- bottom-up bbox refit (fixed-depth loop).
    nb_min = jnp.zeros((K, 3), jnp.float32).at[P - 1 :].set(bmin[prim_order])
    nb_max = jnp.zeros((K, 3), jnp.float32).at[P - 1 :].set(bmax[prim_order])

    def refit_body(_, nb):
        nmin, nmax = nb
        new_min = jnp.minimum(nmin[left], nmin[right])
        new_max = jnp.maximum(nmax[left], nmax[right])
        return nmin.at[: P - 1].set(new_min), nmax.at[: P - 1].set(new_max)

    nb_min, nb_max = jax.lax.fori_loop(0, depth_bound, refit_body, (nb_min, nb_max))

    # --- threaded links: miss(n) = sibling if left child else miss(parent);
    # hit(internal) = left child, hit(leaf) = miss(leaf).
    miss = jnp.full((K,), -1, jnp.int32)

    def miss_body(_, miss):
        pm = jnp.where(parent >= 0, miss[jnp.maximum(parent, 0)], -1)
        return jnp.where(is_left & (sibling >= 0), sibling, pm)

    miss = jax.lax.fori_loop(0, depth_bound, miss_body, miss)
    node_id = jnp.arange(K, dtype=jnp.int32)
    is_leaf = node_id >= (P - 1)
    hit = jnp.where(is_leaf, miss, left[jnp.clip(node_id, 0, n_int - 1)])

    ps = jnp.where(is_leaf, node_id - (P - 1), -1)
    pc = jnp.where(is_leaf, 1, 0).astype(jnp.int32)
    return {
        "nodes_bmin": nb_min,
        "nodes_bmax": nb_max,
        "nodes_hit": hit.astype(jnp.int32),
        "nodes_miss": miss.astype(jnp.int32),
        "nodes_prim_start": ps.astype(jnp.int32),
        "nodes_prim_count": pc,
        "prim_order": prim_order,
    }


def tri_boxes(v0, e1, e2, pad=1e-5):
    """AABBs of triangles given the pre-expanded v0/e1/e2 scene arrays."""
    p0 = v0
    p1 = v0 + e1
    p2 = v0 + e2
    bmin = jnp.minimum(jnp.minimum(p0, p1), p2) - pad
    bmax = jnp.maximum(jnp.maximum(p0, p1), p2) + pad
    return bmin, bmax


def rebuild_scene_bvh(scene):
    """Re-build the (single-level) scene BVH on device from the current
    tri/sphere arrays — the per-frame step after skinning/deformation.
    Jittable; returns a scene with fresh nodes_* arrays."""
    num_tris = scene["num_tris"]
    num_sph = scene["num_spheres"]
    boxes = []
    if num_tris:
        bt = tri_boxes(
            scene["tri_v0"][:num_tris],
            scene["tri_e1"][:num_tris],
            scene["tri_e2"][:num_tris],
        )
        boxes.append(bt)
    if num_sph:
        c = scene["sph_center"][:num_sph]
        r = scene["sph_radius"][:num_sph, None]
        boxes.append((c - r - 1e-5, c + r + 1e-5))
    bmin = jnp.concatenate([b[0] for b in boxes])
    bmax = jnp.concatenate([b[1] for b in boxes])
    arrays = build_lbvh(bmin, bmax)
    return scene.replace(**arrays)
