"""BVH voxel LOD: interior nodes usable as far-field proxy "voxels".

Counterpart of the reference's SBVH voxel machinery
(src/libaten/accelerator/sbvh.h:11-14,74 — interior nodes at depths that
are multiples of VoxelDepth=3 become treelet roots; sbvh_voxel.cpp:14-148
— `makeTreelet` collects each treelet's triangles and `buildVoxel`
assigns the node the DOMINANT material by accumulated triangle area) and
the traverser's voxel-LOD hit path
(accelerator/threaded_bvh_traverser.h:221-277 — when LOD is enabled and
the node's voxel depth passes the `lod_depth` threshold, the ray returns
a hit on the node's AABB instead of descending).

TPU-native design: instead of a per-node union in a 48-byte record, the
voxel annotation is two extra flat arrays over the node pool
(`nodes_voxel_mtl` [K] i32, -1 = not a voxel; `nodes_depth` [K] i32),
computed host-side in one pass over the preorder layout — a node's
subtree is CONTIGUOUS in preorder ([i, miss_link_i)), so treelet
triangle collection is pure range arithmetic, no stack walk.  The
threshold `lod_depth` stays a traced scalar so the runtime LOD knob
(device_renderer's distance-limit ratio slider) needs no recompile.
"""
from __future__ import annotations

import numpy as np

VOXEL_DEPTH = 3  # reference sbvh.h:11 VoxelDepth


def node_depths(nodes_hit, nodes_miss, nodes_prim_start):
    """[K] i32 depth of every node in the preorder hit/miss layout.

    Children of internal node i are left = i+1 and right = miss(i+1)
    (the left child's skip link is its right sibling by construction of
    the preorder flatten — accel/build.py).
    """
    K = len(nodes_hit)
    depth = np.full(K, -1, np.int32)
    stack = [(0, 0)]
    while stack:
        i, d = stack.pop()
        if i < 0 or i >= K or depth[i] >= 0:
            continue
        depth[i] = d
        if nodes_prim_start[i] < 0:  # internal
            left = i + 1
            stack.append((left, d + 1))
            right = nodes_miss[left]
            if right is not None and right >= 0:
                stack.append((int(right), d + 1))
    return depth


def annotate_voxels(tree, prim_mtl, prim_area, voxel_depth=VOXEL_DEPTH):
    """Compute (nodes_voxel_mtl, nodes_depth) for a threaded BVH dict.

    tree: build_bvh/build_sbvh output (nodes_* + prim_order).
    prim_mtl:  [P] i32 material id per GLOBAL prim id.
    prim_area: [P] f32 surface area per GLOBAL prim id.

    A node is a voxel iff it is internal, its depth is a non-zero
    multiple of voxel_depth (root excluded — sbvh_voxel.cpp:25 loops
    from 1), and it gets the material covering the largest area of its
    subtree (buildVoxel, sbvh_voxel.cpp:105-147).
    """
    hit = np.asarray(tree["nodes_hit"])
    miss = np.asarray(tree["nodes_miss"])
    ps = np.asarray(tree["nodes_prim_start"])
    pc = np.asarray(tree["nodes_prim_count"])
    order = np.asarray(tree["prim_order"])
    K = len(hit)
    depth = node_depths(hit, miss, ps)
    vox_mtl = np.full(K, -1, np.int32)

    prim_mtl = np.asarray(prim_mtl)
    prim_area = np.asarray(prim_area, np.float64)
    num_mtl = int(prim_mtl.max()) + 1 if prim_mtl.size else 1

    # Per-preorder-slot (leaf-range-expanded) material/area streams with a
    # prefix sum per material lets every subtree query be two gathers.
    slot_mtl = prim_mtl[order]
    # SBVH spatial splits duplicate clipped prim refs in prim_order; an
    # unweighted vote would multiply a spanning triangle's area by its
    # ref count and could flip a subtree's dominant material.  Weight
    # each ref by area / global ref count: a subtree holding all k refs
    # sums to the full area, partial subtrees get a proportional share.
    ref_count = np.bincount(order, minlength=prim_area.shape[0]).astype(
        np.float64
    )
    slot_area = prim_area[order] / np.maximum(ref_count[order], 1.0)
    # slot position of each node's first prim and one-past-last prim
    # (subtree [i, skip) covers exactly the slots of its leaves because
    # prim ranges are allocated in preorder).
    first_slot = np.full(K + 1, -1, np.int64)
    acc = 0
    for i in range(K):
        first_slot[i] = acc
        if ps[i] >= 0:
            acc += pc[i]
    first_slot[K] = acc
    # per-material cumulative area over slots
    cum = np.zeros((acc + 1, num_mtl), np.float64)
    np.add.at(cum[1:], (np.arange(acc), slot_mtl), slot_area)
    cum = np.cumsum(cum, axis=0)

    for i in range(1, K):
        if ps[i] >= 0 or depth[i] <= 0 or depth[i] % voxel_depth != 0:
            continue
        end = miss[i] if miss[i] >= 0 else K
        lo, hi = first_slot[i], first_slot[end]
        if hi <= lo:
            continue
        areas = cum[hi] - cum[lo]
        vox_mtl[i] = int(np.argmax(areas))
    return vox_mtl, depth


def enable_voxel_lod(scene, lod_depth=VOXEL_DEPTH, voxel_depth=VOXEL_DEPTH):
    """Return a new SceneData with voxel-LOD arrays + threshold attached.

    Only single-level (non-instanced) scenes carry the flat node pool
    this annotates — matching the reference, where voxels live in the
    per-object SBVH trees.  `lod_depth` is the runtime acceptance
    threshold (node voxel depth >= lod_depth hits as a voxel,
    threaded_bvh_traverser.h:241); larger = finer voxels = higher
    quality.  Adjustable later without recompile via
    scene.replace(lod_depth=jnp.float32(...)).
    """
    import jax.numpy as jnp

    from aten_tpu.scene.scene import SceneData

    assert scene["num_instances"] == 0, "voxel LOD: single-level scenes only"
    num_tris = scene["num_tris"]
    num_sph = scene["num_spheres"]
    tree = {
        k: np.asarray(scene[k])
        for k in (
            "nodes_hit", "nodes_miss", "nodes_prim_start",
            "nodes_prim_count", "prim_order", "nodes_bmin", "nodes_bmax",
        )
    }
    tri_mtl = np.asarray(scene["tri_mtl"])[:num_tris]
    tri_area = np.asarray(scene["tri_area"])[:num_tris]
    sph_mtl = np.asarray(scene["sph_mtl"])[:num_sph]
    sph_r = np.asarray(scene["sph_radius"])[:num_sph]
    prim_mtl = np.concatenate([tri_mtl, sph_mtl]).astype(np.int32)
    prim_area = np.concatenate(
        [tri_area, 4.0 * np.pi * sph_r * sph_r]
    ).astype(np.float32)
    vox_mtl, depth = annotate_voxels(tree, prim_mtl, prim_area, voxel_depth)
    arrays = dict(scene.arrays)
    arrays["nodes_voxel_mtl"] = jnp.asarray(vox_mtl)
    arrays["nodes_depth"] = jnp.asarray(depth)
    arrays["lod_depth"] = jnp.asarray(lod_depth, jnp.int32)
    static = dict(scene.static)
    static["has_voxel_lod"] = True
    # Rebuild the Pallas layout from the LOD-BAKED tree: annotated
    # nodes at depth >= lod_depth become zero-prim voxel leaves and
    # their subtrees vanish (ops/traverse_pallas.bake_lod_tree), so the
    # kernel and the traced-knob oracle agree at THIS lod_depth.
    # Changing scene["lod_depth"] afterwards re-steers only the oracle;
    # call enable_voxel_lod again to re-bake the kernel layout.
    for k in list(arrays):
        if k.startswith(("pl_", "trl_", "tt_")):
            arrays.pop(k)
    from aten_tpu.ops.traverse_pallas import bake_lod_tree, build_treelet_layout

    baked, voxid = bake_lod_tree(tree, vox_mtl, depth, int(lod_depth))
    layout = build_treelet_layout(
        baked,
        np.asarray(scene["tri_v0"]), np.asarray(scene["tri_e1"]),
        np.asarray(scene["tri_e2"]), np.asarray(scene["sph_center"]),
        np.asarray(scene["sph_radius"]), num_tris,
        voxid=voxid, vox_base=num_tris + num_sph,
    )
    static["trl_window"] = layout.pop("_window")
    for k, v in layout.items():
        arrays[k] = jnp.asarray(v)
    static["trl_has_lod"] = True
    return SceneData(arrays, static)
