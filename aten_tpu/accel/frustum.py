"""Frustum vs. BVH intersection (visibility culling assist).

Counterpart of the reference's Frustum-BVH module
(src/libaten/accelerator/ThreadedBvhFrustum.cpp:1-134 and
src/libaten/math/frustum.h), which intersects a camera frustum against
the threaded (hit/miss-linked) BVH to assist screen-space hit tests.
There is no GL raster here, so the TPU-native role is batched
visibility culling: given a pinhole camera, return which BVH leaves /
primitives can possibly appear on screen, as a mask usable to prune
work (e.g. restrict LBVH refit or debug draws to visible geometry).

Design: the frustum is six inward-facing planes; the classic
plane/AABB "p-vertex" test runs VECTORIZED over the whole node array
(one [K,6] test matrix) instead of walking hit/miss links — on TPU a
dense elementwise test over every node is faster than a data-dependent
walk, and the conservative answer is identical for culling purposes.
A node is OUT only if all its corners are outside one plane; prims
inherit their leaf's verdict via the prim_order ranges.
"""
from __future__ import annotations

import numpy as np


def frustum_planes_from_camera(cam):
    """Six inward-facing planes [6,4] (nx,ny,nz,d with n.x+d>=0 inside)
    for a PinholeCamera (near at 0, far at `far`)."""
    o = np.asarray(cam.origin, np.float64)
    look = np.asarray(cam.lookat, np.float64)
    fwd = look - o
    fwd = fwd / np.linalg.norm(fwd)
    up_hint = np.asarray(getattr(cam, "up", (0.0, 1.0, 0.0)), np.float64)
    right = np.cross(fwd, up_hint)
    right = right / np.linalg.norm(right)
    up = np.cross(right, fwd)

    aspect = cam.width / cam.height
    tan_v = np.tan(np.deg2rad(cam.vfov_deg) * 0.5)
    tan_h = tan_v * aspect

    def plane(n):
        n = n / np.linalg.norm(n)
        return np.array([n[0], n[1], n[2], -np.dot(n, o)], np.float64)

    planes = [
        plane(fwd),  # near (at the eye)
        plane(np.cross(up, fwd + right * tan_h)),    # right
        plane(np.cross(fwd - right * tan_h, up)),    # left
        plane(np.cross(fwd + up * tan_v, right)),    # top
        plane(np.cross(right, fwd - up * tan_v)),    # bottom
    ]
    far = getattr(cam, "far", 1e6)
    far_p = -fwd
    planes.append(
        np.array(
            [far_p[0], far_p[1], far_p[2], -np.dot(far_p, o + fwd * far)],
            np.float64,
        )
    )
    return np.stack(planes).astype(np.float32)


def intersect_frustum_nodes(planes, nodes_bmin, nodes_bmax):
    """[K] bool: True where a node AABB touches the frustum.

    p-vertex test: for each plane pick the AABB corner farthest along
    the plane normal; if even that corner is outside, the box is out.
    One fused [K,6] computation (no per-node control flow).
    """
    n = planes[:, :3]  # [6,3]
    d = planes[:, 3]  # [6]
    bmin = np.asarray(nodes_bmin, np.float32)[:, None, :]  # [K,1,3]
    bmax = np.asarray(nodes_bmax, np.float32)[:, None, :]
    pvert = np.where(n[None] >= 0.0, bmax, bmin)  # [K,6,3]
    dist = (pvert * n[None]).sum(-1) + d[None]  # [K,6]
    return (dist >= 0.0).all(axis=1)


def visible_prims(scene_np, planes, prim_bmin=None, prim_bmax=None):
    """[P] bool: prims inside (or touching) the frustum, via their
    containing leaves.  scene_np: dict with nodes_bmin/bmax,
    nodes_prim_start/count, prim_order (build.py layout).  When the
    per-prim AABBs are provided, prims of surviving leaves are refined
    against the frustum individually (per-prim AABB-CONSERVATIVE: a
    triangle whose box touches the frustum may itself miss it, and the
    plane test admits boxes near plane corners — callers get a superset
    of the truly visible prims, never a subset); otherwise the answer
    is leaf-conservative.  Returns
    (prim_mask_over_ids, leaf_mask_over_nodes)."""
    node_in = intersect_frustum_nodes(
        planes, scene_np["nodes_bmin"], scene_np["nodes_bmax"]
    )
    ps = np.asarray(scene_np["nodes_prim_start"])
    pc = np.asarray(scene_np["nodes_prim_count"])
    order = np.asarray(scene_np["prim_order"])
    num_prims = int(order.max()) + 1 if order.size else 0
    mask = np.zeros(num_prims, bool)
    for k in np.nonzero(node_in & (ps >= 0))[0]:
        mask[order[ps[k] : ps[k] + pc[k]]] = True
    if prim_bmin is not None:
        cand = np.nonzero(mask)[0]
        fine = intersect_frustum_nodes(
            planes, np.asarray(prim_bmin)[cand], np.asarray(prim_bmax)[cand]
        )
        mask[:] = False
        mask[cand[fine]] = True
    return mask, node_in
