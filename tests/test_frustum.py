"""Frustum-BVH culling (ThreadedBvhFrustum.cpp role)."""
import numpy as np

from aten_tpu.accel.build import build_bvh
from aten_tpu.accel.frustum import (
    frustum_planes_from_camera,
    intersect_frustum_nodes,
    visible_prims,
)
from aten_tpu.core.camera import PinholeCamera


def _cam():
    return PinholeCamera(
        origin=(0.0, 0.0, 5.0), lookat=(0.0, 0.0, 0.0), vfov_deg=40.0,
        width=64, height=64,
    )


def test_plane_aabb_inside_outside():
    planes = frustum_planes_from_camera(_cam())
    # box at the lookat point: inside
    inside = intersect_frustum_nodes(
        planes, np.array([[-0.1, -0.1, -0.1]]), np.array([[0.1, 0.1, 0.1]])
    )
    assert inside[0]
    # box behind the camera: outside
    behind = intersect_frustum_nodes(
        planes, np.array([[-0.1, -0.1, 7.0]]), np.array([[0.1, 0.1, 7.5]])
    )
    assert not behind[0]
    # box far off to the side: outside
    side = intersect_frustum_nodes(
        planes, np.array([[50.0, -0.1, -0.1]]), np.array([[50.2, 0.1, 0.1]])
    )
    assert not side[0]


def test_visible_prims_matches_bruteforce():
    rng = np.random.default_rng(0)
    # scatter boxes; some in front of the camera, some behind/off-axis
    centers = rng.uniform(-6, 6, size=(64, 3)).astype(np.float32)
    half = 0.05
    bmin = centers - half
    bmax = centers + half
    tree = build_bvh(bmin, bmax)
    planes = frustum_planes_from_camera(_cam())
    coarse, _ = visible_prims(tree, planes)
    brute = intersect_frustum_nodes(planes, bmin, bmax)
    # leaf-level culling is conservative: everything the brute-force
    # test keeps must be kept by the BVH walk
    assert np.all(coarse[brute])
    # per-prim refinement is exact
    fine, _ = visible_prims(tree, planes, bmin, bmax)
    assert np.array_equal(fine, brute)
    assert not fine[centers[:, 2] > 5.2].any()
