"""SBVH voxel LOD (sbvh.h:11-14, sbvh_voxel.cpp, traverser voxel path)."""
import jax.numpy as jnp
import numpy as np
import pytest

from aten_tpu.accel.traverse import traverse
from aten_tpu.accel.voxel import VOXEL_DEPTH, annotate_voxels, enable_voxel_lod
from aten_tpu.core.camera import PinholeCamera
from aten_tpu.scene.materials import MaterialType
from aten_tpu.scene.scene import SceneBuilder


def _grid_scene(n=24):
    """n*n quad grid in the z=0 plane; left half red, right half white.
    2*n*n tris — enough to exceed the dense-path threshold."""
    b = SceneBuilder()
    red = b.add_material(MaterialType.DIFFUSE, base_color=(0.8, 0.1, 0.1))
    white = b.add_material(MaterialType.DIFFUSE, base_color=(0.8, 0.8, 0.8))
    for i in range(n):
        for j in range(n):
            x0, x1 = i / n * 2 - 1, (i + 1) / n * 2 - 1
            y0, y1 = j / n * 2 - 1, (j + 1) / n * 2 - 1
            m = red if i < n // 2 else white
            b.add_quad([x0, y0, 0], [x1, y0, 0], [x1, y1, 0], [x0, y1, 0], m)
    cam = PinholeCamera(
        origin=(0, 0, 3), lookat=(0, 0, 0), vfov_deg=45, width=32, height=32
    )
    return b.build(), cam


def test_annotation_marks_interior_multiples_of_voxel_depth():
    scene, _ = _grid_scene()
    tree = {
        k: np.asarray(scene[k])
        for k in (
            "nodes_hit", "nodes_miss", "nodes_prim_start",
            "nodes_prim_count", "prim_order",
        )
    }
    nt = scene["num_tris"]
    vox, depth = annotate_voxels(
        tree,
        np.asarray(scene["tri_mtl"])[:nt],
        np.asarray(scene["tri_area"])[:nt],
    )
    assert (depth >= 0).all()  # every node reached
    marked = np.nonzero(vox >= 0)[0]
    assert len(marked) > 0
    ps = tree["nodes_prim_start"]
    assert (ps[marked] < 0).all()  # internal only
    assert (depth[marked] % VOXEL_DEPTH == 0).all()
    assert (depth[marked] > 0).all()  # root excluded


def test_dominant_material_and_lod_hits():
    scene, cam = _grid_scene()
    lscene = enable_voxel_lod(scene, lod_depth=VOXEL_DEPTH)

    # rays straight down onto the left (red) half
    N = 64
    xs = np.linspace(-0.9, -0.55, N, dtype=np.float32)
    ro = jnp.asarray(np.stack([xs, np.zeros(N), np.full(N, 2.0)], 1))
    rd = jnp.asarray(np.tile(np.array([[0, 0, -1]], np.float32), (N, 1)))

    hit = traverse(lscene, ro, rd)
    vox_base = lscene["num_tris"] + lscene["num_spheres"]
    assert bool(hit["hit"].all())
    # coarse threshold accepts depth-3 voxels: every one of these rays
    # stops at a voxel, far above the plane geometry
    assert bool((hit["prim"] >= vox_base).all())
    node = hit["prim"] - vox_base
    mtl = jnp.take(lscene["nodes_voxel_mtl"], node)
    assert bool((mtl == 0).all())  # red dominates the left half's subtrees

    # very strict threshold: no node is that deep -> exact geometry hits,
    # identical to the unannotated scene
    sscene = lscene.replace(lod_depth=jnp.asarray(99, jnp.int32))
    hs = traverse(sscene, ro, rd)
    h0 = traverse(scene, ro, rd, impl="jax")
    np.testing.assert_allclose(np.asarray(hs["t"]), np.asarray(h0["t"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(hs["prim"]), np.asarray(h0["prim"]))


def test_lod_render_is_finite_and_close():
    from aten_tpu.integrator.pathtracer import render_sample

    b_scene, cam = _grid_scene()
    scene = b_scene.replace(bg=jnp.asarray([2.0, 2.0, 2.0], jnp.float32))
    lscene = enable_voxel_lod(scene, lod_depth=6)
    img = render_sample(
        lscene, cam.arrays(), cam.width, cam.height,
        jnp.uint32(0), jnp.uint32(0), 1, 3, 2,
    )
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.mean() > 0.0
