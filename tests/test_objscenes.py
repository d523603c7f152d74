"""OBJ loading + native BVH builder + reference-asset scenes."""
import os

import numpy as np
import pytest

from aten_tpu.accel.build import build_bvh, _build_bvh_native
from aten_tpu.scene.scenedefs import REF_ASSET_DIR

HAS_ASSETS = os.path.isdir(REF_ASSET_DIR)


def test_native_builder_matches_numpy_traversal():
    """Native and NumPy builders may split differently but must produce
    identical closest hits."""
    import jax
    import jax.numpy as jnp

    from aten_tpu.accel.traverse import traverse
    from aten_tpu.scene.materials import MaterialType
    from aten_tpu.scene.scene import SceneBuilder

    rng = np.random.default_rng(11)
    n = 700  # above the native threshold
    b = SceneBuilder()
    m = b.add_material(MaterialType.DIFFUSE)
    v0 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    pos = np.concatenate([v0, v0 + e1, v0 + e2])
    faces = np.stack([np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n], 1)
    b.add_mesh(pos, faces, m)
    scene = b.build()  # native path (n > 512)

    # swap in a numpy-built BVH over the same primitive boxes
    p0, p1, p2 = v0, v0 + e1, v0 + e2
    bmin = np.minimum(np.minimum(p0, p1), p2) - 1e-5
    bmax = np.maximum(np.maximum(p0, p1), p2) + 1e-5
    ref_bvh = build_bvh(bmin, bmax, use_native=False)
    nat_bvh = _build_bvh_native(bmin, bmax, 4)
    assert nat_bvh is not None, "native builder failed to load"
    assert sorted(nat_bvh["prim_order"].tolist()) == list(range(n))

    scene_np = scene.replace(**{k: jnp.asarray(v) for k, v in ref_bvh.items()})
    N = 256
    ro = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    f = jax.jit(lambda s, ro, rd: traverse(s, ro, rd, impl="jax"))
    a = f(scene, ro, rd)
    c = f(scene_np, ro, rd)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(c["hit"]))
    m_ = np.asarray(a["hit"])
    np.testing.assert_allclose(
        np.asarray(a["t"])[m_], np.asarray(c["t"])[m_], rtol=1e-5, atol=1e-5
    )


@pytest.mark.skipif(not HAS_ASSETS, reason="reference assets not mounted")
def test_obj_cornell_box_renders():
    from aten_tpu.integrator.pathtracer import render_image
    from aten_tpu.scene.scenedefs import obj_cornell_box

    scene, cam = obj_cornell_box(24, 24)
    assert scene["num_tris"] == 32
    img = np.asarray(render_image(scene, cam, spp=2, max_depth=3))
    assert np.isfinite(img).all() and img.mean() > 0.02
    # orig.obj: left wall red-ish, right wall green-ish
    left = img[8:18, :5].mean(axis=(0, 1))
    right = img[8:18, -5:].mean(axis=(0, 1))
    assert left[0] > left[1] and right[1] > right[0]


@pytest.mark.skipif(not HAS_ASSETS, reason="reference assets not mounted")
def test_dragon_scene_builds_fast():
    import time

    from aten_tpu.scene.scenedefs import dragon_scene

    t0 = time.time()
    scene, _ = dragon_scene(16, 16)
    dt = time.time() - t0
    assert scene["num_tris"] > 90000
    assert dt < 30.0, f"100k-tri BVH build took {dt:.1f}s"
