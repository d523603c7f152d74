"""On-device LBVH builder (aten_tpu/accel/lbvh.py).

Oracle: traversal over LBVH arrays must find the same closest hits as
traversal over the host SAH builder's arrays (both walked with the
"jax" threaded-traversal path so the BVH arrays are actually exercised,
not the dense all-prims fallback).
"""
import jax
import jax.numpy as jnp
import numpy as np

from aten_tpu.accel.lbvh import build_lbvh, rebuild_scene_bvh, tri_boxes
from aten_tpu.accel.traverse import traverse
from aten_tpu.scene.materials import MaterialType
from aten_tpu.scene.scene import SceneBuilder


def _random_tri_soup(n=300, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    tris = (
        centers[:, None, :]
        + rng.uniform(-0.4, 0.4, (n, 3, 3)).astype(np.float32)
    )
    return tris


def _scene_from_tris(tris):
    sb = SceneBuilder()
    m = sb.add_material(MaterialType.DIFFUSE, base_color=(0.5, 0.5, 0.5))
    pos = tris.reshape(-1, 3)
    faces = np.arange(len(pos)).reshape(-1, 3)
    sb.add_mesh(pos, faces, m)
    return sb.build()


def _rays(n=400, seed=1):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_lbvh_matches_sah_traversal():
    tris = _random_tri_soup()
    scene = _scene_from_tris(tris)
    ro, rd = _rays()

    h_sah = traverse(scene, ro, rd, impl="jax")

    bmin, bmax = tri_boxes(
        scene["tri_v0"], scene["tri_e1"], scene["tri_e2"]
    )
    lb = jax.jit(build_lbvh)(bmin, bmax)
    scene_lb = scene.replace(**{k: v for k, v in lb.items()})
    h_lb = traverse(scene_lb, ro, rd, impl="jax")

    np.testing.assert_array_equal(np.asarray(h_sah["hit"]), np.asarray(h_lb["hit"]))
    np.testing.assert_array_equal(np.asarray(h_sah["prim"]), np.asarray(h_lb["prim"]))
    mask = np.asarray(h_sah["hit"])
    np.testing.assert_allclose(
        np.asarray(h_sah["t"])[mask], np.asarray(h_lb["t"])[mask], rtol=1e-5
    )


def test_lbvh_node_pool_is_well_formed():
    tris = _random_tri_soup(n=128, seed=3)
    scene = _scene_from_tris(tris)
    bmin, bmax = tri_boxes(scene["tri_v0"], scene["tri_e1"], scene["tri_e2"])
    lb = build_lbvh(bmin, bmax)
    P = 128 * 1  # one box per tri
    K = 2 * P - 1
    hit = np.asarray(lb["nodes_hit"])
    miss = np.asarray(lb["nodes_miss"])
    ps = np.asarray(lb["nodes_prim_start"])
    order = np.asarray(lb["prim_order"])
    assert hit.shape == (K,)
    assert sorted(order.tolist()) == list(range(P))
    # Every leaf reachable from the root by hit links (full DFS walk
    # visits all nodes exactly once when every AABB "hits").
    seen = np.zeros(K, bool)
    cur, steps = 0, 0
    while cur >= 0 and steps <= K + 1:
        assert not seen[cur]
        seen[cur] = True
        cur = hit[cur]
        steps += 1
    assert seen.all()
    # Leaf prim ranges cover [0, P) exactly once.
    leaf_ps = ps[ps >= 0]
    assert sorted(leaf_ps.tolist()) == list(range(P))
    # Node boxes contain their leaves' boxes (root spans everything).
    nb_min = np.asarray(lb["nodes_bmin"])
    nb_max = np.asarray(lb["nodes_bmax"])
    assert (nb_min[0] <= np.asarray(bmin).min(0) + 1e-6).all()
    assert (nb_max[0] >= np.asarray(bmax).max(0) - 1e-6).all()


def test_lbvh_duplicate_centroids():
    """All-identical centroids must still build a valid tree (index
    fallback in the augmented delta)."""
    n = 64
    bmin = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32), (n, 1))
    bmax = jnp.tile(jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32), (n, 1))
    lb = build_lbvh(bmin, bmax)
    hit = np.asarray(lb["nodes_hit"])
    K = 2 * n - 1
    seen = np.zeros(K, bool)
    cur, steps = 0, 0
    while cur >= 0 and steps <= K + 1:
        assert not seen[cur], "cycle in hit links"
        seen[cur] = True
        cur = hit[cur]
        steps += 1
    assert seen.all()


def test_rebuild_scene_bvh_after_move():
    """Moving geometry then rebuilding on-device gives correct hits at
    the new location (the skinning-per-frame pipeline)."""
    tris = _random_tri_soup(n=600, seed=5)  # >512 so the BVH path is used
    scene = _scene_from_tris(tris)
    shift = jnp.asarray([10.0, 0.0, 0.0], jnp.float32)
    moved = scene.replace(tri_v0=scene["tri_v0"] + shift)
    moved = rebuild_scene_bvh(moved.drop("pl_nodes", "pl_prims", "pl_meta"))

    ro, rd = _rays(n=200, seed=7)
    ro_shift = ro + shift
    h_ref = traverse(scene, ro, rd, impl="jax")
    h_new = traverse(moved, ro_shift, rd, impl="jax")
    np.testing.assert_array_equal(
        np.asarray(h_ref["hit"]), np.asarray(h_new["hit"])
    )
    mask = np.asarray(h_ref["hit"])
    np.testing.assert_array_equal(
        np.asarray(h_ref["prim"])[mask], np.asarray(h_new["prim"])[mask]
    )
    np.testing.assert_allclose(
        np.asarray(h_ref["t"])[mask], np.asarray(h_new["t"])[mask],
        rtol=1e-4, atol=1e-4,
    )
