"""BVH build + traversal vs brute-force intersection (SURVEY.md §4: the
reference has NO BVH tests; allclose-vs-oracle is our gate)."""
import jax
import jax.numpy as jnp
import numpy as np

from aten_tpu.accel.build import build_bvh
from aten_tpu.accel.traverse import occluded, traverse
from aten_tpu.core import vecmath as vm
from aten_tpu.scene.materials import MaterialType
from aten_tpu.scene.scene import SceneBuilder


def _random_tri_scene(num_tris=200, seed=0):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    m = b.add_material(MaterialType.DIFFUSE)
    v0 = rng.uniform(-1, 1, (num_tris, 3)).astype(np.float32)
    e1 = rng.uniform(-0.3, 0.3, (num_tris, 3)).astype(np.float32)
    e2 = rng.uniform(-0.3, 0.3, (num_tris, 3)).astype(np.float32)
    pos = np.concatenate([v0, v0 + e1, v0 + e2], axis=0)
    faces = np.stack(
        [np.arange(num_tris), np.arange(num_tris) + num_tris,
         np.arange(num_tris) + 2 * num_tris], axis=1
    )
    b.add_mesh(pos, faces, m)
    # a few spheres too
    for i in range(8):
        b.add_sphere(rng.uniform(-1, 1, 3), 0.2, m)
    return b.build()


_traverse_jit = jax.jit(lambda scene, ro, rd: traverse(scene, ro, rd, impl='jax'))
_occluded_jit = jax.jit(lambda scene, ro, rd, dist: occluded(scene, ro, rd, dist, impl='jax'))
_traverse_dense_jit = jax.jit(lambda scene, ro, rd: traverse(scene, ro, rd, impl='dense'))


@jax.jit
def _brute_force(scene, ro, rd):
    T = scene["tri_v0"].shape[0]
    t_t, u, v, h = vm.intersect_tri(
        ro[:, None, :], rd[:, None, :],
        scene["tri_v0"][None], scene["tri_e1"][None], scene["tri_e2"][None],
        t_min=1e-4,
    )
    t_t = jnp.where(h, t_t, jnp.inf)
    t_s, hs = vm.intersect_sphere(
        ro[:, None, :], rd[:, None, :],
        scene["sph_center"][None], scene["sph_radius"][None], t_min=1e-4,
    )
    t_s = jnp.where(hs, t_s, jnp.inf)
    allt = jnp.concatenate([t_t, t_s], axis=1)
    best = jnp.argmin(allt, axis=1)
    tbest = jnp.min(allt, axis=1)
    return jnp.where(jnp.isfinite(tbest), best, -1), tbest


def test_bvh_links_wellformed():
    rng = np.random.default_rng(1)
    bmin = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    bmax = bmin + rng.uniform(0.01, 0.3, (500, 3)).astype(np.float32)
    bvh = build_bvh(bmin, bmax)
    K = bvh["nodes_bmin"].shape[0]
    assert np.all(bvh["nodes_hit"] < K) and np.all(bvh["nodes_miss"] < K)
    # prim_order is a permutation
    assert sorted(bvh["prim_order"].tolist()) == list(range(500))
    # leaves cover all prims exactly once
    leaf = bvh["nodes_prim_start"] >= 0
    assert bvh["nodes_prim_count"][leaf].sum() == 500


def test_traverse_matches_brute_force():
    scene = _random_tri_scene()
    rng = np.random.default_rng(2)
    N = 256
    ro = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    res = _traverse_jit(scene, ro, rd)
    bf_prim, bf_t = _brute_force(scene, ro, rd)
    hit = np.asarray(res["hit"])
    np.testing.assert_array_equal(hit, np.asarray(bf_prim) >= 0)
    # same t where hit (prim ids may differ on exact ties)
    np.testing.assert_allclose(
        np.asarray(res["t"])[hit], np.asarray(bf_t)[hit], rtol=1e-4, atol=1e-5
    )
    agree = np.asarray(res["prim"])[hit] == np.asarray(bf_prim)[hit]
    assert agree.mean() > 0.99


def test_any_hit_occlusion():
    scene = _random_tri_scene()
    rng = np.random.default_rng(3)
    N = 128
    ro = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    closest = _traverse_jit(scene, ro, rd)
    dist = jnp.full((N,), 10.0)
    occ = _occluded_jit(scene, ro, rd, dist)
    # occluded iff the closest hit is within range
    expect = np.asarray(closest["hit"]) & (np.asarray(closest["t"]) < 10.0 - 1e-3)
    np.testing.assert_array_equal(np.asarray(occ), expect)


def test_dense_matches_bvh():
    scene = _random_tri_scene()
    rng = np.random.default_rng(5)
    N = 256
    ro = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    a = _traverse_jit(scene, ro, rd)
    b = _traverse_dense_jit(scene, ro, rd)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    m = np.asarray(a["hit"])
    np.testing.assert_allclose(
        np.asarray(a["t"])[m], np.asarray(b["t"])[m], rtol=1e-5, atol=1e-5
    )
    assert (np.asarray(a["prim"])[m] == np.asarray(b["prim"])[m]).mean() > 0.99


def test_traverse_jit_compiles():
    scene = _random_tri_scene(num_tris=50)
    f = jax.jit(lambda ro, rd: traverse(scene, ro, rd)["t"])
    ro = jnp.zeros((16, 3))
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (16, 1))
    t = f(ro, rd)
    assert t.shape == (16,)
