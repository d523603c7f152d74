"""SBVH spatial-split builder (native/bvh_builder.cpp aten_build_sbvh)."""
import jax.numpy as jnp
import numpy as np
import pytest

from aten_tpu.accel.build import _load_native, build_bvh, build_sbvh
from aten_tpu.accel.traverse import traverse
from aten_tpu.scene.materials import MaterialType
from aten_tpu.scene.scene import SceneBuilder

needs_native = pytest.mark.skipif(
    _load_native() is None, reason="native builder unavailable"
)


def _long_tri_scene(n=200, seed=0):
    """Mix of long, axis-spanning slivers + small tris: the case spatial
    splits exist for."""
    rng = np.random.default_rng(seed)
    tris = []
    for i in range(n // 2):  # long slivers along x
        y, z = rng.uniform(-3, 3, 2)
        x0 = rng.uniform(-5, 0)
        tris.append([[x0, y, z], [x0 + rng.uniform(4, 8), y + 0.05, z],
                     [x0 + rng.uniform(2, 4), y, z + 0.05]])
    for i in range(n // 2):  # small tris
        c = rng.uniform(-4, 4, 3)
        tris.append(c[None] + rng.uniform(-0.2, 0.2, (3, 3)))
    return np.asarray(tris, np.float32)


def _boxes(tris):
    return tris.min(axis=1) - 1e-5, tris.max(axis=1) + 1e-5


@needs_native
def test_sbvh_well_formed_and_duplicates():
    tris = _long_tri_scene()
    bmin, bmax = _boxes(tris)
    sb = build_sbvh(bmin, bmax)
    P = len(tris)
    order = sb["prim_order"]
    # every prim referenced at least once; duplication allowed
    assert set(order.tolist()) == set(range(P))
    assert len(order) >= P
    # leaf ranges tile [0, R)
    ps = sb["nodes_prim_start"]
    pc = sb["nodes_prim_count"]
    spans = sorted(
        (int(s), int(s + c)) for s, c in zip(ps, pc) if s >= 0
    )
    cur = 0
    for s, e in spans:
        assert s == cur
        cur = e
    assert cur == len(order)


@needs_native
def test_sbvh_traversal_matches_sah():
    """Same closest hits as the object-split tree (duplicated refs never
    change visibility)."""
    tris = _long_tri_scene(n=300, seed=2)
    bmin, bmax = _boxes(tris)

    sb_builder = SceneBuilder()
    m = sb_builder.add_material(MaterialType.DIFFUSE, base_color=(0.5,) * 3)
    sb_builder.add_mesh(tris.reshape(-1, 3), np.arange(900).reshape(-1, 3), m)
    scene = sb_builder.build()

    sbvh = build_sbvh(bmin, bmax)
    scene_sbvh = scene.replace(
        **{k: jnp.asarray(v) for k, v in sbvh.items()}
    )

    rng = np.random.default_rng(3)
    ro = jnp.asarray(rng.uniform(-6, 6, (500, 3)).astype(np.float32))
    rd = rng.normal(size=(500, 3)).astype(np.float32)
    rd = jnp.asarray(rd / np.linalg.norm(rd, axis=1, keepdims=True))

    h0 = traverse(scene, ro, rd, impl="jax")
    h1 = traverse(scene_sbvh, ro, rd, impl="jax")
    np.testing.assert_array_equal(np.asarray(h0["hit"]), np.asarray(h1["hit"]))
    mask = np.asarray(h0["hit"])
    np.testing.assert_allclose(
        np.asarray(h0["t"])[mask], np.asarray(h1["t"])[mask], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(h0["prim"])[mask], np.asarray(h1["prim"])[mask]
    )


@needs_native
def test_sbvh_improves_sliver_sah_cost():
    """On the sliver scene, spatial splits must reduce the summed
    leaf-area x count proxy cost vs the object-split tree."""
    tris = _long_tri_scene(n=400, seed=5)
    bmin, bmax = _boxes(tris)
    plain = build_bvh(bmin, bmax, use_native=True)
    sbvh = build_sbvh(bmin, bmax)

    def leaf_cost(b):
        lo = b["nodes_bmin"]
        hi = b["nodes_bmax"]
        d = np.maximum(hi - lo, 0)
        area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
        leaf = b["nodes_prim_start"] >= 0
        return float((area[leaf] * b["nodes_prim_count"][leaf]).sum())

    assert leaf_cost(sbvh) < leaf_cost(plain) * 0.9
