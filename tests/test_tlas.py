"""Two-level TLAS/BLAS instancing (aten_tpu/accel/tlas.py).

Oracle strategy: an instanced scene must traverse identically to the
same geometry baked (pre-transformed) into a single-level scene.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from aten_tpu.accel.traverse import occluded, traverse
from aten_tpu.scene.materials import MaterialType
from aten_tpu.scene.scene import SceneBuilder


def _sphere_mesh(n=6):
    """Crude lat-long sphere triangulation (unit radius)."""
    th = np.linspace(0, np.pi, n + 1)
    ph = np.linspace(0, 2 * np.pi, 2 * n + 1)
    T, P = np.meshgrid(th, ph, indexing="ij")
    pos = np.stack(
        [np.sin(T) * np.cos(P), np.cos(T), np.sin(T) * np.sin(P)], axis=-1
    ).reshape(-1, 3)
    faces = []
    W = 2 * n + 1
    for i in range(n):
        for j in range(2 * n):
            a, b = i * W + j, i * W + j + 1
            c, d = (i + 1) * W + j, (i + 1) * W + j + 1
            faces += [[a, b, c], [b, d, c]]
    return pos.astype(np.float32), np.asarray(faces, np.int64)


def _ray_grid(n=24, z=5.0, span=3.0):
    xs = np.linspace(-span, span, n, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs)
    ro = np.stack([X.ravel(), Y.ravel(), np.full(n * n, z, np.float32)], -1)
    rd = np.tile(np.array([[0, 0, -1]], np.float32), (n * n, 1))
    return jnp.asarray(ro), jnp.asarray(rd)


def _translate(t):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = t
    return m


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return m


def test_identity_instance_matches_plain():
    pos, faces = _sphere_mesh()

    sb = SceneBuilder()
    m = sb.add_material(MaterialType.DIFFUSE, base_color=(0.7, 0.7, 0.7))
    sb.add_mesh(pos, faces, m)
    plain = sb.build()

    sb2 = SceneBuilder()
    m2 = sb2.add_material(MaterialType.DIFFUSE, base_color=(0.7, 0.7, 0.7))
    o = sb2.create_object()
    sb2.add_mesh(pos, faces, m2, obj=o)
    sb2.add_instance(o, np.eye(4))
    inst = sb2.build()
    assert inst["num_instances"] == 1

    ro, rd = _ray_grid()
    h0 = traverse(plain, ro, rd)
    h1 = traverse(inst, ro, rd)
    np.testing.assert_array_equal(np.asarray(h0["hit"]), np.asarray(h1["hit"]))
    np.testing.assert_allclose(
        np.asarray(h0["t"])[np.asarray(h0["hit"])],
        np.asarray(h1["t"])[np.asarray(h1["hit"])],
        rtol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(h0["prim"]), np.asarray(h1["prim"]))


def test_instances_match_baked_transforms():
    pos, faces = _sphere_mesh()
    offsets = [(-2.0, 0.0, 0.0), (2.0, 0.5, -1.0), (0.0, -1.5, 1.0)]

    # Baked: three translated copies as world geometry.
    sb = SceneBuilder()
    m = sb.add_material(MaterialType.DIFFUSE, base_color=(0.7, 0.7, 0.7))
    for off in offsets:
        sb.add_mesh(pos + np.asarray(off, np.float32), faces, m)
    baked = sb.build()

    # Instanced: one object, three instances.
    sb2 = SceneBuilder()
    m2 = sb2.add_material(MaterialType.DIFFUSE, base_color=(0.7, 0.7, 0.7))
    o = sb2.create_object()
    sb2.add_mesh(pos, faces, m2, obj=o)
    for off in offsets:
        sb2.add_instance(o, _translate(off))
    inst = sb2.build()
    assert inst["num_instances"] == 3

    ro, rd = _ray_grid()
    h0 = traverse(baked, ro, rd)
    h1 = traverse(inst, ro, rd)
    np.testing.assert_array_equal(np.asarray(h0["hit"]), np.asarray(h1["hit"]))
    mask = np.asarray(h0["hit"])
    np.testing.assert_allclose(
        np.asarray(h0["t"])[mask], np.asarray(h1["t"])[mask], rtol=1e-4, atol=1e-5
    )
    # Baked prim id is instance-major; instanced id is object-local.
    F = len(faces)
    np.testing.assert_array_equal(
        np.asarray(h0["prim"])[mask] % F, np.asarray(h1["prim"])[mask]
    )
    np.testing.assert_array_equal(
        np.asarray(h0["prim"])[mask] // F, np.asarray(h1["inst"])[mask]
    )


def test_rotated_instance_normals():
    """Instanced analytic sphere under rotation+translation: eval_hit's
    world normal must equal the geometric sphere normal."""
    from aten_tpu.integrator.pathtracer import eval_hit

    sb = SceneBuilder()
    m = sb.add_material(MaterialType.DIFFUSE, base_color=(0.5, 0.5, 0.5))
    o = sb.create_object()
    sb.add_sphere((0, 0, 0), 1.0, m, obj=o)
    mtx = _translate((1.0, 2.0, 0.0)) @ _rot_y(0.7)
    sb.add_instance(o, mtx)
    sc = sb.build()

    ro, rd = _ray_grid(n=16, z=5.0, span=0.8)
    ro = ro + jnp.asarray([1.0, 2.0, 0.0])
    h = traverse(sc, ro, rd)
    assert bool(np.asarray(h["hit"]).any())
    res = eval_hit(sc, ro, rd, h)
    mask = np.asarray(h["hit"])
    p = np.asarray(res["p"])[mask]
    n = np.asarray(res["ns"])[mask]
    expect = p - np.array([1.0, 2.0, 0.0], np.float32)
    expect /= np.linalg.norm(expect, axis=1, keepdims=True)
    np.testing.assert_allclose(n, expect, atol=1e-4)


def test_occlusion_through_instance():
    pos, faces = _sphere_mesh()
    sb = SceneBuilder()
    m = sb.add_material(MaterialType.DIFFUSE, base_color=(0.5, 0.5, 0.5))
    o = sb.create_object()
    sb.add_mesh(pos, faces, m, obj=o)
    sb.add_instance(o, _translate((0.0, 0.0, 0.0)))
    sc = sb.build()

    ro = jnp.asarray([[0.0, 0.0, 4.0], [3.0, 0.0, 4.0]], jnp.float32)
    rd = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
    occ = np.asarray(occluded(sc, ro, rd, jnp.asarray([8.0, 8.0])))
    assert occ[0] and not occ[1]


def test_instanced_render_smoke():
    """End-to-end: a tiny Cornell-like box with an instanced sphere grid
    renders finite, nonzero radiance."""
    from aten_tpu.integrator.pathtracer import render_sample

    sb = SceneBuilder()
    white = sb.add_material(MaterialType.DIFFUSE, base_color=(0.7, 0.7, 0.7))
    lm = sb.add_material(MaterialType.EMISSIVE, base_color=(12.0, 12.0, 12.0))
    # floor + light (world geometry)
    sb.add_quad((-4, 0, -4), (4, 0, -4), (4, 0, 4), (-4, 0, 4), white)
    ls, lc = sb.add_quad((-1, 6, -1), (1, 6, -1), (1, 6, 1), (-1, 6, 1), lm)
    sb.add_area_light_tris(ls, lc, (12.0, 12.0, 12.0))
    o = sb.create_object()
    sb.add_sphere((0, 0, 0), 0.5, white, obj=o)
    for i in range(3):
        for j in range(3):
            sb.add_instance(o, _translate((i * 1.5 - 1.5, 0.5, j * 1.5 - 1.5)))
    sc = sb.build()

    from aten_tpu.core.camera import PinholeCamera

    cam = PinholeCamera(
        origin=(0, 3, 9), lookat=(0, 1, 0), up=(0, 1, 0), vfov_deg=40,
        width=32, height=32,
    )
    img = np.asarray(
        render_sample(sc, cam.arrays(), 32, 32, jnp.uint32(0), jnp.uint32(0),
                      1, 4, 2)
    )
    assert np.isfinite(img).all()
    assert img.max() > 0.0


def test_instanced_pallas_layout_well_formed():
    """The tt_* instanced-kernel arrays: links in pool range (or the
    -1/-2 sentinels), TLAS leaves point at their object's BLAS root,
    fat-leaf prim ranges stay inside the padded prim rows."""
    pos, faces = _sphere_mesh(n=10)
    sb = SceneBuilder()
    m = sb.add_material(MaterialType.DIFFUSE, base_color=(0.7, 0.7, 0.7))
    o = sb.create_object()
    sb.add_mesh(pos, faces, m, obj=o)
    for k in range(5):
        sb.add_instance(o, _translate((k * 3.0, 0.0, 0.0)))
    sc = sb.build()
    assert "tt_nodes" in sc
    nodes = np.asarray(sc["tt_nodes"])
    ints = nodes[:, 6:11].view(np.int32)
    K = nodes.shape[0]
    hit, miss, start, count, inst = (ints[:, k] for k in range(5))
    assert ((hit >= -2) & (hit < K)).all()
    assert ((miss >= -2) & (miss < K)).all()
    P_rows = np.asarray(sc["tt_prims"]).shape[0]
    fat = start >= 0
    assert ((start[fat] + count[fat]) <= P_rows).all()
    # every instance appears at exactly one TLAS leaf
    leaves = inst[inst >= 0]
    assert sorted(leaves.tolist()) == list(range(5))
