"""Reverse-mode pixel gradients vs finite differences (BASELINE.md
north star: d pixel / d {material, light} params)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aten_tpu.integrator.pathtracer import _trace_paths
from aten_tpu.scene.scenedefs import cornell_box


@pytest.fixture(scope="module")
def setup():
    scene, cam = cornell_box(16, 16)
    return scene, cam.arrays()


def _loss(base_color, scene, ca):
    mats = dict(scene["materials"])
    mats["base_color"] = base_color
    s2 = scene.replace(materials=mats)
    rad = _trace_paths(s2, ca, 16, 16, jnp.uint32(0), jnp.uint32(0), 1, 3, 2)
    return jnp.mean(rad)


def test_grad_matches_finite_difference(setup):
    scene, ca = setup
    bc = scene["materials"]["base_color"]
    g = jax.jit(jax.grad(_loss))(bc, scene, ca)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # white wall albedo (material 0) must have positive gradient on mean
    assert g[0].sum() > 0
    # finite-difference check on the white-wall red channel
    eps = 1e-2
    f = jax.jit(_loss)
    bc_p = bc.at[0, 0].add(eps)
    bc_m = bc.at[0, 0].add(-eps)
    fd = (float(f(bc_p, scene, ca)) - float(f(bc_m, scene, ca))) / (2 * eps)
    rel = abs(fd - g[0, 0]) / max(abs(fd), 1e-6)
    assert rel < 0.15, (fd, g[0, 0])


def test_grad_wrt_emission(setup):
    scene, ca = setup

    def loss_e(le_scale):
        mats = dict(scene["materials"])
        mats["base_color"] = mats["base_color"].at[3].mul(le_scale)
        s2 = scene.replace(materials=mats)
        rad = _trace_paths(s2, ca, 16, 16, jnp.uint32(0), jnp.uint32(0), 1, 3, 2)
        return jnp.mean(rad)

    g = float(jax.jit(jax.grad(loss_e))(jnp.float32(1.0)))
    assert np.isfinite(g)
    assert g > 0  # brighter light -> brighter image


@pytest.fixture(scope="module")
def textured_setup():
    """A lit quad with a 4x4 albedo texture filling the view."""
    from aten_tpu.core.camera import PinholeCamera
    from aten_tpu.scene.materials import MaterialType
    from aten_tpu.scene.scene import SceneBuilder

    b = SceneBuilder()
    tex = np.full((4, 4, 3), 0.5, np.float32)
    tid = b.add_texture(tex)
    m = b.add_material(MaterialType.DIFFUSE, base_color=(1, 1, 1),
                       albedo_map=tid)
    b.add_quad((-2, -2, 0), (2, -2, 0), (2, 2, 0), (-2, 2, 0), m)
    emit = b.add_material(MaterialType.EMISSIVE, base_color=(8, 8, 8))
    # winding: normal faces -z, toward the textured quad
    ls, lc = b.add_quad((-1, -1, 3), (-1, 1, 3), (1, 1, 3), (1, -1, 3), emit)
    b.add_area_light_tris(ls, lc, le=(8, 8, 8))
    scene = b.build()
    cam = PinholeCamera(origin=(0, 0, 2.2), lookat=(0, 0, 0), vfov_deg=60,
                        width=16, height=16)
    return scene, cam.arrays()


def test_grad_wrt_texture_texels(textured_setup):
    """d pixel / d texel (albedo map) vs finite differences — the
    texture-parameter leg of the BASELINE.md north star."""
    scene, ca = textured_setup

    def loss_t(stack):
        s2 = scene.replace(tex_stack=stack)
        rad = _trace_paths(s2, ca, 16, 16, jnp.uint32(0), jnp.uint32(0), 1, 2, 2)
        return jnp.mean(rad)

    stack = scene["tex_stack"]
    g = np.asarray(jax.jit(jax.grad(loss_t))(stack))
    assert np.isfinite(g).all()
    # the quad has constant uv=0, so gradient concentrates at texel (0,0)
    assert g[0, 0, 0, :3].sum() > 0
    eps = 1e-2
    f = jax.jit(loss_t)
    sp = stack.at[0, 0, 0, 0].add(eps)
    sm = stack.at[0, 0, 0, 0].add(-eps)
    fd = (float(f(sp)) - float(f(sm))) / (2 * eps)
    rel = abs(fd - g[0, 0, 0, 0]) / max(abs(fd), 1e-6)
    assert rel < 0.15, (fd, g[0, 0, 0, 0])


def test_grad_wrt_light_params(setup):
    """d pixel / d {light radiance, light position} vs finite
    differences — the light-parameter leg of the north star."""
    scene, ca = setup

    def loss_le(le):
        lights = dict(scene["lights"])
        lights["le"] = le
        s2 = scene.replace(lights=lights)
        rad = _trace_paths(s2, ca, 16, 16, jnp.uint32(0), jnp.uint32(0), 1, 3, 2)
        return jnp.mean(rad)

    le = scene["lights"]["le"]
    g = np.asarray(jax.jit(jax.grad(loss_le))(le))
    assert np.isfinite(g).all()
    assert g[0].sum() > 0  # brighter emitter -> brighter image
    eps = 0.5
    f = jax.jit(loss_le)
    fd = (float(f(le.at[0, 0].add(eps))) - float(f(le.at[0, 0].add(-eps)))) / (2 * eps)
    rel = abs(fd - g[0, 0]) / max(abs(fd), 1e-6)
    assert rel < 0.15, (fd, g[0, 0])

    # position gradient needs a singular light (area lights sample their
    # triangles, not the pos field): a point-lit quad
    from aten_tpu.core.camera import PinholeCamera
    from aten_tpu.scene.materials import MaterialType
    from aten_tpu.scene.scene import SceneBuilder

    b = SceneBuilder()
    m = b.add_material(MaterialType.DIFFUSE, base_color=(0.8, 0.8, 0.8))
    b.add_quad((-2, -2, 0), (2, -2, 0), (2, 2, 0), (-2, 2, 0), m)
    b.add_point_light((0.5, 0.5, 2.0), (6, 6, 6))
    ps = b.build()
    pcam = PinholeCamera(origin=(0, 0, 2.5), lookat=(0, 0, 0), vfov_deg=60,
                         width=16, height=16)
    pca = pcam.arrays()

    def loss_pos(pos):
        lights = dict(ps["lights"])
        lights["pos"] = pos
        s2 = ps.replace(lights=lights)
        rad = _trace_paths(s2, pca, 16, 16, jnp.uint32(0), jnp.uint32(0), 1, 2, 2)
        return jnp.mean(rad)

    pos = ps["lights"]["pos"]
    gp = np.asarray(jax.jit(jax.grad(loss_pos))(pos))
    assert np.isfinite(gp).all()
    assert np.abs(gp[0]).sum() > 0  # moving the emitter changes the image
    eps = 5e-2
    fp = jax.jit(loss_pos)
    fd = (float(fp(pos.at[0, 2].add(eps)))
          - float(fp(pos.at[0, 2].add(-eps)))) / (2 * eps)
    rel = abs(fd - gp[0, 2]) / max(abs(fd), 1e-6)
    assert rel < 0.15, (fd, gp[0, 2])
