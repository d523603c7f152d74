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
