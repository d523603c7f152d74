"""End-to-end integrator tests on the Cornell fixture (golden-style gates
the reference never had — SURVEY.md §4)."""
import jax.numpy as jnp
import numpy as np
import pytest

from aten_tpu.integrator.pathtracer import render_image, render_sample
from aten_tpu.scene.scenedefs import cornell_box


@pytest.fixture(scope="module")
def tiny_cornell():
    return cornell_box(32, 32)


def test_cornell_renders_sane(tiny_cornell):
    scene, cam = tiny_cornell
    img = np.asarray(render_image(scene, cam, spp=4, max_depth=4))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.mean() > 0.05  # light reaches the film
    # color bleeding direction: left wall red-dominant, right green-dominant
    left = img[8:24, :6].mean(axis=(0, 1))
    right = img[8:24, -6:].mean(axis=(0, 1))
    assert left[0] > left[1]
    assert right[1] > right[0]


def test_render_deterministic(tiny_cornell):
    scene, cam = tiny_cornell
    a = np.asarray(render_image(scene, cam, spp=2, max_depth=3))
    b = np.asarray(render_image(scene, cam, spp=2, max_depth=3))
    np.testing.assert_array_equal(a, b)


def test_samples_decorrelated(tiny_cornell):
    scene, cam = tiny_cornell
    ca = cam.arrays()
    s0 = np.asarray(
        render_sample(scene, ca, 32, 32, jnp.uint32(0), jnp.uint32(0), 2, 3, 2)
    )
    s1 = np.asarray(
        render_sample(scene, ca, 32, 32, jnp.uint32(0), jnp.uint32(1), 2, 3, 2)
    )
    assert not np.array_equal(s0, s1)


def test_variance_decreases_with_spp(tiny_cornell):
    scene, cam = tiny_cornell
    ref = np.asarray(render_image(scene, cam, spp=16, max_depth=3, frame=7))
    lo = np.asarray(render_image(scene, cam, spp=1, max_depth=3))
    hi = np.asarray(render_image(scene, cam, spp=8, max_depth=3))
    err_lo = np.abs(lo - ref).mean()
    err_hi = np.abs(hi - ref).mean()
    assert err_hi < err_lo
