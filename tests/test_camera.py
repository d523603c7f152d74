"""Pinhole camera tests (mirrors aten_unittest/pinhole_camera.cpp:6-16)."""
import math

import jax.numpy as jnp
import numpy as np

from aten_tpu.core import camera as cam_mod


def test_pixel_width_matches_fov():
    cam = cam_mod.PinholeCamera(
        origin=(0, 0, 0), lookat=(0, 0, -1), vfov_deg=60.0, width=640, height=480
    )
    depth = 10.0
    expected = 2.0 * depth * math.tan(math.radians(60.0) / 2) / 480
    assert abs(cam.pixel_width_at(depth) - expected) < 1e-6


def test_center_ray_points_forward():
    cam = cam_mod.PinholeCamera(
        origin=(1, 2, 3), lookat=(1, 2, -5), width=64, height=64
    )
    arr = cam.arrays()
    ro, rd = cam_mod.generate_ray(arr, jnp.asarray([0.5]), jnp.asarray([0.5]))
    np.testing.assert_allclose(np.asarray(ro)[0], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd)[0], [0, 0, -1], atol=1e-5)


def test_rays_are_normalized_and_diverge():
    cam = cam_mod.PinholeCamera(
        origin=(0, 0, 0), lookat=(0, 0, -1), vfov_deg=90.0, width=8, height=8
    )
    arr = cam.arrays()
    s = jnp.linspace(0.05, 0.95, 8)
    t = jnp.full((8,), 0.5)
    _, rd = cam_mod.generate_ray(arr, s, t)
    lens = np.linalg.norm(np.asarray(rd), axis=-1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)
    assert np.asarray(rd)[0, 0] < 0 and np.asarray(rd)[-1, 0] > 0
