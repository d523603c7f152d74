"""Checkpoint/resume (utils/checkpoint.py) and camera additions
(EquirectCamera, CameraOperator, ThinLens)."""
import jax.numpy as jnp
import numpy as np
import pytest

from aten_tpu.core.camera import (
    CameraOperator, EquirectCamera, PinholeCamera, ThinLensCamera,
    generate_ray, generate_ray_thinlens,
)
from aten_tpu.integrator.film import Film
from aten_tpu.utils.checkpoint import (
    load_checkpoint, render_state, restore_render_state, save_checkpoint,
)


def test_film_checkpoint_resume_bit_identical(tmp_path):
    """Render 4 samples straight vs 2 + checkpoint + resume + 2: the
    progressive averages must match exactly (pure-function sampling)."""
    from aten_tpu.integrator.pathtracer import render_sample
    from aten_tpu.scene.scenedefs import cornell_box

    scene, cam = cornell_box(24, 24)
    ca = cam.arrays()

    def sample(s):
        return render_sample(
            scene, ca, 24, 24, jnp.uint32(0), jnp.uint32(s), 4, 3, 2
        )

    f_direct = Film(24, 24)
    for s in range(4):
        f_direct.accumulate(sample(s))

    f_a = Film(24, 24)
    for s in range(2):
        f_a.accumulate(sample(s))
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, render_state(f_a, frame=0))
    st = load_checkpoint(p)
    f_b = Film(24, 24)
    frame, _ = restore_render_state(st, f_b)
    assert frame == 0
    assert f_b.count == 2
    for s in range(2, 4):
        f_b.accumulate(sample(s))
    np.testing.assert_array_equal(
        np.asarray(f_direct.image()), np.asarray(f_b.image())
    )


def test_checkpoint_nested_scene_arrays(tmp_path):
    from aten_tpu.scene.scenedefs import cornell_box

    scene, cam = cornell_box(16, 16)
    f = Film(16, 16)
    f.accumulate(jnp.ones((16, 16, 3)))
    p = str(tmp_path / "full.npz")
    save_checkpoint(p, render_state(f, frame=3, scene=scene))
    st = load_checkpoint(p)
    assert int(st["frame"]) == 3
    f2 = Film(16, 16)
    frame, scene2 = restore_render_state(st, f2, scene)
    assert frame == 3
    np.testing.assert_allclose(
        np.asarray(scene2["materials"]["base_color"]),
        np.asarray(scene["materials"]["base_color"]),
    )


def test_equirect_camera_directions():
    cam = EquirectCamera(origin=(0, 0, 0), lookat=(0, 0, 1), width=8, height=4)
    ca = cam.arrays()
    s = jnp.asarray([0.5, 0.0, 0.25, 0.75])
    t = jnp.asarray([0.5, 0.5, 0.5, 0.5])
    ro, rd = generate_ray(ca, s, t)
    rd = np.asarray(rd)
    np.testing.assert_allclose(rd[0], [0, 0, 1], atol=1e-5)   # center: fwd
    np.testing.assert_allclose(rd[1], [0, 0, -1], atol=1e-5)  # edge: back
    # camera right is world -x when looking down +z with up +y
    np.testing.assert_allclose(rd[2], [1, 0, 0], atol=1e-5)   # quarter: left
    np.testing.assert_allclose(rd[3], [-1, 0, 0], atol=1e-5)  # quarter: right
    # poles
    _, rd_up = generate_ray(ca, jnp.asarray([0.5]), jnp.asarray([0.999]))
    assert np.asarray(rd_up)[0][1] > 0.99
    # all directions unit length
    ss, tt = jnp.meshgrid(jnp.linspace(0, 1, 16), jnp.linspace(0.01, 0.99, 8))
    _, rds = generate_ray(ca, ss.ravel(), tt.ravel())
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rds), axis=1), 1.0, atol=1e-5
    )


def test_camera_operator_ops():
    cam = PinholeCamera(origin=(0, 0, 5), lookat=(0, 0, 0), width=8, height=8)
    # dolly forward reduces distance, never crosses the target
    c2 = CameraOperator.dolly(cam, 2.0)
    assert np.linalg.norm(c2.origin) == pytest.approx(3.0, abs=1e-5)
    c3 = CameraOperator.dolly(cam, 100.0)
    assert np.linalg.norm(c3.origin) > 0.0
    # orbit 90deg yaw keeps radius, moves to the side
    c4 = CameraOperator.orbit(cam, np.pi / 2, 0.0)
    assert np.linalg.norm(c4.origin) == pytest.approx(5.0, abs=1e-4)
    assert abs(c4.origin[0]) == pytest.approx(5.0, abs=1e-3)
    # orbit pitch raises the eye
    c5 = CameraOperator.orbit(cam, 0.0, 0.5)
    assert c5.origin[1] > 0.5
    assert np.linalg.norm(c5.origin) == pytest.approx(5.0, abs=1e-4)
    # pan shifts both endpoints
    c6 = CameraOperator.pan(cam, 1.0, 0.0)
    assert np.linalg.norm(np.asarray(c6.lookat) - np.asarray(cam.lookat)) > 0.5


def test_thinlens_focus_plane_sharp():
    """Points on the focal plane project identically for any lens sample."""
    cam = ThinLensCamera(
        origin=(0, 0, 5), lookat=(0, 0, 0), width=8, height=8,
        lens_radius=0.2, focus_dist=5.0,
    )
    ca = cam.arrays()
    s = jnp.asarray([0.3])
    t = jnp.asarray([0.7])
    hits = []
    for u1, u2 in [(0.0, 0.0), (0.5, 0.25), (0.99, 0.8)]:
        ro, rd = generate_ray_thinlens(
            ca, s, t, jnp.asarray([u1]), jnp.asarray([u2])
        )
        # intersect with the focal plane z = 0
        tau = (0.0 - np.asarray(ro)[0, 2]) / np.asarray(rd)[0, 2]
        hits.append(np.asarray(ro)[0] + tau * np.asarray(rd)[0])
    hits = np.asarray(hits)
    np.testing.assert_allclose(hits[0], hits[1], atol=1e-5)
    np.testing.assert_allclose(hits[0], hits[2], atol=1e-5)
