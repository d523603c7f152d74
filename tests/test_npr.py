"""NPR toon + feature-line tests."""
import jax.numpy as jnp
import numpy as np

from aten_tpu.integrator.npr import ToonParams, feature_lines, render_npr
from aten_tpu.integrator.pathtracer import render_sample_with_aovs
from aten_tpu.scene.scenedefs import cornell_box, material_test_scene


def test_npr_renders():
    scene, cam = material_test_scene(32, 32)
    img = np.asarray(render_npr(scene, cam))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()


def test_feature_lines_where_expected():
    scene, cam = cornell_box(48, 48)
    _, aovs = render_sample_with_aovs(
        scene, cam.arrays(), 48, 48, jnp.uint32(0), jnp.uint32(0), 1, 2, 1
    )
    lines = np.asarray(feature_lines(aovs, ToonParams()))
    # some edges (sphere silhouettes, wall corners), but not everywhere
    assert 0.02 < lines.mean() < 0.6
    # flat back-wall interior nearly line-free (1spp jitter -> rare specks)
    assert lines[16:24, 12:22].mean() < 0.1


def test_toon_ramp_quantizes():
    scene, cam = cornell_box(48, 48)
    img = np.asarray(render_npr(scene, cam))
    wall = img[24:34, 6:12, 0]  # left wall patch, smooth irradiance
    assert len(np.unique(np.round(wall, 2))) <= 12
