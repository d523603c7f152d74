"""Toon / StylizedBrdf path-traced material tests.

Mirrors /root/reference/src/libaten/material/toon.cpp semantics:
toon-as-light at bounce 0 (HitTeminatedMaterial,
pathtracing_impl.h:453-509), remap-texture banding, rim light, and the
ToonSpecular stylized half vector.
"""
import jax.numpy as jnp
import numpy as np

from aten_tpu.integrator.pathtracer import render_image
from aten_tpu.scene.scenedefs import toon_scene


def test_stylized_half_reduces_to_ggx_half():
    """With all highlight controls at defaults the stylized H is the
    plain half vector."""
    from aten_tpu.shading.toon import stylized_half

    n = jnp.asarray([[0.0, 1.0, 0.0]] * 4)
    v = jnp.asarray([[0.3, 0.8, 0.1]] * 4)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    l = jnp.asarray([[-0.4, 0.7, 0.2]] * 4)
    l = l / jnp.linalg.norm(l, axis=-1, keepdims=True)
    mat = {
        "toon_hl_translation_t": jnp.zeros(4), "toon_hl_translation_b": jnp.zeros(4),
        "toon_hl_scale_t": jnp.zeros(4), "toon_hl_scale_b": jnp.zeros(4),
        "toon_hl_split_t": jnp.zeros(4), "toon_hl_split_b": jnp.zeros(4),
        "toon_hl_square_sharp": jnp.ones(4), "toon_hl_square_magnitude": jnp.zeros(4),
    }
    h = stylized_half(mat, n, v, l)
    h_ref = (v + l) / jnp.linalg.norm(v + l, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=1e-5)


def test_rim_light_bright_at_grazing():
    from aten_tpu.shading.toon import rim_light

    mat = {
        "toon_rim_enable": jnp.ones(2),
        "toon_rim_color": jnp.asarray([[1.0, 0.5, 0.25]] * 2),
        "toon_rim_width": jnp.full(2, 0.5),
        "toon_rim_softness": jnp.full(2, 0.5),
        "toon_rim_spread": jnp.ones(2),
    }
    n = jnp.asarray([[0.0, 0.0, 1.0]] * 2)
    # lane 0: grazing view; lane 1: head-on view
    rd = jnp.asarray([[-0.995, 0.0, -0.0999], [0.0, 0.0, -1.0]])
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    rim = np.asarray(rim_light(mat, n, rd))
    assert rim[0, 0] > 0.3          # grazing -> strong rim
    assert rim[1].max() < 1e-3      # head-on -> no rim
    np.testing.assert_allclose(rim[0] / rim[0, 0], [1.0, 0.5, 0.25], atol=1e-5)


def test_toon_scene_bands_and_termination():
    """The toon sphere must show quantized bands from the remap texture
    and terminate at bounce 0 (no indirect noise on the toon surface)."""
    scene, cam = toon_scene(96, 96)
    img = np.asarray(render_image(scene, cam, spp=4, max_depth=3))
    assert np.isfinite(img).all()
    # left sphere interior (diffuse-base toon): the lit side must show
    # band values from the ramp {0.18,0.45,0.8,1.0} * base_color
    patch = img[30:45, 18:40]  # on the left sphere
    assert patch.max() > 0.05  # lit
    # quantization: per-pixel green/red ratio fixed by base_color, and
    # few distinct luminance levels (bands + rim); sample unique rounded
    lum = (patch * [0.2126, 0.7152, 0.0722]).sum(-1)
    lit = lum[lum > 0.02]
    assert lit.size > 20
    levels = np.unique(np.round(lit / lum.max() * 20))
    assert levels.size <= 10  # banded, not a smooth gradient


def test_stylized_scene_renders():
    scene, cam = toon_scene(64, 64, stylized=True)
    img = np.asarray(render_image(scene, cam, spp=2, max_depth=2))
    assert np.isfinite(img).all()
    assert img.max() > 0.01
