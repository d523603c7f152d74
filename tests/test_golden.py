"""Pinned golden-image gates on the five BASELINE.md fixture configs
(SURVEY.md §4 implication (c): the reference validates visually via
gallery screenshots; here the renders are pinned and diffed in CI).

Sampling is pure-function (CMJ reseeded from frame/sample/pixel/bounce),
so the CPU oracle render of a fixed config is deterministic — goldens
compare tight.  Regenerate intentionally with tools/make_goldens.py and
review the diff.
"""
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    with np.load(path) as z:
        return z["img"]


def _assert_close(img, gold, name):
    img = np.asarray(img)
    assert img.shape == gold.shape, (img.shape, gold.shape)
    assert np.isfinite(img).all()
    # deterministic sampling -> near-bitwise; tolerance covers compiler
    # re-association across jax/XLA versions
    err = np.abs(img - gold)
    assert err.max() < 5e-3, f"{name}: max err {err.max()}"
    assert err.mean() < 5e-4, f"{name}: mean err {err.mean()}"


def test_golden_cornell():
    from aten_tpu.integrator.pathtracer import render_image
    from aten_tpu.scene.scenedefs import cornell_box

    scene, cam = cornell_box(64, 64)
    _assert_close(render_image(scene, cam, spp=16, max_depth=5),
                  _load("cornell"), "cornell")


def test_golden_mtrl_zoo():
    from aten_tpu.integrator.pathtracer import render_image
    from aten_tpu.scene.scenedefs import material_test_scene

    scene, cam = material_test_scene(96, 48)
    _assert_close(render_image(scene, cam, spp=8, max_depth=4),
                  _load("mtrl_zoo"), "mtrl_zoo")


def test_golden_sponza():
    from aten_tpu.integrator.pathtracer import render_image
    from aten_tpu.scene.scenedefs import sponza_scene

    scene, cam = sponza_scene(64, 64)
    _assert_close(render_image(scene, cam, spp=4, max_depth=3),
                  _load("sponza"), "sponza")


def test_golden_restir_lights():
    import jax.numpy as jnp

    from aten_tpu.integrator import restir
    from aten_tpu.scene.scenedefs import many_light_scene

    scene, cam = many_light_scene(64, 64, num_lights=32)
    st = restir.init_state(64, 64)
    img = None
    for f in range(2):
        img, st = restir.restir_direct_sample(
            scene, cam.arrays(), 64, 64, jnp.uint32(f), st
        )
    _assert_close(img, _load("restir_lights"), "restir_lights")


def test_golden_restir_gi():
    """Full-GI composition golden (VERDICT r4 #8: the direct-only golden
    existed, GI had only the convergence test): reservoir direct at
    bounce 0 + PT bounces, pinned bytes."""
    import jax.numpy as jnp

    from aten_tpu.integrator import restir
    from aten_tpu.scene.scenedefs import many_light_scene

    scene, cam = many_light_scene(64, 64, num_lights=32)
    st = restir.init_state(64, 64)
    img = None
    for f in range(2):
        img, st = restir.restir_gi_sample(
            scene, cam.arrays(), 64, 64, jnp.uint32(f), st,
            max_depth=3, rr_depth=2,
        )
    _assert_close(img, _load("restir_gi"), "restir_gi")


def test_golden_volume():
    from aten_tpu.integrator.volpt import render_volpt
    from aten_tpu.scene.scenedefs import hetero_volume_scene

    scene, cam = hetero_volume_scene(32, 32, res=24)
    _assert_close(render_volpt(scene, cam, spp=4, max_depth=6),
                  _load("volume"), "volume")
