"""Presentation post-ops (aten_tpu/display) and asset I/O (aten_tpu/io)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from aten_tpu.display.atrous import atrous
from aten_tpu.display.taa import TAAParams, init_history, taa_step
from aten_tpu.display.tonemap import (
    exposure, gamma, gt_tonemap, magnifier, srgb_oetf,
)
from aten_tpu.io.hdr import read_hdr, write_hdr
from aten_tpu.io.image import load_image, save_image
from aten_tpu.io.material_io import (
    export_materials_xml, load_materials_json, load_materials_xml,
)
from aten_tpu.io.obj_writer import write_mtl, write_obj
from aten_tpu.scene.materials import MaterialType
from aten_tpu.scene.scene import SceneBuilder


# -- tone mapping ----------------------------------------------------------

def test_gt_tonemap_properties():
    x = jnp.linspace(0.0, 8.0, 256).reshape(16, 16, 1)
    img = jnp.tile(x, (1, 1, 3))
    y = np.asarray(gt_tonemap(img))
    assert np.isfinite(y).all()
    # gray in, gray out (chromaticity preserved)
    np.testing.assert_allclose(y[..., 0], y[..., 1], atol=1e-4)
    # monotone in luminance, and bounded by max monitor luminance
    lum = y[..., 1].ravel()
    assert (np.diff(lum) > -1e-4).all()
    assert lum.max() <= 1.0 + 1e-3
    # linear segment: values just above the toe pass through ~unchanged
    mid = np.asarray(gt_tonemap(jnp.full((1, 1, 3), 0.3)))[0, 0, 1]
    np.testing.assert_allclose(mid, 0.3, atol=0.02)


def test_srgb_and_gamma():
    img = jnp.asarray([[[0.0, 0.5, 1.0]]])
    s = np.asarray(srgb_oetf(img))
    assert s[0, 0, 0] == 0.0
    np.testing.assert_allclose(s[0, 0, 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gamma(img))[0, 0, 1], 0.5 ** (1 / 2.2), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(exposure(img, ev=1.0)), np.asarray(img) * 2.0
    )


def test_magnifier_ring_and_zoom():
    H = W = 64
    img = jnp.zeros((H, W, 3), jnp.float32).at[32, 40].set(
        jnp.asarray([0.0, 1.0, 0.0])
    )
    out = np.asarray(
        magnifier(img, center_px=(32.0, 32.0), magnification=0.5, radius=20.0)
    )
    assert out.shape == (H, W, 3)
    # ring drawn in red
    assert (out[..., 0] == 1.0).any()
    # the green dot at x=40 (8px from center) appears magnified at x=48
    assert out[32, 48, 1] == 1.0


# -- TAA -------------------------------------------------------------------

def test_taa_reduces_noise_static_camera():
    from aten_tpu.core.camera import PinholeCamera, camera_matrices

    H = W = 32
    cam = PinholeCamera(origin=(0, 0, 5), lookat=(0, 0, 0), width=W, height=H)
    w2v, v2c = camera_matrices(cam)
    rng = np.random.default_rng(0)
    clean = np.full((H, W, 3), 0.5, np.float32)
    pos = np.zeros((H, W, 3), np.float32)  # plane at origin-ish
    # world positions matching each pixel ray at z=0 plane: approximate by
    # projecting is exact enough for a static camera (reprojects to self).
    depth = np.ones((H, W), np.float32)

    hist = init_history(H, W)
    var0 = None
    out = None
    for frame in range(6):
        noisy = clean + rng.normal(0, 0.2, clean.shape).astype(np.float32)
        out, hist = taa_step(
            jnp.asarray(noisy), jnp.asarray(pos), jnp.asarray(depth),
            hist, w2v, v2c, TAAParams(blend=0.2, clip_gamma=10.0),
        )
        if frame == 0:
            var0 = float(np.var(np.asarray(out) - clean))
    varN = float(np.var(np.asarray(out) - clean))
    assert varN < var0 * 0.7  # accumulation suppressed noise


# -- a-trous ---------------------------------------------------------------

def test_atrous_smooths_but_keeps_edges():
    H = W = 64
    rng = np.random.default_rng(1)
    left = 0.2, 1.0
    img = np.full((H, W, 3), 0.2, np.float32)
    img[:, W // 2 :] = 1.0
    noisy = img + rng.normal(0, 0.1, img.shape).astype(np.float32)
    normal = np.tile([[0.0, 0.0, 1.0]], (H * W, 1)).reshape(H, W, 3)
    depth = np.zeros((H, W), np.float32)
    depth[:, W // 2 :] = 5.0  # depth edge at the boundary
    out = np.asarray(
        atrous(jnp.asarray(noisy), jnp.asarray(normal), jnp.asarray(depth),
               iters=3)
    )
    # noise reduced on flats
    assert np.std(out[:, : W // 2 - 4]) < np.std(noisy[:, : W // 2 - 4]) * 0.6
    # edge magnitude preserved
    assert abs(out[:, W // 2 + 4].mean() - out[:, W // 2 - 4].mean()) > 0.6


# -- HDR / image I/O -------------------------------------------------------

@pytest.mark.parametrize("rle", [False, True])
def test_hdr_roundtrip(tmp_path, rle):
    rng = np.random.default_rng(2)
    img = (rng.uniform(0, 1, (17, 23, 3)) ** 2 * 10.0).astype(np.float32)
    img[3:6] = 2.0  # constant rows exercise RLE runs
    img[:, 10:14] = 0.0
    p = str(tmp_path / "x.hdr")
    write_hdr(p, img, rle=rle)
    back = read_hdr(p)
    assert back.shape == img.shape
    # RGBE shares one exponent per pixel: error bound is the per-pixel
    # channel max / 256 (8-bit mantissa), not a per-channel rtol.
    bound = img.max(axis=-1, keepdims=True) / 256.0 + 1e-3
    assert (np.abs(back - img) <= bound).all()


def test_ldr_roundtrip(tmp_path):
    img = np.linspace(0, 1, 8 * 8 * 3).reshape(8, 8, 3).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_image(p, img)
    back = load_image(p)
    np.testing.assert_allclose(back, img, atol=0.01)


# -- material XML/JSON -----------------------------------------------------

_XML = """<?xml version="1.0"?>
<root>
  <material>
    <name>red_wall</name><type>diffuse</type>
    <baseColor>0.8 0.1 0.1</baseColor>
  </material>
  <material>
    <name>glass</name><type>refraction</type>
    <baseColor>1 1 1</baseColor><ior>1.7</ior>
  </material>
  <material>
    <name>metal</name><type>ggx</type>
    <baseColor>0.9 0.8 0.7</baseColor><roughness>0.15</roughness>
  </material>
</root>
"""


def test_material_xml_load(tmp_path):
    p = tmp_path / "m.xml"
    p.write_text(_XML)
    sb = SceneBuilder()
    ids = load_materials_xml(sb, str(p))
    assert set(ids) == {"red_wall", "glass", "metal"}
    rows = sb.materials.rows
    assert rows[ids["red_wall"]]["type"] == int(MaterialType.DIFFUSE)
    assert rows[ids["glass"]]["type"] == int(MaterialType.REFRACTION)
    assert rows[ids["glass"]]["ior"] == 1.7
    assert rows[ids["metal"]]["roughness"] == 0.15
    np.testing.assert_allclose(
        rows[ids["red_wall"]]["base_color"], (0.8, 0.1, 0.1)
    )


def test_material_export_import_roundtrip(tmp_path):
    sb = SceneBuilder()
    sb.add_material(MaterialType.GGX, base_color=(0.2, 0.4, 0.6), roughness=0.3)
    sb.add_material(MaterialType.DIFFUSE, base_color=(1.0, 0.5, 0.25))
    p = tmp_path / "out.xml"
    export_materials_xml(str(p), sb.materials, names=["a", "b"])
    sb2 = SceneBuilder()
    ids = load_materials_xml(sb2, str(p))
    assert sb2.materials.rows[ids["a"]]["type"] == int(MaterialType.GGX)
    np.testing.assert_allclose(
        sb2.materials.rows[ids["b"]]["base_color"], (1.0, 0.5, 0.25)
    )


def test_material_json_load(tmp_path):
    p = tmp_path / "m.json"
    p.write_text(
        '{"materials": [{"name": "d", "type": "disney", '
        '"baseColor": [0.5, 0.5, 0.5], "metallic": 0.8}]}'
    )
    sb = SceneBuilder()
    ids = load_materials_json(sb, str(p))
    assert sb.materials.rows[ids["d"]]["type"] == int(MaterialType.DISNEY)
    assert sb.materials.rows[ids["d"]]["metallic"] == 0.8


# -- OBJ writer ------------------------------------------------------------

def test_obj_write_load_roundtrip(tmp_path):
    from aten_tpu.scene.objloader import load_obj

    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    nml = np.tile([[0, 0, 1]], (4, 1)).astype(np.float32)
    obj_p = str(tmp_path / "quad.obj")
    mtl_p = str(tmp_path / "quad.mtl")
    sb_src = SceneBuilder()
    sb_src.add_material(MaterialType.DIFFUSE, base_color=(0.3, 0.6, 0.9))
    write_mtl(mtl_p, sb_src.materials, names=["mat0"])
    write_obj(obj_p, pos, faces, nml=nml, face_mtl=[0, 0],
              mtl_names=["mat0"], mtl_path=mtl_p)

    sb = SceneBuilder()
    load_obj(sb, obj_p)
    scene = sb.build()
    assert scene["num_tris"] == 2
    np.testing.assert_allclose(
        sb.materials.rows[0]["base_color"], (0.3, 0.6, 0.9), atol=1e-6
    )
