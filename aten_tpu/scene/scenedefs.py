"""Built-in test scenes.

Counterpart of the reference's compile-time scene library
src/common/scenedefs.{h,cpp} (23 scenes selected by `#define Scene`,
scenedefs.h:261).  Here scenes are plain functions returning
(SceneData, camera) — no compile-time linkage.
"""
from __future__ import annotations

import numpy as np

from aten_tpu.core.camera import PinholeCamera
from aten_tpu.scene.materials import MaterialType
from aten_tpu.scene.scene import SceneBuilder


def cornell_box(width=512, height=512, use_spheres=True):
    """The classic Cornell box (CornellBoxScene role, scenedefs.cpp).

    Walls are quads; contents are two spheres (mirror + glass) like the
    reference's sphere Cornell; ceiling quad area light.
    """
    b = SceneBuilder()
    white = b.add_material(MaterialType.DIFFUSE, base_color=(0.73, 0.73, 0.73))
    red = b.add_material(MaterialType.DIFFUSE, base_color=(0.65, 0.05, 0.05))
    green = b.add_material(MaterialType.DIFFUSE, base_color=(0.12, 0.45, 0.15))
    emit = b.add_material(MaterialType.EMISSIVE, base_color=(36.0, 33.0, 26.0))
    mirror = b.add_material(MaterialType.SPECULAR, base_color=(0.99, 0.99, 0.99))
    glass = b.add_material(MaterialType.REFRACTION, base_color=(0.99, 0.99, 0.99), ior=1.5)

    s = 1.0  # half-size
    # floor (y=-1), ceiling (y=1), back (z=-1), left (x=-1, red), right (x=1, green)
    b.add_quad([-s, -s, s], [s, -s, s], [s, -s, -s], [-s, -s, -s], white)
    b.add_quad([-s, s, -s], [s, s, -s], [s, s, s], [-s, s, s], white)
    b.add_quad([-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s], white)
    b.add_quad([-s, -s, s], [-s, -s, -s], [-s, s, -s], [-s, s, s], red)
    b.add_quad([s, -s, -s], [s, -s, s], [s, s, s], [s, s, -s], green)
    # ceiling light (slightly below ceiling, facing down)
    l = 0.35
    ls, lc = b.add_quad(
        [-l, s - 1e-3, l], [-l, s - 1e-3, -l], [l, s - 1e-3, -l], [l, s - 1e-3, l], emit
    )
    b.add_area_light_tris(ls, lc, le=(36.0, 33.0, 26.0))

    if use_spheres:
        b.add_sphere((-0.42, -0.65, -0.30), 0.35, mirror)
        b.add_sphere((0.45, -0.65, 0.30), 0.35, glass)

    cam = PinholeCamera(
        origin=(0.0, 0.0, 3.45),
        lookat=(0.0, 0.0, 0.0),
        vfov_deg=45.0,
        width=width,
        height=height,
    )
    return b.build(), cam


def material_test_scene(width=512, height=512, envmap=None):
    """Material zoo on a plane (MtrlTestScene role): one sphere per model."""
    b = SceneBuilder()
    floor = b.add_material(MaterialType.DIFFUSE, base_color=(0.6, 0.6, 0.6))
    mats = [
        b.add_material(MaterialType.DIFFUSE, base_color=(0.7, 0.3, 0.3)),
        b.add_material(MaterialType.OREN_NAYAR, base_color=(0.7, 0.6, 0.2), roughness=0.8),
        b.add_material(MaterialType.SPECULAR, base_color=(0.95, 0.95, 0.95)),
        b.add_material(MaterialType.REFRACTION, base_color=(0.98, 0.98, 0.98), ior=1.5),
        b.add_material(MaterialType.GGX, base_color=(0.9, 0.7, 0.3), roughness=0.25, ior=2.0),
        b.add_material(MaterialType.BECKMANN, base_color=(0.3, 0.6, 0.9), roughness=0.35, ior=2.0),
        b.add_material(MaterialType.VELVET, base_color=(0.6, 0.2, 0.5), roughness=0.4),
        b.add_material(
            MaterialType.DISNEY, base_color=(0.8, 0.3, 0.2), roughness=0.35,
            metallic=0.6, sheen=0.3, clearcoat=0.5,
        ),
        b.add_material(
            MaterialType.MICROFACET_REFRACTION, base_color=(0.95, 0.95, 0.98),
            roughness=0.15, ior=1.5,
        ),
        b.add_material(MaterialType.RETROREFLECTIVE, base_color=(0.9, 0.9, 0.6), roughness=0.15),
        b.add_material(MaterialType.CAR_PAINT, base_color=(0.7, 0.1, 0.1), roughness=0.3),
    ]
    ext = 40.0
    b.add_quad(
        [-ext, 0, ext], [ext, 0, ext], [ext, 0, -ext], [-ext, 0, -ext], floor
    )
    n = len(mats)
    for i, m in enumerate(mats):
        x = (i - (n - 1) / 2.0) * 2.2
        b.add_sphere((x, 1.0, 0.0), 1.0, m)
    if envmap is not None:
        b.set_envmap(envmap)
    else:
        emit = b.add_material(MaterialType.EMISSIVE, base_color=(18.0, 17.0, 15.0))
        ls, lc = b.add_quad(
            [-4, 8, 4], [-4, 8, -4], [4, 8, -4], [4, 8, 4], emit
        )
        b.add_area_light_tris(ls, lc, le=(18.0, 17.0, 15.0))
        b.set_background((0.25, 0.3, 0.4))
    cam = PinholeCamera(
        origin=(0.0, 3.5, 14.0),
        lookat=(0.0, 1.0, 0.0),
        vfov_deg=40.0,
        width=width,
        height=height,
    )
    return b.build(), cam


# Reference asset tree (read-only mount); scenes below skip gracefully
# when it is absent.
REF_ASSET_DIR = "/root/reference/asset"


def obj_cornell_box(width=512, height=512, le=(36.0, 33.0, 26.0)):
    """The reference's canonical ObjCornellBoxScene (scenedefs.cpp:732):
    asset/cornellbox/orig.obj with the 'light' material overridden to an
    emissive + area light, mirroring its material callback."""
    import os

    from aten_tpu.scene.objloader import _mtl_to_material, load_obj

    path = os.path.join(REF_ASSET_DIR, "cornellbox", "orig.obj")
    b = SceneBuilder()

    def override(name, mtl):
        if name == "light":
            return b.add_material(MaterialType.EMISSIVE, base_color=le)
        return _mtl_to_material(b, mtl) if mtl else b.add_material(
            MaterialType.DIFFUSE, base_color=(0.6, 0.6, 0.6)
        )

    groups = load_obj(b, path, mtl_override=override)
    ls, lc = groups["light"]
    b.add_area_light_tris(ls, lc, le=le)
    cam = PinholeCamera(
        origin=(0.0, 1.0, 3.0), lookat=(0.0, 1.0, 0.0), vfov_deg=45.0,
        width=width, height=height,
    )
    return b.build(), cam


def dragon_scene(width=512, height=512):
    """100k-triangle dragon on a floor — the BVH-scale fixture."""
    import os

    from aten_tpu.scene.objloader import load_obj

    b = SceneBuilder()
    gold = b.add_material(
        MaterialType.GGX, base_color=(0.95, 0.75, 0.35), roughness=0.25, ior=2.5
    )
    floor = b.add_material(MaterialType.DIFFUSE, base_color=(0.55, 0.55, 0.55))
    emit = b.add_material(MaterialType.EMISSIVE, base_color=(26.0, 25.0, 23.0))
    load_obj(
        b, os.path.join(REF_ASSET_DIR, "dragon", "dragon.obj"),
        mtl_override=lambda n, m: gold,
    )
    ext = 30.0
    b.add_quad([-ext, -0.6, ext], [ext, -0.6, ext], [ext, -0.6, -ext], [-ext, -0.6, -ext], floor)
    ls, lc = b.add_quad([-4, 14, 4], [-4, 14, -4], [4, 14, -4], [4, 14, 4], emit)
    b.add_area_light_tris(ls, lc, le=(26.0, 25.0, 23.0))
    b.set_background((0.12, 0.14, 0.18))
    cam = PinholeCamera(
        origin=(0.0, 4.0, 14.0), lookat=(0.0, 1.5, 0.0), vfov_deg=40.0,
        width=width, height=height,
    )
    return b.build(), cam


def sponza_scene(width=512, height=512):
    """sponza_lod.obj (12.8k tris) with a sun + sky (gallery config role)."""
    import os

    from aten_tpu.scene.objloader import load_obj

    b = SceneBuilder()
    load_obj(b, os.path.join(REF_ASSET_DIR, "sponza", "sponza_lod.obj"))
    b.add_directional_light((-0.35, -1.0, 0.2), le=(6.0, 5.8, 5.2))
    b.set_background((0.6, 0.75, 0.95))
    cam = PinholeCamera(
        origin=(-7.0, 2.0, 0.0), lookat=(10.0, 2.5, 0.0), vfov_deg=55.0,
        width=width, height=height,
    )
    return b.build(), cam


def crytek_class_scene(width=512, height=512, dragons=3):
    """Flagship-SCALE fixture standing in for CryptekSponzaScene
    (scenedefs.cpp's crytek config; README.md:94-98 gallery).

    The reference checkout ships only crytek_sponza/sponza.mtl + its
    textures — the 262k-triangle sponza.obj itself is absent from
    /root/reference/asset/crytek_sponza (it is fetched separately in the
    reference's setup), so a literal crytek render is impossible here.
    This fixture matches the WORKLOAD instead: sponza_lod interior +
    `dragons` dragon meshes (~12.8k + dragons*100k tris ~ 313k at the
    default, beyond crytek's 262k), textured banners using the real
    crytek textures, a sun + sky.  The packed prim pool exceeds the
    resident-VMEM budget, so this drives the STREAMED treelet kernel —
    the same path a real crytek ingest would take.
    """
    import os

    from aten_tpu.scene.objloader import load_obj

    b = SceneBuilder()
    load_obj(b, os.path.join(REF_ASSET_DIR, "sponza", "sponza_lod.obj"))

    gold = b.add_material(
        MaterialType.GGX, base_color=(0.9, 0.72, 0.38), roughness=0.3, ior=2.3
    )
    for i in range(dragons):
        load_obj(
            b, os.path.join(REF_ASSET_DIR, "dragon", "dragon.obj"),
            mtl_override=lambda n, m: gold,
            scale=0.45, offset=(4.0 * i - 1.0, 0.45, -1.6),
        )

    # banners with the real crytek textures (uv-mapped quads)
    crytek = os.path.join(REF_ASSET_DIR, "crytek_sponza")
    banner_tex = os.path.join(crytek, "sponza_fabric_blue_diff.png")
    if os.path.exists(banner_tex):
        from aten_tpu.io.image import load_image

        tid = b.add_texture(load_image(banner_tex))
        bm = b.add_material(
            MaterialType.DIFFUSE, base_color=(1, 1, 1), albedo_map=tid
        )
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        for x0 in (-4.0, 2.0):
            pos = np.array(
                [[x0, 5.0, -2.2], [x0 + 2.5, 5.0, -2.2],
                 [x0 + 2.5, 8.0, -2.2], [x0, 8.0, -2.2]], np.float32
            )
            b.add_mesh(pos, [[0, 1, 2], [0, 2, 3]], bm, uv=uv)

    b.add_directional_light((-0.35, -1.0, 0.2), le=(6.0, 5.8, 5.2))
    b.set_background((0.6, 0.75, 0.95))
    cam = PinholeCamera(
        origin=(-7.0, 2.0, 0.0), lookat=(10.0, 2.5, 0.0), vfov_deg=55.0,
        width=width, height=height,
    )
    return b.build(), cam


def _add_box(b, lo, hi, mtl):
    """Axis-aligned box as 12 triangles (outward normals)."""
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    b.add_quad([x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1], mtl)  # +z
    b.add_quad([x1, y0, z0], [x0, y0, z0], [x0, y1, z0], [x1, y1, z0], mtl)  # -z
    b.add_quad([x1, y0, z1], [x1, y0, z0], [x1, y1, z0], [x1, y1, z1], mtl)  # +x
    b.add_quad([x0, y0, z0], [x0, y0, z1], [x0, y1, z1], [x0, y1, z0], mtl)  # -x
    b.add_quad([x0, y1, z1], [x1, y1, z1], [x1, y1, z0], [x0, y1, z0], mtl)  # +y
    b.add_quad([x0, y0, z0], [x1, y0, z0], [x1, y0, z1], [x0, y0, z1], mtl)  # -y


def homogeneous_volume_scene(width=256, height=256, sigma_s=0.8, sigma_a=0.05, g=0.4):
    """Fog-in-a-box (reference homogeneous-medium gallery scene role):
    a null-boundary cube filled with a scattering medium, an area light
    above, a diffuse floor."""
    b = SceneBuilder()
    floor = b.add_material(MaterialType.DIFFUSE, base_color=(0.6, 0.6, 0.6))
    emit = b.add_material(MaterialType.EMISSIVE, base_color=(24.0, 23.0, 21.0))
    med = b.add_medium(sigma_a=(sigma_a,) * 3, sigma_s=(sigma_s,) * 3, g=g)
    boundary = b.add_material(
        MaterialType.REFRACTION, base_color=(1.0, 1.0, 1.0), ior=1.0, medium=med
    )
    ext = 12.0
    b.add_quad([-ext, 0, ext], [ext, 0, ext], [ext, 0, -ext], [-ext, 0, -ext], floor)
    _add_box(b, (-3, 0.02, -3), (3, 6, 3), boundary)
    ls, lc = b.add_quad([-2, 9, 2], [-2, 9, -2], [2, 9, -2], [2, 9, 2], emit)
    b.add_area_light_tris(ls, lc, le=(24.0, 23.0, 21.0))
    b.set_background((0.05, 0.06, 0.08))
    cam = PinholeCamera(
        origin=(0.0, 4.0, 14.0), lookat=(0.0, 2.5, 0.0), vfov_deg=42.0,
        width=width, height=height,
    )
    return b.build(), cam


def hetero_volume_scene(width=256, height=256, res=48):
    """Procedural smoke-ball grid (NanoVDB gallery scene role): density =
    soft sphere falloff + low-frequency ripple, delta-tracked."""
    z, y, x = np.meshgrid(
        np.linspace(-1, 1, res), np.linspace(-1, 1, res), np.linspace(-1, 1, res),
        indexing="ij",
    )
    r = np.sqrt(x * x + y * y + z * z)
    dens = np.clip(1.0 - r, 0.0, 1.0) ** 1.5
    dens *= 0.75 + 0.25 * np.sin(6.0 * x) * np.sin(5.0 * y + 1.0) * np.sin(7.0 * z)
    dens = np.clip(dens * 2.0, 0.0, 1.0).astype(np.float32)

    b = SceneBuilder()
    floor = b.add_material(MaterialType.DIFFUSE, base_color=(0.55, 0.55, 0.55))
    emit = b.add_material(MaterialType.EMISSIVE, base_color=(20.0, 19.0, 18.0))
    lo, hi = (-2.0, 0.2, -2.0), (2.0, 4.2, 2.0)
    med = b.add_medium(
        sigma_a=(0.2, 0.2, 0.2), sigma_s=(3.0, 3.0, 3.0), g=0.2,
        grid=dens, grid_bmin=lo, grid_bmax=hi,
    )
    boundary = b.add_material(
        MaterialType.REFRACTION, base_color=(1.0, 1.0, 1.0), ior=1.0, medium=med
    )
    ext = 12.0
    b.add_quad([-ext, 0, ext], [ext, 0, ext], [ext, 0, -ext], [-ext, 0, -ext], floor)
    _add_box(b, lo, hi, boundary)
    ls, lc = b.add_quad([-2, 8, 2], [-2, 8, -2], [2, 8, -2], [2, 8, 2], emit)
    b.add_area_light_tris(ls, lc, le=(20.0, 19.0, 18.0))
    b.set_background((0.06, 0.07, 0.09))
    cam = PinholeCamera(
        origin=(0.0, 3.0, 11.0), lookat=(0.0, 2.0, 0.0), vfov_deg=42.0,
        width=width, height=height,
    )
    return b.build(), cam


def toon_scene(width=512, height=512, stylized=False):
    """Toon-shaded spheres with a banded remap texture + rim light
    (reference ToonScene role, common/scenedefs.cpp; material family
    /root/reference/src/libaten/material/toon.cpp).  One point light is
    the toon target light; a diffuse floor catches regular shading."""
    b = SceneBuilder()
    lid = b.add_point_light((4.0, 7.0, 6.0), (420.0, 400.0, 380.0))
    # 4-band luminance ramp (remap texture, toon.cpp:215)
    ramp = np.zeros((1, 64, 3), np.float32)
    for i in range(64):
        u = (i + 0.5) / 64
        band = 0.18 if u < 0.25 else (0.45 if u < 0.55 else (0.8 if u < 0.85 else 1.0))
        ramp[0, i] = band
    remap = b.add_texture(ramp)
    mtype = MaterialType.STYLIZED_BRDF if stylized else MaterialType.TOON
    toon_d = b.add_material(
        mtype, base_color=(0.85, 0.45, 0.35),
        toon_remap_tex=remap, toon_target_light=lid,
        toon_rim_enable=1.0, toon_rim_color=(0.4, 0.45, 0.7),
        toon_rim_width=0.35, toon_rim_softness=0.4, toon_rim_spread=1.0,
    )
    toon_s = b.add_material(
        mtype, base_color=(0.4, 0.55, 0.9),
        toon_remap_tex=remap, toon_target_light=lid,
        toon_type=1.0, roughness=0.2, ior=6.0,
        toon_hl_split_t=0.25, toon_hl_square_sharp=2.0,
        toon_hl_square_magnitude=0.3,
    )
    floor = b.add_material(MaterialType.DIFFUSE, base_color=(0.6, 0.6, 0.6))
    ext = 20.0
    b.add_quad([-ext, 0, ext], [ext, 0, ext], [ext, 0, -ext], [-ext, 0, -ext], floor)
    b.add_sphere((-1.4, 1.2, 0.0), 1.2, toon_d)
    b.add_sphere((1.4, 1.2, 0.0), 1.2, toon_s)
    b.set_background((0.1, 0.12, 0.16))
    cam = PinholeCamera(
        origin=(0.0, 2.5, 8.0), lookat=(0.0, 1.2, 0.0), vfov_deg=40.0,
        width=width, height=height,
    )
    return b.build(), cam


def many_light_scene(width=512, height=512, num_lights=126, seed=0):
    """ManyLightScene role (126 point lights, scenedefs.cpp) — the ReSTIR
    stress fixture."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    floor = b.add_material(MaterialType.DIFFUSE, base_color=(0.55, 0.55, 0.55))
    ball = b.add_material(MaterialType.GGX, base_color=(0.8, 0.8, 0.85), roughness=0.3, ior=2.0)
    ext = 20.0
    b.add_quad([-ext, 0, ext], [ext, 0, ext], [ext, 0, -ext], [-ext, 0, -ext], floor)
    for i in range(5):
        for j in range(5):
            b.add_sphere(((i - 2) * 3.0, 1.0, (j - 2) * 3.0), 1.0, ball)
    for _ in range(num_lights):
        p = rng.uniform([-12, 0.5, -12], [12, 6.0, 12])
        c = rng.uniform(0.2, 1.0, 3) * 4.0
        b.add_point_light(tuple(p), tuple(c))
    cam = PinholeCamera(
        origin=(0.0, 8.0, 22.0), lookat=(0.0, 1.0, 0.0), vfov_deg=45.0,
        width=width, height=height,
    )
    return b.build(), cam
