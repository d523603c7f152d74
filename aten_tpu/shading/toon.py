"""Toon / StylizedBrdf path-traced NPR materials.

Counterpart of the reference's Toon material family:
  * Toon::bsdf / ComputeBRDF / ComputeRimLight
    (/root/reference/src/libaten/material/toon.h:20, toon.cpp:88-280)
  * StylizedBrdf::ComputeBRDF (toon.cpp:361-442, "Global
    Illumination-Aware Stylised Shading")
  * ToonSpecular stylized-highlight half vector (toon.cpp:282-354,
    "Stylized Highlights for Cartoon Rendering and Animation")
  * toon-as-light termination routing: HitTeminatedMaterial
    (renderer/pathtracing/pathtracing_impl.h:453-509) — at bounce 0 the
    toon term is added to the contribution like an emitter and the path
    terminates; deeper bounces terminate with no contribution.

TPU-native form: everything is batched masked math over lanes; the
single designated target light (param.toon.target_light_idx) is a
per-material id so different toon materials can key different lights.
The shade-time radiance -> band remap runs through a 1-D remap texture
(sampled at (lum, 0.5), default white like sampleTexture's vec4(1)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from aten_tpu.core import sampler as smp
from aten_tpu.core import vecmath as vm
from aten_tpu.scene.lights import sample_light
from aten_tpu.shading import brdf as brdf_mod


def stylized_half(mat, n, v, l):
    """Stylized highlight H (toon.cpp:319-354): translate / scale /
    split / square the half vector in the tangent frame of n."""
    h = vm.normalize(l + v)
    t, b = vm.onb(n)
    tl_t = mat["toon_hl_translation_t"][..., None]
    tl_b = mat["toon_hl_translation_b"][..., None]
    h = vm.normalize(h + tl_t * t + tl_b * b)
    sc_t = mat["toon_hl_scale_t"][..., None]
    sc_b = mat["toon_hl_scale_b"][..., None]
    h = vm.normalize(h - sc_t * vm.dot(h, t) * t - sc_b * vm.dot(h, b) * b)
    sp_t = mat["toon_hl_split_t"][..., None]
    sp_b = mat["toon_hl_split_b"][..., None]
    h = vm.normalize(
        h - sp_t * jnp.sign(vm.dot(h, t)) * t - sp_b * jnp.sign(vm.dot(h, b)) * b
    )
    sharp = mat["toon_hl_square_sharp"][..., None]
    mag = mat["toon_hl_square_magnitude"][..., None]
    ht = jnp.clip(vm.dot(h, t), -1.0, 1.0)
    hb = jnp.clip(vm.dot(h, b), -1.0, 1.0)
    sq_t = jnp.sin(jnp.power(jnp.arccos(ht), jnp.maximum(sharp, 1e-6)))
    sq_b = jnp.sin(jnp.power(jnp.arccos(hb), jnp.maximum(sharp, 1e-6)))
    h = vm.normalize(h - mag * (sq_t * ht * t + sq_b * hb * b))
    return h


def toon_specular_eval(mat, n, wo, wi):
    """GGX BRDF evaluated with the stylized half vector
    (ToonSpecular::ComputeBRDF, toon.cpp:298-317). Returns (bsdf, pdf)."""
    h = stylized_half(mat, n, wo, wi)
    a = jnp.maximum(mat["roughness"], 1e-3)
    nh = jnp.clip(vm.dot(n, h, keepdims=False), 0.0, 1.0)
    nv = jnp.clip(vm.dot(n, wo, keepdims=False), 1e-6, 1.0)
    nl = jnp.clip(vm.dot(n, wi, keepdims=False), 0.0, 1.0)
    vh = jnp.clip(vm.dot(wo, h, keepdims=False), 1e-6, 1.0)
    d = brdf_mod._ggx_d(nh, a)
    g = brdf_mod._ggx_g1(nv, a) * brdf_mod._ggx_g1(nl, a)
    f0 = ((mat["ior"] - 1.0) / (mat["ior"] + 1.0)) ** 2
    f = f0 + (1.0 - f0) * (1.0 - vh) ** 5
    spec = (d * g * f / jnp.maximum(4.0 * nv * nl, 1e-8))[..., None]
    bsdf = spec * jnp.ones_like(mat["base_color"])
    pdf = d * nh / jnp.maximum(4.0 * vh, 1e-8)
    return bsdf, pdf


def _bezier_smoothstep(edge0, edge1, mid, t, s):
    """toon.cpp:222-240 — quadratic-bezier-shaped smoothstep."""
    tt = jnp.clip((t - edge0) / jnp.maximum(edge1 - edge0, 1e-6), 0.0, 1.0)
    tt = tt * s
    p = (1.0 - 2.0 * mid) * tt * tt + 2.0 * mid * tt
    return jnp.where(t <= edge0, 0.0, jnp.where(t >= edge1, 1.0, p))


def rim_light(mat, n, rd):
    """Additive rim term (Toon::ComputeRimLight, toon.cpp:243-280)."""
    ndv = vm.dot(n, -rd, keepdims=False)
    rim = _bezier_smoothstep(
        1.0 - mat["toon_rim_width"],
        1.0,
        (1.0 - mat["toon_rim_softness"]) * 0.5,
        1.0 - ndv,
        mat["toon_rim_spread"],
    )
    rim = jnp.where(ndv > 0.0, rim, 0.0)
    on = (mat["toon_rim_enable"] > 0).astype(jnp.float32)
    return (rim * on)[..., None] * mat["toon_rim_color"]


def _sample_remap(scene, tex_id, u, default):
    """1-D remap texture lookup at (u, 0.5); default where tex_id < 0."""
    if scene.get("tex_stack") is None:
        return default
    from aten_tpu.scene.textures import sample_texture

    val = sample_texture(scene, tex_id, u, jnp.full_like(u, 0.5))[..., :3]
    return jnp.where((tex_id >= 0)[..., None], val, default)


def toon_term(scene, mat, p, ns, rd, state, occluded_fn, stylized=None):
    """Toon-as-light contribution (Toon::bsdf, toon.cpp:88-164).

    mat: gathered per-lane material rows (post albedo/normal maps).
    rd: incident ray direction (the reference's wi).
    stylized: per-lane bool — StylizedBrdf lanes use the GI-aware remap
    (toon.cpp:361-442); plain Toon lanes the luminance band remap.
    Returns (rgb [N,3], state).
    """
    n = brdf_mod.orient_normal(ns, -rd)
    wo = -rd

    tl = mat["toon_target_light"]
    has_light = tl >= 0
    u_a, u_b, state = smp.next_2d(state)
    u_c, state = smp.next_1d(state)
    ls = sample_light(scene, jnp.maximum(tl, 0), p, u_c, (u_a, u_b))

    wi = ls["dir"]
    cos_s = vm.dot(n, wi, keepdims=False)
    cos_l = vm.dot(ls["nml"], -wi, keepdims=False)

    # base BRDF: diffuse or stylized-highlight GGX (toon.cpp:184-201)
    f_dif = mat["base_color"] / jnp.pi
    pdf_dif = jnp.maximum(cos_s, 0.0) / jnp.pi
    f_spec, pdf_spec = toon_specular_eval(mat, n, wo, wi)
    spec_sel = (mat["toon_type"] > 0)[..., None]
    f = jnp.where(spec_sel, f_spec, f_dif)
    path_pdf = jnp.where(mat["toon_type"] > 0, pdf_spec, pdf_dif)

    # 3-point NEE with light_select_prob = 1 (pathtracing_nee_impl.h)
    dist2 = jnp.maximum(ls["dist"] * ls["dist"], 1e-8)
    inf_or_sing = ls["infinite"] | ls["singular"]
    dist2 = jnp.where(inf_or_sing, 1.0, dist2)
    path_pdf_area = jnp.where(
        ls["infinite"], path_pdf, path_pdf * jnp.abs(cos_l) / dist2
    )
    mis_w = jnp.where(
        ls["singular"],
        1.0,
        ls["pdf"] / jnp.maximum(ls["pdf"] + path_pdf_area, 1e-12),
    )
    g = jnp.maximum(cos_s, 0.0) * jnp.maximum(cos_l, 0.0) / dist2
    lpdf = jnp.maximum(ls["pdf"], 1e-12)
    radiance = f * ls["le"] * (mis_w * g / lpdf)[..., None]

    # shadow test toward the target light (will_receive_shadow)
    ro_sh = p + n * 1e-3
    from aten_tpu.shading.nee import shadow_distance

    dist_sh = jnp.where(
        ls["infinite"] | ls["singular"],
        ls["dist"],
        shadow_distance(ls["dist"], cos_l),
    )
    occ = occluded_fn(ro_sh, wi, dist_sh).astype(jnp.float32)
    vis = jnp.where(mat["toon_receive_shadow"] > 0, 1.0 - occ, 1.0)
    lit = has_light & (cos_s >= 0.0) & (cos_l >= 0.0)
    radiance = jnp.where(
        (lit & (vis > 0.0))[..., None], radiance * vis[..., None], 0.0
    )

    # --- plain Toon: gamma'd luminance -> band remap (toon.cpp:208-218)
    lum = jnp.clip(vm.luminance(radiance)[..., 0], 0.0, 1.0)
    lum = jnp.clip(jnp.power(lum, 1.0 / 2.2), 0.0, 1.0)
    toon_rgb = _sample_remap(
        scene, mat["toon_remap_tex"], lum, jnp.ones_like(radiance)
    ) * mat["base_color"]

    # --- StylizedBrdf: GI-aware remap (toon.cpp:408-441)
    y = 0.212639 * radiance[..., 0] + 0.715169 * radiance[..., 1] \
        + 0.072192 * radiance[..., 2]
    weight = jnp.maximum(y, 0.01)
    y_min = jnp.minimum(mat["toon_stylized_y_min"], mat["toon_stylized_y_max"])
    y_max = jnp.maximum(mat["toon_stylized_y_min"], mat["toon_stylized_y_max"])
    remap_v = jnp.clip(
        (y - y_min) / jnp.maximum(y_max - y_min, 1e-6), 0.0, 1.0
    )
    sty_remap = _sample_remap(scene, mat["toon_remap_tex"], remap_v, radiance)
    # pdf = 1 / nee_weight; nee_weight = misW / light_pdf (select prob 1)
    sty_pdf = lpdf / jnp.maximum(mis_w, 1e-6)
    sty_rgb = weight[..., None] * sty_remap * sty_pdf[..., None]

    if stylized is None:
        stylized = jnp.zeros(p.shape[0], bool)
    out = jnp.where(stylized[..., None], sty_rgb, toon_rgb)
    out = jnp.where(has_light[..., None], out, 0.0)
    return out + rim_light(mat, n, rd), state
