"""BRDF/BSDF sampling and evaluation, batched over shading points.

Counterpart of the reference material layer: per-type static dispatch
`material::sampleMaterial / samplePDF / sampleBSDF`
(src/libaten/material/material_impl.h:24-206) over the 14 model zoo in
src/libaten/material/*.cpp.  The CUDA switch-per-thread becomes a
branchless masked select: every model is evaluated on the whole batch
(cheap VPU work) and the per-lane material type picks the result.  This
is also the differentiability-friendly form — gradients flow through
all model parameters without control-flow discontinuities.

Conventions:
  * `wo` points away from the surface toward the previous vertex
    (viewer); `wi` points away toward the next vertex (light).
  * `ns` is the shading normal as stored (may face away from wo);
    models that need it use the orienting normal internally, matching
    the reference's use of a flipped normal on backfaces.
  * Singular (delta) models report pdf = 1 and a bsdf value f such that
    f * |cos| equals the throughput weight.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from aten_tpu.core import vecmath as vm
from aten_tpu.scene.materials import MaterialType

PI = np.float32(np.pi)


def orient_normal(ns, wo):
    """Flip normal to the side of wo."""
    s = jnp.sign(vm.dot(ns, wo))
    s = jnp.where(s == 0.0, 1.0, s)
    return ns * s


def fresnel_schlick(cos_i, f0):
    c = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    return f0 + (1.0 - f0) * (c ** 5)


def fresnel_dielectric(cos_i, eta_i, eta_t):
    """Exact unpolarized dielectric Fresnel (material.h:445-520 role)."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = (eta_i / eta_t) ** 2 * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    rs = (eta_i * cos_i - eta_t * cos_t) / jnp.maximum(
        eta_i * cos_i + eta_t * cos_t, 1e-12
    )
    rp = (eta_t * cos_i - eta_i * cos_t) / jnp.maximum(
        eta_t * cos_i + eta_i * cos_t, 1e-12
    )
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(sin2_t >= 1.0, 1.0, f)  # TIR


def _cos_hemisphere_sample(n, u1, u2):
    """Cosine-weighted hemisphere about n. Returns (wi, pdf)."""
    r = jnp.sqrt(jnp.clip(u1, 1e-8, 1.0))
    phi = 2.0 * PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.clip(1.0 - u1, 1e-8, 1.0))
    local = jnp.stack([x, y, z], axis=-1)
    wi = vm.normalize(vm.to_world(local, n))
    pdf = jnp.maximum(vm.dot(wi, n, keepdims=False), 1e-6) / PI
    return wi, pdf


# ---------------------------------------------------------------------------
# Microfacet NDFs (GGX = ggx.cpp:74-120 role, Beckmann = beckmann.cpp role)
# ---------------------------------------------------------------------------


def _ggx_alpha(mat):
    return jnp.maximum(mat["roughness"] ** 2, 1e-3)


def _ggx_d(nh, a):
    d = nh * nh * (a * a - 1.0) + 1.0
    return a * a / jnp.maximum(PI * d * d, 1e-12)


def _ggx_g1(nv, a):
    nv = jnp.maximum(nv, 1e-6)
    return 2.0 * nv / jnp.maximum(nv + jnp.sqrt(a * a + (1.0 - a * a) * nv * nv), 1e-12)


def _beckmann_d(nh, a):
    nh = jnp.maximum(nh, 1e-6)
    nh2 = nh * nh
    t2 = (1.0 - nh2) / nh2
    return jnp.exp(-t2 / jnp.maximum(a * a, 1e-12)) / jnp.maximum(
        PI * a * a * nh2 * nh2, 1e-12
    )


def _beckmann_g1(nv, a):
    nv = jnp.clip(nv, 1e-6, 1.0)
    tan_v = jnp.sqrt(jnp.maximum(1.0 - nv * nv, 0.0)) / nv
    c = 1.0 / jnp.maximum(a * tan_v, 1e-12)
    c2 = c * c
    poly = (3.535 * c + 2.181 * c2) / (1.0 + 2.276 * c + 2.577 * c2)
    return jnp.where(c < 1.6, poly, jnp.ones_like(c))


def _microfacet_f0(mat):
    ior = mat["ior"]
    r = (ior - 1.0) / jnp.maximum(ior + 1.0, 1e-6)
    return r * r


def _microfacet_eval(mat, n, wo, wi, kind):
    """Shared Cook-Torrance evaluation. kind: 'ggx' | 'beckmann'."""
    a = _ggx_alpha(mat)
    h = vm.normalize(wo + wi)
    nh = jnp.clip(vm.dot(n, h, keepdims=False), 0.0, 1.0)
    nv = vm.dot(n, wo, keepdims=False)
    nl = vm.dot(n, wi, keepdims=False)
    vh = jnp.clip(vm.dot(wo, h, keepdims=False), 0.0, 1.0)
    if kind == "ggx":
        d = _ggx_d(nh, a)
        g = _ggx_g1(nv, a) * _ggx_g1(nl, a)
    else:
        d = _beckmann_d(nh, a)
        g = _beckmann_g1(nv, a) * _beckmann_g1(nl, a)
    f = fresnel_schlick(vh, _microfacet_f0(mat))
    spec = d * g * f / jnp.maximum(4.0 * nv * nl, 1e-6)
    valid = (nv > 0.0) & (nl > 0.0)
    fr = jnp.where(valid[..., None], spec[..., None] * mat["base_color"], 0.0)
    pdf = jnp.where(valid, d * nh / jnp.maximum(4.0 * vh, 1e-6), 0.0)
    return fr, pdf


def _microfacet_sample_h(mat, n, u1, u2, kind):
    a = _ggx_alpha(mat)
    u1 = jnp.clip(u1, 1e-7, 1.0 - 1e-7)
    if kind == "ggx":
        tan2 = a * a * u1 / (1.0 - u1)
    else:
        tan2 = -(a * a) * jnp.log(jnp.maximum(1.0 - u1, 1e-7))
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * PI * u2
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    return vm.normalize(vm.to_world(local, n))


# ---------------------------------------------------------------------------
# Oren-Nayar (orennayar.cpp role)
# ---------------------------------------------------------------------------


def _oren_nayar_eval(mat, n, wo, wi):
    sig = mat["roughness"]
    s2 = sig * sig
    A = 1.0 - 0.5 * s2 / (s2 + 0.33)
    B = 0.45 * s2 / (s2 + 0.09)
    ci = jnp.clip(vm.dot(n, wi, keepdims=False), 0.0, 1.0)
    co = jnp.clip(vm.dot(n, wo, keepdims=False), 0.0, 1.0)
    si = jnp.sqrt(jnp.maximum(1.0 - ci * ci, 0.0))
    so = jnp.sqrt(jnp.maximum(1.0 - co * co, 0.0))
    # cos(phi_i - phi_o) from tangent-plane projections.
    ti = wi - n * ci[..., None]
    to = wo - n * co[..., None]
    denom = jnp.maximum(
        vm.length(ti, keepdims=False) * vm.length(to, keepdims=False), 1e-8
    )
    cos_dphi = jnp.clip(vm.dot(ti, to, keepdims=False) / denom, 0.0, 1.0)
    sin_a = jnp.maximum(si, so)
    tan_b = jnp.minimum(si, so) / jnp.maximum(jnp.maximum(ci, co), 1e-6)
    f = (A + B * cos_dphi * sin_a * tan_b)[..., None] * mat["base_color"] / PI
    return jnp.where((ci > 0)[..., None] & (co > 0)[..., None], f, 0.0)


# ---------------------------------------------------------------------------
# Velvet (velvet.cpp role): inverted-gaussian sheen lobe, cosine sampled.
# ---------------------------------------------------------------------------


def _velvet_eval(mat, n, wo, wi):
    a = jnp.maximum(mat["roughness"], 1e-3)
    h = vm.normalize(wo + wi)
    nh = jnp.clip(vm.dot(n, h, keepdims=False), 1e-6, 1.0)
    sin2 = 1.0 - nh * nh
    cot2 = (nh * nh) / jnp.maximum(sin2, 1e-6)
    d = jnp.exp(-cot2 / (a * a)) / jnp.maximum(PI * a * a * sin2 * sin2, 1e-6)
    nv = vm.dot(n, wo, keepdims=False)
    nl = vm.dot(n, wi, keepdims=False)
    valid = (nv > 0) & (nl > 0)
    spec = d / jnp.maximum(4.0 * (nv + nl - nv * nl), 1e-6)
    return jnp.where(valid[..., None], spec[..., None] * mat["base_color"], 0.0)


# ---------------------------------------------------------------------------
# Disney principled BRDF (disney_brdf.cpp role; Burley 2012)
# ---------------------------------------------------------------------------


def _schlick_w(c):
    return jnp.clip(1.0 - c, 0.0, 1.0) ** 5


def _gtr1_d(nh, a):
    a = jnp.clip(a, 1e-3, 0.999)
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * nh * nh
    denom = PI * jnp.log(a2) * t  # negative for a<1; numerator negative too
    return (a2 - 1.0) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)


def _disney_lobes(mat):
    """Static per-lane lobe weights for the sampling mixture."""
    w_diff = (1.0 - mat["metallic"])
    w_spec = jnp.ones_like(w_diff)
    w_cc = 0.25 * mat["clearcoat"]
    tot = jnp.maximum(w_diff + w_spec + w_cc, 1e-6)
    return w_diff / tot, w_spec / tot, w_cc / tot


def _disney_eval_pdf(mat, n, wo, wi):
    bc = mat["base_color"]
    rough = jnp.clip(mat["roughness"], 0.02, 1.0)
    metallic = mat["metallic"]
    nv = vm.dot(n, wo, keepdims=False)
    nl = vm.dot(n, wi, keepdims=False)
    h = vm.normalize(wo + wi)
    nh = jnp.clip(vm.dot(n, h, keepdims=False), 0.0, 1.0)
    lh = jnp.clip(vm.dot(wi, h, keepdims=False), 0.0, 1.0)
    lum = vm.luminance(bc)[..., 0]
    ctint = bc / jnp.maximum(lum, 1e-4)[..., None]

    # diffuse + subsurface (Burley)
    fl = _schlick_w(nl)
    fv = _schlick_w(nv)
    fd90 = 0.5 + 2.0 * lh * lh * rough
    fd = (1.0 + (fd90 - 1.0) * fl) * (1.0 + (fd90 - 1.0) * fv)
    fss90 = lh * lh * rough
    fss = (1.0 + (fss90 - 1.0) * fl) * (1.0 + (fss90 - 1.0) * fv)
    ss = 1.25 * (fss * (1.0 / jnp.maximum(nl + nv, 1e-4) - 0.5) + 0.5)
    f_diff = bc / PI * jnp.where(
        (mat["subsurface"] > 0)[..., None],
        ((1.0 - mat["subsurface"]) * fd + mat["subsurface"] * ss)[..., None],
        fd[..., None],
    )
    # sheen
    csheen = (1.0 - mat["sheen_tint"])[..., None] + mat["sheen_tint"][..., None] * ctint
    f_sheen = mat["sheen"][..., None] * csheen * _schlick_w(lh)[..., None]

    # specular GGX
    a = jnp.maximum(rough * rough, 1e-3)
    cspec0 = (
        mat["specular"][..., None]
        * 0.08
        * ((1.0 - mat["specular_tint"])[..., None] + mat["specular_tint"][..., None] * ctint)
    )
    cspec0 = cspec0 * (1.0 - metallic)[..., None] + bc * metallic[..., None]
    d_spec = _ggx_d(nh, a)
    g_spec = _ggx_g1(nv, a) * _ggx_g1(nl, a)
    f_spec_f = cspec0 + (1.0 - cspec0) * _schlick_w(lh)[..., None]
    f_spec = f_spec_f * (d_spec * g_spec / jnp.maximum(4.0 * nv * nl, 1e-6))[..., None]

    # clearcoat (GTR1, fixed F0 0.04, G alpha 0.25)
    a_cc = (1.0 - mat["clearcoat_gloss"]) * 0.1 + mat["clearcoat_gloss"] * 0.001
    a_cc = jnp.sqrt(jnp.clip(a_cc, 1e-4, 1.0))
    d_cc = _gtr1_d(nh, a_cc)
    f_cc = 0.04 + 0.96 * _schlick_w(lh)
    g_cc = _ggx_g1(nv, 0.25) * _ggx_g1(nl, 0.25)
    f_clear = (0.25 * mat["clearcoat"] * d_cc * f_cc * g_cc / jnp.maximum(4.0 * nv * nl, 1e-6))[..., None]

    f = (f_diff + f_sheen) * (1.0 - metallic)[..., None] + f_spec + f_clear
    valid = (nv > 0) & (nl > 0)
    f = jnp.where(valid[..., None], f, 0.0)

    # mixture pdf
    w_d, w_s, w_c = _disney_lobes(mat)
    pdf_d = jnp.maximum(nl, 0.0) / PI
    vh = jnp.clip(vm.dot(wo, h, keepdims=False), 1e-6, 1.0)
    pdf_s = d_spec * nh / (4.0 * vh)
    pdf_c = d_cc * nh / (4.0 * vh)
    pdf = w_d * pdf_d + w_s * pdf_s + w_c * pdf_c
    pdf = jnp.where(valid, pdf, 0.0)
    return f, pdf


def _disney_sample(mat, n, wo, u1, u2, u3):
    w_d, w_s, w_c = _disney_lobes(mat)
    # cosine lobe
    wi_d, _ = _cos_hemisphere_sample(n, u1, u2)
    # GGX specular lobe
    h_s = _microfacet_sample_h(mat, n, u1, u2, "ggx")
    wi_s = vm.normalize(2.0 * vm.dot(wo, h_s) * h_s - wo)
    # clearcoat GTR1 lobe
    a_cc = (1.0 - mat["clearcoat_gloss"]) * 0.1 + mat["clearcoat_gloss"] * 0.001
    a_cc = jnp.sqrt(jnp.clip(a_cc, 1e-4, 1.0))
    a2 = jnp.clip(a_cc * a_cc, 1e-6, 0.999)
    u1c = jnp.clip(u1, 1e-6, 1.0 - 1e-6)
    cos2 = (1.0 - a2 ** (1.0 - u1c)) / (1.0 - a2)
    cos_t = jnp.sqrt(jnp.clip(cos2, 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos2, 0.0, 1.0))
    phi = 2.0 * PI * u2
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    h_c = vm.normalize(vm.to_world(local, n))
    wi_c = vm.normalize(2.0 * vm.dot(wo, h_c) * h_c - wo)

    pick_d = u3 < w_d
    pick_c = u3 >= (w_d + w_s)
    wi = jnp.where(pick_d[..., None], wi_d, jnp.where(pick_c[..., None], wi_c, wi_s))
    return wi


# ---------------------------------------------------------------------------
# Rough dielectric (MicrofacetRefraction, Walter et al. 2007;
# material/microfacet_refraction.cpp role)
# ---------------------------------------------------------------------------


def _rough_dielectric_eval_pdf(mat, ns, wo, wi):
    """f and pdf for a GGX rough dielectric at arbitrary wi (both
    reflection and transmission branches)."""
    n = orient_normal(ns, wo)
    entering = vm.dot(ns, wo, keepdims=False) > 0.0
    eta_i = jnp.where(entering, 1.0, mat["ior"])
    eta_t = jnp.where(entering, mat["ior"], 1.0)
    a = _ggx_alpha(mat)

    nv = jnp.clip(vm.dot(n, wo, keepdims=False), 1e-6, 1.0)
    nl = vm.dot(n, wi, keepdims=False)  # signed: <0 => transmission
    reflecting = nl > 0.0

    # reflection half-vector
    h_r = vm.normalize(wo + wi)
    # transmission half-vector (Walter eq. 16), oriented to n's side
    ht = -(eta_i[..., None] * wo + eta_t[..., None] * wi)
    h_t = vm.normalize(ht)
    h_t = h_t * jnp.sign(vm.dot(h_t, n))
    h = jnp.where(reflecting[..., None], h_r, h_t)

    nh = jnp.clip(vm.dot(n, h, keepdims=False), 0.0, 1.0)
    vh = vm.dot(wo, h, keepdims=False)
    lh = vm.dot(wi, h, keepdims=False)
    d = _ggx_d(nh, a)
    g = _ggx_g1(jnp.abs(nv), a) * _ggx_g1(jnp.abs(nl), a)
    F = fresnel_dielectric(jnp.clip(jnp.abs(vh), 0.0, 1.0), eta_i, eta_t)

    # reflection branch
    f_r = d * g * F / jnp.maximum(4.0 * jnp.abs(nv * nl), 1e-6)
    pdf_r = d * nh / jnp.maximum(4.0 * jnp.abs(vh), 1e-6) * F
    # transmission branch (Walter eq. 21)
    denom = eta_i * vh + eta_t * lh
    denom2 = jnp.maximum(denom * denom, 1e-8)
    jac_t = eta_t * eta_t * jnp.abs(lh) / denom2
    f_t = (
        jnp.abs(vh * lh)
        / jnp.maximum(jnp.abs(nv * nl), 1e-6)
        * eta_t * eta_t * (1.0 - F) * d * g / denom2
    )
    pdf_t = d * nh * jac_t * (1.0 - F)

    valid_r = reflecting & (nh > 0)
    valid_t = (~reflecting) & (nh > 0)
    f = jnp.where(valid_r, f_r, jnp.where(valid_t, f_t, 0.0))
    pdf = jnp.where(valid_r, pdf_r, jnp.where(valid_t, pdf_t, 0.0))
    return f[..., None] * mat["base_color"], pdf


def _rough_dielectric_sample(mat, ns, wo, u1, u2, u3):
    n = orient_normal(ns, wo)
    entering = vm.dot(ns, wo, keepdims=False) > 0.0
    eta_i = jnp.where(entering, 1.0, mat["ior"])
    eta_t = jnp.where(entering, mat["ior"], 1.0)
    h = _microfacet_sample_h(mat, n, u1, u2, "ggx")
    vh = jnp.clip(vm.dot(wo, h, keepdims=False), 0.0, 1.0)
    F = fresnel_dielectric(vh, eta_i, eta_t)
    wi_r = vm.normalize(2.0 * vm.dot(wo, h) * h - wo)
    wt, tir = vm.refract(wo, h * jnp.sign(vm.dot(h, wo)), (eta_i / eta_t)[..., None])
    choose_reflect = (u3 < F) | tir
    wi = jnp.where(choose_reflect[..., None], wi_r, wt)
    return wi, ~choose_reflect


# ---------------------------------------------------------------------------
# Retroreflective (retroreflective.cpp role, simplified): a Beckmann-like
# lobe concentrated around the INCOMING direction (wi ~ wo), as produced by
# corner-cube sheeting, over a diffuse floor.  The reference implements a
# measured effective-area model; this is a compact analytic stand-in with
# the same phenomenology (bright back-reflection, diffuse fallback).
# ---------------------------------------------------------------------------

_RETRO_KS = 0.55
_RETRO_KD = 0.3


def _retro_eval_pdf(mat, n, wo, wi):
    a = jnp.clip(mat["roughness"], 0.02, 1.0)
    nv = vm.dot(n, wo, keepdims=False)
    nl = vm.dot(n, wi, keepdims=False)
    c = jnp.clip(vm.dot(wo, wi, keepdims=False), -1.0, 1.0)  # retro alignment
    sin2 = jnp.maximum(1.0 - c * c, 0.0)
    # normalized spherical-gaussian-ish lobe about wo
    sharp = 2.0 / jnp.maximum(a * a, 1e-4)
    lobe = sharp / (2.0 * PI) * jnp.exp(-sharp * 0.5 * sin2)
    f = _RETRO_KD / PI + _RETRO_KS * lobe / jnp.maximum(jnp.abs(nl), 1e-4)
    valid = (nv > 0) & (nl > 0)
    f = jnp.where(valid, f, 0.0)[..., None] * mat["base_color"]
    pdf_cos = jnp.maximum(nl, 0.0) / PI
    pdf = 0.5 * pdf_cos + 0.5 * jnp.where(valid, lobe, 0.0)
    return f, pdf


def _retro_sample(mat, n, wo, u1, u2, u3):
    a = jnp.clip(mat["roughness"], 0.02, 1.0)
    wi_d, _ = _cos_hemisphere_sample(n, u1, u2)
    # perturb around wo with the same lobe sharpness
    sharp = 2.0 / jnp.maximum(a * a, 1e-4)
    u1c = jnp.clip(u1, 1e-6, 1.0 - 1e-6)
    sin2 = jnp.minimum(-jnp.log(u1c) * 2.0 / sharp, 1.0)
    cos_t = jnp.sqrt(1.0 - sin2)
    sin_t = jnp.sqrt(sin2)
    phi = 2.0 * PI * u2
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    wi_r = vm.normalize(vm.to_world(local, vm.normalize(wo)))
    return jnp.where((u3 < 0.5)[..., None], wi_d, wi_r)


# ---------------------------------------------------------------------------
# Car paint (car_paint.cpp + FlakesNormal role, simplified): diffuse base
# coat + metallic-flake GGX lobe + smooth clearcoat GGX lobe.  The
# reference perturbs the flake normal with a procedural texture; here the
# flake lobe's roughness stands in for flake orientation spread (a normal
# map supplies true sparkle when bound).
# ---------------------------------------------------------------------------


def _carpaint_eval_pdf(mat, n, wo, wi):
    nv = vm.dot(n, wo, keepdims=False)
    nl = vm.dot(n, wi, keepdims=False)
    h = vm.normalize(wo + wi)
    nh = jnp.clip(vm.dot(n, h, keepdims=False), 0.0, 1.0)
    vh = jnp.clip(vm.dot(wo, h, keepdims=False), 1e-6, 1.0)
    f_diff = mat["base_color"] / PI * 0.6
    a_fl = jnp.maximum(mat["roughness"] ** 2, 1e-3)
    d_fl = _ggx_d(nh, a_fl)
    g_fl = _ggx_g1(nv, a_fl) * _ggx_g1(nl, a_fl)
    f_fl = (d_fl * g_fl / jnp.maximum(4.0 * nv * nl, 1e-6))[..., None] * mat["base_color"] * 0.4
    a_cc = jnp.float32(0.01)
    d_cc = _ggx_d(nh, a_cc)
    g_cc = _ggx_g1(nv, a_cc) * _ggx_g1(nl, a_cc)
    f_cc = (0.04 + 0.96 * _schlick_w(vh)) * d_cc * g_cc / jnp.maximum(4.0 * nv * nl, 1e-6)
    f = f_diff * jnp.ones_like(mat["base_color"]) + f_fl + f_cc[..., None]
    valid = (nv > 0) & (nl > 0)
    f = jnp.where(valid[..., None], f, 0.0)
    pdf = (
        0.5 * jnp.maximum(nl, 0.0) / PI
        + 0.35 * d_fl * nh / (4.0 * vh)
        + 0.15 * d_cc * nh / (4.0 * vh)
    )
    return f, jnp.where(valid, pdf, 0.0)


def _carpaint_sample(mat, n, wo, u1, u2, u3):
    wi_d, _ = _cos_hemisphere_sample(n, u1, u2)
    h_fl = _microfacet_sample_h(mat, n, u1, u2, "ggx")
    wi_fl = vm.normalize(2.0 * vm.dot(wo, h_fl) * h_fl - wo)
    mat_cc = dict(mat, roughness=jnp.full_like(mat["roughness"], 0.1))
    h_cc = _microfacet_sample_h(mat_cc, n, u1, u2, "ggx")
    wi_cc = vm.normalize(2.0 * vm.dot(wo, h_cc) * h_cc - wo)
    wi = jnp.where(
        (u3 < 0.5)[..., None],
        wi_d,
        jnp.where((u3 < 0.85)[..., None], wi_fl, wi_cc),
    )
    return wi


# ---------------------------------------------------------------------------
# Dispatch tables
# ---------------------------------------------------------------------------

_DIFFUSE_LIKE = (
    MaterialType.DIFFUSE,
    MaterialType.OREN_NAYAR,
    MaterialType.VELVET,
    MaterialType.EMISSIVE,  # harmless fallback if sampled
)


def _need(used, *types):
    """Static dispatch pruning: a scene's used-material-type set (baked
    static at build) lets jit skip whole BRDF families — the TPU
    analogue of the reference's per-type switch doing no work for
    absent cases (material_impl.h:24-206)."""
    return used is None or any(int(t) in used for t in types)


def eval_bsdf(mat, ns, wo, wi, used=None):
    """f(wo, wi) for non-singular lobes; zero for singular/emissive."""
    n = orient_normal(ns, wo)
    mtype = mat["type"]
    nl = jnp.clip(vm.dot(n, wi, keepdims=False), 0.0, 1.0)[..., None]

    f = mat["base_color"] / PI * jnp.ones_like(nl)  # DIFFUSE (+ TOON in PT)
    f = jnp.where((nl > 0), f, 0.0)

    t = mtype[..., None]
    out = f
    if _need(used, MaterialType.OREN_NAYAR):
        out = jnp.where(t == MaterialType.OREN_NAYAR,
                        _oren_nayar_eval(mat, n, wo, wi), out)
    if _need(used, MaterialType.GGX):
        out = jnp.where(t == MaterialType.GGX,
                        _microfacet_eval(mat, n, wo, wi, "ggx")[0], out)
    if _need(used, MaterialType.BECKMANN):
        out = jnp.where(t == MaterialType.BECKMANN,
                        _microfacet_eval(mat, n, wo, wi, "beckmann")[0], out)
    if _need(used, MaterialType.VELVET):
        out = jnp.where(t == MaterialType.VELVET,
                        _velvet_eval(mat, n, wo, wi), out)
    if _need(used, MaterialType.DISNEY):
        out = jnp.where(t == MaterialType.DISNEY,
                        _disney_eval_pdf(mat, n, wo, wi)[0], out)
    if _need(used, MaterialType.MICROFACET_REFRACTION):
        out = jnp.where(t == MaterialType.MICROFACET_REFRACTION,
                        _rough_dielectric_eval_pdf(mat, ns, wo, wi)[0], out)
    if _need(used, MaterialType.RETROREFLECTIVE):
        out = jnp.where(t == MaterialType.RETROREFLECTIVE,
                        _retro_eval_pdf(mat, n, wo, wi)[0], out)
    if _need(used, MaterialType.CAR_PAINT):
        out = jnp.where(t == MaterialType.CAR_PAINT,
                        _carpaint_eval_pdf(mat, n, wo, wi)[0], out)
    zero_types = (
        (t == MaterialType.SPECULAR)
        | (t == MaterialType.REFRACTION)
        | (t == MaterialType.EMISSIVE)
    )
    out = jnp.where(zero_types, 0.0, out)
    return out


def eval_pdf(mat, ns, wo, wi, used=None):
    """Solid-angle pdf of sample_brdf proposing wi; zero for singular."""
    n = orient_normal(ns, wo)
    mtype = mat["type"]
    nl = jnp.clip(vm.dot(n, wi, keepdims=False), 0.0, 1.0)
    out = nl / PI
    if _need(used, MaterialType.GGX):
        out = jnp.where(mtype == MaterialType.GGX,
                        _microfacet_eval(mat, n, wo, wi, "ggx")[1], out)
    if _need(used, MaterialType.BECKMANN):
        out = jnp.where(mtype == MaterialType.BECKMANN,
                        _microfacet_eval(mat, n, wo, wi, "beckmann")[1], out)
    if _need(used, MaterialType.DISNEY):
        out = jnp.where(mtype == MaterialType.DISNEY,
                        _disney_eval_pdf(mat, n, wo, wi)[1], out)
    if _need(used, MaterialType.MICROFACET_REFRACTION):
        out = jnp.where(mtype == MaterialType.MICROFACET_REFRACTION,
                        _rough_dielectric_eval_pdf(mat, ns, wo, wi)[1], out)
    if _need(used, MaterialType.RETROREFLECTIVE):
        out = jnp.where(mtype == MaterialType.RETROREFLECTIVE,
                        _retro_eval_pdf(mat, n, wo, wi)[1], out)
    if _need(used, MaterialType.CAR_PAINT):
        out = jnp.where(mtype == MaterialType.CAR_PAINT,
                        _carpaint_eval_pdf(mat, n, wo, wi)[1], out)
    zero = (
        (mtype == MaterialType.SPECULAR)
        | (mtype == MaterialType.REFRACTION)
        | (mtype == MaterialType.EMISSIVE)
    )
    return jnp.where(zero, 0.0, out)


def sample_brdf(mat, ns, wo, u1, u2, u3, used=None):
    """Sample wi ~ p(wi | wo). Returns dict:
      wi [N,3], pdf [N], bsdf [N,3], singular [N], transmission [N].

    used: optional static collection of MaterialType ints present in
    the scene; unused families are pruned from the compiled program.
    """
    n = orient_normal(ns, wo)
    mtype = mat["type"]
    t3 = mtype[..., None]

    # --- cosine-hemisphere family (diffuse / oren-nayar / velvet)
    wi_cos, pdf_cos = _cos_hemisphere_sample(n, u1, u2)
    wi = wi_cos

    if _need(used, MaterialType.GGX):
        h_ggx = _microfacet_sample_h(mat, n, u1, u2, "ggx")
        wi_ggx = vm.normalize(2.0 * vm.dot(wo, h_ggx) * h_ggx - wo)
        wi = jnp.where(t3 == MaterialType.GGX, wi_ggx, wi)
    if _need(used, MaterialType.BECKMANN):
        h_bek = _microfacet_sample_h(mat, n, u1, u2, "beckmann")
        wi_bek = vm.normalize(2.0 * vm.dot(wo, h_bek) * h_bek - wo)
        wi = jnp.where(t3 == MaterialType.BECKMANN, wi_bek, wi)

    # --- ideal mirror
    wi_spec = vm.reflect(wo, n)
    if _need(used, MaterialType.SPECULAR):
        wi = jnp.where(t3 == MaterialType.SPECULAR, wi_spec, wi)

    # --- ideal dielectric: Fresnel-weighted reflect/refract
    if _need(used, MaterialType.REFRACTION):
        entering = vm.dot(ns, wo, keepdims=False) > 0.0
        eta_i = jnp.where(entering, 1.0, mat["ior"])
        eta_t = jnp.where(entering, mat["ior"], 1.0)
        cos_i = jnp.clip(vm.dot(n, wo, keepdims=False), 0.0, 1.0)
        F = fresnel_dielectric(cos_i, eta_i, eta_t)
        wt, tir = vm.refract(wo, n, (eta_i / eta_t)[..., None])
        choose_reflect = (u3 < F) | tir
        wi_refr = jnp.where(choose_reflect[..., None], wi_spec, wt)
        wi = jnp.where(t3 == MaterialType.REFRACTION, wi_refr, wi)
    else:
        choose_reflect = jnp.ones(mtype.shape, bool)

    if _need(used, MaterialType.DISNEY):
        wi = jnp.where(t3 == MaterialType.DISNEY,
                       _disney_sample(mat, n, wo, u1, u2, u3), wi)
    if _need(used, MaterialType.MICROFACET_REFRACTION):
        wi_rt, rt_transmit = _rough_dielectric_sample(mat, ns, wo, u1, u2, u3)
        wi = jnp.where(t3 == MaterialType.MICROFACET_REFRACTION, wi_rt, wi)
    else:
        rt_transmit = jnp.zeros(mtype.shape, bool)
    if _need(used, MaterialType.RETROREFLECTIVE):
        wi = jnp.where(t3 == MaterialType.RETROREFLECTIVE,
                       _retro_sample(mat, n, wo, u1, u2, u3), wi)
    if _need(used, MaterialType.CAR_PAINT):
        wi = jnp.where(t3 == MaterialType.CAR_PAINT,
                       _carpaint_sample(mat, n, wo, u1, u2, u3), wi)

    # pdf + bsdf via the shared evaluators (keeps sample/eval consistent)
    pdf = eval_pdf(mat, ns, wo, wi, used=used)
    f = eval_bsdf(mat, ns, wo, wi, used=used)

    # singular overrides: pdf 1, f = weight / |cos|
    cos_wi = jnp.abs(vm.dot(n, wi, keepdims=False))
    inv_cos = 1.0 / jnp.maximum(cos_wi, 1e-6)
    is_spec = mtype == MaterialType.SPECULAR
    is_refr = mtype == MaterialType.REFRACTION
    f = jnp.where(is_spec[..., None], mat["base_color"] * inv_cos[..., None], f)
    # dielectric: weight 1 (color tint via base_color), Fresnel handled by
    # the discrete reflect/refract choice itself (probability = weight).
    f = jnp.where(is_refr[..., None], mat["base_color"] * inv_cos[..., None], f)
    pdf = jnp.where(is_spec | is_refr, 1.0, pdf)

    singular = is_spec | is_refr
    transmission = (is_refr & ~choose_reflect) | (
        (mtype == MaterialType.MICROFACET_REFRACTION) & rt_transmit
    )
    return {
        "wi": wi,
        "pdf": pdf,
        "bsdf": f,
        "singular": singular,
        "transmission": transmission,
    }
