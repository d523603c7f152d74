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
# Dispatch tables
# ---------------------------------------------------------------------------

_DIFFUSE_LIKE = (
    MaterialType.DIFFUSE,
    MaterialType.OREN_NAYAR,
    MaterialType.VELVET,
    MaterialType.EMISSIVE,  # harmless fallback if sampled
)


def eval_bsdf(mat, ns, wo, wi):
    """f(wo, wi) for non-singular lobes; zero for singular/emissive."""
    n = orient_normal(ns, wo)
    mtype = mat["type"]
    nl = jnp.clip(vm.dot(n, wi, keepdims=False), 0.0, 1.0)[..., None]

    f = mat["base_color"] / PI * jnp.ones_like(nl)  # DIFFUSE
    f = jnp.where((nl > 0), f, 0.0)
    f_on = _oren_nayar_eval(mat, n, wo, wi)
    f_ggx, _ = _microfacet_eval(mat, n, wo, wi, "ggx")
    f_bek, _ = _microfacet_eval(mat, n, wo, wi, "beckmann")
    f_vel = _velvet_eval(mat, n, wo, wi)

    t = mtype[..., None]
    out = jnp.where(t == MaterialType.OREN_NAYAR, f_on, f)
    out = jnp.where(t == MaterialType.GGX, f_ggx, out)
    out = jnp.where(t == MaterialType.BECKMANN, f_bek, out)
    out = jnp.where(t == MaterialType.VELVET, f_vel, out)
    zero_types = (
        (t == MaterialType.SPECULAR)
        | (t == MaterialType.REFRACTION)
        | (t == MaterialType.EMISSIVE)
    )
    out = jnp.where(zero_types, 0.0, out)
    return out


def eval_pdf(mat, ns, wo, wi):
    """Solid-angle pdf of sample_brdf proposing wi; zero for singular."""
    n = orient_normal(ns, wo)
    mtype = mat["type"]
    nl = jnp.clip(vm.dot(n, wi, keepdims=False), 0.0, 1.0)
    pdf_cos = nl / PI
    _, pdf_ggx = _microfacet_eval(mat, n, wo, wi, "ggx")
    _, pdf_bek = _microfacet_eval(mat, n, wo, wi, "beckmann")
    out = pdf_cos
    out = jnp.where(mtype == MaterialType.GGX, pdf_ggx, out)
    out = jnp.where(mtype == MaterialType.BECKMANN, pdf_bek, out)
    zero = (
        (mtype == MaterialType.SPECULAR)
        | (mtype == MaterialType.REFRACTION)
        | (mtype == MaterialType.EMISSIVE)
    )
    return jnp.where(zero, 0.0, out)


def sample_brdf(mat, ns, wo, u1, u2, u3):
    """Sample wi ~ p(wi | wo). Returns dict:
      wi [N,3], pdf [N], bsdf [N,3], singular [N], transmission [N].
    """
    n = orient_normal(ns, wo)
    mtype = mat["type"]

    # --- cosine-hemisphere family (diffuse / oren-nayar / velvet)
    wi_cos, pdf_cos = _cos_hemisphere_sample(n, u1, u2)

    # --- GGX / Beckmann: sample half-vector, reflect
    h_ggx = _microfacet_sample_h(mat, n, u1, u2, "ggx")
    wi_ggx = vm.normalize(2.0 * vm.dot(wo, h_ggx) * h_ggx - wo)
    h_bek = _microfacet_sample_h(mat, n, u1, u2, "beckmann")
    wi_bek = vm.normalize(2.0 * vm.dot(wo, h_bek) * h_bek - wo)

    # --- ideal mirror
    wi_spec = vm.reflect(wo, n)

    # --- ideal dielectric: Fresnel-weighted reflect/refract
    entering = vm.dot(ns, wo, keepdims=False) > 0.0
    eta_i = jnp.where(entering, 1.0, mat["ior"])
    eta_t = jnp.where(entering, mat["ior"], 1.0)
    cos_i = jnp.clip(vm.dot(n, wo, keepdims=False), 0.0, 1.0)
    F = fresnel_dielectric(cos_i, eta_i, eta_t)
    wt, tir = vm.refract(wo, n, (eta_i / eta_t)[..., None])
    choose_reflect = (u3 < F) | tir
    wi_refr = jnp.where(choose_reflect[..., None], wi_spec, wt)

    # assemble wi
    t3 = mtype[..., None]
    wi = wi_cos
    wi = jnp.where(t3 == MaterialType.GGX, wi_ggx, wi)
    wi = jnp.where(t3 == MaterialType.BECKMANN, wi_bek, wi)
    wi = jnp.where(t3 == MaterialType.SPECULAR, wi_spec, wi)
    wi = jnp.where(t3 == MaterialType.REFRACTION, wi_refr, wi)

    # pdf + bsdf via the shared evaluators (keeps sample/eval consistent)
    pdf = eval_pdf(mat, ns, wo, wi)
    f = eval_bsdf(mat, ns, wo, wi)

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
    transmission = is_refr & ~choose_reflect
    return {
        "wi": wi,
        "pdf": pdf,
        "bsdf": f,
        "singular": singular,
        "transmission": transmission,
    }
