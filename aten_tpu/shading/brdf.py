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

import jax
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
# Retroreflective (retroreflective.cpp): three-component corner-cube
# sheeting model — Beckmann surface reflection + the paper's
# retroreflection lobe (an NDF about the REVERSED incident direction,
# scaled by the sheet's effective retroreflective area ERA(theta) and a
# double Fresnel transmission) + an energy-compensated diffuse floor.
# The ERA table is OUR OWN measurement (utils/retroreflective.py, the
# analytically validated corner-cube ray-count tool), phi-averaged —
# same role as the reference's baked ERATable
# (retroreflective.cpp:58-160) with independent provenance.
# ---------------------------------------------------------------------------

_ERA_CACHE = {}


def _era_theta_table(steps=91):
    """[steps] ERA values over theta in [0, pi/2], phi-averaged."""
    if steps not in _ERA_CACHE:
        from aten_tpu.utils.retroreflective import era

        thetas = np.linspace(0.0, np.pi / 2, steps).astype(np.float32)
        phis = np.linspace(0.0, np.pi, 16, endpoint=False).astype(np.float32)
        tt = np.repeat(thetas, len(phis))
        pp = np.tile(phis, len(thetas))
        # pure-NumPy host computation: the old eager-jnp build dispatched
        # ~60 tiny device ops at trace time, which costs minutes through
        # the remote-TPU tunnel (each eager op is its own compile+RPC)
        vals = np.asarray(era(tt, pp, n_orgs=48, xp=np)).reshape(
            steps, len(phis))
        _ERA_CACHE[steps] = (thetas, vals.mean(axis=1).astype(np.float32))
    return _ERA_CACHE[steps]


def _refract_dir(d, n, eta):
    """Refract incident d (pointing INTO the surface) about n
    (material::ComputeRefractVector role).  eta = ni/nt, per-lane."""
    eta = jnp.asarray(eta)
    cos_i = -vm.dot(d, n, keepdims=False)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    k = jnp.maximum(k, 0.0)
    ut = eta[..., None] * d + (eta * cos_i - jnp.sqrt(k))[..., None] * n
    return vm.normalize(ut)


def _retro_components(mat, n, wo, wi):
    """Per-component (f, pdf) triplets + normalized lobe weights.

    Conventions: reference wi (incident) = -wo here; reference wo
    (scattered) = wi here; uo := -ref_wi = wo.
    """
    rough = jnp.clip(mat["roughness"], 0.01, 1.0)
    ior = jnp.maximum(mat["ior"], 1.01)
    ni, nt = 1.0, ior
    f0 = ((ni - nt) / (ni + nt)) ** 2

    nv = vm.dot(n, wo, keepdims=False)
    nl = vm.dot(n, wi, keepdims=False)

    # refracted mean direction into the prismatic sheet
    ut = _refract_dir(-wo, n, ni / nt)
    cos_t = jnp.clip(vm.dot(ut, -n, keepdims=False), 0.0, 1.0)
    theta = jnp.arccos(cos_t)
    th_tab, era_tab = _era_theta_table()
    # uniform-grid lerp: jnp.interp lowers to a vmapped searchsorted
    # WHILE loop (measured 470 ms/bounce at 8.4M lanes on v5e); the ERA
    # table is linspace(0, pi/2), so the bin index is direct arithmetic
    steps = len(era_tab)
    pos = jnp.clip(theta / jnp.float32(th_tab[1] - th_tab[0]),
                   0.0, jnp.float32(steps - 1) - 1e-6)
    i0 = pos.astype(jnp.int32)
    fr = pos - i0.astype(jnp.float32)
    # both lerp endpoints in ONE one-hot MXU gather of a staged
    # [steps, 2] (tab[i], tab[i+1]) pair table: two plain takes at
    # wavefront width cost ~79 ms/bounce EACH on the 8.4M-lane zoo
    # (xplane r5 leg 2); the one-hot matmul over a 91-row table is ~1 ms
    from aten_tpu.ops.gather import take_rows

    import numpy as _np
    pairs = jnp.asarray(_np.stack(
        [_np.asarray(era_tab, _np.float32),
         _np.asarray(list(era_tab[1:]) + [era_tab[-1]], _np.float32)],
        axis=1))
    shp = i0.shape
    pr = take_rows(pairs, i0.reshape(-1)).reshape(shp + (2,))
    E = pr[..., 0] * (1.0 - fr) + pr[..., 1] * fr

    # lobe weights (Retroreflective::ComputeWeights)
    F_in = fresnel_schlick(jnp.clip(nv, 0.0, 1.0), f0)
    w_sr = F_in
    w_rr = (1.0 - F_in) * E
    w_d = (1.0 - F_in) * (1.0 - E)
    norm = jnp.maximum(w_sr + w_rr + w_d, 1e-8)
    w_sr, w_rr, w_d = w_sr / norm, w_rr / norm, w_d / norm

    # 1) surface reflection: Beckmann microfacet (RetroreflectiveSurfaceReflection)
    f_sr, pdf_sr = _microfacet_eval(mat, n, wo, wi, "beckmann")

    # 2) retroreflection (Eq.2-14): NDF about uo = wo with the
    # refraction-Jacobian-widened roughness
    nn = nt / ni
    utn = vm.dot(ut, n, keepdims=False)
    j1d = nv + nn * utn
    j2d = -nn * utn + nv
    absnv = jnp.abs(nv)
    J1 = jnp.where(j1d > 0, absnv / jnp.maximum(j1d * j1d, 1e-12), 0.0)
    J2 = jnp.where(j2d > 0, absnv / jnp.maximum(j2d * j2d, 1e-12), 0.0)
    a2 = rough * rough
    a0 = jnp.sqrt(
        jnp.where(J1 > 0, a2 / jnp.maximum(J1, 1e-12), 0.0)
        + jnp.where(J2 > 0, a2 / jnp.maximum(J2, 1e-12), 0.0)
    )
    a0 = jnp.clip(a0, 1e-3, None)
    c_retro = jnp.clip(vm.dot(wi, wo, keepdims=False), 0.0, 1.0)
    D = _beckmann_d(c_retro, a0)
    F_rr = (1.0 - fresnel_schlick(jnp.clip(nv, 0.0, 1.0), f0)) * (
        1.0 - fresnel_schlick(jnp.clip(nl, 0.0, 1.0), f0)
    )
    G = _beckmann_g1(jnp.abs(vm.dot(-wo, ut, keepdims=False)), rough) * \
        _beckmann_g1(jnp.abs(vm.dot(ut, wi, keepdims=False)), rough)
    f_rr = jnp.where(
        jnp.abs(nl) > 1e-6, E * F_rr * G * D / jnp.maximum(jnp.abs(nl), 1e-6), 0.0
    )
    pdf_rr = D * c_retro

    # 3) diffuse floor with multiple-scattering compensation (Eq.15-18)
    kd = 1.0
    brdf0 = F_rr * (1.0 - E) * (ni / nt) ** 2 * (kd / PI)
    Fd = (1.0 - f0) * (-160.0 / 21.0)
    f_d = brdf0 / (1.0 - kd * Fd)
    pdf_cos = jnp.maximum(nl, 0.0) / PI
    pdf_d = 1.0 / jnp.maximum(1.0 - pdf_cos, 1e-3)

    valid = (nv > 0) & (nl > 0)
    base = mat["base_color"]
    f = (f_sr + jnp.where(valid, f_rr + f_d, 0.0)[..., None] * base)
    pdf = w_sr * pdf_sr + jnp.where(
        valid, w_rr * pdf_rr + w_d * pdf_d, 0.0
    )
    return f, pdf, (w_sr, w_rr, w_d), (a0, ut)


def _retro_eval_pdf(mat, n, wo, wi):
    f, pdf, _, _ = _retro_components(mat, n, wo, wi)
    return f, pdf


def _retro_sample(mat, n, wo, u1, u2, u3):
    """Component pick by the normalized weights (Retroreflective::sample):
    surface reflection samples the Beckmann half-vector; retroreflection
    samples the widened NDF about uo = wo; diffuse is cosine."""
    # weights depend only on (wo, n) — evaluate with wi = wo placeholder
    _, _, (w_sr, w_rr, _), (a0, _) = _retro_components(mat, n, wo, wo)

    mat_b = dict(mat)
    h = _microfacet_sample_h(mat_b, n, u1, u2, "beckmann")
    wi_sr = vm.normalize(2.0 * vm.dot(wo, h) * h - wo)

    # Beckmann-sampled lobe about uo = wo with roughness a0
    u1c = jnp.clip(u1, 1e-7, 1.0 - 1e-7)
    tan2 = -(a0 * a0) * jnp.log(jnp.maximum(1.0 - u1c * 0.99, 1e-7))
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * PI * u2
    local = jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )
    wi_rr = vm.normalize(vm.to_world(local, vm.normalize(wo)))

    wi_d, _ = _cos_hemisphere_sample(n, u1, u2)

    c1 = (u3 < w_sr)[..., None]
    c2 = (u3 < w_sr + w_rr)[..., None]
    return jnp.where(c1, wi_sr, jnp.where(c2, wi_rr, wi_d))


# ---------------------------------------------------------------------------
# Car paint (car_paint.cpp): Fresnel-weighted clearcoat Beckmann lobe
# over a flake layer — the PROCEDURAL FlakesNormal pattern decides per
# shading point whether the base is a metallic flake (wide Beckmann,
# flakes_color) or the pigment diffuse.  Shade-time flake fields
# (coverage + tangent flake normal at the hit uv) are attached to the
# gathered material by `carpaint_flake_fields`; unit contexts without uv
# fall back to the expected coverage (flake_density).
# ---------------------------------------------------------------------------


def carpaint_flake_fields(mat, uv, ns):
    """Attach per-lane flake data (CarPaint::applyNormalMap +
    FlakesNormal::gen role): mat['flake_a'] coverage at uv and
    mat['flake_nml'] the world-space flake-perturbed normal."""
    from aten_tpu.utils.flakes import flakes_gen

    nml_t, a = flakes_gen(
        uv[..., 0], uv[..., 1],
        mat["flake_scale"], mat["flake_size"],
        mat["flake_size_variance"], mat["flake_normal_orientation"],
    )
    mat = dict(mat)
    mat["flake_a"] = a
    mat["flake_nml"] = vm.normalize(vm.to_world(nml_t, ns))
    return mat


def _carpaint_fields(mat, n):
    from aten_tpu.utils.flakes import flake_density

    dens = flake_density(mat["flake_size"])
    a = mat.get("flake_a")
    if a is None:
        a = dens  # expected coverage when no uv context (unit tests)
    n_fl = mat.get("flake_nml")
    if n_fl is None:
        n_fl = n
    return dens, a, n_fl


_FLAKE_ROUGH = 1.0   # car_paint.cpp:162 (flake lobe roughness)
_FLAKE_IOR = 10.0    # car_paint.cpp:163


def _carpaint_eval_pdf(mat, n, wo, wi):
    nv = vm.dot(n, wo, keepdims=False)
    nl = vm.dot(n, wi, keepdims=False)
    F = fresnel_dielectric(jnp.clip(nv, 0.0, 1.0), 1.0, mat["clearcoat_ior"])
    dens, a, n_fl = _carpaint_fields(mat, n)

    # clearcoat: Beckmann(clearcoat_roughness, clearcoat_ior)
    mat_cc = dict(mat, roughness=mat["clearcoat_roughness"],
                  ior=mat["clearcoat_ior"],
                  base_color=mat["clearcoat_color"])
    f_cc, pdf_cc = _microfacet_eval(mat_cc, n, wo, wi, "beckmann")

    # flakes: wide Beckmann about the flake-perturbed normal
    mat_fl = dict(mat, roughness=jnp.full_like(nv, _FLAKE_ROUGH),
                  ior=jnp.full_like(nv, _FLAKE_IOR),
                  base_color=mat["flakes_color"]
                  * mat["flake_color_multiplier"][..., None])
    f_fl, _ = _microfacet_eval(mat_fl, n_fl, wo, wi, "beckmann")
    mat_fl_pdf = dict(mat_fl)
    _, pdf_fl = _microfacet_eval(mat_fl_pdf, n, wo, wi, "beckmann")

    # pigment diffuse
    f_diff = mat["base_color"] / PI

    valid = (nv > 0) & (nl > 0)
    f = (
        F[..., None] * f_cc
        + (1.0 - F)[..., None]
        * (a[..., None] * f_fl + (1.0 - a)[..., None] * f_diff)
    )
    f = jnp.where(valid[..., None], f, 0.0)
    pdf_diff = jnp.maximum(nl, 0.0) / PI
    pdf = F * pdf_cc + (1.0 - F) * (dens * pdf_fl + (1.0 - dens) * pdf_diff)
    return f, jnp.where(valid, pdf, 0.0)


def _carpaint_sample(mat, n, wo, u1, u2, u3):
    nv = vm.dot(n, wo, keepdims=False)
    F = fresnel_dielectric(jnp.clip(nv, 0.0, 1.0), 1.0, mat["clearcoat_ior"])
    dens, _, _ = _carpaint_fields(mat, n)

    mat_cc = dict(mat, roughness=mat["clearcoat_roughness"])
    h_cc = _microfacet_sample_h(mat_cc, n, u1, u2, "beckmann")
    wi_cc = vm.normalize(2.0 * vm.dot(wo, h_cc) * h_cc - wo)

    mat_fl = dict(mat, roughness=jnp.full_like(nv, _FLAKE_ROUGH))
    h_fl = _microfacet_sample_h(mat_fl, n, u1, u2, "beckmann")
    wi_fl = vm.normalize(2.0 * vm.dot(wo, h_fl) * h_fl - wo)

    wi_d, _ = _cos_hemisphere_sample(n, u1, u2)

    pick_cc = (u3 < F)[..., None]
    # re-stretch u3 for the base pick (CarPaint::sampleDirection)
    u3b = jnp.clip((u3 - F) / jnp.maximum(1.0 - F, 1e-6), 0.0, 1.0)
    pick_fl = (u3b < dens)[..., None]
    return jnp.where(pick_cc, wi_cc, jnp.where(pick_fl, wi_fl, wi_d))


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


def eval_bsdf_pdf(mat, ns, wo, wi, used=None):
    """Fused f(wo,wi) + pdf(wo,wi) in ONE pass: the microfacet/Disney/
    retro/carpaint evaluators already compute both, so NEE calling
    eval_bsdf then eval_pdf separately paid every family twice."""
    n = orient_normal(ns, wo)
    mtype = mat["type"]
    t = mtype[..., None]
    nl = jnp.clip(vm.dot(n, wi, keepdims=False), 0.0, 1.0)

    f = mat["base_color"] / PI * jnp.ones_like(nl)[..., None]
    f = jnp.where((nl[..., None] > 0), f, 0.0)
    pdf = nl / PI
    if _need(used, MaterialType.OREN_NAYAR):
        f = jnp.where(t == MaterialType.OREN_NAYAR,
                      _oren_nayar_eval(mat, n, wo, wi), f)
    if _need(used, MaterialType.VELVET):
        f = jnp.where(t == MaterialType.VELVET,
                      _velvet_eval(mat, n, wo, wi), f)
    for ty, both in (
        (MaterialType.GGX,
         lambda: _microfacet_eval(mat, n, wo, wi, "ggx")),
        (MaterialType.BECKMANN,
         lambda: _microfacet_eval(mat, n, wo, wi, "beckmann")),
        (MaterialType.DISNEY, lambda: _disney_eval_pdf(mat, n, wo, wi)),
        (MaterialType.MICROFACET_REFRACTION,
         lambda: _rough_dielectric_eval_pdf(mat, ns, wo, wi)),
        (MaterialType.RETROREFLECTIVE,
         lambda: _retro_eval_pdf(mat, n, wo, wi)),
        (MaterialType.CAR_PAINT, lambda: _carpaint_eval_pdf(mat, n, wo, wi)),
    ):
        if _need(used, ty):
            fv, pv = both()
            f = jnp.where(t == ty, fv, f)
            pdf = jnp.where(mtype == ty, pv, pdf)
    zero = (
        (mtype == MaterialType.SPECULAR)
        | (mtype == MaterialType.REFRACTION)
        | (mtype == MaterialType.EMISSIVE)
    )
    f = jnp.where(zero[..., None], 0.0, f)
    pdf = jnp.where(zero, 0.0, pdf)
    return f, pdf


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

    # pdf + bsdf via the shared FUSED evaluator (keeps sample/eval
    # consistent; one family sweep instead of two)
    f, pdf = eval_bsdf_pdf(mat, ns, wo, wi, used=used)

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
