"""BRDF correctness: white-furnace energy bounds, sample/pdf consistency,
reciprocity-ish sanity (SURVEY.md §4a: white-furnace + chi^2 style tests
that the reference never had)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aten_tpu.core import sampler as smp
from aten_tpu.core import vecmath as vm
from aten_tpu.scene.materials import MaterialTable, MaterialType, gather_material
from aten_tpu.shading import brdf


def _mat_row(mtype, **kw):
    t = MaterialTable()
    t.add(mtype, **kw)
    arr = t.arrays()
    return gather_material(arr, jnp.zeros((1,), jnp.int32))


def _batch_mat(mat, n):
    return {k: jnp.broadcast_to(v, (n,) + v.shape[1:]) for k, v in mat.items()}


N = 4096


@jax.jit
def _estimate_reflectance(mat_b, wo):
    """Monte-Carlo integral of f*cos/pdf over sampled directions."""
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (N, 3))
    pix = jnp.arange(N, dtype=jnp.uint32)
    st = smp.make_state(smp.wang_hash(pix), 0, 0, 1)
    u1, u2, st = smp.next_2d(st)
    u3, st = smp.next_1d(st)
    s = brdf.sample_brdf(mat_b, n, wo, u1, u2, u3)
    cos = jnp.abs(vm.dot(n, s["wi"], keepdims=False))
    w = s["bsdf"] * (cos / jnp.maximum(s["pdf"], 1e-9))[..., None]
    return jnp.mean(w, axis=0)


@pytest.mark.parametrize(
    "mtype,kw",
    [
        (MaterialType.DIFFUSE, {}),
        (MaterialType.OREN_NAYAR, {"roughness": 0.5}),
        (MaterialType.GGX, {"roughness": 0.3, "ior": 1.8}),
        (MaterialType.BECKMANN, {"roughness": 0.3, "ior": 1.8}),
        (MaterialType.SPECULAR, {}),
        (MaterialType.REFRACTION, {"ior": 1.5}),
        (MaterialType.VELVET, {"roughness": 0.4}),
        (MaterialType.DISNEY, {"roughness": 0.4, "metallic": 0.3, "clearcoat": 0.5, "sheen": 0.3}),
        (MaterialType.MICROFACET_REFRACTION, {"roughness": 0.2, "ior": 1.5}),
        (MaterialType.RETROREFLECTIVE, {"roughness": 0.2}),
        (MaterialType.CAR_PAINT, {"roughness": 0.3}),
    ],
)
def test_energy_conservation(mtype, kw):
    """White furnace: reflectance estimate must stay <= 1 (+MC slack)."""
    mat = _mat_row(mtype, base_color=(1.0, 1.0, 1.0), **kw)
    mat_b = _batch_mat(mat, N)
    wo = vm.normalize(jnp.broadcast_to(jnp.asarray([0.3, 0.1, 0.9]), (N, 3)))
    refl = np.asarray(_estimate_reflectance(mat_b, wo))
    assert np.isfinite(refl).all()
    assert refl.max() <= 1.05, refl


def test_diffuse_furnace_exact():
    mat = _mat_row(MaterialType.DIFFUSE, base_color=(1.0, 1.0, 1.0))
    mat_b = _batch_mat(mat, N)
    wo = vm.normalize(jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (N, 3)))
    refl = np.asarray(_estimate_reflectance(mat_b, wo))
    np.testing.assert_allclose(refl, 1.0, atol=1e-3)  # f*cos/pdf == albedo exactly


@pytest.mark.parametrize(
    "mtype,kw",
    [
        (MaterialType.DIFFUSE, {}),
        (MaterialType.GGX, {"roughness": 0.4, "ior": 1.6}),
        (MaterialType.BECKMANN, {"roughness": 0.4, "ior": 1.6}),
        (MaterialType.DISNEY, {"roughness": 0.4, "metallic": 0.5}),
        (MaterialType.MICROFACET_REFRACTION, {"roughness": 0.3, "ior": 1.5}),
        (MaterialType.RETROREFLECTIVE, {"roughness": 0.3}),
        (MaterialType.CAR_PAINT, {"roughness": 0.3}),
    ],
)
def test_sample_eval_pdf_consistent(mtype, kw):
    """pdf returned by sampling == eval_pdf at the sampled direction."""
    mat = _mat_row(mtype, **kw)
    mat_b = _batch_mat(mat, 512)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (512, 3))
    wo = vm.normalize(jnp.broadcast_to(jnp.asarray([0.4, -0.2, 0.8]), (512, 3)))
    pix = jnp.arange(512, dtype=jnp.uint32)
    st = smp.make_state(smp.wang_hash(pix), 0, 0, 1)
    u1, u2, st = smp.next_2d(st)
    u3, _ = smp.next_1d(st)
    s = jax.jit(brdf.sample_brdf)(mat_b, n, wo, u1, u2, u3)
    pdf2 = jax.jit(brdf.eval_pdf)(mat_b, n, wo, s["wi"])
    np.testing.assert_allclose(
        np.asarray(s["pdf"]), np.asarray(pdf2), rtol=2e-3, atol=1e-5
    )


def test_fresnel_dielectric_limits():
    # normal incidence: ((n1-n2)/(n1+n2))^2 ; grazing: -> 1
    f0 = brdf.fresnel_dielectric(jnp.asarray([1.0]), 1.0, 1.5)
    np.testing.assert_allclose(float(f0[0]), ((1 - 1.5) / (2.5)) ** 2, rtol=1e-5)
    fg = brdf.fresnel_dielectric(jnp.asarray([0.001]), 1.0, 1.5)
    assert float(fg[0]) > 0.97


def test_refraction_snell():
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = vm.normalize(jnp.asarray([[0.5, 0.0, 0.8]]))
    wt, tir = vm.refract(wo, n, jnp.asarray([[1.0 / 1.5]]))
    assert not bool(tir[0])
    # Snell: sin_t = sin_i / 1.5
    sin_i = float(jnp.sqrt(1 - vm.dot(wo, n, keepdims=False) ** 2)[0])
    sin_t = float(jnp.sqrt(1 - vm.dot(-wt, -n, keepdims=False) ** 2)[0])
    np.testing.assert_allclose(sin_t, sin_i / 1.5, rtol=1e-5)
    assert float(wt[0, 2]) < 0  # transmitted to the other side


def test_retroreflective_peak_toward_source():
    """Corner-cube sheeting sends light BACK toward the source: eval at
    wi == wo must dominate eval at the mirror direction (the signature
    the reference's ERA model produces, retroreflective.cpp:176-300)."""
    mat = _mat_row(MaterialType.RETROREFLECTIVE, roughness=0.15, ior=1.5)
    mat_b = _batch_mat(mat, 1)
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = vm.normalize(jnp.asarray([[0.35, 0.0, 0.9]]))
    # retro direction = wo; side = same polar angle, rotated azimuth
    # (not the mirror lobe, not the retro lobe -> diffuse floor only)
    wi_retro = wo
    wi_side = vm.normalize(jnp.asarray([[0.0, 0.35, 0.9]]))
    f_retro = np.asarray(brdf.eval_bsdf(mat_b, n, wo, wi_retro))[0]
    f_side = np.asarray(brdf.eval_bsdf(mat_b, n, wo, wi_side))[0]
    assert f_retro.mean() > 4.0 * f_side.mean(), (f_retro, f_side)


def test_retro_era_table_shape():
    """Our measured ERA curve: high plateau near normal incidence,
    decaying to zero by ~60 deg (matches the corner-cube geometry the
    reference's baked table encodes)."""
    th, vals = brdf._era_theta_table()
    assert vals[0] > 0.5
    assert vals[:5].max() <= 0.75
    deg = np.degrees(th)
    assert vals[deg > 65].max() < 1e-3
    # roughly monotone decreasing after the plateau
    head = vals[deg < 10].mean()
    mid = vals[(deg > 25) & (deg < 35)].mean()
    assert head > mid > vals[deg > 55].mean()


def test_carpaint_flake_fields_coverage():
    """Procedural flake coverage tracks the analytic density and the
    flake normal tilts away from the surface normal on flakes."""
    from aten_tpu.shading.brdf import carpaint_flake_fields

    mat = _mat_row(MaterialType.CAR_PAINT, flake_size=0.25)
    Np = 8192
    mat_b = _batch_mat(mat, Np)
    rng = np.random.default_rng(1)
    uv = jnp.asarray(rng.uniform(0, 1, (Np, 2)).astype(np.float32))
    ns = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (Np, 3))
    m2 = carpaint_flake_fields(mat_b, uv, ns)
    cover = float(np.asarray(m2["flake_a"]).mean())
    dens = float(np.pi * 0.25 ** 2)
    # the jittered 3d cell offsets shrink the effective disc, so real
    # coverage sits below the analytic pi*size^2 (which, as in the
    # reference, is only the SAMPLING weight, FlakesNormal.h:21-55)
    assert 0.2 * dens < cover < 1.2 * dens, (cover, dens)
    # flake normals deviate from N on flakes, equal N off flakes
    dev = 1.0 - np.asarray(vm.dot(m2["flake_nml"], ns, keepdims=False))
    a = np.asarray(m2["flake_a"]) > 0
    assert dev[a].mean() > 1e-3
    np.testing.assert_allclose(dev[~a], 0.0, atol=1e-6)


def test_carpaint_flakes_color_visible():
    """Flake lanes reflect flakes_color through the wide Beckmann lobe:
    eval with flake coverage forced on vs off must differ."""
    mat = _mat_row(
        MaterialType.CAR_PAINT, base_color=(0.6, 0.05, 0.05),
        flakes_color=(1.0, 1.0, 0.0),
    )
    mat_b = _batch_mat(mat, 4)
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (4, 3))
    wo = vm.normalize(jnp.broadcast_to(jnp.asarray([0.2, 0.1, 0.95]), (4, 3)))
    wi = vm.normalize(jnp.broadcast_to(jnp.asarray([-0.3, 0.2, 0.9]), (4, 3)))
    m_on = dict(mat_b, flake_a=jnp.ones(4), flake_nml=n)
    m_off = dict(mat_b, flake_a=jnp.zeros(4), flake_nml=n)
    f_on = np.asarray(brdf.eval_bsdf(m_on, n, wo, wi))
    f_off = np.asarray(brdf.eval_bsdf(m_off, n, wo, wi))
    assert not np.allclose(f_on, f_off)
    # flake lobe carries no blue (flakes_color = yellow)
    assert f_on[:, 2].mean() < f_on[:, 0].mean()
