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
