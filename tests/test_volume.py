"""Volume rendering tests: HG phase, homogeneous + heterogeneous media
(SURVEY.md §2.4 volume core)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aten_tpu.volume.medium import hg_phase, hg_sample


def test_hg_phase_normalizes():
    # integral of phase over sphere == 1 (MC with uniform directions)
    rng = np.random.default_rng(0)
    d = rng.normal(size=(20000, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    for g in [0.0, 0.4, -0.6]:
        cos_t = jnp.asarray(d[:, 2])
        ph = np.asarray(hg_phase(jnp.float32(g), cos_t))
        integral = ph.mean() * 4.0 * np.pi
        assert abs(integral - 1.0) < 0.05, (g, integral)


def test_hg_sample_matches_phase():
    # sampled cos-theta distribution has mean == g (HG property)
    N = 8192
    u1 = jnp.asarray(np.random.default_rng(1).uniform(size=N).astype(np.float32))
    u2 = jnp.asarray(np.random.default_rng(2).uniform(size=N).astype(np.float32))
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (N, 3))  # travel +z
    for g in [0.0, 0.5, -0.5]:
        wi, pdf = hg_sample(jnp.full((N,), g, jnp.float32), wo, u1, u2)
        cos_t = np.asarray(wi)[:, 2]  # vs propagation dir +z
        assert abs(cos_t.mean() - g) < 0.05, (g, cos_t.mean())
        assert np.isfinite(np.asarray(pdf)).all()


@pytest.mark.parametrize("scene_kind", ["homogeneous", "hetero"])
def test_volume_scene_renders(scene_kind):
    from aten_tpu.integrator.volpt import render_volpt
    from aten_tpu.scene.scenedefs import hetero_volume_scene, homogeneous_volume_scene

    if scene_kind == "homogeneous":
        scene, cam = homogeneous_volume_scene(24, 24)
    else:
        scene, cam = hetero_volume_scene(24, 24, res=24)
    img = np.asarray(render_volpt(scene, cam, spp=2, max_depth=4, rr_depth=3))
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.mean() > 0.01  # light reaches film through the medium


def test_medium_attenuates_and_inscatters():
    """Moderate fog: transmission dims bright background pixels
    (Beer-Lambert) while dark-background pixels gain in-scattered glow."""
    from aten_tpu.integrator.volpt import render_volpt
    from aten_tpu.scene.scenedefs import homogeneous_volume_scene

    scene_fog, cam = homogeneous_volume_scene(24, 24, sigma_s=0.4, sigma_a=0.02)
    scene_thin, _ = homogeneous_volume_scene(24, 24, sigma_s=1e-4, sigma_a=1e-5)
    fog = np.asarray(render_volpt(scene_fog, cam, spp=8, max_depth=6, rr_depth=5))
    thin = np.asarray(render_volpt(scene_thin, cam, spp=8, max_depth=6, rr_depth=5))
    lt = thin.mean(-1)
    lf = fog.mean(-1)
    dark = lt <= np.quantile(lt, 0.08)  # darkest pixels of the clear render
    bright = lt > 0.3  # lit floor seen through/around the box
    assert bright.sum() > 10
    assert lf[dark].mean() > lt[dark].mean() * 1.15  # in-scattered glow
    assert lf[bright].mean() < lt[bright].mean()  # attenuation
