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


def test_medium_stack_nested_media():
    """Glass shell around smoke (VERDICT r01 #7): exiting the inner
    boundary must RESTORE the outer medium from the stack — the 1-deep
    register this replaces forgot it.  Checks the stack ops directly
    plus an end-to-end nested render staying finite and darker inside."""
    import jax.numpy as jnp

    from aten_tpu.integrator import volpt as vp

    # direct stack semantics (UpdateMedium, volume_pathtracing_impl.h:24-48)
    N = 4
    mstack = jnp.full((N, vp.MEDIUM_STACK_DEPTH), -1, jnp.int32)
    msize = jnp.zeros((N,), jnp.int32)
    t = jnp.ones((N,), bool)
    mat_outer = {"medium": jnp.full((N,), 2, jnp.int32)}
    mat_inner = {"medium": jnp.full((N,), 5, jnp.int32)}
    # enter outer, enter inner, exit inner -> current medium = outer
    mstack, msize = vp._update_medium(mstack, msize, t, t, mat_outer, t)
    mstack, msize = vp._update_medium(mstack, msize, t, t, mat_inner, t)
    assert int(vp._stack_top(mstack, msize)[0]) == 5
    mstack, msize = vp._update_medium(mstack, msize, t, ~t, mat_inner, t)
    assert int(vp._stack_top(mstack, msize)[0]) == 2
    mstack, msize = vp._update_medium(mstack, msize, t, ~t, mat_outer, t)
    assert int(vp._stack_top(mstack, msize)[0]) == -1
    # overflow guard: pushes beyond depth are dropped, pops floor at 0
    for _ in range(vp.MEDIUM_STACK_DEPTH + 2):
        mstack, msize = vp._update_medium(mstack, msize, t, t, mat_inner, t)
    assert int(msize[0]) == vp.MEDIUM_STACK_DEPTH
    for _ in range(vp.MEDIUM_STACK_DEPTH + 2):
        mstack, msize = vp._update_medium(mstack, msize, t, ~t, mat_inner, t)
    assert int(msize[0]) == 0

    # end-to-end: fog box CONTAINING a denser inner box; rays crossing
    # the inner box then its far boundary must still see the outer fog
    import numpy as np

    from aten_tpu.core.camera import PinholeCamera
    from aten_tpu.scene.materials import MaterialType
    from aten_tpu.scene.scene import SceneBuilder
    from aten_tpu.scene.scenedefs import _add_box

    b = SceneBuilder()
    lm = b.add_material(MaterialType.EMISSIVE, base_color=(3, 3, 3))
    b.add_quad((-8, -8, -6), (8, -8, -6), (8, 8, -6), (-8, 8, -6), lm)
    fog = b.add_medium(sigma_a=(0.25,) * 3, sigma_s=(0.02,) * 3, g=0.0)
    dense = b.add_medium(sigma_a=(3.0,) * 3, sigma_s=(0.05,) * 3, g=0.0)
    mo = b.add_material(MaterialType.REFRACTION, ior=1.0, medium=fog)
    mi = b.add_material(MaterialType.REFRACTION, ior=1.0, medium=dense)
    _add_box(b, (-3, -3, -3), (3, 3, 3), mo)
    _add_box(b, (-1, -1, -1), (1, 1, 1), mi)
    sc = b.build()
    cam = PinholeCamera(origin=(0, 0, 8), lookat=(0, 0, 0), vfov_deg=35,
                        width=24, height=24)
    img = np.asarray(vp.render_volpt(sc, cam, spp=6, max_depth=8))
    assert np.isfinite(img).all()
    center = img[12, 12].mean()   # through fog + dense + fog
    edge = img[2, 2].mean()       # fog only
    assert center < edge


def test_ratio_tracking_matches_beer_lambert():
    """Estimator gate for the brick-skipping/early-exit rework: ratio
    tracking over a CONSTANT density grid must reproduce the analytic
    Beer-Lambert transmittance in expectation (the majorant equals the
    density, so every tentative collision is real and the product
    telescopes to ~exp(-sigma*d))."""
    import jax.numpy as jnp
    import numpy as np

    from aten_tpu.volume.medium import MediumTable, transmittance

    tbl = MediumTable()
    tbl.add(sigma_a=(0.4, 0.4, 0.4), sigma_s=(0.6, 0.6, 0.6), g=0.0,
            grid=np.full((8, 8, 8), 0.7, np.float32),
            grid_bmin=(-1, -1, -1), grid_bmax=(1, 1, 1))
    scene = tbl.arrays()
    n = 4096
    ro = jnp.tile(jnp.asarray([[-0.99, 0.0, 0.0]], jnp.float32), (n, 1))
    rd = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
    dist = jnp.full((n,), 1.5, jnp.float32)
    mid = jnp.zeros((n,), jnp.int32)
    seeds = jnp.arange(n, dtype=jnp.uint32)
    tr = np.asarray(transmittance(scene, mid, ro, rd, dist, seeds))
    expect = np.exp(-0.7 * (0.4 + 0.6) * 1.5)
    assert abs(tr[:, 0].mean() - expect) < 0.02, (tr[:, 0].mean(), expect)


def test_brick_skipping_unbiased():
    """Brick empty-space skipping must not change the rendered mean:
    compare the hetero fixture with and without grid_brickmax at
    matched sample counts (different RNG realizations; agreement is
    statistical, bounded by the pixel-averaged MC error)."""
    import numpy as np

    from aten_tpu.integrator.volpt import render_volpt
    from aten_tpu.scene.scenedefs import hetero_volume_scene

    scene, cam = hetero_volume_scene(24, 24, res=24)
    spp = 24
    img_brick = np.asarray(render_volpt(scene, cam, spp=spp, max_depth=5))
    scene_nb = scene.drop("grid_brickmax")
    img_plain = np.asarray(render_volpt(scene_nb, cam, spp=spp, max_depth=5))
    # means over the image agree well below the per-pixel noise floor
    assert abs(img_brick.mean() - img_plain.mean()) < 0.015, (
        img_brick.mean(), img_plain.mean())
    assert np.abs(img_brick.mean(axis=(0, 1)) - img_plain.mean(axis=(0, 1))).max() < 0.02
