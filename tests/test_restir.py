"""ReSTIR direct-lighting tests on the ManyLight fixture (SURVEY.md §2.4,
restir gallery config: 126 point lights)."""
import jax.numpy as jnp
import numpy as np
import pytest

from aten_tpu.integrator.restir import ReSTIRRenderer, restir_direct_sample, init_state
from aten_tpu.scene.scenedefs import many_light_scene


@pytest.fixture(scope="module")
def setup():
    scene, cam = many_light_scene(24, 24, num_lights=32)
    return scene, cam


def test_restir_runs_and_accumulates(setup):
    scene, cam = setup
    r = ReSTIRRenderer(scene, cam)
    imgs = [np.asarray(r.render_frame()) for _ in range(3)]
    for im in imgs:
        assert im.shape == (24, 24, 3)
        assert np.isfinite(im).all()
        assert (im >= 0).all()
    assert imgs[0].mean() > 0.001  # lights actually reach surfaces


@pytest.mark.slow
def test_restir_converges_toward_reference(setup):
    """ReSTIR estimate should correlate with a brute-force direct-light
    reference (all lights summed analytically + shadow rays)."""
    from aten_tpu.accel.traverse import occluded, traverse
    from aten_tpu.core import camera as cm
    from aten_tpu.integrator.pathtracer import eval_hit
    from aten_tpu.scene.lights import sample_light
    from aten_tpu.scene.materials import gather_material
    from aten_tpu.shading import brdf as brdf_mod
    from aten_tpu.core import vecmath as vm
    import jax

    scene, cam = setup
    ca = cam.arrays()
    W = H = 24
    N = W * H

    # reference: loop over every light, add its (visible) contribution
    @jax.jit
    def direct_ref():
        pix = jnp.arange(N, dtype=jnp.uint32)
        px = (pix % W).astype(jnp.float32)
        py = (pix // W).astype(jnp.float32)
        ro, rd = cm.generate_ray(ca, (px + 0.5) / W, (jnp.float32(H - 1) - py + 0.5) / H)
        hit = traverse(scene, ro, rd)
        h = eval_hit(scene, ro, rd, hit)
        mat = gather_material(scene["materials"], h["mtl"])
        wo = -rd
        n_or = brdf_mod.orient_normal(h["ns"], wo)
        total = jnp.zeros((N, 3), jnp.float32)
        for li in range(scene["num_lights"]):
            lidx = jnp.full((N,), li, jnp.int32)
            u = jnp.zeros((N,), jnp.float32)
            ls = sample_light(scene, lidx, h["p"], u, (u, u))
            cos_s = jnp.maximum(vm.dot(n_or, ls["dir"], keepdims=False), 0.0)
            f = brdf_mod.eval_bsdf(mat, h["ns"], wo, ls["dir"])
            blocked = occluded(scene, h["p"] + n_or * 1e-3, ls["dir"], ls["dist"])
            c = f * ls["le"] * cos_s[..., None]
            total = total + jnp.where((blocked | ~hit["hit"])[..., None], 0.0, c)
        return total.reshape(H, W, 3)

    ref = np.asarray(direct_ref())
    r = ReSTIRRenderer(scene, cam)
    acc = np.zeros((H, W, 3), np.float32)
    n_frames = 16
    for _ in range(n_frames):
        acc += np.asarray(r.render_frame())
    est = acc / n_frames
    # compare only lit geometry pixels; reservoir estimate is noisy but
    # must be unbiased-ish: relative error of the mean within 20%
    m = ref.mean(axis=-1) > 1e-3
    rel = abs(est[m].mean() - ref[m].mean()) / ref[m].mean()
    assert rel < 0.2, (est[m].mean(), ref[m].mean())

def test_reproject_prev_pixel_roundtrip():
    """A point along pixel (x,y)'s ray reprojects to pixel (x,y) under
    the same camera (the motion-reprojection primitive of temporal
    reuse, replacing the reference's rasterized motion-depth buffer)."""
    import jax.numpy as jnp
    import numpy as np

    from aten_tpu.core import camera as cam_mod
    from aten_tpu.core.camera import PinholeCamera
    from aten_tpu.integrator.restir import _reproject_prev_pixel

    W = H = 32
    cam = PinholeCamera(origin=(1.0, 2.0, 5.0), lookat=(0.0, 0.5, 0.0),
                        vfov_deg=45, width=W, height=H)
    ca = cam.arrays()
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    px = (pix % W).astype(jnp.float32)
    py = (pix // W).astype(jnp.float32)
    s = (px + 0.5) / W
    t = (jnp.float32(H - 1) - py + 0.5) / H
    ro, rd = cam_mod.generate_ray(ca, s, t)
    p = ro + 3.7 * rd  # arbitrary depth along each pixel ray
    prev_cam = {k: ca[k] for k in ("origin", "right", "up", "forward")}
    idx, ok = _reproject_prev_pixel(prev_cam, p, W, H)
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(pix))


def test_temporal_acceptance_rejects_mismatched_history():
    """History from a different surface (mesh/material) must NOT merge:
    run two frames, then corrupt the stored mesh ids and verify the
    third frame's reservoirs ignore the history (M resets to the
    initial-candidate count), matching IsAcceptableNeighbor
    (restir_impl.h:275-310)."""
    import jax.numpy as jnp
    import numpy as np

    from aten_tpu.integrator import restir
    from aten_tpu.scene.scenedefs import many_light_scene

    W = H = 32
    scene, cam = many_light_scene(W, H, num_lights=8)
    ca = cam.arrays()
    st = restir.init_state(H, W)
    _, st = restir.restir_direct_sample(scene, ca, W, H, jnp.uint32(0), st)
    _, st2 = restir.restir_direct_sample(scene, ca, W, H, jnp.uint32(1), st)
    m_with = np.asarray(st2["reservoir"]["m"])

    bad = dict(st, mesh=jnp.full_like(st["mesh"], 999999))
    _, st3 = restir.restir_direct_sample(scene, ca, W, H, jnp.uint32(1), bad)
    m_without = np.asarray(st3["reservoir"]["m"])
    sh = np.asarray(st2["valid"])
    # accepted history accumulates M well beyond the no-history run
    # (spatial reuse still merges neighbors in both, so compare means)
    assert m_with[sh].mean() > 1.5 * m_without[sh].mean()


def test_restir_gi_matches_pt_on_diffuse_scene():
    """GI consistency (VERDICT r3 #5): the full ReSTIR renderer (bounce-0
    reservoir direct + PT bounces >= 1) must converge to the plain PT
    image on a diffuse scene as reservoirs accumulate — same transport,
    different direct-lighting estimator."""
    import jax.numpy as jnp
    import numpy as np

    from aten_tpu.integrator import restir
    from aten_tpu.integrator.pathtracer import render_image
    from aten_tpu.scene.scenedefs import cornell_box

    W = H = 24
    scene, cam = cornell_box(W, H, use_spheres=False)
    ca = cam.arrays()

    pt = np.asarray(render_image(scene, cam, spp=64, max_depth=3))

    st = restir.init_state(H, W)
    acc = np.zeros((H, W, 3), np.float32)
    F = 24
    for f in range(F):
        img, st = restir.restir_gi_sample(
            scene, ca, W, H, jnp.uint32(f), st, max_depth=3, rr_depth=2)
        acc += np.asarray(img)
    gi = acc / F

    # overall energy agrees; per-pixel agreement bounded by MC noise of
    # both estimators at these sample counts
    assert abs(gi.mean() - pt.mean()) / max(pt.mean(), 1e-6) < 0.1, (
        gi.mean(), pt.mean())
    # bright (lit) pixel population matches, not just the global mean
    lit = pt.mean(axis=-1) > np.percentile(pt.mean(axis=-1), 60)
    assert abs(gi.mean(axis=-1)[lit].mean() - pt.mean(axis=-1)[lit].mean()) \
        / pt.mean(axis=-1)[lit].mean() < 0.12
