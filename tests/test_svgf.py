"""SVGF denoiser + AOV + AO tests (SURVEY.md §2.4/§2.5 components)."""
import jax.numpy as jnp
import numpy as np
import pytest

from aten_tpu.denoise.svgf import SVGFDenoiser, SVGFParams
from aten_tpu.integrator.ao import render_ao
from aten_tpu.integrator.pathtracer import render_image, render_sample_with_aovs
from aten_tpu.scene.scenedefs import cornell_box


@pytest.fixture(scope="module")
def setup():
    scene, cam = cornell_box(32, 32)
    return scene, cam


def test_aovs_sane(setup):
    scene, cam = setup
    ca = cam.arrays()
    img, aovs = render_sample_with_aovs(
        scene, ca, 32, 32, jnp.uint32(0), jnp.uint32(0), 1, 3, 2
    )
    assert img.shape == (32, 32, 3)
    normal = np.asarray(aovs["normal"])
    depth = np.asarray(aovs["depth"])
    # Cornell: nearly everything hit (border rays can jitter past the open
    # box mouth) -> positive depth, unit-ish normals
    assert (depth > 0).mean() > 0.9
    assert (depth[8:24, 8:24] > 0).all()
    lens = np.linalg.norm(normal, axis=-1)
    np.testing.assert_allclose(lens[depth > 0], 1.0, atol=1e-3)
    # back wall faces camera: +z normals dominate center
    assert normal[14:18, 14:18, 2].mean() > 0.5


def test_svgf_reduces_noise(setup):
    scene, cam = setup
    ca = cam.arrays()
    ref = np.asarray(render_image(scene, cam, spp=32, max_depth=3, frame=3))
    den = SVGFDenoiser(32, 32)
    outs = []
    for f in range(6):
        img, aovs = render_sample_with_aovs(
            scene, ca, 32, 32, jnp.uint32(f), jnp.uint32(0), 1, 3, 2
        )
        out = den.step(img, aovs, cam)
        outs.append(np.asarray(out))
    raw = np.asarray(
        render_sample_with_aovs(
            scene, ca, 32, 32, jnp.uint32(5), jnp.uint32(0), 1, 3, 2
        )[0]
    )
    # robust metric: median per-pixel error (mean is firefly-dominated;
    # a-trous redistributes rare outliers, which is fine visually)
    err_raw = np.median(np.abs(raw - ref))
    err_den = np.median(np.abs(outs[-1] - ref))
    assert np.isfinite(outs[-1]).all()
    assert err_den < err_raw * 0.75, (err_den, err_raw)
    # denoise signature: the flat back-wall patch becomes much smoother
    # (32x32 windows are edge-limited, so error reduction is modest but
    # smoothing must be strong)
    patch = np.s_[8:14, 12:20]
    lum_raw = raw[patch].mean(-1)
    lum_den = outs[-1][patch].mean(-1)
    assert lum_den.std() < lum_raw.std() * 0.45


def test_svgf_history_accumulates(setup):
    scene, cam = setup
    ca = cam.arrays()
    den = SVGFDenoiser(32, 32)
    for f in range(3):
        img, aovs = render_sample_with_aovs(
            scene, ca, 32, 32, jnp.uint32(f), jnp.uint32(0), 1, 2, 1
        )
        den.step(img, aovs, cam)
    hist = np.asarray(den.state["history"])
    assert hist.max() == 3  # static camera: full temporal acceptance


def test_ao_renderer(setup):
    scene, cam = setup
    img = np.asarray(render_ao(scene, cam, spp=2, num_rays=8, ao_radius=2.5))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1).all()
    # inside a closed box with radius spanning it: meaningful occlusion
    # somewhere (sphere contact shadows / corners), openness elsewhere
    assert img.min() < 0.7
    assert img.mean() > 0.2


def test_object_motion_vectors_accept_moving_instance():
    """Dynamic-object reprojection (VERDICT r01 weak #6): a translating
    instance keeps its temporal history when the denoiser is fed the
    scene's instance transforms, and loses it when not (camera-only
    reprojection looks at the wrong previous pixel)."""
    import jax.numpy as jnp
    import numpy as np

    from aten_tpu.core.camera import PinholeCamera
    from aten_tpu.denoise import svgf
    from aten_tpu.integrator.pathtracer import render_sample_with_aovs
    from aten_tpu.scene.materials import MaterialType
    from aten_tpu.scene.scene import SceneBuilder

    def build(tx):
        b = SceneBuilder()
        m = b.add_material(MaterialType.DIFFUSE, base_color=(0.8, 0.2, 0.2))
        o = b.create_object()
        quad = np.array(
            [[-0.6, -0.6, 0], [0.6, -0.6, 0], [0.6, 0.6, 0], [-0.6, 0.6, 0]],
            np.float32,
        )
        b.add_mesh(quad, [[0, 1, 2], [0, 2, 3]], m, obj=o)
        mtx = np.eye(4, dtype=np.float32)
        mtx[0, 3] = tx
        b.add_instance(o, mtx)
        # static backdrop (second instance, identity)
        o2 = b.create_object()
        back = quad * 8.0
        back[:, 2] = -2.0
        b.add_mesh(back, [[0, 1, 2], [0, 2, 3]],
                   b.add_material(MaterialType.DIFFUSE,
                                  base_color=(0.3, 0.3, 0.35)), obj=o2)
        b.add_instance(o2, np.eye(4, dtype=np.float32))
        b.add_point_light((0, 2, 4), (30, 30, 30))
        return b.build()

    W = H = 48
    cam = PinholeCamera(origin=(0, 0, 4), lookat=(0, 0, 0), vfov_deg=45,
                        width=W, height=H)
    ca = cam.arrays()
    move = 0.5  # ~6 pixels of screen motion

    def run(with_motion):
        den = svgf.SVGFDenoiser(W, H)
        for f, tx in enumerate((0.0, move)):
            scene = build(tx)
            img, aovs = render_sample_with_aovs(
                scene, ca, W, H, jnp.uint32(f), jnp.uint32(0), 1, 2, 1)
            den.step(img, aovs, cam, scene=scene if with_motion else None)
        hist = np.asarray(den.state["history"])
        inst = np.asarray(aovs["inst"]).reshape(H, W)
        on_obj = inst == 0
        assert on_obj.sum() > 20
        return hist[on_obj].mean()

    h_motion = run(True)
    h_static = run(False)
    assert h_motion > 1.8, h_motion      # history carried across the move
    # camera-only reprojection still self-accepts inside the uniform
    # quad (same normal/mtl/depth at the stale pixel); the moving
    # object's leading/trailing edges are what it loses
    assert h_motion > h_static + 0.25, (h_motion, h_static)
