"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4d: multi-host tests via distributed-local emulation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aten_tpu.integrator.pathtracer import render_sample
from aten_tpu.parallel.mesh import make_mesh, make_train_step, render_tiled
from aten_tpu.scene.scenedefs import cornell_box

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device"
)


def test_tiled_matches_single_device():
    width, height = 32, 32
    scene, cam = cornell_box(width, height)
    ca = cam.arrays()
    mesh = make_mesh(8)
    tiled = np.asarray(
        render_tiled(
            scene, ca, width, height, jnp.uint32(0), jnp.uint32(0),
            spp=1, max_depth=3, rr_depth=2, mesh=mesh,
        )
    )
    single = np.asarray(
        render_sample(scene, ca, width, height, jnp.uint32(0), jnp.uint32(0), 1, 3, 2)
    )
    # Global pixel-id seeding -> same sample streams.  XLA fuses the two
    # programs differently (1-2 ulp), which can flip a rare MC branch
    # (RR / fresnel choice), so allow a tiny fraction of divergent pixels.
    diff = np.abs(tiled - single).max(axis=-1)
    assert (diff > 1e-4).mean() < 0.005, diff.max()
    assert np.median(diff) == 0.0
    # And the sharded render itself is deterministic (bitwise).
    tiled2 = np.asarray(
        render_tiled(
            scene, ca, width, height, jnp.uint32(0), jnp.uint32(0),
            spp=1, max_depth=3, rr_depth=2, mesh=make_mesh(8),
        )
    )
    np.testing.assert_array_equal(tiled, tiled2)


def test_train_step_runs_and_reduces_loss():
    width, height = 16, 16
    scene, cam = cornell_box(width, height)
    ca = cam.arrays()
    mesh = make_mesh(8)
    target = np.asarray(
        render_sample(scene, ca, width, height, jnp.uint32(0), jnp.uint32(0), 1, 2, 1)
    )
    # Perturb materials, then take SGD steps toward the target image.
    mats = dict(scene["materials"])
    mats["base_color"] = jnp.clip(scene["materials"]["base_color"] * 0.5, 0, None)
    scene_p = scene.replace(materials=mats)
    step = make_train_step(width, height, spp=1, max_depth=2, rr_depth=1,
                           mesh=mesh, lr=0.1)
    losses = []
    s = scene_p
    for it in range(4):
        # Fixed seed: the MC loss is a deterministic objective, so steps
        # are comparable (reseeding would change the estimator per step).
        loss, s = step(s, ca, jnp.asarray(target), jnp.uint32(0))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # gradient direction is right


def test_train_step_light_and_texture_fields():
    """make_train_step optimizes light radiance alongside materials
    (the north-star parameter classes through the SPMD step)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aten_tpu.parallel.mesh import make_mesh, make_train_step
    from aten_tpu.scene.scenedefs import cornell_box

    W = H = 16
    scene, cam = cornell_box(W, H)
    ca = cam.arrays()
    mesh = make_mesh(8)
    step = make_train_step(
        W, H, spp=1, max_depth=2, rr_depth=1, mesh=mesh,
        fields=("base_color", "lights.le"),
    )
    target = jnp.zeros((H, W, 3), jnp.float32)
    le0 = np.asarray(scene["lights"]["le"]).copy()
    loss, s2 = step(scene, ca, target, jnp.uint32(0))
    assert np.isfinite(float(loss))
    le1 = np.asarray(s2["lights"]["le"])
    # black target pulls the emitter DOWN
    assert le1[0].sum() < le0[0].sum()


def test_train_step_default_fields_optimize_texture():
    """Default TRAINABLE_FIELDS covers all three north-star classes
    (materials + textures.tex_stack + lights.le, VERDICT r3 #7): a
    perturbed albedo texture must move toward the target render through
    the default-configured SPMD step."""
    from aten_tpu.core.camera import PinholeCamera
    from aten_tpu.parallel.mesh import TRAINABLE_FIELDS
    from aten_tpu.scene.materials import MaterialType
    from aten_tpu.scene.scene import SceneBuilder

    assert "textures.tex_stack" in TRAINABLE_FIELDS
    assert "lights.le" in TRAINABLE_FIELDS

    def build():
        b = SceneBuilder()
        tex = np.full((4, 4, 3), 0.8, np.float32)
        tid = b.add_texture(tex)
        m = b.add_material(MaterialType.DIFFUSE, base_color=(1, 1, 1),
                           albedo_map=tid)
        emit = b.add_material(MaterialType.EMISSIVE, base_color=(6, 6, 6))
        b.add_quad((-2, -2, 0), (2, -2, 0), (2, 2, 0), (-2, 2, 0), m)
        ls, lc = b.add_quad((-1, -1, 3), (-1, 1, 3), (1, 1, 3), (1, -1, 3),
                            emit)
        b.add_area_light_tris(ls, lc, le=(6, 6, 6))
        cam = PinholeCamera(origin=(0, 0, 2.0), lookat=(0, 0, 0),
                            vfov_deg=60, width=16, height=16)
        return b.build(), cam

    W = H = 16
    scene, cam = build()
    ca = cam.arrays()
    mesh = make_mesh(8)
    target = np.asarray(
        render_sample(scene, ca, W, H, jnp.uint32(0), jnp.uint32(0), 1, 2, 1))
    dim = scene.replace(tex_stack=scene["tex_stack"] * 0.4)
    step = make_train_step(W, H, spp=1, max_depth=2, rr_depth=1, mesh=mesh,
                           lr=0.05)
    losses = []
    s = dim
    for _ in range(4):
        loss, s = step(s, ca, jnp.asarray(target), jnp.uint32(0))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # the texture itself moved up toward the brighter target
    assert float(s["tex_stack"].mean()) > float(dim["tex_stack"].mean())
