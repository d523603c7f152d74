"""Skeleton FK, animation curves, LBS skinning (aten_tpu/anim/)."""
import jax
import jax.numpy as jnp
import numpy as np

from aten_tpu.anim.animation import AnimationClip, slerp
from aten_tpu.anim.skeleton import (
    Skeleton, global_matrices, quat_to_mat, skinning_palette, trs_to_mat,
)
from aten_tpu.anim.skinning import (
    DeformableMesh, apply_pose, skin_vertices, vertex_normals,
)
from aten_tpu.scene.materials import MaterialType
from aten_tpu.scene.scene import SceneBuilder

IDQ = np.array([0.0, 0.0, 0.0, 1.0], np.float32)


def _quat_axis_angle(axis, angle):
    axis = np.asarray(axis, np.float32)
    axis /= np.linalg.norm(axis)
    s = np.sin(angle / 2)
    return np.array([*(axis * s), np.cos(angle / 2)], np.float32)


def _two_bone():
    """Root at origin; child offset +1x from root."""
    return Skeleton(
        parents=(-1, 0),
        bind_t=np.array([[0, 0, 0], [1, 0, 0]], np.float32),
        bind_q=np.stack([IDQ, IDQ]),
        bind_s=np.ones((2, 3), np.float32),
    )


def test_fk_two_bone_rotation():
    skel = _two_bone()
    # Rotate root 90 deg about z: the child joint should land at (0,1,0).
    q = jnp.asarray(np.stack([_quat_axis_angle([0, 0, 1], np.pi / 2), IDQ]))
    g = global_matrices(
        skel, jnp.asarray(skel.bind_t), q, jnp.asarray(skel.bind_s)
    )
    child_pos = np.asarray(g)[1][:3, 3]
    np.testing.assert_allclose(child_pos, [0, 1, 0], atol=1e-6)


def test_inverse_bind_identity_palette():
    skel = _two_bone()
    inv_bind = skel.inverse_bind()
    pal = skinning_palette(
        skel,
        jnp.asarray(skel.bind_t),
        jnp.asarray(skel.bind_q),
        jnp.asarray(skel.bind_s),
        jnp.asarray(inv_bind),
    )
    # Bind pose => palette is identity for every joint.
    expect = np.tile(np.eye(4, dtype=np.float32)[:3, :4], (2, 1, 1))
    np.testing.assert_allclose(np.asarray(pal), expect, atol=1e-6)


def test_lbs_blend_translations():
    # Two joints translated differently; a 0.5/0.5 vertex lands midway.
    pal = jnp.asarray(
        np.stack(
            [
                np.hstack([np.eye(3), [[0], [0], [0]]]),
                np.hstack([np.eye(3), [[2], [0], [0]]]),
            ]
        ).astype(np.float32)
    )
    pos = jnp.asarray([[0.0, 1.0, 0.0]])
    nml = jnp.asarray([[0.0, 0.0, 1.0]])
    w = jnp.asarray([[0.5, 0.5, 0.0, 0.0]])
    j = jnp.asarray([[0, 1, 0, 0]], jnp.int32)
    p, n = skin_vertices(pal, pos, nml, w, j)
    np.testing.assert_allclose(np.asarray(p), [[1.0, 1.0, 0.0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n), [[0.0, 0.0, 1.0]], atol=1e-6)


def test_clip_sampling_lerp_and_slerp():
    q90 = _quat_axis_angle([0, 0, 1], np.pi / 2)
    clip = AnimationClip.from_tracks(
        [
            {
                "times": np.array([0.0, 1.0], np.float32),
                "trans": np.array([[0, 0, 0], [2, 0, 0]], np.float32),
                "rot": np.stack([IDQ, q90]),
                "scale": np.ones((2, 3), np.float32),
            }
        ]
    )
    tr, q, sc = clip.sample(0.5)
    np.testing.assert_allclose(np.asarray(tr), [[1.0, 0.0, 0.0]], atol=1e-6)
    # slerp halfway to a 90 deg rotation = 45 deg
    m = np.asarray(quat_to_mat(q))[0]
    c = np.cos(np.pi / 4)
    np.testing.assert_allclose(m[0, 0], c, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sc), np.ones((1, 3)), atol=1e-6)
    # clamping beyond the range
    tr2, _, _ = clip.sample(5.0)
    np.testing.assert_allclose(np.asarray(tr2), [[2.0, 0.0, 0.0]], atol=1e-5)


def test_skinned_scene_update_and_traversal():
    """Attach a deformable quad, pose it +5x via a single joint, and
    check rays hit at the new location after the on-device rebuild."""
    from aten_tpu.accel.traverse import traverse

    sb = SceneBuilder()
    m = sb.add_material(MaterialType.DIFFUSE, base_color=(0.6, 0.6, 0.6))
    # enough static filler geometry to leave the dense path (>512 prims)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-20, -10, (520, 3)).astype(np.float32)
    faces_f = np.arange(519).reshape(-1, 3)
    sb.add_mesh(pts[:519], faces_f, m)

    V = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    F = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    W = np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (4, 1))
    J = np.zeros((4, 4), np.int32)
    dm = DeformableMesh.attach(sb, V, F, m, W, J)
    scene = sb.build()
    scene = scene.drop("pl_nodes", "pl_prims", "pl_meta")

    pal_rest = jnp.asarray(np.eye(4, dtype=np.float32)[:3, :4][None])
    pal_moved = jnp.asarray(
        np.hstack([np.eye(3), [[5.0], [0], [0]]]).astype(np.float32)[None]
    )

    step = jax.jit(lambda s, pal: apply_pose(s, dm, pal))
    s0 = step(scene, pal_rest)
    s1 = step(scene, pal_moved)

    ro = jnp.asarray([[0.5, 0.5, 3.0], [5.5, 0.5, 3.0]], jnp.float32)
    rd = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
    h0 = traverse(s0, ro, rd, impl="jax")
    h1 = traverse(s1, ro, rd, impl="jax")
    assert bool(h0["hit"][0]) and not bool(h0["hit"][1])
    assert not bool(h1["hit"][0]) and bool(h1["hit"][1])
    np.testing.assert_allclose(float(h1["t"][1]), 3.0, atol=1e-4)


def test_vertex_normals_flat_quad():
    pos = jnp.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    n = np.asarray(vertex_normals(pos, faces))
    np.testing.assert_allclose(n, np.tile([[0, 0, 1]], (4, 1)), atol=1e-6)
