"""Binary FBX importer tests against a REAL third-party asset (the
unitychan FBX set the reference ships, produced by Unity's exporter) —
independent fixtures, not a write-what-we-read roundtrip."""
import os

import numpy as np
import pytest

UNITYCHAN = "/root/reference/asset/unitychan/unitychan.fbx"

pytestmark = pytest.mark.skipif(
    not os.path.exists(UNITYCHAN),
    reason="reference unitychan asset not present",
)


def test_parse_fbx_tree():
    from aten_tpu.io.fbx import parse_fbx

    root = parse_fbx(UNITYCHAN)
    assert root.props[0] == 7400  # binary FBX version
    names = [n.name for n in root.children]
    assert "Objects" in names and "Connections" in names


def test_load_meshes():
    from aten_tpu.io.fbx import load_fbx_meshes

    ms = load_fbx_meshes(UNITYCHAN)
    assert len(ms) >= 10  # unitychan splits into many part meshes
    total_tris = 0
    for m in ms:
        V = len(m["pos"])
        assert np.isfinite(m["pos"]).all()
        assert m["faces"].min() >= 0 and m["faces"].max() < V
        total_tris += len(m["faces"])
        if m["normals_corner"] is not None:
            # one row per polygon corner; unit length
            ln = np.linalg.norm(m["normals_corner"], axis=-1)
            assert np.allclose(ln[ln > 0], 1.0, atol=1e-3)
        if m["uvs_corner"] is not None:
            assert np.isfinite(m["uvs_corner"]).all()
    assert total_tris > 10000  # character-scale geometry


def test_load_skinned_bind_pose_consistent():
    """Skeleton TRS (incl. PreRotation) must agree with the clusters'
    TransformLink matrices: the skinning palette at the bind pose is the
    identity, so skinned positions reproduce bind positions."""
    import jax
    import jax.numpy as jnp

    from aten_tpu.anim.skeleton import global_matrices
    from aten_tpu.io.fbx import load_fbx_skinned
    from aten_tpu.scene.scene import SceneBuilder

    b = SceneBuilder()
    dm, skel, clips, inv_bind = load_fbx_skinned(b, UNITYCHAN)
    assert skel.num_joints > 50  # full character rig
    assert all(p < j for j, p in enumerate(skel.parents))
    assert np.allclose(dm.weights.sum(axis=1), 1.0, atol=1e-3)
    assert (dm.joints >= 0).all() and (dm.joints < skel.num_joints).all()

    g = np.asarray(global_matrices(
        skel, jnp.asarray(skel.bind_t), jnp.asarray(skel.bind_q),
        jnp.asarray(skel.bind_s)))
    pal = np.einsum("jab,jbc->jac", g, inv_bind)
    used = np.unique(dm.joints[dm.weights > 1e-3])
    assert np.abs(pal[used] - np.eye(4)).max() < 1e-3


def test_fbx_animation_curve_clip():
    """FBX take ingestion (FbxConverter/AnmExporter.cpp role): the
    motion file's AnimationStack/CurveNode/Curve chain becomes an
    AnimationClip aligned to the MODEL file's joint order by name, and
    driving FK -> LBS with it deforms the unitychan mesh."""
    import jax.numpy as jnp

    from aten_tpu.anim.skeleton import global_matrices
    from aten_tpu.anim.skinning import skin_vertices
    from aten_tpu.io.fbx import fbx_joint_names, load_fbx_clip, \
        load_fbx_skinned
    from aten_tpu.scene.scene import SceneBuilder

    motion = os.path.join(os.path.dirname(UNITYCHAN),
                          "unitychan_WAIT00.fbx")
    b = SceneBuilder()
    dm, skel, _, inv_bind = load_fbx_skinned(b, UNITYCHAN)
    names = fbx_joint_names(UNITYCHAN)
    assert len(names) == skel.num_joints
    clip = load_fbx_clip(motion, joint_names=names)
    assert clip.times.shape[0] == skel.num_joints
    assert clip.duration > 1.0  # a real take, not a single pose
    # quaternion tracks stay unit-length through resampling
    assert np.abs(np.linalg.norm(clip.rot, axis=-1) - 1).max() < 1e-3

    def posed(t):
        tr, q, sc = clip.sample(t)
        g = global_matrices(skel, tr, q, sc)
        pal = jnp.einsum("jab,jbc->jac", g, jnp.asarray(inv_bind))
        p, _ = skin_vertices(pal, jnp.asarray(dm.bind_pos),
                             jnp.asarray(dm.bind_nml),
                             jnp.asarray(dm.weights), jnp.asarray(dm.joints))
        return np.asarray(p)

    p0 = posed(0.0)
    p1 = posed(0.6 * clip.duration)
    assert np.isfinite(p0).all() and np.isfinite(p1).all()
    # the take animates the character: vertices actually move, but stay
    # within a sane bound of the bind pose (no exploding transforms)
    disp = np.linalg.norm(p1 - p0, axis=1)
    assert disp.max() > 1e-3
    ext = np.linalg.norm(dm.bind_pos.max(axis=0) - dm.bind_pos.min(axis=0))
    assert disp.max() < 5.0 * ext
