"""Deformable container formats + glTF skinned import (anim/formats.py)."""
import base64
import json

import jax.numpy as jnp
import numpy as np

from aten_tpu.anim.animation import AnimationClip
from aten_tpu.anim.formats import (
    load_deformable, load_gltf_skinned, save_deformable,
)
from aten_tpu.anim.skeleton import Skeleton, skinning_palette
from aten_tpu.anim.skinning import DeformableMesh
from aten_tpu.scene.materials import MaterialType
from aten_tpu.scene.scene import SceneBuilder

IDQ = np.array([0, 0, 0, 1], np.float32)


def test_npz_container_roundtrip(tmp_path):
    mesh = DeformableMesh(
        tri_start=3,
        faces=np.array([[0, 1, 2]]),
        bind_pos=np.zeros((3, 3), np.float32),
        bind_nml=np.tile([[0, 0, 1]], (3, 1)).astype(np.float32),
        weights=np.tile([[1, 0, 0, 0]], (3, 1)).astype(np.float32),
        joints=np.zeros((3, 4), np.int32),
    )
    skel = Skeleton(
        parents=(-1, 0),
        bind_t=np.array([[0, 0, 0], [1, 0, 0]], np.float32),
        bind_q=np.stack([IDQ, IDQ]),
        bind_s=np.ones((2, 3), np.float32),
    )
    clip = AnimationClip.from_tracks([
        {"times": np.array([0.0, 1.0], np.float32),
         "trans": np.zeros((2, 3), np.float32),
         "rot": np.stack([IDQ, IDQ]),
         "scale": np.ones((2, 3), np.float32)}
        for _ in range(2)
    ])
    p = str(tmp_path / "model.npz")
    save_deformable(p, mesh, skel, clips=[clip], inv_bind=skel.inverse_bind())
    m2, s2, clips2, ib = load_deformable(p)
    assert m2.tri_start == 3
    np.testing.assert_array_equal(m2.faces, mesh.faces)
    assert s2.parents == skel.parents
    assert len(clips2) == 1
    np.testing.assert_allclose(clips2[0].times, clip.times)
    assert ib.shape == (2, 4, 4)


def _skinned_gltf(tmp_path):
    """Column of 6 verts; joint 1 at y=1 rotates in an animation."""
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [0, 2, 0], [1, 2, 0]],
        np.float32,
    )
    w1 = np.clip(pos[:, 1] - 0.5, 0, 1)
    weights = np.stack([1 - w1, w1, np.zeros_like(w1), np.zeros_like(w1)], 1)
    joints = np.zeros((6, 4), np.uint16)
    joints[:, 1] = 1
    idx = np.array([0, 1, 2, 1, 3, 2, 2, 3, 4, 3, 5, 4], np.uint16)
    ibm = np.stack([np.eye(4), np.eye(4)]).astype(np.float32)
    ibm[1, 3, 1] = -1.0  # column-major: translation row; inv bind of y=+1
    times = np.array([0.0, 1.0], np.float32)
    rots = np.array([[0, 0, 0, 1],
                     [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)]], np.float32)
    buf = (pos.tobytes() + weights.astype(np.float32).tobytes()
           + joints.tobytes() + idx.tobytes() + ibm.tobytes()
           + times.tobytes() + rots.tobytes())
    off = {}
    o = 0
    for name, n in [("pos", 72), ("w", 96), ("j", 48), ("i", 24),
                    ("ibm", 128), ("t", 8), ("r", 32)]:
        off[name] = o
        o += n
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "skin": 0},
            {"children": [2], "translation": [0, 0, 0]},   # joint 0 (root)
            {"translation": [0, 1, 0]},                    # joint 1
        ],
        "skins": [{"joints": [1, 2], "inverseBindMatrices": 4}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "WEIGHTS_0": 1, "JOINTS_0": 2},
            "indices": 3,
        }]}],
        "animations": [{
            "channels": [{"sampler": 0,
                          "target": {"node": 2, "path": "rotation"}}],
            "samplers": [{"input": 5, "output": 6,
                          "interpolation": "LINEAR"}],
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 6, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 6, "type": "VEC4"},
            {"bufferView": 2, "componentType": 5123, "count": 6, "type": "VEC4"},
            {"bufferView": 3, "componentType": 5123, "count": 12, "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5126, "count": 2, "type": "MAT4"},
            {"bufferView": 5, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 6, "componentType": 5126, "count": 2, "type": "VEC4"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": off["pos"], "byteLength": 72},
            {"buffer": 0, "byteOffset": off["w"], "byteLength": 96},
            {"buffer": 0, "byteOffset": off["j"], "byteLength": 48},
            {"buffer": 0, "byteOffset": off["i"], "byteLength": 24},
            {"buffer": 0, "byteOffset": off["ibm"], "byteLength": 128},
            {"buffer": 0, "byteOffset": off["t"], "byteLength": 8},
            {"buffer": 0, "byteOffset": off["r"], "byteLength": 32},
        ],
        "buffers": [{
            "byteLength": len(buf),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(buf).decode(),
        }],
    }
    p = tmp_path / "skinned.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


def test_gltf_skinned_import(tmp_path):
    path = _skinned_gltf(tmp_path)
    sb = SceneBuilder()
    mesh, skel, clips, inv_bind = load_gltf_skinned(sb, path)
    assert skel.num_joints == 2
    assert skel.parents == (-1, 0)
    assert inv_bind.shape == (2, 4, 4)
    np.testing.assert_allclose(inv_bind[1][:3, 3], [0, -1, 0], atol=1e-6)
    assert mesh.bind_pos.shape == (6, 3)
    assert len(clips) == 1

    # bind pose -> identity palette -> identical positions
    from aten_tpu.anim.skinning import skin_vertices

    pal = skinning_palette(
        skel, jnp.asarray(skel.bind_t), jnp.asarray(skel.bind_q),
        jnp.asarray(skel.bind_s), jnp.asarray(inv_bind),
    )
    p0, _ = skin_vertices(
        pal, jnp.asarray(mesh.bind_pos), jnp.asarray(mesh.bind_nml),
        jnp.asarray(mesh.weights), jnp.asarray(mesh.joints),
    )
    np.testing.assert_allclose(np.asarray(p0), mesh.bind_pos, atol=1e-5)

    # animated pose at t=1: joint-1-weighted verts rotate 90deg about z
    tr, q, s = clips[0].sample(1.0)
    pal1 = skinning_palette(skel, tr, q, s, jnp.asarray(inv_bind))
    p1, _ = skin_vertices(
        pal1, jnp.asarray(mesh.bind_pos), jnp.asarray(mesh.bind_nml),
        jnp.asarray(mesh.weights), jnp.asarray(mesh.joints),
    )
    p1 = np.asarray(p1)
    # vertex 4 = (0,2,0), fully joint 1: rotates about (0,1,0) -> (-1,1,0)
    np.testing.assert_allclose(p1[4], [-1.0, 1.0, 0.0], atol=1e-5)
    # vertex 0 = (0,0,0), fully joint 0: unmoved
    np.testing.assert_allclose(p1[0], [0.0, 0.0, 0.0], atol=1e-5)
