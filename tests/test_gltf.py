"""glTF 2.0 importer (aten_tpu/io/gltf.py)."""
import base64
import json
import struct

import numpy as np
import pytest

from aten_tpu.io.gltf import load_gltf
from aten_tpu.scene.materials import MaterialType
from aten_tpu.scene.scene import SceneBuilder


def _quad_gltf_doc():
    """Unit quad in the xy plane, indexed, with a translated node."""
    pos = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    nml = np.tile([[0, 0, 1]], (4, 1)).astype(np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    buf = pos.tobytes() + nml.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [2.0, 0.0, 0.0]}],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1},
                "indices": 2,
                "material": 0,
            }]
        }],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.2, 0.4, 0.8, 1.0],
                "metallicFactor": 0.0,
                "roughnessFactor": 0.5,
            }
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 12},
        ],
        "buffers": [{"byteLength": len(buf)}],
    }
    return doc, buf


def test_gltf_embedded_base64(tmp_path):
    doc, buf = _quad_gltf_doc()
    doc["buffers"][0]["uri"] = (
        "data:application/octet-stream;base64,"
        + base64.b64encode(buf).decode()
    )
    p = tmp_path / "quad.gltf"
    p.write_text(json.dumps(doc))
    sb = SceneBuilder()
    prims = load_gltf(sb, str(p))
    assert prims == [(0, 2)]
    scene = sb.build()
    assert scene["num_tris"] == 2
    # node translation baked: v0.x in [2, 3]
    v0 = np.asarray(scene["tri_v0"])
    assert v0[:, 0].min() >= 2.0 - 1e-5
    # material mapped to Disney with the base color factor
    rows = sb.materials.rows
    assert rows[0]["type"] == int(MaterialType.DISNEY)
    np.testing.assert_allclose(rows[0]["base_color"], (0.2, 0.4, 0.8))
    assert rows[0]["roughness"] == 0.5


def test_glb_container(tmp_path):
    doc, buf = _quad_gltf_doc()
    js = json.dumps(doc).encode()
    js += b" " * (-len(js) % 4)
    bin_chunk = buf + b"\0" * (-len(buf) % 4)
    glb = (
        struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(bin_chunk))
        + struct.pack("<II", len(js), 0x4E4F534A) + js
        + struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk
    )
    p = tmp_path / "quad.glb"
    p.write_bytes(glb)
    sb = SceneBuilder()
    prims = load_gltf(sb, str(p))
    assert prims == [(0, 2)]
    assert sb.build()["num_tris"] == 2


def test_gltf_instanced_shared_mesh(tmp_path):
    doc, buf = _quad_gltf_doc()
    doc["buffers"][0]["uri"] = (
        "data:application/octet-stream;base64,"
        + base64.b64encode(buf).decode()
    )
    # two nodes sharing mesh 0 at different translations
    doc["nodes"] = [
        {"mesh": 0, "translation": [0.0, 0.0, 0.0]},
        {"mesh": 0, "translation": [5.0, 0.0, 0.0]},
    ]
    doc["scenes"] = [{"nodes": [0, 1]}]
    p = tmp_path / "two.gltf"
    p.write_text(json.dumps(doc))
    sb = SceneBuilder()
    load_gltf(sb, str(p), instanced=True)
    scene = sb.build()
    assert scene["num_instances"] == 2
    assert scene["num_tris"] == 2  # mesh stored once

    # traversal sees both copies
    import jax.numpy as jnp

    from aten_tpu.accel.traverse import traverse

    ro = jnp.asarray([[0.5, 0.5, 3.0], [5.5, 0.5, 3.0], [8.0, 0.5, 3.0]],
                     jnp.float32)
    rd = jnp.asarray([[0, 0, -1.0]] * 3, jnp.float32)
    h = traverse(scene, ro, rd)
    assert bool(h["hit"][0]) and bool(h["hit"][1]) and not bool(h["hit"][2])
