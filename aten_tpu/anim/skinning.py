"""Linear-blend skinning + per-frame scene update and BVH rebuild.

Counterpart of the reference's GPU skinning pipeline
(src/libidaten/kernel/Skinning.{h,cu}: SkinningVertex {pos, blend
weights/indices} x joint matrices -> deformed pos/nml + min/max AABB
reduction feeding the LBVH rebuild; host `deformable : transformable`,
deformable.h:21).

TPU-native: skinning is one batched gather + weighted einsum over all
vertices (pure MXU/VPU work), normals are rebuilt by scatter-add
area-weighted face normals (`.at[].add`), and the scene's pre-expanded
triangle arrays are refreshed with `dynamic_update_slice` — the whole
pose -> skin -> retriangulate -> LBVH rebuild step is ONE jittable
function, mirroring Skinning::compute -> LBVHBuilder::build per frame.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aten_tpu.accel.lbvh import rebuild_scene_bvh
from aten_tpu.core import vecmath as vm


def skin_vertices(palette, pos, nml, weights, joints):
    """LBS: palette [J,3,4], pos/nml [V,3], weights [V,4], joints [V,4].

    Returns (skinned_pos [V,3], skinned_nml [V,3]).  Normals use the
    rotation part of the blended matrix (adequate for rigid+uniform
    scale palettes, as in the reference's Skinning.cu).
    """
    m = jnp.take(palette, joints, axis=0)  # [V,4,3,4]
    blended = jnp.sum(m * weights[..., None, None], axis=1)  # [V,3,4]
    p = jnp.einsum("vij,vj->vi", blended[:, :, :3], pos) + blended[:, :, 3]
    n = jnp.einsum("vij,vj->vi", blended[:, :, :3], nml)
    return p, vm.normalize(n)


def vertex_normals(pos, faces):
    """Area-weighted vertex normals via scatter-add (jittable)."""
    fn = jnp.cross(pos[faces[:, 1]] - pos[faces[:, 0]],
                   pos[faces[:, 2]] - pos[faces[:, 0]])
    n = jnp.zeros_like(pos)
    for a in range(3):
        n = n.at[faces[:, a]].add(fn)
    return vm.normalize(n)


@dataclasses.dataclass(frozen=True)
class DeformableMesh:
    """Bind-pose skinned mesh occupying tri range [tri_start,
    tri_start+F) of a built scene (the deformable's identity in the
    scene, like the reference's deformable registered as a
    transformable)."""

    tri_start: int
    faces: np.ndarray      # [F,3] vertex indices (object-local)
    bind_pos: np.ndarray   # [V,3]
    bind_nml: np.ndarray   # [V,3]
    weights: np.ndarray    # [V,4]
    joints: np.ndarray     # [V,4] int

    @staticmethod
    def attach(builder, pos, faces, mtl_id, weights, joints, nml=None):
        """Register bind-pose geometry with a SceneBuilder; returns the
        DeformableMesh handle (use after builder.build())."""
        pos = np.asarray(pos, np.float32)
        faces_a = np.asarray(faces, np.int64)
        if nml is None:
            nml = np.asarray(
                vertex_normals(jnp.asarray(pos), jnp.asarray(faces_a))
            )
        tri_start, _ = builder.add_mesh(pos, faces_a, mtl_id, nml=nml)
        w = np.asarray(weights, np.float32)
        w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-9)
        return DeformableMesh(
            tri_start=tri_start,
            faces=faces_a,
            bind_pos=pos,
            bind_nml=np.asarray(nml, np.float32),
            weights=w,
            joints=np.asarray(joints, np.int32),
        )


def apply_pose(scene, mesh: DeformableMesh, palette, rebuild=True):
    """Skin `mesh` with the [J,3,4] palette and refresh the scene's
    triangle arrays (+ LBVH rebuild unless rebuild=False).  Jittable."""
    faces = jnp.asarray(mesh.faces)
    p, _ = skin_vertices(
        palette,
        jnp.asarray(mesh.bind_pos),
        jnp.asarray(mesh.bind_nml),
        jnp.asarray(mesh.weights),
        jnp.asarray(mesh.joints),
    )
    n = vertex_normals(p, faces)

    i0, i1, i2 = faces[:, 0], faces[:, 1], faces[:, 2]
    start = mesh.tri_start

    def upd(name, val):
        return jax.lax.dynamic_update_slice_in_dim(scene[name], val, start, 0)

    e1 = p[i1] - p[i0]
    e2 = p[i2] - p[i0]
    scene = scene.replace(
        tri_v0=upd("tri_v0", p[i0]),
        tri_e1=upd("tri_e1", e1),
        tri_e2=upd("tri_e2", e2),
        tri_n0=upd("tri_n0", n[i0]),
        tri_n1=upd("tri_n1", n[i1]),
        tri_n2=upd("tri_n2", n[i2]),
        tri_area=upd("tri_area", 0.5 * vm.length(jnp.cross(e1, e2), keepdims=False)),
    )
    if rebuild:
        scene = rebuild_scene_bvh(scene)
    return scene
