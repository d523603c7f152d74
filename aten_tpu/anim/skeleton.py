"""Skeleton pose computation (forward kinematics).

Counterpart of the reference's `Skeleton` (src/libaten/deformable/
skeleton.{h,cpp}): joints with parent links and local TRS, composed
into global joint matrices, then multiplied with inverse-bind matrices
to produce the skinning palette.

TPU-native design: the joint hierarchy is grouped into topological
LEVELS host-side (static), and FK runs one batched gather+matmul per
level — O(depth) small einsums instead of a sequential per-joint walk.
Joint counts are tiny (tens), so this is trivially cheap but keeps the
whole pose->skin->LBVH pipeline jittable end-to-end.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def quat_to_mat(q):
    """[...,4] quaternion (x,y,z,w) -> [...,3,3] rotation matrix."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def trs_to_mat(t, q, s):
    """Translation [..,3], quaternion [..,4], scale [..,3] -> [..,4,4]."""
    r = quat_to_mat(q) * s[..., None, :]
    m = jnp.zeros(t.shape[:-1] + (4, 4), jnp.float32)
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., :3, 3].set(t)
    m = m.at[..., 3, 3].set(1.0)
    return m


@dataclasses.dataclass(frozen=True)
class Skeleton:
    """Static hierarchy: parents[j] < j (root = -1)."""

    parents: tuple  # [J] ints
    bind_t: np.ndarray  # [J,3] local bind translation
    bind_q: np.ndarray  # [J,4] local bind rotation (x,y,z,w)
    bind_s: np.ndarray  # [J,3] local bind scale

    def __post_init__(self):
        for j, p in enumerate(self.parents):
            assert p < j, "parents must precede children"

    @property
    def num_joints(self):
        return len(self.parents)

    def levels(self):
        """Topological levels: list of index arrays, roots first."""
        depth = [0] * self.num_joints
        for j, p in enumerate(self.parents):
            depth[j] = 0 if p < 0 else depth[p] + 1
        out = []
        for d in range(max(depth) + 1):
            out.append(np.asarray([j for j in range(self.num_joints) if depth[j] == d]))
        return out

    def inverse_bind(self):
        """[J,4,4] inverse global bind matrices (the skinning palette is
        global(pose) @ inverse_bind)."""
        g = np.asarray(
            global_matrices(
                self,
                jnp.asarray(self.bind_t),
                jnp.asarray(self.bind_q),
                jnp.asarray(self.bind_s),
            )
        )
        return np.linalg.inv(g).astype(np.float32)


def global_matrices(skel: Skeleton, t, q, s):
    """FK: local TRS arrays [J,·] -> global joint matrices [J,4,4].

    Jittable (skel is static). Level-parallel: each level's joints do
    one batched parent-gather matmul.
    """
    local = trs_to_mat(t, q, s)
    g = local
    parents = np.asarray(skel.parents)
    for lvl in skel.levels()[1:]:
        pidx = parents[lvl]
        upd = jnp.einsum("jab,jbc->jac", g[pidx], local[lvl])
        g = g.at[lvl].set(upd)
    return g


def skinning_palette(skel: Skeleton, t, q, s, inv_bind):
    """[J,3,4] palette rows: global(pose) @ inverse_bind."""
    g = global_matrices(skel, t, q, s)
    m = jnp.einsum("jab,jbc->jac", g, inv_bind)
    return m[:, :3, :4]
