"""Keyframe animation curves (translation / rotation / scale channels).

Counterpart of the reference's ANM format + `DeformAnimation` keyframe
interpolation (src/libaten/deformable/ANMFormat.h,
DeformAnimationInterp.cpp: linear lerp for vectors, slerp for
quaternions).  TPU-native: channels are padded [J,K,C] arrays sampled
with a vectorized `searchsorted` + lerp/slerp over ALL joints at once;
sampling is jittable so animation time can be a traced scalar.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def slerp(q0, q1, u):
    """Batched quaternion slerp with the lerp fallback for tiny angles
    (DeformAnimationInterp.cpp's slerp)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)  # shortest arc
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_t = jnp.sin(theta)
    safe = sin_t > 1e-5
    w0 = jnp.where(safe, jnp.sin((1 - u) * theta) / jnp.where(safe, sin_t, 1.0), 1 - u)
    w1 = jnp.where(safe, jnp.sin(u * theta) / jnp.where(safe, sin_t, 1.0), u)
    q = w0 * q0 + w1 * q1
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


@dataclasses.dataclass(frozen=True)
class AnimationClip:
    """Per-joint keyframed TRS channels, padded to a common key count.

    times [J,K] (non-decreasing per joint; pad by repeating the last
    key), trans [J,K,3], rot [J,K,4] quaternions (x,y,z,w), scale
    [J,K,3].  duration = max time.
    """

    times: np.ndarray
    trans: np.ndarray
    rot: np.ndarray
    scale: np.ndarray

    @staticmethod
    def from_tracks(tracks):
        """tracks: list (per joint) of dicts {times [K_j], trans [K_j,3],
        rot [K_j,4], scale [K_j,3]}; ragged K_j padded to max."""
        J = len(tracks)
        K = max(len(t["times"]) for t in tracks)
        times = np.zeros((J, K), np.float32)
        trans = np.zeros((J, K, 3), np.float32)
        rot = np.zeros((J, K, 4), np.float32)
        scale = np.ones((J, K, 3), np.float32)
        for j, tr in enumerate(tracks):
            k = len(tr["times"])
            times[j, :k] = tr["times"]
            times[j, k:] = tr["times"][-1]
            trans[j, :k] = tr["trans"]
            trans[j, k:] = tr["trans"][-1]
            rot[j, :k] = tr["rot"]
            rot[j, k:] = tr["rot"][-1]
            scale[j, :k] = tr["scale"]
            scale[j, k:] = tr["scale"][-1]
        return AnimationClip(times, trans, rot, scale)

    @property
    def duration(self):
        return float(self.times.max())

    def sample(self, t):
        """Sample all joints at (traced) time t -> (trans [J,3],
        rot [J,4], scale [J,3])."""
        times = jnp.asarray(self.times)
        J, K = times.shape
        tt = jnp.clip(jnp.asarray(t, jnp.float32), 0.0, None)
        # per-joint bracketing key: k1 = first key with time > t
        k1 = jnp.sum((times <= tt).astype(jnp.int32), axis=1)  # [J]
        k1 = jnp.clip(k1, 1, K - 1)
        k0 = k1 - 1
        t0 = jnp.take_along_axis(times, k0[:, None], axis=1)[:, 0]
        t1 = jnp.take_along_axis(times, k1[:, None], axis=1)[:, 0]
        u = jnp.where(t1 > t0, (tt - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0)
        u = jnp.clip(u, 0.0, 1.0)[:, None]

        def gather(arr, k):
            return jnp.take_along_axis(
                jnp.asarray(arr), k[:, None, None], axis=1
            )[:, 0]

        tr = (1 - u) * gather(self.trans, k0) + u * gather(self.trans, k1)
        sc = (1 - u) * gather(self.scale, k0) + u * gather(self.scale, k1)
        q = slerp(gather(self.rot, k0), gather(self.rot, k1), u)
        return tr, q, sc
