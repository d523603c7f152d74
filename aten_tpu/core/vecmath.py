"""Batched 3D math primitives.

Counterpart of the reference's scalar math layer (src/libaten/math/:
vec3.h, mat4.h, aabb.h, intersect.h) re-designed for SoA batches:
every function takes/returns arrays whose last axis is the vector
axis, so the whole image's worth of rays is processed by the VPU at
once instead of one scalar ray per CUDA thread.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6
INF = jnp.float32(3.4e38)


def dot(a, b, keepdims=True):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def length(a, keepdims=True):
    return jnp.sqrt(jnp.maximum(jnp.sum(a * a, axis=-1, keepdims=keepdims), 0.0))


def normalize(a):
    return a / jnp.maximum(length(a), 1e-20)


def reflect(wi, n):
    """Reflect direction `wi` (pointing away from surface) about normal."""
    return normalize(2.0 * dot(wi, n) * n - wi)


def refract(wi, n, eta):
    """Refract `wi` (away from surface, same side as n) with relative IOR eta.

    Returns (wt, total_internal_reflection_mask). eta = n_i / n_t.
    """
    cos_i = dot(wi, n)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    wt = normalize(-eta * wi + (eta * cos_i - cos_t) * n)
    return wt, tir[..., 0]


def onb(n):
    """Branchless orthonormal basis from unit normal (Duff et al. 2017).

    Returns (t, b) tangent/bitangent with [..., 3] shape.
    """
    nx, ny, nz = n[..., 0:1], n[..., 1:2], n[..., 2:3]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = jnp.concatenate([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    bt = jnp.concatenate([b, sign + ny * ny * a, -ny], axis=-1)
    return t, bt


def to_world(local_dir, n):
    """Map a local-frame direction (z-up) into the frame of normal n."""
    t, b = onb(n)
    return (
        local_dir[..., 0:1] * t
        + local_dir[..., 1:2] * b
        + local_dir[..., 2:3] * n
    )


def spherical_dir(sin_theta, cos_theta, phi):
    return jnp.concatenate(
        [
            sin_theta * jnp.cos(phi),
            sin_theta * jnp.sin(phi),
            cos_theta,
        ],
        axis=-1,
    )


def luminance(rgb):
    return (
        0.2126 * rgb[..., 0:1] + 0.7152 * rgb[..., 1:2] + 0.0722 * rgb[..., 2:3]
    )


# ---------------------------------------------------------------------------
# Intersection primitives (counterpart of math/intersect.h:44 and aabb.h).
# All batched: rays are [N, 3] arrays; primitives may broadcast.
# ---------------------------------------------------------------------------


def intersect_aabb(ro, rd_inv, bmin, bmax, t_max):
    """Slab test. Returns hit mask [N]. rd_inv = 1/rd (with inf for 0)."""
    t0 = (bmin - ro) * rd_inv
    t1 = (bmax - ro) * rd_inv
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)
    t_enter = jnp.max(tsmall, axis=-1)
    t_exit = jnp.min(tbig, axis=-1)
    return (t_enter <= t_exit) & (t_exit > 0.0) & (t_enter < t_max)


def intersect_tri(ro, rd, v0, e1, e2, t_min=EPS):
    """Moller-Trumbore. All args [..., 3]. Returns (t, u, v, hit_mask[...])."""
    pvec = cross(rd, e2)
    det = dot(e1, pvec, keepdims=False)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = ro - v0
    u = dot(tvec, pvec, keepdims=False) * inv_det
    qvec = cross(tvec, e1)
    v = dot(rd, qvec, keepdims=False) * inv_det
    t = dot(e2, qvec, keepdims=False) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
    )
    return t, u, v, hit


def intersect_sphere(ro, rd, center, radius, t_min=EPS):
    """Returns (t, hit_mask). Picks the nearest positive root."""
    oc = ro - center
    b = dot(oc, rd, keepdims=False)
    c = dot(oc, oc, keepdims=False) - radius * radius
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = -b - sq
    t1 = -b + sq
    t = jnp.where(t0 > t_min, t0, t1)
    hit = (disc > 0.0) & (t > t_min)
    return t, hit


# mat4 helpers ---------------------------------------------------------------


def transform_point(m, p):
    """Apply [...,4,4] matrix to [...,3] points."""
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    r = jnp.einsum("...ij,...j->...i", m, ph)
    return r[..., :3]


def transform_vector(m, v):
    return jnp.einsum("...ij,...j->...i", m[..., :3, :3], v)


def look_at(eye, center, up):
    """Camera-to-world rotation basis (right, up, forward) as in pinhole."""
    import numpy as np

    f = np.asarray(center, np.float32) - np.asarray(eye, np.float32)
    f = f / np.linalg.norm(f)
    r = np.cross(f, np.asarray(up, np.float32))
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    return r.astype(np.float32), u.astype(np.float32), f.astype(np.float32)
