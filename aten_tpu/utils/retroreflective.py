"""Effective retroreflective area (ERA) measurement.

Counterpart of the reference's MeasureEffectiveRetroreflectiveArea tool
(src/MeasureEffectiveRetroreflectiveArea/MeasureEffectiveRetroreflectiveArea.{h,cpp}),
which feeds the Retroreflective BRDF (material/retroreflective.cpp) with
the corner-cube ERA model of Belcour et al., "A Practical Extension to
Microfacet Theory for the Modeling of Varying Iridescence" lineage paper
cited in the header (dl.acm.org/doi/10.1145/3095140.3095176).

Measurement (MeasureEffectiveRetroreflectiveArea.cpp:36-255): rays
originate on a barycentric grid over the FRONT triangle of a corner-cube
pair — front face {(0,P,0),(0,0,P),(P,0,0)}, back face
{(-P,0,0),(0,-P,0),(0,0,-P)} — with direction built from spherical
(theta, phi) in the frame {t=(-.5,1,-.5)/|.|, b=(-1,0,1)/|.|,
n=-front_normal}; ERA(theta,phi) = #rays hitting BOTH faces / #rays
hitting the front face.

TPU-native design: the reference loops 100x100 origins per (theta,phi)
on the CPU; here the whole (angle-grid x origin-grid) product evaluates
as one fused [A, O] batch of two Möller-Trumbore tests under jit — no
loops, no BVH (two triangles).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

THETA_MIN, THETA_MAX = 0.0, np.pi / 2  # header :13-14
PHI_MIN, PHI_MAX = 0.0, np.pi  # header :16-18
RAY_ORG_NUM = 100  # header :20
_POS = 1.0

FRONT = np.array([[0, _POS, 0], [0, 0, _POS], [_POS, 0, 0]], np.float32)
BACK = np.array([[-_POS, 0, 0], [0, -_POS, 0], [0, 0, -_POS]], np.float32)


def ray_origins(n: int = RAY_ORG_NUM) -> np.ndarray:
    """Barycentric grid over the front triangle (cpp:76-91)."""
    step = 1.0 / n
    pts = []
    p0 = FRONT[0]
    v0 = FRONT[1] - FRONT[0]
    v1 = FRONT[2] - FRONT[0]
    for y in range(n + 1):
        a = min(y * step, 1.0)
        for x in range(n + 1):
            b = min(x * step, 1.0)
            if a + b > 1.0:
                break
            pts.append(p0 + v0 * a + v1 * b)
    return np.asarray(pts, np.float32)


def gen_ray(theta, phi, xp=jnp):
    """Direction for spherical (theta, phi) in the tool's fixed frame
    (GenRay, cpp:181-222).  Broadcasts over array inputs.  xp selects
    jnp (traced) or np (host table builds — avoids dispatching dozens of
    eager device ops through the TPU tunnel at trace time)."""
    v0 = FRONT[1] - FRONT[0]
    v1 = FRONT[2] - FRONT[0]
    n = np.cross(v0 / np.linalg.norm(v0), v1 / np.linalg.norm(v1))
    n = -n / np.linalg.norm(n)
    t = np.array([-0.5, 1.0, -0.5])
    t = t / np.linalg.norm(t)
    b = np.array([-1.0, 0.0, 1.0])
    b = b / np.linalg.norm(b)
    st = xp.sin(theta)
    x = st * xp.cos(phi)
    y = st * xp.sin(phi)
    z = xp.cos(theta)
    d = (
        x[..., None] * t[None]
        + y[..., None] * b[None]
        + z[..., None] * n[None]
    )
    return d / xp.linalg.norm(d, axis=-1, keepdims=True)


def _tri_hit(ro, rd, tri, xp=jnp):
    """Möller-Trumbore both-sided test; ro [*,3], rd [*,3] broadcastable."""
    v0, v1, v2 = (xp.asarray(t) for t in tri)
    e1 = v1 - v0
    e2 = v2 - v0
    p = xp.cross(rd, e2)
    det = xp.sum(e1 * p, axis=-1)
    inv = xp.where(xp.abs(det) > 1e-12, 1.0 / det, 0.0)
    s = ro - v0
    u = xp.sum(s * p, axis=-1) * inv
    q = xp.cross(s, e1)
    v = xp.sum(rd * q, axis=-1) * inv
    t = xp.sum(e2 * q, axis=-1) * inv
    return (
        (xp.abs(det) > 1e-12)
        & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
    )


def era(theta, phi, n_orgs: int = RAY_ORG_NUM, xp=jnp):
    """ERA for arrays of angles: [A] -> [A] hit rates (HitTest role,
    cpp:224-255).  One fused [A, O] evaluation.  Pass xp=np for a pure
    host computation (table builds at trace time)."""
    theta = xp.atleast_1d(xp.asarray(theta, xp.float32))
    phi = xp.atleast_1d(xp.asarray(phi, xp.float32))
    d = gen_ray(theta, phi, xp=xp)  # [A,3]
    orgs = xp.asarray(ray_origins(n_orgs))  # [O,3]
    ro = orgs[None, :, :]  # [1,O,3]
    rd = d[:, None, :]  # [A,1,3]
    # Origins LIE on the front plane; nudge back along the ray so the
    # front-face test is a proper intersection (reference origins are on
    # the surface and intersectTriangle accepts t>0 from the plane's
    # numeric jitter; the epsilon makes that robust in f32).
    ro = ro - rd * 1e-3
    front = _tri_hit(ro, rd, FRONT, xp=xp)  # [A,O]
    back = _tri_hit(ro, rd, BACK, xp=xp)
    n_front = front.sum(axis=-1)
    n_both = (front & back).sum(axis=-1)
    return xp.where(n_front > 0, n_both / xp.maximum(n_front, 1), 0.0)


def era_table(steps: int = 40, n_orgs: int = RAY_ORG_NUM):
    """(theta_grid, phi_grid, era[T,P]) over the tool's angle ranges
    (ComputeERA loop, main.cpp:196-230)."""
    thetas = np.linspace(THETA_MIN, THETA_MAX, steps, endpoint=False)
    phis = np.linspace(PHI_MIN, PHI_MAX, steps, endpoint=False)
    tt, pp = np.meshgrid(thetas, phis, indexing="ij")
    vals = era(tt.ravel(), pp.ravel(), n_orgs=n_orgs)
    return thetas, phis, np.asarray(vals).reshape(steps, steps)
