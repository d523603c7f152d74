"""Cameras.

Counterpart of src/libaten/camera/ (CameraParameter POD camera.h:15,
pinhole static sample pinhole.h:64-66, thin-lens DoF).  A camera here
is a small frozen dataclass of numpy scalars/vectors (static scene
data) plus pure batched functions mapping film coordinates (s, t) in
[0,1)^2 to world rays.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from aten_tpu.core import vecmath as vm


@dataclasses.dataclass(frozen=True)
class PinholeCamera:
    origin: tuple
    lookat: tuple
    up: tuple = (0.0, 1.0, 0.0)
    vfov_deg: float = 45.0
    width: int = 512
    height: int = 512

    def basis(self):
        r, u, f = vm.look_at(self.origin, self.lookat, self.up)
        return r, u, f

    def arrays(self):
        """Device-ready camera parameter pytree."""
        r, u, f = self.basis()
        aspect = self.width / self.height
        half_h = math.tan(math.radians(self.vfov_deg) * 0.5)
        half_w = aspect * half_h
        return {
            "origin": jnp.asarray(self.origin, jnp.float32),
            "right": jnp.asarray(r * half_w * 2.0),
            "up": jnp.asarray(u * half_h * 2.0),
            "forward": jnp.asarray(f),
            "dist": jnp.float32(1.0),
        }

    def pixel_width_at(self, depth: float) -> float:
        """Physical width of one pixel at given view depth (used by the
        reference unit test aten_unittest/pinhole_camera.cpp:6-16)."""
        half_h = math.tan(math.radians(self.vfov_deg) * 0.5)
        screen_h = 2.0 * half_h * depth
        return screen_h / self.height


def generate_ray(cam_arrays, s, t):
    """Batched pinhole ray gen. s, t: [...] in [0,1). Returns (ro, rd).

    Mirrors pinhole::sample (camera/pinhole.h:64) — screen point on the
    view plane at unit distance, direction normalized.
    """
    o = cam_arrays["origin"]
    p = (
        o
        + cam_arrays["forward"] * cam_arrays["dist"]
        + (s[..., None] - 0.5) * cam_arrays["right"]
        + (t[..., None] - 0.5) * cam_arrays["up"]
    )
    rd = vm.normalize(p - o)
    ro = jnp.broadcast_to(o, rd.shape)
    return ro, rd


@dataclasses.dataclass(frozen=True)
class ThinLensCamera(PinholeCamera):
    """Depth of field: sample a disc on the lens, focus on the focal plane
    (counterpart of camera/thinlens.h)."""

    lens_radius: float = 0.05
    focus_dist: float = 1.0

    def arrays(self):
        a = super().arrays()
        a["lens_radius"] = jnp.float32(self.lens_radius)
        a["focus_dist"] = jnp.float32(self.focus_dist)
        return a


def generate_ray_thinlens(cam_arrays, s, t, u1, u2):
    """u1, u2: lens-disc samples in [0,1)."""
    o = cam_arrays["origin"]
    fwd = cam_arrays["forward"]
    focus = cam_arrays["focus_dist"]
    # Point on focal plane through the pinhole ray.
    p = (
        o
        + fwd * focus
        + (s[..., None] - 0.5) * cam_arrays["right"] * focus
        + (t[..., None] - 0.5) * cam_arrays["up"] * focus
    )
    # Concentric-ish disc sample on the lens.
    r = jnp.sqrt(u1)[..., None] * cam_arrays["lens_radius"]
    phi = (2.0 * np.pi) * u2[..., None]
    right_n = vm.normalize(cam_arrays["right"])
    up_n = vm.normalize(cam_arrays["up"])
    lens_p = o + r * (jnp.cos(phi) * right_n + jnp.sin(phi) * up_n)
    rd = vm.normalize(p - lens_p)
    return lens_p, rd


def camera_matrices(cam: PinholeCamera):
    """World-to-view and view-to-clip matrices for reprojection (SVGF/TAA),
    counterpart of ComputeCameraMatrices (renderer/pathtracing/pt_params.h:177)."""
    r, u, f = cam.basis()
    eye = np.asarray(cam.origin, np.float32)
    w2v = np.eye(4, dtype=np.float32)
    w2v[0, :3], w2v[1, :3], w2v[2, :3] = r, u, -f
    w2v[:3, 3] = -w2v[:3, :3] @ eye
    fov = math.radians(cam.vfov_deg)
    fy = 1.0 / math.tan(fov * 0.5)
    fx = fy * cam.height / cam.width
    znear, zfar = 0.01, 10000.0
    v2c = np.zeros((4, 4), np.float32)
    v2c[0, 0], v2c[1, 1] = fx, fy
    v2c[2, 2] = -(zfar + znear) / (zfar - znear)
    v2c[2, 3] = -2 * zfar * znear / (zfar - znear)
    v2c[3, 2] = -1.0
    return jnp.asarray(w2v), jnp.asarray(v2c)
