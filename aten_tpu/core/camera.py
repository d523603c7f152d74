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
    view plane at unit distance, direction normalized.  Dispatches on
    the (static) pytree structure: EquirectCamera arrays route to the
    lat-long ray gen.
    """
    if "fwd" in cam_arrays:
        return generate_ray_equirect(cam_arrays, s, t)
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


@dataclasses.dataclass(frozen=True)
class EquirectCamera:
    """360-degree lat-long camera (counterpart of camera/equirect.h):
    pixel (s,t) maps to spherical direction in the camera basis."""

    origin: tuple
    lookat: tuple
    up: tuple = (0.0, 1.0, 0.0)
    width: int = 1024
    height: int = 512

    def basis(self):
        return vm.look_at(self.origin, self.lookat, self.up)

    def arrays(self):
        r, u, f = self.basis()
        import jax.numpy as jnp

        return {
            "origin": jnp.asarray(self.origin, jnp.float32),
            "right": jnp.asarray(r),
            "upv": jnp.asarray(u),
            "fwd": jnp.asarray(f),
        }


def generate_ray_equirect(cam_arrays, s, t):
    """s in [0,1) -> azimuth (full turn), t in [0,1) -> polar."""
    import jax.numpy as jnp

    phi = (s - 0.5) * (2.0 * np.pi)     # [-pi, pi), 0 = forward
    theta = (1.0 - t) * np.pi           # t=1 -> up
    sin_t = jnp.sin(theta)
    local = jnp.stack(
        [sin_t * jnp.sin(phi), jnp.cos(theta), sin_t * jnp.cos(phi)], axis=-1
    )
    rd = (
        local[..., 0:1] * cam_arrays["right"]
        + local[..., 1:2] * cam_arrays["upv"]
        + local[..., 2:3] * cam_arrays["fwd"]
    )
    ro = jnp.broadcast_to(cam_arrays["origin"], rd.shape)
    return ro, vm.normalize(rd)


class CameraOperator:
    """Interactive orbit/dolly/rotate controls over a PinholeCamera
    (counterpart of camera/CameraOperator.{h,cpp}).  Functional: every
    op returns a NEW camera dataclass."""

    @staticmethod
    def dolly(cam, amount):
        eye = np.asarray(cam.origin, np.float32)
        at = np.asarray(cam.lookat, np.float32)
        f = at - eye
        d = np.linalg.norm(f)
        f = f / max(d, 1e-9)
        step = min(amount, d - 1e-3) if amount > 0 else amount
        return dataclasses.replace(cam, origin=tuple(eye + f * step))

    @staticmethod
    def orbit(cam, yaw, pitch):
        """Rotate the eye around the lookat point (radians)."""
        eye = np.asarray(cam.origin, np.float32)
        at = np.asarray(cam.lookat, np.float32)
        up = np.asarray(cam.up, np.float32)
        v = eye - at
        r = np.linalg.norm(v)
        upn = up / np.linalg.norm(up)
        # horizontal frame (a, b) spanning the plane orthogonal to up
        seed = np.array([0.0, 0.0, 1.0], np.float32)
        if abs(np.dot(seed, upn)) > 0.99:
            seed = np.array([1.0, 0.0, 0.0], np.float32)
        b = seed - np.dot(seed, upn) * upn
        b /= np.linalg.norm(b)
        a = np.cross(upn, b)
        y = np.dot(v, upn)
        az = np.arctan2(np.dot(v, a), np.dot(v, b))
        el = np.arctan2(y, max(np.linalg.norm(v - y * upn), 1e-9))
        az += yaw
        el = np.clip(el + pitch, -1.55, 1.55)
        nh = r * np.cos(el)
        v_new = nh * (np.sin(az) * a + np.cos(az) * b) + r * np.sin(el) * upn
        return dataclasses.replace(cam, origin=tuple(at + v_new))

    @staticmethod
    def pan(cam, dx, dy):
        """Translate eye and lookat in the view plane."""
        r, u, f = cam.basis()
        off = r * dx + u * dy
        return dataclasses.replace(
            cam,
            origin=tuple(np.asarray(cam.origin) + off),
            lookat=tuple(np.asarray(cam.lookat) + off),
        )


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
