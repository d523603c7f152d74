"""Texture storage + batched sampling.

Counterpart of src/libaten/image/texture.h (f32 RGBA host textures with
nearest/bilinear `at()`, image/texture.h:29-69) and the unified sampling
entry `sampleTexture` (material/sample_texture.h:17-61) that the CUDA
path maps to tex2DLod.  TPUs have no texture units, so textures live as
one padded [T, MH, MW, 4] stack in HBM and sampling is a batched gather
with manual bilinear filtering and wrap addressing; per-texture true
sizes ride in a side table.  Normal-map application mirrors
sample_texture.h:63-90.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from aten_tpu.core import vecmath as vm


class TextureTable:
    def __init__(self):
        self.images = []

    def add(self, img) -> int:
        """img: [H, W, 3|4] float array. Returns texture id."""
        img = np.asarray(img, np.float32)
        if img.ndim == 2:
            img = img[..., None].repeat(3, -1)
        if img.shape[-1] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
        self.images.append(img)
        return len(self.images) - 1

    def arrays(self):
        if not self.images:
            return {
                "tex_stack": jnp.ones((1, 1, 1, 4), jnp.float32),
                "tex_size": jnp.ones((1, 2), jnp.int32),
            }
        mh = max(i.shape[0] for i in self.images)
        mw = max(i.shape[1] for i in self.images)
        stack = np.zeros((len(self.images), mh, mw, 4), np.float32)
        size = np.zeros((len(self.images), 2), np.int32)
        for t, img in enumerate(self.images):
            h, w = img.shape[:2]
            stack[t, :h, :w] = img
            size[t] = (h, w)
        return {"tex_stack": jnp.asarray(stack), "tex_size": jnp.asarray(size)}


def sample_texture(tex, tex_id, u, v, default=1.0):
    """Bilinear wrap-addressed fetch. tex_id: int32 [N] (-1 -> default).
    Returns rgba [N, 4]."""
    stack = tex["tex_stack"]
    size = tex["tex_size"]
    T = stack.shape[0]
    tid = jnp.clip(tex_id, 0, T - 1)
    h = jnp.take(size[:, 0], tid).astype(jnp.float32)
    w = jnp.take(size[:, 1], tid).astype(jnp.float32)
    # wrap addressing; v flipped (image row 0 = top, uv origin bottom-left)
    uu = jnp.mod(u, 1.0)
    vv = jnp.mod(1.0 - jnp.mod(v, 1.0), 1.0)
    x = uu * w - 0.5
    y = vv * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def fetch(xi, yi):
        xi = jnp.mod(xi, jnp.maximum(w, 1.0)).astype(jnp.int32)
        yi = jnp.mod(yi, jnp.maximum(h, 1.0)).astype(jnp.int32)
        return stack[tid, yi, xi]

    c = (
        fetch(x0, y0) * (1 - fx) * (1 - fy)
        + fetch(x0 + 1, y0) * fx * (1 - fy)
        + fetch(x0, y0 + 1) * (1 - fx) * fy
        + fetch(x0 + 1, y0 + 1) * fx * fy
    )
    has = (tex_id >= 0)[..., None]
    return jnp.where(has, c, jnp.full_like(c, default))


def apply_albedo(scene, mat, uv):
    """Multiply sampled albedo maps into base_color (shade-time fetch,
    the reference does this inside shade via sampleTexture)."""
    if "tex_stack" not in scene:
        return mat
    rgba = sample_texture(
        scene, mat["albedo_map"], uv[..., 0], uv[..., 1], default=1.0
    )
    mat = dict(mat)
    mat["base_color"] = mat["base_color"] * rgba[..., :3]
    return mat


def apply_normal_map(scene, mat, ns, uv):
    """Tangent-space normal perturbation (sample_texture.h:63-90 role)."""
    if "tex_stack" not in scene:
        return ns
    rgba = sample_texture(
        scene, mat["normal_map"], uv[..., 0], uv[..., 1], default=0.5
    )
    nm = rgba[..., :3] * 2.0 - 1.0
    t, b = vm.onb(ns)
    perturbed = vm.normalize(
        nm[..., 0:1] * t + nm[..., 1:2] * b + nm[..., 2:3] * ns
    )
    has = (mat["normal_map"] >= 0)[..., None]
    return jnp.where(has, perturbed, ns)


def apply_roughness_map(scene, mat, uv):
    if "tex_stack" not in scene:
        return mat
    rgba = sample_texture(
        scene, mat["roughness_map"], uv[..., 0], uv[..., 1], default=1.0
    )
    mat = dict(mat)
    has = mat["roughness_map"] >= 0
    mat["roughness"] = jnp.where(has, mat["roughness"] * rgba[..., 0], mat["roughness"])
    return mat
