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

    def arrays(self, mipmap=True):
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
        out = {"tex_stack": jnp.asarray(stack), "tex_size": jnp.asarray(size)}
        if mipmap and min(mh, mw) >= 2:
            # Mip chain by 2x2 box reduction of the padded stack
            # (GenMipMaps counterpart, src/libidaten/kernel/GenMipMaps.cu;
            # the CUDA path samples them through tex2DLod).
            level = stack
            l = 1
            while min(level.shape[1], level.shape[2]) >= 2:
                h2, w2 = level.shape[1] // 2, level.shape[2] // 2
                level = level[:, : 2 * h2, : 2 * w2].reshape(
                    len(self.images), h2, 2, w2, 2, 4
                ).mean(axis=(2, 4))
                out[f"tex_mip{l}"] = jnp.asarray(level)
                l += 1
        return out


def num_mip_levels(scene):
    """Mip count from (static) key structure; 1 = base level only."""
    l = 1
    while f"tex_mip{l}" in scene:
        l += 1
    return l


def _bilinear(stack, tid, h, w, u, v):
    """Bilinear wrap-addressed fetch from one stacked level.

    The 4 taps are flat 1D row-takes on a [T*MH*MW, 4] view, not
    `stack[tid, yi, xi]`: multi-axis advanced indexing lowers to a
    multi-dim XLA gather that measured ~2-3x the flat-take cost at
    wavefront width (PERF_NOTES_R5 gather rules)."""
    MH, MW, C = stack.shape[1], stack.shape[2], stack.shape[3]
    flat = stack.reshape(stack.shape[0] * MH * MW, C)
    base = tid * (MH * MW)
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
        return jnp.take(flat, base + yi * MW + xi, axis=0)

    return (
        fetch(x0, y0) * (1 - fx) * (1 - fy)
        + fetch(x0 + 1, y0) * fx * (1 - fy)
        + fetch(x0, y0 + 1) * (1 - fx) * fy
        + fetch(x0 + 1, y0 + 1) * fx * fy
    )


def sample_texture(tex, tex_id, u, v, default=1.0):
    """Bilinear wrap-addressed fetch. tex_id: int32 [N] (-1 -> default).
    Returns rgba [N, 4].  Level 0 only; see sample_texture_lod."""
    stack = tex["tex_stack"]
    size = tex["tex_size"]
    T = stack.shape[0]
    tid = jnp.clip(tex_id, 0, T - 1)
    h = jnp.take(size[:, 0], tid).astype(jnp.float32)
    w = jnp.take(size[:, 1], tid).astype(jnp.float32)
    c = _bilinear(stack, tid, h, w, u, v)
    has = (tex_id >= 0)[..., None]
    return jnp.where(has, c, jnp.full_like(c, default))


def sample_texture_lod(tex, tex_id, u, v, lod, default=1.0):
    """Trilinear fetch: bilinear at floor(lod)/ceil(lod) mip levels,
    blended — the tex2DLod counterpart (sample_texture.h:17-61 device
    branch).  lod is per-lane float (0 = base); scenes built without
    mipmaps fall back to level 0."""
    L = num_mip_levels(tex)
    if L <= 1:
        return sample_texture(tex, tex_id, u, v, default)
    stack0 = tex["tex_stack"]
    size = tex["tex_size"]
    T = stack0.shape[0]
    tid = jnp.clip(tex_id, 0, T - 1)
    h0 = jnp.take(size[:, 0], tid).astype(jnp.float32)
    w0 = jnp.take(size[:, 1], tid).astype(jnp.float32)
    lod = jnp.clip(lod, 0.0, L - 1.0)
    l0 = jnp.floor(lod)
    frac = (lod - l0)[..., None]

    # gather each level's bilinear result, then select the two needed —
    # levels are distinct array shapes (static), so select not gather.
    levels = [stack0] + [tex[f"tex_mip{l}"] for l in range(1, L)]
    c_by_level = []
    for l, st in enumerate(levels):
        hl = jnp.maximum(jnp.floor(h0 / (1 << l)), 1.0)
        wl = jnp.maximum(jnp.floor(w0 / (1 << l)), 1.0)
        c_by_level.append(_bilinear(st, tid, hl, wl, u, v))
    stackc = jnp.stack(c_by_level, axis=0)  # [L, N, 4]
    idx0 = l0.astype(jnp.int32)
    idx1 = jnp.minimum(idx0 + 1, L - 1)

    def sel(idx):
        ii = jnp.broadcast_to(idx[None, :, None], (1,) + stackc.shape[1:])
        return jnp.take_along_axis(stackc, ii, axis=0)[0]

    c = sel(idx0) * (1 - frac) + sel(idx1) * frac
    has = (tex_id >= 0)[..., None]
    return jnp.where(has, c, jnp.full_like(c, default))


def footprint_lod(tex, tex_id, t, pixel_spread):
    """Isotropic LOD estimate from hit distance: footprint ~= t *
    pixel_spread (world units per pixel at distance t); lod =
    log2(footprint * texsize).  The reference relies on tex2DLod with
    caller-provided lod; this is the ray-differential-free estimate."""
    size = tex["tex_size"]
    T = size.shape[0]
    tid = jnp.clip(tex_id, 0, T - 1)
    wmax = jnp.take(jnp.maximum(size[:, 0], size[:, 1]), tid).astype(jnp.float32)
    fp = jnp.maximum(t * pixel_spread, 1e-8)
    return jnp.maximum(jnp.log2(fp * wmax), 0.0)


def apply_albedo(scene, mat, uv):
    """Multiply sampled albedo maps into base_color (shade-time fetch,
    the reference does this inside shade via sampleTexture)."""
    if "tex_stack" not in scene or not scene.get("has_albedo_maps", True):
        return mat  # consumers default tex_alpha to 1 via .get
    rgba = sample_texture(
        scene, mat["albedo_map"], uv[..., 0], uv[..., 1], default=1.0
    )
    mat = dict(mat)
    mat["base_color"] = mat["base_color"] * rgba[..., :3]
    mat["tex_alpha"] = rgba[..., 3]
    return mat


def apply_normal_map(scene, mat, ns, uv):
    """Tangent-space normal perturbation (sample_texture.h:63-90 role)."""
    if "tex_stack" not in scene or not scene.get("has_normal_maps", True):
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
    if "tex_stack" not in scene or not scene.get("has_roughness_maps", True):
        return mat
    rgba = sample_texture(
        scene, mat["roughness_map"], uv[..., 0], uv[..., 1], default=1.0
    )
    mat = dict(mat)
    has = mat["roughness_map"] >= 0
    mat["roughness"] = jnp.where(has, mat["roughness"] * rgba[..., 0], mat["roughness"])
    return mat
