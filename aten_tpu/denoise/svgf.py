"""SVGF — spatiotemporal variance-guided filtering, as batched image ops.

Counterpart of the reference's SVGF core (src/libaten/renderer/svgf/
svgf_impl.h): TemporalReprojection (:286-384), EstimateVariance with the
7x7 young-pixel fallback + 3x3 Gauss (:435-617), and the 5-iteration
edge-aware a-trous wavelet filter (:673-806), with the ping-pong AOV
buffers of SVGFParams (svgf_types.h:56-150).  The CUDA per-pixel
kernels become whole-image shifted-window arithmetic: every stencil tap
is a statically shifted copy of the image, so the filter is pure fused
VPU work under jit — and differentiable end to end.

Reprojection uses true camera matrices (prev W2V/V2C), replacing the
reference's rasterized motion-depth buffer (it has no raster G-buffer
here; world positions come from the path tracer's AOVs).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aten_tpu.core.camera import camera_matrices
from aten_tpu.core.vecmath import luminance


def _shift(img, dy, dx):
    """Edge-clamped static shift: out[y,x] = img[y+dy, x+dx]."""
    h, w = img.shape[0], img.shape[1]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    pad = [(py1, py0), (px1, px0)] + [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad, mode="edge")
    return p[py0 : py0 + h, px0 : px0 + w]


# 5x5 B3-spline kernel (a-trous), outer product of [1,4,6,4,1]/16
_B3 = [1.0 / 16, 4.0 / 16, 6.0 / 16, 4.0 / 16, 1.0 / 16]


@dataclasses.dataclass(frozen=True)
class SVGFParams:
    temporal_alpha: float = 0.2
    sigma_z: float = 1.0
    sigma_n: float = 128.0
    sigma_l: float = 4.0
    atrous_iters: int = 5  # svgf_types.h:121 atrous_iter_cnt = 5
    history_cap: int = 32
    young_threshold: int = 4


def init_state(height, width):
    return {
        "color": jnp.zeros((height, width, 3), jnp.float32),
        "moments": jnp.zeros((height, width, 2), jnp.float32),
        "normal": jnp.zeros((height, width, 3), jnp.float32),
        "depth": jnp.full((height, width), -1.0, jnp.float32),
        "mtl": jnp.full((height, width), -1, jnp.int32),
        "history": jnp.zeros((height, width), jnp.float32),
        "w2v": jnp.eye(4, dtype=jnp.float32),
        "v2c": jnp.eye(4, dtype=jnp.float32),
        "valid": jnp.zeros((height, width), bool),
        # dynamic-object motion (optional): previous frame's instance
        # L2W + the current frame's W2L
        "prev_l2w": None,
        "cur_w2l": None,
    }


def inst_l2w_from_w2l(inst_w2l):
    """Invert the scene's [I,3,4] W2L rows to L2W (R' = R^-1, t' = -R't)."""
    R = inst_w2l[..., :3]
    t = inst_w2l[..., 3]
    Rinv = jnp.linalg.inv(R)
    tinv = -jnp.einsum("iab,ib->ia", Rinv, t)
    return jnp.concatenate([Rinv, tinv[..., None]], axis=-1)


def _project(pos, w2v, v2c, width, height):
    """World pos [H,W,3] -> pixel coords (x, y) float + in-front mask."""
    ph = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], axis=-1)
    view = jnp.einsum("ij,hwj->hwi", w2v, ph)
    clip = jnp.einsum("ij,hwj->hwi", v2c, view)
    w = clip[..., 3]
    ndc = clip[..., :3] / jnp.where(jnp.abs(w) > 1e-8, w, 1e-8)[..., None]
    x = (ndc[..., 0] * 0.5 + 0.5) * width
    y = (1.0 - (ndc[..., 1] * 0.5 + 0.5)) * height
    ok = w > 1e-6
    return x, y, ok


def _gather_prev(state, iy, ix):
    """History fetch at reprojected pixels as ONE flat wide take.

    Seven `img[iy, ix]` fetches would be seven multi-dim XLA gathers;
    scattered gathers on v5e are index-count-bound and 2D forms cost
    2-3x the flat ones (PERF_NOTES_R5 gather rules), so the history
    buffers are packed to [H*W, 12] and fetched with a single take."""
    H, W = state["color"].shape[0], state["color"].shape[1]
    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)
    idx = (iy * W + ix).reshape(-1)
    cols, spans, pos = [], [], 0
    for k in ("color", "moments", "normal", "depth", "mtl", "history",
              "valid"):
        v = state[k]
        c = 1 if v.ndim == 2 else v.shape[2]
        cols.append(v.reshape(H * W, c).astype(jnp.float32))
        spans.append((k, pos, c, v.ndim == 2, v.dtype))
        pos += c
    rows = jnp.take(jnp.concatenate(cols, axis=1), idx, axis=0)
    out = {}
    for k, p, c, scalar, dt in spans:
        f = rows[:, p] if scalar else rows[:, p:p + c]
        f = f.reshape(iy.shape + (() if scalar else (c,)))
        if dt == jnp.bool_:
            f = f > 0.5
        elif jnp.issubdtype(dt, jnp.integer):
            f = jnp.round(f).astype(dt)
        out[k] = f
    return out


def object_motion_pos(pos, inst, cur_w2l, prev_l2w):
    """Previous-frame world position of each pixel's surface point for
    DYNAMIC instances: prev_pos = prev_L2W[inst] . (cur_W2L[inst] . pos).
    Static pixels (inst < 0) pass through.  This supplies the object
    term of the reference's rasterized motion-depth buffer
    (host_renderer/main.cpp:150-163) analytically from the instance
    transforms of the two frames."""
    I = cur_w2l.shape[0]
    iid = jnp.clip(jnp.where(inst >= 0, inst, I - 1), 0, I - 1)
    w2l = cur_w2l[iid]           # [H,W,3,4]
    l2w = prev_l2w[iid]
    local = jnp.einsum("hwij,hwj->hwi", w2l[..., :3], pos) + w2l[..., 3]
    prev = jnp.einsum("hwij,hwj->hwi", l2w[..., :3], local) + l2w[..., 3]
    return jnp.where((inst >= 0)[..., None], prev, pos)


def temporal_reproject(img, aovs, state, params: SVGFParams, width, height):
    """TemporalReprojection (svgf_impl.h:286): reproject through the PREV
    camera, accept on normal/mtl/depth consistency, accumulate moments.
    When the state carries prev-frame instance transforms (dynamic
    scenes), positions on moving objects are first pulled back through
    the object motion before the camera reprojection."""
    lum = luminance(img)[..., 0]
    mom_cur = jnp.stack([lum, lum * lum], axis=-1)

    pos = aovs["pos"]
    if state.get("prev_l2w") is not None and "inst" in aovs:
        pos = object_motion_pos(
            pos, aovs["inst"], state["cur_w2l"], state["prev_l2w"]
        )
    x, y, infront = _project(pos, state["w2v"], state["v2c"], width, height)
    ix = jnp.round(x - 0.5).astype(jnp.int32)
    iy = jnp.round(y - 0.5).astype(jnp.int32)
    inside = (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height) & infront
    prev = _gather_prev(state, iy, ix)

    ndot = jnp.sum(aovs["normal"] * prev["normal"], axis=-1)
    same_mtl = aovs["mtl"] == prev["mtl"]
    depth_ok = jnp.abs(prev["depth"] - aovs["depth"]) < 0.1 * jnp.maximum(
        aovs["depth"], 1e-3
    )
    cur_ok = aovs["depth"] > 0.0
    accept = inside & prev["valid"] & cur_ok & (ndot > 0.8) & same_mtl & depth_ok

    history = jnp.where(accept, jnp.minimum(prev["history"] + 1.0, params.history_cap), 1.0)
    alpha = jnp.maximum(params.temporal_alpha, 1.0 / history)
    a3 = alpha[..., None]
    color = jnp.where(
        accept[..., None], (1.0 - a3) * prev["color"] + a3 * img, img
    )
    moments = jnp.where(
        accept[..., None], (1.0 - a3) * prev["moments"] + a3 * mom_cur, mom_cur
    )
    return color, moments, history, cur_ok


def estimate_variance(color, moments, history, aovs, params: SVGFParams):
    """EstimateVariance (svgf_impl.h:435): temporal variance for mature
    pixels, 7x7 bilateral spatial fallback for young ones, 3x3 Gauss."""
    var_t = jnp.maximum(moments[..., 1] - moments[..., 0] ** 2, 0.0)

    lum = luminance(color)[..., 0]
    depth = aovs["depth"]
    normal = aovs["normal"]
    wsum = jnp.zeros_like(lum)
    m1 = jnp.zeros_like(lum)
    m2 = jnp.zeros_like(lum)
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            l_q = _shift(lum, dy, dx)
            z_q = _shift(depth, dy, dx)
            n_q = _shift(normal, dy, dx)
            w_z = jnp.exp(-jnp.abs(z_q - depth) / (params.sigma_z + 1e-4))
            w_n = jnp.maximum(jnp.sum(n_q * normal, axis=-1), 0.0) ** params.sigma_n
            w = w_z * w_n
            wsum = wsum + w
            m1 = m1 + w * l_q
            m2 = m2 + w * l_q * l_q
    m1 = m1 / jnp.maximum(wsum, 1e-6)
    m2 = m2 / jnp.maximum(wsum, 1e-6)
    var_s = jnp.maximum(m2 - m1 * m1, 0.0)

    var = jnp.where(history >= params.young_threshold, var_t, var_s)
    # 3x3 gaussian smooth (svgf_impl.h:560 region)
    g = [[1, 2, 1], [2, 4, 2], [1, 2, 1]]
    out = jnp.zeros_like(var)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            out = out + g[dy + 1][dx + 1] * _shift(var, dy, dx)
    return out / 16.0


def atrous_filter(color, variance, aovs, params: SVGFParams):
    """ExecAtrousWaveletFilter (svgf_impl.h:673): 5 dilated 5x5 passes with
    depth/normal/luminance edge-stopping; returns (filtered color, the
    iteration-1 color used as next frame's history)."""
    normal = aovs["normal"]
    depth = aovs["depth"]
    history_color = color

    # Screen-space depth gradients: the canonical SVGF depth weight
    # divides by the EXPECTED depth change along the offset
    # (|grad_z . (q-p)|), so oblique surfaces (fast depth ramps, e.g. a
    # floor seen at grazing angle) keep their same-plane neighbors
    # instead of rejecting them — the fix for dark seam outlines.
    dzdx = 0.5 * (_shift(depth, 0, 1) - _shift(depth, 0, -1))
    dzdy = 0.5 * (_shift(depth, 1, 0) - _shift(depth, -1, 0))

    for it in range(params.atrous_iters):
        step = 1 << it
        lum_p = luminance(color)[..., 0]
        sdev = jnp.sqrt(jnp.maximum(variance, 0.0))
        csum = jnp.zeros_like(color)
        vsum = jnp.zeros_like(variance)
        wsum = jnp.zeros_like(lum_p)
        for ky in range(-2, 3):
            for kx in range(-2, 3):
                dy, dx = ky * step, kx * step
                hk = _B3[ky + 2] * _B3[kx + 2]
                c_q = _shift(color, dy, dx)
                v_q = _shift(variance, dy, dx)
                l_q = luminance(c_q)[..., 0]
                z_q = _shift(depth, dy, dx)
                n_q = _shift(normal, dy, dx)
                expected_dz = jnp.abs(dzdx * dx + dzdy * dy)
                w_z = jnp.exp(
                    -jnp.abs(z_q - depth)
                    / (params.sigma_z * (expected_dz + 1e-2) + 1e-4)
                )
                w_n = jnp.maximum(jnp.sum(n_q * normal, axis=-1), 0.0) ** params.sigma_n
                w_l = jnp.exp(
                    -jnp.abs(l_q - lum_p) / (params.sigma_l * sdev + 1e-4)
                )
                w = hk * w_z * w_n * w_l
                csum = csum + w[..., None] * c_q
                vsum = vsum + w * w * v_q
                wsum = wsum + w
        color = csum / jnp.maximum(wsum[..., None], 1e-6)
        variance = vsum / jnp.maximum(wsum * wsum, 1e-6)
        if it == 0:
            history_color = color  # SVGF: 1st-iteration output feeds history
    return color, history_color


class SVGFDenoiser:
    """Counterpart of SVGFRenderer/SVGFPathTracing (svgf/svgf.cpp:461-639):
    1spp path trace -> temporal reprojection -> variance estimation ->
    5x a-trous -> history update."""

    def __init__(self, width, height, params: SVGFParams = None):
        self.width = width
        self.height = height
        self.params = params or SVGFParams()
        self.state = init_state(height, width)

    def step(self, img, aovs, cam, scene=None):
        """img [H,W,3] noisy radiance; aovs from render_sample_with_aovs;
        cam the CURRENT camera (its matrices become next frame's prev).
        Pass the CURRENT scene for instanced dynamic scenes: its
        instance transforms feed object motion vectors (the rasterized
        motion-depth buffer role)."""
        out, self.state = svgf_step(
            img, aovs, self.state, self.params, cam, self.width, self.height,
            scene=scene,
        )
        return out


def svgf_step(img, aovs, state, params, cam, width, height, scene=None):
    w2v, v2c = camera_matrices(cam)
    cur_w2l = scene["inst_w2l"] if scene is not None and "inst_w2l" in scene         else None
    state = dict(state, cur_w2l=cur_w2l)
    out, new_state = _svgf_step_jit(
        img, aovs, state, params=params, width=width, height=height
    )
    # this frame's instance L2W becomes next frame's motion source
    prev_l2w = inst_l2w_from_w2l(cur_w2l) if cur_w2l is not None else None
    new_state = dict(new_state, w2v=w2v, v2c=v2c, prev_l2w=prev_l2w,
                     cur_w2l=None)
    return out, new_state


import functools


@functools.partial(jax.jit, static_argnames=("width", "height", "params"))
def _svgf_step_jit(img, aovs, state, params, width, height):
    color, moments, history, cur_ok = temporal_reproject(
        img, aovs, state, params, width, height
    )
    variance = estimate_variance(color, moments, history, aovs, params)
    filtered, history_color = atrous_filter(color, variance, aovs, params)
    # pixels with no geometry keep raw radiance (background)
    filtered = jnp.where(cur_ok[..., None], filtered, img)
    new_state = {
        "color": history_color,
        "moments": moments,
        "normal": aovs["normal"],
        "depth": aovs["depth"],
        "mtl": aovs["mtl"],
        "history": history,
        "w2v": state["w2v"],
        "v2c": state["v2c"],
        "valid": cur_ok,
    }
    return filtered, new_state
