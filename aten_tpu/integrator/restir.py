"""ReSTIR — reservoir spatiotemporal importance resampling: reservoir
direct lighting at the primary hit composed with standard PT bounces
(full GI, restir_gi_sample) or standalone (restir_direct_sample).

Counterpart of the reference ReSTIR core (src/libaten/renderer/restir/
restir_types.h:9-76 `Reservoir` {w_sum, M, y, W, target_pdf_of_y} with
streaming update; restir_impl.h: GenerateInitialCandidate:127,
EvaluateVisibility:219, ApplyTemporalReuse:275, ApplySpatialReuse:446,
ComputePixelColor:583).  As in the reference, ReSTIR replaces NEE at
the primary hit; reservoirs are flat SoA arrays over pixels and every
pass is batched select arithmetic.

Measure bookkeeping: a candidate's target p-hat is the luminance of the
unshadowed contribution f*cos*Le*G in the measure it was sampled in,
and q is its actual sampling pdf — standard RIS over heterogeneous
light types.  Spot-light falloff is folded into the stored radiance at
candidate time (re-evaluation at a reusing pixel keeps the original
falloff — a small approximation vs. the reference, noted here).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aten_tpu.accel.traverse import occluded, traverse
from aten_tpu.core import camera as cam_mod
from aten_tpu.core import sampler as smp
from aten_tpu.core import vecmath as vm
from aten_tpu.integrator.pathtracer import eval_hit
from aten_tpu.scene.lights import sample_light
from aten_tpu.scene.materials import MaterialType, gather_material
from aten_tpu.shading import brdf as brdf_mod
from aten_tpu.shading import nee

M_CANDIDATES = 32  # initial light candidates (reference M)
SPATIAL_NEIGHBORS = 4
SPATIAL_RADIUS = 8
TEMPORAL_M_CAP = 20  # clamp history influence (restir_impl.h temporal cap)

# reservoir y-sample kinds
KIND_AREA = 0
KIND_SINGULAR = 1
KIND_INFINITE = 2


def _empty_reservoir(N, vz):
    z3 = jnp.zeros((N, 3), jnp.float32) + vz[..., None]
    z = jnp.zeros((N,), jnp.float32) + vz
    return {
        "w_sum": z,
        "m": z,
        "target": z,  # p-hat of the kept sample
        "W": z,
        "l_pos": z3,
        "l_nml": z3,
        "l_le": z3,  # raw radiance (pre-geometry)
        "kind": z.astype(jnp.int32),
    }


def _eval_candidate(mat, p, ns, wo, y, used=None):
    """Re-evaluate a stored light sample at a surface. Returns
    (contrib_rgb, target, wi, dist)."""
    n = brdf_mod.orient_normal(ns, wo)
    is_inf = y["kind"] == KIND_INFINITE
    to_l = jnp.where(is_inf[..., None], -y["l_nml"], y["l_pos"] - p)
    dist = jnp.where(
        is_inf, jnp.float32(1e30), vm.length(to_l, keepdims=False)
    )
    wi = jnp.where(
        is_inf[..., None], -y["l_nml"], to_l / jnp.maximum(dist[..., None], 1e-12)
    )
    cos_s = jnp.maximum(vm.dot(n, wi, keepdims=False), 0.0)
    f = brdf_mod.eval_bsdf(mat, ns, wo, wi, used=used)
    d2 = jnp.maximum(dist * dist, 1e-8)
    cos_l = jnp.maximum(vm.dot(y["l_nml"], -wi, keepdims=False), 0.0)
    geom = jnp.where(
        y["kind"] == KIND_AREA,
        cos_l / d2,
        jnp.where(is_inf, 1.0, 1.0 / d2),
    )
    contrib = f * y["l_le"] * (cos_s * geom)[..., None]
    target = vm.luminance(contrib)[..., 0]
    return contrib, target, wi, dist


def _light_sample_to_y(scene, ls, lidx):
    """Convert a sample_light() result into reservoir y-sample fields."""
    kind = jnp.where(
        ls["singular"],
        KIND_SINGULAR,
        jnp.where(ls["infinite"], KIND_INFINITE, KIND_AREA),
    )
    # (a per-candidate re-gather of the raw light row's le used to sit
    # here, unused — ls already carries everything needed)
    # area lights & IBL: le as sampled; singular: raw intensity (distance
    # re-applied at eval); spot falloff folded in (see module docstring).
    dist2 = jnp.maximum(ls["dist"] * ls["dist"], 1e-8)[..., None]
    le_store = jnp.where(
        ls["singular"][..., None], ls["le"] * dist2, ls["le"]
    )
    return {
        "l_pos": ls["pos"],
        "l_nml": ls["nml"],
        "l_le": le_store,
        "kind": kind,
    }, ls


def _pack_cols(fields):
    """Concat a dict of [N] / [N,C] arrays into one [N, D] f32 matrix.

    Scattered-index gathers on v5e are index-count-bound (~3.5 ms per
    262k indices regardless of row width, PERF_NOTES_R5): reading 13
    reservoir/G-buffer fields at reprojected pixels as 13 takes cost
    ~45 ms/frame; as ONE wide take it costs one.  int/bool fields ride
    as f32 (ids are small integers — exact)."""
    cols, spans, pos = [], [], 0
    for k, v in fields.items():
        c = 1 if v.ndim == 1 else v.shape[1]
        cols.append((v if v.ndim == 2 else v[:, None]).astype(jnp.float32))
        spans.append((k, pos, c, v.ndim == 1, v.dtype))
        pos += c
    return jnp.concatenate(cols, axis=1), spans


def _unpack_cols(rows, spans):
    out = {}
    for k, p, c, scalar, dt in spans:
        f = rows[:, p] if scalar else rows[:, p:p + c]
        if dt == jnp.bool_:
            f = f > 0.5
        elif jnp.issubdtype(dt, jnp.integer):
            f = jnp.round(f).astype(dt)
        out[k] = f
    return out


def _reservoir_update(r, y, w, u):
    """Streaming reservoir update (restir_types.h:40-76)."""
    w_sum = r["w_sum"] + w
    take = (u * jnp.maximum(w_sum, 1e-20)) < w
    out = dict(r)
    out["w_sum"] = w_sum
    out["m"] = r["m"] + 1.0
    for k in ("l_pos", "l_nml", "l_le"):
        out[k] = jnp.where(take[..., None], y[k], r[k])
    out["kind"] = jnp.where(take, y["kind"], r["kind"])
    out["target"] = jnp.where(take, y["target"], r["target"])
    return out


def _merge_reservoir(r, r2, target_of_y2_here, u, m_cap=None):
    """Merge r2 into r, re-targeted at r's surface (ApplyTemporal/Spatial
    Reuse)."""
    m2 = r2["m"] if m_cap is None else jnp.minimum(r2["m"], m_cap)
    w2 = target_of_y2_here * r2["W"] * m2
    w_sum = r["w_sum"] + w2
    take = (u * jnp.maximum(w_sum, 1e-20)) < w2
    out = dict(r)
    out["w_sum"] = w_sum
    out["m"] = r["m"] + m2
    for k in ("l_pos", "l_nml", "l_le"):
        out[k] = jnp.where(take[..., None], r2[k], r[k])
    out["kind"] = jnp.where(take, r2["kind"], r["kind"])
    out["target"] = jnp.where(take, target_of_y2_here, r["target"])
    return out


def _finalize_W(r):
    W = r["w_sum"] / jnp.maximum(r["m"] * r["target"], 1e-20)
    return dict(r, W=jnp.where(r["target"] > 0, W, 0.0))


def init_state(height, width):
    N = height * width
    vz = jnp.zeros((N,), jnp.float32)
    return {
        "reservoir": _empty_reservoir(N, vz),
        "normal": jnp.zeros((N, 3), jnp.float32),
        "depth": jnp.full((N,), -1.0, jnp.float32),
        "valid": jnp.zeros((N,), bool),
        "mtl": jnp.full((N,), -1, jnp.int32),
        "mesh": jnp.full((N,), -1, jnp.int32),
        # previous camera basis for motion reprojection (None first frame)
        "cam": {
            "origin": jnp.zeros(3), "right": jnp.zeros(3),
            "up": jnp.zeros(3), "forward": jnp.zeros(3),
        },
    }


def _reproject_prev_pixel(prev_cam, p, width, height):
    """Previous-frame pixel of world point p under the previous pinhole
    camera (the reference reads a rasterized motion-depth buffer,
    restir_impl.h:344-357; an analytic reprojection replaces it for
    camera motion — dynamic-object motion needs object MVs, as SVGF)."""
    d = p - prev_cam["origin"]
    f = prev_cam["forward"]
    r = prev_cam["right"]
    u = prev_cam["up"]
    k = vm.dot(d, f, keepdims=False) / jnp.maximum(
        jnp.sum(f * f), 1e-12
    )
    ks = jnp.maximum(k, 1e-6)
    s = 0.5 + vm.dot(d, r, keepdims=False) / (ks * jnp.maximum(jnp.sum(r * r), 1e-12))
    t = 0.5 + vm.dot(d, u, keepdims=False) / (ks * jnp.maximum(jnp.sum(u * u), 1e-12))
    pxp = jnp.floor(s * width).astype(jnp.int32)
    pyp = (jnp.float32(height - 1) - jnp.floor(t * height)).astype(jnp.int32)
    ok = (k > 0) & (pxp >= 0) & (pxp < width) & (pyp >= 0) & (pyp < height)
    idx = jnp.clip(pyp * width + pxp, 0, width * height - 1)
    return idx, ok


def _direct_core(scene, cam_arrays, width, height, state, st,
                 ro, rd, hit, h, mat):
    """ReSTIR direct-lighting core at a batch of primary hits: initial
    candidates -> visibility -> temporal reuse -> spatial reuse -> shade.
    Shared verbatim by the direct renderer and the GI composition so the
    direct pass's sample streams (and its pinned golden) are unchanged.
    Returns (color [N,3], reservoir, new_state, sampler_state)."""
    used = scene.get("used_mtl_types")
    N = width * height
    num_lights = scene["num_lights"]
    pix = jnp.arange(N, dtype=jnp.uint32)
    wo = -rd
    n_or = brdf_mod.orient_normal(h["ns"], wo)
    is_emis = mat["type"] == MaterialType.EMISSIVE
    shadeable = hit["hit"] & ~is_emis

    vz = rd[..., 0] * 0.0
    r = _empty_reservoir(N, vz)

    # ---- initial candidates (GenerateInitialCandidate, restir_impl.h:127)
    # lax.scan instead of a 16x unrolled Python loop: the body traces
    # once (compile time was minutes at odd sizes); the sampler state
    # threads through the carry, so the sample stream is unchanged.
    def _candidate_body(carry, _):
        st, r = carry
        u_pick, st = smp.next_1d(st)
        ua, ub, st = smp.next_2d(st)
        uc, st = smp.next_1d(st)
        ur, st = smp.next_1d(st)
        lidx = jnp.minimum(
            (u_pick * num_lights).astype(jnp.int32), jnp.int32(num_lights - 1)
        )
        ls = sample_light(scene, lidx, h["p"], uc, (ua, ub))
        yf, ls2 = _light_sample_to_y(scene, ls, lidx)
        contrib, target, wi, dist = _eval_candidate(
            mat, h["p"], h["ns"], wo, dict(yf, kind=yf["kind"]), used=used
        )
        # proposal pdf in the sample's own measure
        pdf_sel = jnp.float32(1.0 / max(num_lights, 1))
        q = jnp.where(ls2["singular"], pdf_sel, ls2["pdf"] * pdf_sel)
        w = jnp.where(q > 0, target / jnp.maximum(q, 1e-20), 0.0)
        y = dict(yf, target=target)
        r = _reservoir_update(r, y, w, ur)
        return (st, r), None

    (st, r), _ = jax.lax.scan(
        _candidate_body, (st, r), None, length=M_CANDIDATES
    )
    r = _finalize_W(r)

    # ---- visibility of the winner (EvaluateVisibility, restir_impl.h:219)
    _, _, wi_win, dist_win = _eval_candidate(mat, h["p"], h["ns"], wo, r,
                                             used=used)
    ro_sh = h["p"] + n_or * 1e-3
    # keep the shadow ray off the emitter's own surface (nee.shadow_distance)
    cos_lw = vm.dot(r["l_nml"], -wi_win, keepdims=False)
    dist_win2 = jnp.where(
        r["kind"] == 0, nee.shadow_distance(dist_win, cos_lw), dist_win
    )
    blocked = occluded(scene, ro_sh, wi_win, dist_win2)
    r = dict(r, W=jnp.where(blocked, 0.0, r["W"]))

    # ---- temporal reuse (ApplyTemporalReuse, restir_impl.h:275-400):
    # motion-reprojected history + the reference's acceptance tests
    # (IsAcceptableNeighbor: material type, mesh id, normal >= 0.95)
    ridx, in_range = _reproject_prev_pixel(state["cam"], h["p"], width, height)
    # one wide take instead of 13 narrow ones (see _pack_cols)
    hist, hspans = _pack_cols({
        **{"r_" + k: v for k, v in state["reservoir"].items()},
        "normal": state["normal"], "depth": state["depth"],
        "valid": state["valid"], "mtl": state["mtl"], "mesh": state["mesh"],
    })
    hrows = _unpack_cols(jnp.take(hist, ridx, axis=0), hspans)
    prev = {k[2:]: v for k, v in hrows.items() if k.startswith("r_")}
    prev_norm = hrows["normal"]
    prev_depth = hrows["depth"]
    prev_valid = hrows["valid"]
    prev_mtl_t = hrows["mtl"]
    prev_mesh = hrows["mesh"]
    ndot = jnp.sum(h["ns"] * prev_norm, axis=-1)
    depth_ok = jnp.abs(prev_depth - hit["t"]) < 0.1 * jnp.maximum(hit["t"], 1e-3)
    accept = (
        prev_valid & in_range & shadeable
        & (ndot >= 0.95)
        & (prev_mtl_t == mat["type"])
        & (prev_mesh == h["mesh"])
        & depth_ok
    )
    _, target_prev_here, _, _ = _eval_candidate(mat, h["p"], h["ns"], wo,
                                                prev, used=used)
    ut, st = smp.next_1d(st)
    merged = _merge_reservoir(r, prev, target_prev_here, ut, m_cap=TEMPORAL_M_CAP * 1.0)
    merged = _finalize_W(merged)
    r = {
        k: jnp.where(
            accept[..., None] if merged[k].ndim == 2 else accept, merged[k], r[k]
        )
        for k in r
    }

    # ---- spatial reuse (ApplySpatialReuse, restir_impl.h:446)
    ix = pix.astype(jnp.int32) % width
    iy = pix.astype(jnp.int32) // width

    def _spatial_body(carry, _):
        st, r = carry
        ua, ub, st = smp.next_2d(st)
        us, st = smp.next_1d(st)
        dx = ((ua * 2.0 - 1.0) * SPATIAL_RADIUS).astype(jnp.int32)
        dy = ((ub * 2.0 - 1.0) * SPATIAL_RADIUS).astype(jnp.int32)
        jx = jnp.clip(ix + dx, 0, width - 1)
        jy = jnp.clip(iy + dy, 0, height - 1)
        j = (jy * width + jx).astype(jnp.int32)
        # one wide take of (reservoir, ns, t) instead of 10 (see _pack_cols)
        spk, sspans = _pack_cols({
            **{"r_" + k2: r[k2] for k2 in r}, "ns": h["ns"], "t": hit["t"],
        })
        srows = _unpack_cols(jnp.take(spk, j, axis=0), sspans)
        rj = {k2[2:]: v for k2, v in srows.items() if k2.startswith("r_")}
        nj = srows["ns"]
        tj = srows["t"]
        geo_ok = (jnp.sum(h["ns"] * nj, axis=-1) > 0.9) & (
            jnp.abs(tj - hit["t"]) < 0.1 * jnp.maximum(hit["t"], 1e-3)
        )
        _, target_j_here, _, _ = _eval_candidate(mat, h["p"], h["ns"], wo, rj,
                                                 used=used)
        merged = _merge_reservoir(r, rj, target_j_here, us)
        merged = _finalize_W(merged)
        r = {
            k2: jnp.where(
                geo_ok[..., None] if merged[k2].ndim == 2 else geo_ok,
                merged[k2], r[k2],
            )
            for k2 in r
        }
        return (st, r), None

    (st, r), _ = jax.lax.scan(
        _spatial_body, (st, r), None, length=SPATIAL_NEIGHBORS
    )

    # ---- final shade (ComputePixelColor, restir_impl.h:583)
    contrib, target, wi_f, dist_f = _eval_candidate(mat, h["p"], h["ns"], wo,
                                                    r, used=used)
    ro_shf = h["p"] + n_or * 1e-3
    cos_lf = vm.dot(r["l_nml"], -wi_f, keepdims=False)
    dist_f2 = jnp.where(
        r["kind"] == 0, nee.shadow_distance(dist_f, cos_lf), dist_f
    )
    blocked_f = occluded(scene, ro_shf, wi_f, dist_f2)
    color = contrib * jnp.where(blocked_f, 0.0, r["W"])[..., None]
    # emissive surfaces show their own radiance; misses show background
    color = jnp.where(shadeable[..., None], color, 0.0)
    emis_vis = hit["hit"] & is_emis & (vm.dot(h["ng"], -rd, keepdims=False) > 0)
    color = color + jnp.where(emis_vis[..., None], mat["base_color"], 0.0)
    color = color + jnp.where(hit["hit"][..., None], 0.0, scene["bg"])
    color = jnp.where(jnp.isfinite(color), color, 0.0)

    new_state = {
        "reservoir": r,
        "normal": h["ns"],
        "depth": hit["t"],
        "valid": shadeable,
        "mtl": mat["type"],
        "mesh": h["mesh"],
        "cam": {k: cam_arrays[k] for k in ("origin", "right", "up", "forward")},
    }
    return color, r, new_state, st


def _primary_rays(cam_arrays, width, height, frame):
    N = width * height
    pix = jnp.arange(N, dtype=jnp.uint32)
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32)
    pixel_seed = smp.wang_hash(pix + jnp.uint32(1))
    st = smp.make_state(pixel_seed, frame, 0, 1, bounce=0)
    ju, jv, st = smp.next_2d(st)
    s = (px + ju) / width
    t = (jnp.float32(height - 1) - py + jv) / height
    ro, rd = cam_mod.generate_ray(cam_arrays, s, t)
    return ro, rd, st, pixel_seed


@functools.partial(jax.jit, static_argnames=("width", "height"))
def restir_direct_sample(scene, cam_arrays, width, height, frame, state):
    """One frame of ReSTIR direct lighting. Returns (image, new state)."""
    ro, rd, st, _ = _primary_rays(cam_arrays, width, height, frame)
    hit = traverse(scene, ro, rd)
    h = eval_hit(scene, ro, rd, hit)
    mat = gather_material(scene["materials"], h["mtl"])
    color, _, new_state, _ = _direct_core(
        scene, cam_arrays, width, height, state, st, ro, rd, hit, h, mat
    )
    return color.reshape(height, width, 3), new_state


@functools.partial(
    jax.jit, static_argnames=("width", "height", "max_depth", "rr_depth")
)
def restir_gi_sample(scene, cam_arrays, width, height, frame, state,
                     max_depth=5, rr_depth=3):
    """One frame of the FULL ReSTIR renderer: reservoir direct lighting
    at bounce 0 composed with standard PT shading for bounces >= 1,
    gathered into one image — the reference renderer's output semantics
    (libidaten/restir/restir.cpp:47-128: OnShadeReSTIR at bounce 0,
    standard shade + hitShadowRay beyond).  Returns (image, new state).

    MIS note: as in the reference, implicit emitter hits on the BRDF
    continuation keep the standard balance-heuristic weight (the
    reservoir plays NEE's role in the weight), so bright lights aren't
    double counted between the reservoir and the bounce-1 BRDF leg.
    """
    from aten_tpu.accel.traverse import traverse_sorted

    N = width * height
    ro, rd, st, pixel_seed = _primary_rays(cam_arrays, width, height, frame)
    hit = traverse(scene, ro, rd)
    h = eval_hit(scene, ro, rd, hit)
    mat = gather_material(scene["materials"], h["mtl"])

    # ---- bounce 0: reservoir direct (+ emissive/bg, inside the core)
    color, r, new_state, st = _direct_core(
        scene, cam_arrays, width, height, state, st, ro, rd, hit, h, mat
    )

    # ---- bounce 0 continuation: BRDF sample at the primary hit
    wo = -rd
    used = scene.get("used_mtl_types")
    is_emis = mat["type"] == MaterialType.EMISSIVE
    alive = hit["hit"] & ~is_emis
    u1, u2, st = smp.next_2d(st)
    u3, st = smp.next_1d(st)
    samp = brdf_mod.sample_brdf(mat, h["ns"], wo, u1, u2, u3, used=used)
    n_or0 = brdf_mod.orient_normal(h["ns"], wo)
    cos_wi = jnp.abs(vm.dot(n_or0, samp["wi"], keepdims=False))
    good = (samp["pdf"] > 1e-9) & (cos_wi > 1e-9)
    pdf_det = jax.lax.stop_gradient(jnp.maximum(samp["pdf"], 1e-9))
    throughput = jnp.where(
        (alive & good)[..., None],
        samp["bsdf"] * (cos_wi / pdf_det)[..., None],
        0.0,
    )
    alive = alive & good
    off_n = jnp.where(samp["transmission"][..., None], -n_or0, n_or0)
    ro_b = jax.lax.stop_gradient(h["p"] + off_n * 1e-3)
    rd_b = jax.lax.stop_gradient(samp["wi"])
    pdf_prev = samp["pdf"]
    prev_singular = samp["singular"]

    # ---- bounces >= 1: standard NEE path tracing (pathtracer semantics)
    occluded_fn = lambda o, d, dist: occluded(scene, o, d, dist)
    radiance = jnp.zeros((N, 3), jnp.float32)

    def bounce_body(carry, bounce):
        ro, rd, throughput, radiance, alive, pdf_prev, prev_singular = carry
        hit = traverse_sorted(scene, ro, rd,
                              t_max=jnp.where(alive, vm.INF, 0.0))
        h = eval_hit(scene, ro, rd, hit)
        mat = gather_material(scene["materials"], h["mtl"])
        from aten_tpu.scene import textures as tex_mod

        mat = tex_mod.apply_albedo(scene, mat, h["uv"])
        mat = tex_mod.apply_roughness_map(scene, mat, h["uv"])
        h["ns"] = tex_mod.apply_normal_map(scene, mat, h["ns"], h["uv"])

        miss = alive & ~hit["hit"]
        if scene.get("envmap") is not None:
            from aten_tpu.scene.envmap import eval_env

            le_bg = eval_env(scene, rd)
            w_bg = nee.env_miss_weight(scene, rd, pdf_prev, prev_singular)
        else:
            le_bg = scene["bg"]
            w_bg = jnp.ones((N,), jnp.float32)
        radiance = radiance + jnp.where(
            miss[..., None], throughput * le_bg * w_bg[..., None], 0.0
        )

        state = smp.make_state(pixel_seed, frame, 0, 1, bounce=bounce + 1)
        is_emis = mat["type"] == MaterialType.EMISSIVE
        cos_l = vm.dot(h["ng"], -rd, keepdims=False)
        w_imp = nee.implicit_light_weight(
            scene, h["light"], pdf_prev, prev_singular, hit["t"], cos_l
        )
        w_imp = jnp.where(h["light"] >= 0, w_imp, 1.0)
        radiance = radiance + jnp.where(
            (alive & hit["hit"] & is_emis & (cos_l > 0))[..., None],
            throughput * mat["base_color"] * w_imp[..., None], 0.0,
        )
        alive = alive & hit["hit"] & ~is_emis

        wo = -rd
        occ = lambda o, d, dist, a=alive: occluded_fn(
            o, d, jnp.where(a, dist, 0.0))
        contrib, state = nee.nee_contribution(
            scene, mat, h["p"], h["ns"], wo, state, occ, used=used
        )
        is_sing = (mat["type"] == MaterialType.SPECULAR) | (
            mat["type"] == MaterialType.REFRACTION
        )
        radiance = radiance + jnp.where(
            (alive & ~is_sing)[..., None], throughput * contrib, 0.0
        )

        u_rr, state = smp.next_1d(state)
        rr_on = bounce >= rr_depth
        rr_p = jnp.where(
            rr_on, jnp.clip(jnp.max(throughput, axis=-1), 0.01, 0.95), 1.0
        )
        rr_p = jax.lax.stop_gradient(rr_p)
        alive = alive & (u_rr < rr_p)
        throughput = throughput / rr_p[..., None]

        u1, u2, state = smp.next_2d(state)
        u3, state = smp.next_1d(state)
        samp = brdf_mod.sample_brdf(mat, h["ns"], wo, u1, u2, u3, used=used)
        n_or = brdf_mod.orient_normal(h["ns"], wo)
        cos_wi = jnp.abs(vm.dot(n_or, samp["wi"], keepdims=False))
        good = (samp["pdf"] > 1e-9) & (cos_wi > 1e-9)
        pdf_det = jax.lax.stop_gradient(jnp.maximum(samp["pdf"], 1e-9))
        throughput = jnp.where(
            (alive & good)[..., None],
            throughput * samp["bsdf"] * (cos_wi / pdf_det)[..., None],
            throughput,
        )
        alive = alive & good
        off_n = jnp.where(samp["transmission"][..., None], -n_or, n_or)
        ro = jax.lax.stop_gradient(h["p"] + off_n * 1e-3)
        rd = jax.lax.stop_gradient(samp["wi"])
        return (ro, rd, throughput, radiance, alive, samp["pdf"],
                samp["singular"]), None

    carry = (ro_b, rd_b, throughput, radiance, alive, pdf_prev, prev_singular)
    carry, _ = jax.lax.scan(
        bounce_body, carry, jnp.arange(1, max_depth, dtype=jnp.uint32)
    )
    indirect = carry[3]
    bad = ~jnp.all(jnp.isfinite(indirect), axis=-1) | jnp.any(indirect < 0, axis=-1)
    indirect = jnp.where(bad[..., None], 0.0, indirect)
    total = color + indirect
    return total.reshape(height, width, 3), new_state


class ReSTIRRenderer:
    """Counterpart of ReSTIRRenderer / idaten::ReSTIRPathTracing
    (restir/restir.cpp:570, libidaten/restir/restir.cpp:47): reservoir
    direct lighting at bounce 0 + standard PT for bounces >= 1 (full
    GI).  Set gi=False for the direct-lighting-only debug mode."""

    def __init__(self, scene, cam, gi=True, max_depth=5, rr_depth=3):
        self.scene = scene
        self.cam = cam
        self.cam_arrays = cam.arrays()
        self.state = init_state(cam.height, cam.width)
        self.frame = 0
        self.gi = gi
        self.max_depth = max_depth
        self.rr_depth = rr_depth

    def render_frame(self):
        if self.gi:
            img, self.state = restir_gi_sample(
                self.scene, self.cam_arrays, self.cam.width, self.cam.height,
                jnp.uint32(self.frame), self.state,
                max_depth=self.max_depth, rr_depth=self.rr_depth,
            )
        else:
            img, self.state = restir_direct_sample(
                self.scene, self.cam_arrays, self.cam.width, self.cam.height,
                jnp.uint32(self.frame), self.state,
            )
        self.frame += 1
        return img
