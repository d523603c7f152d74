"""Next-event estimation + multiple importance sampling.

Counterpart of the reference NEE core: `SampleLight`/`FillShadowRay`
(renderer/pathtracing/pathtracing_impl.h:178-264), the 3-point-form
contribution with solid-angle->area pdf conversion and balance
heuristic in `ComputeRadianceNEE` (pathtracing_nee_impl.h:16-95), and
the implicit-emitter MIS weight of `HitImplicitLight`
(pathtracing_impl.h:395-451).  Light pick is uniform (1/N) as in the
reference.
"""
from __future__ import annotations

import jax.numpy as jnp

from aten_tpu.core import sampler as smp
from aten_tpu.core import vecmath as vm
from aten_tpu.scene.lights import sample_light
from aten_tpu.shading import brdf as brdf_mod


def mis_balance(pdf_a, pdf_b):
    """Balance heuristic; detached under AD (weights sum to one across
    strategies, so attaching them only adds estimator noise/bias)."""
    import jax

    return jax.lax.stop_gradient(pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-12))


def nee_contribution(scene, mat, p, ns, wo, state, occluded_fn, used=None):
    """Direct-light contribution at a batch of shading points.

    occluded_fn(ro, rd, dist) -> bool mask (shadow traversal, injected so
    this module stays traversal-agnostic).
    Returns (rgb [N,3], new sampler state).
    """
    num_lights = scene["num_lights"]
    if num_lights == 0:
        return jnp.zeros_like(p), state

    u_pick, state = smp.next_1d(state)
    u_a, u_b, state = smp.next_2d(state)
    u_c, state = smp.next_1d(state)

    lidx = jnp.minimum(
        (u_pick * num_lights).astype(jnp.int32), jnp.int32(num_lights - 1)
    )
    ls = sample_light(scene, lidx, p, u_c, (u_a, u_b))
    pdf_select = jnp.float32(1.0 / num_lights)

    wi = ls["dir"]
    cos_s = vm.dot(brdf_mod.orient_normal(ns, wo), wi, keepdims=False)
    from aten_tpu.shading import dispatch as disp_mod

    f, pdf_b = disp_mod.eval_bsdf_pdf(scene, mat, ns, wo, wi, used=used)

    cos_l = vm.dot(ls["nml"], -wi, keepdims=False)

    # Per-measure combination (pathtracing_nee_impl.h:16-95):
    dist2 = jnp.maximum(ls["dist"] * ls["dist"], 1e-8)
    # area-measure lights: G = cos_l / dist^2 ; bsdf pdf -> area measure
    pdf_b_area = pdf_b * jnp.abs(cos_l) / dist2
    w_area = mis_balance(ls["pdf"] * pdf_select, pdf_b_area * 1.0)
    c_area = (
        f
        * ls["le"]
        * (jnp.maximum(cos_s, 0.0) * jnp.maximum(cos_l, 0.0) / dist2)[..., None]
        / jnp.maximum(ls["pdf"] * pdf_select, 1e-12)[..., None]
        * w_area[..., None]
    )
    # solid-angle measure (IBL): pdf already per steradian
    w_solid = mis_balance(ls["pdf"] * pdf_select, pdf_b)
    c_solid = (
        f
        * ls["le"]
        * jnp.maximum(cos_s, 0.0)[..., None]
        / jnp.maximum(ls["pdf"] * pdf_select, 1e-12)[..., None]
        * w_solid[..., None]
    )
    # singular lights: no MIS competition
    c_sing = (
        f
        * ls["le"]
        * jnp.maximum(cos_s, 0.0)[..., None]
        / jnp.maximum(ls["pdf"] * pdf_select, 1e-12)[..., None]
    )

    contrib = jnp.where(ls["area_measure"][..., None], c_area, c_solid)
    contrib = jnp.where(ls["singular"][..., None], c_sing, contrib)

    # Facing test + shadow ray.  occluded_fn may return a bool mask
    # (binary any-hit) or a float occlusion in [0,1] (alpha
    # punch-through transmittance, occlusion_alpha).
    facing = (cos_s > 0.0) & (ls["singular"] | ls["infinite"] | (cos_l > 0.0))
    ng_eps = brdf_mod.orient_normal(ns, wo) * 1e-3
    ro_sh = p + ng_eps
    dist_sh = jnp.where(
        ls["infinite"] | ls["singular"],
        ls["dist"],
        shadow_distance(ls["dist"], cos_l),
    )
    occ = occluded_fn(ro_sh, wi, dist_sh).astype(jnp.float32)
    vis = jnp.where(facing, 1.0 - occ, 0.0)
    return contrib * vis[..., None], state


def shadow_distance(dist, cos_l, eps=1e-3):
    """Shadow-ray length that never re-hits the target light itself.

    The 1e-3 normal offset at the shading point shifts the shadow ray
    PARALLEL to the sampled direction, so it crosses the emitter's
    plane up to eps/cos_l EARLIER than `dist` — a fixed dist-eps bound
    then reports the light's own surface as an occluder and kills NEE
    at grazing emission angles (the reference instead accepts hits on
    the target light, HitShadowRay pathtracing_impl.h:353-393, and uses
    an ulp-scale origin offset).  Shortening by eps/cos_l (clamped) can
    at worst skip occluders hugging the emitter surface.
    """
    return dist - eps / jnp.clip(jnp.abs(cos_l), 0.02, 1.0)



def implicit_light_weight(scene, hit_light_id, pdf_prev, prev_singular, t_dist, cos_l):
    """MIS weight for radiance picked up by hitting an emitter with a
    BSDF-sampled ray (HitImplicitLight, pathtracing_impl.h:425-439)."""
    num_lights = jnp.maximum(scene["num_lights"], 1)
    lights = scene["lights"]
    li = jnp.clip(hit_light_id, 0, lights["type"].shape[0] - 1)
    area = jnp.take(lights["area"], li)
    pdf_area = 1.0 / jnp.maximum(area, 1e-12)
    dist2 = jnp.maximum(t_dist * t_dist, 1e-8)
    pdf_light_solid = pdf_area * dist2 / jnp.maximum(jnp.abs(cos_l), 1e-6)
    pdf_light_solid = pdf_light_solid / num_lights
    w = mis_balance(pdf_prev, pdf_light_solid)
    return jnp.where(prev_singular, 1.0, w)


def env_miss_weight(scene, rd, pdf_prev, prev_singular):
    """MIS weight for envmap radiance on miss (ShadeMiss IBL MIS,
    pathtracing_impl.h:163-165)."""
    if scene.get("envmap") is None:
        return jnp.ones(rd.shape[:-1], jnp.float32)
    from aten_tpu.scene.envmap import pdf_env

    num_lights = jnp.maximum(scene["num_lights"], 1)
    p_env = pdf_env(scene, rd) / num_lights
    w = mis_balance(pdf_prev, p_env)
    return jnp.where(prev_singular, 1.0, w)
