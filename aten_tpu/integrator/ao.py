"""Ambient-occlusion renderer.

Counterpart of `AORenderer` (src/libaten/renderer/ao/aorenderer.h:13-37,
aorenderer_impl.h + src/libidaten/ao/ao.cu): primary hit, then
cosine-hemisphere occlusion rays limited to an AO radius; the visible
fraction is the pixel value.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aten_tpu.accel.traverse import occluded, traverse
from aten_tpu.core import camera as cam_mod
from aten_tpu.core import sampler as smp
from aten_tpu.integrator.pathtracer import eval_hit
from aten_tpu.shading import brdf as brdf_mod


@functools.partial(
    jax.jit, static_argnames=("width", "height", "num_rays", "spp")
)
def render_ao_sample(
    scene, cam_arrays, width, height, frame, sample, spp=1, num_rays=4,
    ao_radius=1.0,
):
    N = width * height
    pix = jnp.arange(N, dtype=jnp.uint32)
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32)
    pixel_seed = smp.wang_hash(pix + jnp.uint32(1))
    state = smp.make_state(pixel_seed, frame, sample, spp, bounce=0)
    ju, jv, state = smp.next_2d(state)
    s = (px + ju) / width
    t = (jnp.float32(height - 1) - py + jv) / height
    ro, rd = cam_mod.generate_ray(cam_arrays, s, t)

    hit = traverse(scene, ro, rd)
    h = eval_hit(scene, ro, rd, hit)
    n = brdf_mod.orient_normal(h["ns"], -rd)

    vis = jnp.zeros((N,), jnp.float32)
    for k in range(num_rays):
        u1, u2, state = smp.next_2d(state)
        wi, _ = brdf_mod._cos_hemisphere_sample(n, u1, u2)
        blocked = occluded(
            scene, h["p"] + n * 1e-3, wi, jnp.full((N,), ao_radius)
        )
        vis = vis + jnp.where(blocked, 0.0, 1.0)
    ao = vis / num_rays
    ao = jnp.where(hit["hit"], ao, 1.0)
    return jnp.repeat(ao.reshape(height, width, 1), 3, axis=-1)


def render_ao(scene, cam, spp=4, num_rays=4, ao_radius=1.0, frame=0):
    ca = cam.arrays()
    acc = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
    for s in range(spp):
        acc = acc + render_ao_sample(
            scene, ca, cam.width, cam.height, jnp.uint32(frame), jnp.uint32(s),
            spp, num_rays, ao_radius,
        )
    return acc / spp
