"""Stage profiler for the full-PT frame: times each integrator stage
standalone at renderer shapes so the integrator-vs-kernel gap
(VERDICT r3 weak #3: sponza full PT 2.48 s/frame vs 0.33 s traversal)
can be attributed op by op.

Usage: python tools/pt_profile.py [sponza|cornell] [spp]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))  # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:42s} {best*1e3:9.2f} ms")
    return out, best


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sponza"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from aten_tpu.scene import scenedefs
    from aten_tpu.core import camera as cam_mod
    from aten_tpu.core import sampler as smp

    W = H = 512
    mk = getattr(scenedefs, f"{which}_scene", None)
    if mk is not None:
        scene, cam = mk(W, H)
    else:
        from aten_tpu.scene.scenedefs import cornell_box

        scene, cam = cornell_box(W, H)
    N = W * H * spp
    print(f"{which}: {N} lanes, tris={scene['num_tris']}")

    # primary rays (block-swizzled like the integrator)
    from aten_tpu.integrator.pathtracer import _block_perm

    perm_np, _ = _block_perm(W, H)
    lane = np.arange(N, dtype=np.uint32)
    lpix = perm_np[lane % (W * H)]
    px = (lpix % W).astype(np.float32)
    py = (lpix // W).astype(np.float32)
    s = (px + 0.5) / W
    t = (H - 1 - py + 0.5) / H
    ro, rd = cam_mod.generate_ray(
        cam.arrays(), jnp.asarray(s, jnp.float32), jnp.asarray(t, jnp.float32))
    ro = jax.block_until_ready(ro)

    from aten_tpu.accel.traverse import traverse, traverse_sorted, occluded

    # 1. bare traversal, coherent primaries
    f = jax.jit(lambda ro, rd: traverse(scene, ro, rd)["t"])
    hit_t, sec = timeit("traverse closest (coherent)", f, ro, rd)

    # 2. sorted traversal (argsort + permute + kernel + unpermute)
    f = jax.jit(lambda ro, rd: traverse_sorted(scene, ro, rd)["t"])
    timeit("traverse_sorted closest (coherent)", f, ro, rd)

    # 3. argsort alone at N keys
    key = jnp.asarray(np.random.randint(0, 1 << 30, N, np.int64), jnp.uint32)

    f = jax.jit(lambda k: jnp.argsort(k))
    perm, _ = timeit("argsort 1M keys", f, key)
    f = jax.jit(lambda p: jnp.argsort(p))
    timeit("argsort inverse", f, perm)
    f = jax.jit(lambda ro, p: (ro[p], rd[p]))
    timeit("permute ro+rd", f, ro, perm)

    # 4. eval_hit at N lanes
    from aten_tpu.integrator.pathtracer import eval_hit

    hit = jax.jit(lambda ro, rd: traverse(scene, ro, rd))(ro, rd)
    hit = jax.block_until_ready(hit)
    f = jax.jit(lambda ro, rd, h: eval_hit(scene, ro, rd, h)["p"])
    timeit("eval_hit", f, ro, rd, hit)

    # 5. gather_material + textures
    from aten_tpu.scene.materials import gather_material
    from aten_tpu.scene import textures as tex_mod

    h = jax.jit(lambda ro, rd, h: eval_hit(scene, ro, rd, h))(ro, rd, hit)
    h = jax.block_until_ready(h)

    def mat_fn(mtl, uv, ns):
        mat = gather_material(scene["materials"], mtl)
        mat = tex_mod.apply_albedo(scene, mat, uv)
        mat = tex_mod.apply_roughness_map(scene, mat, uv)
        ns2 = tex_mod.apply_normal_map(scene, mat, ns, uv)
        return mat["base_color"] + ns2

    timeit("gather_material+textures", jax.jit(mat_fn), h["mtl"], h["uv"], h["ns"])

    # 6. NEE contribution (light sample + shadow ray + brdf eval)
    from aten_tpu.shading import nee

    state = smp.make_state(jnp.arange(N, dtype=jnp.uint32), jnp.uint32(0),
                           jnp.zeros(N, jnp.uint32), 1, bounce=1)

    def nee_fn(p, ns, wo):
        occ = lambda o, d, dist: occluded(scene, o, d, dist)
        c, _ = nee.nee_contribution(
            scene, gather_material(scene["materials"], h["mtl"]), p, ns, wo,
            state, occ, used=scene.get("used_mtl_types"))
        return c

    timeit("NEE total (sample+occl+eval)", jax.jit(nee_fn), h["p"], h["ns"], -rd)

    # 6b. occlusion alone on shadow-like rays
    ldir = jnp.asarray(np.random.randn(3).astype(np.float32))
    ldir = ldir / jnp.linalg.norm(ldir)
    f = jax.jit(lambda p: occluded(scene, p, jnp.broadcast_to(ldir, p.shape),
                                   jnp.full(p.shape[:1], 5.0)))
    timeit("occluded any-hit (shared dir)", f, h["p"])

    # 7. BRDF sampling
    from aten_tpu.shading import brdf as brdf_mod

    u1 = jnp.linspace(0, 1, N)
    mat = jax.jit(lambda m: gather_material(scene["materials"], m))(h["mtl"])
    mat = jax.block_until_ready(mat)

    def brdf_fn(ns, wo):
        sm = brdf_mod.sample_brdf(mat, ns, wo, u1, u1, u1,
                                  used=scene.get("used_mtl_types"))
        return sm["wi"] + sm["bsdf"]

    timeit("sample_brdf", jax.jit(brdf_fn), h["ns"], -rd)

    # 8. full frame for comparison
    from aten_tpu.integrator.pathtracer import render_sample

    ca = cam.arrays()

    def frame(i):
        return render_sample(scene, ca, W, H, jnp.uint32(1), jnp.uint32(0),
                             spp, 5, 3, spp_chunk=spp).reshape(-1)[0]

    timeit(f"FULL frame {spp}spp depth5", jax.jit(frame), jnp.uint32(0), reps=2)


if __name__ == "__main__":
    main()
