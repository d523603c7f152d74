"""NEE path-tracing integrator (megakernel form, batched over pixels).

Counterpart of the reference's shared path-tracing core
(renderer/pathtracing/pathtracing_impl.h: GeneratePath:65, ShadeMiss:113,
FillShadowRay:209, HitImplicitLight:395, ComputeRussianProbability:680,
PrepareForNextBounce:700) and the host `PathTracing::radiance` loop
(pathtracing.cpp:22-89).  The wavefront-vs-megakernel split of
aten/idaten collapses here: one batched bounce loop where every lane is
a pixel-sample path and terminated lanes are masked — XLA's analogue of
the reference's stream compaction (masked lanes cost only VPU work,
which measurement shows is cheaper than sort/compact on TPU for
renderer-sized batches).

Path state is SoA, mirroring `Path` {throughput, contrib, attrib,
sampler} (renderer/pathtracing/pt_params.h:25-71).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aten_tpu.accel.traverse import occluded, traverse, traverse_sorted
from aten_tpu.core import camera as cam_mod
from aten_tpu.core import sampler as smp
from aten_tpu.core import vecmath as vm
from aten_tpu.scene.materials import MaterialType, gather_material
from aten_tpu.shading import brdf as brdf_mod
from aten_tpu.shading import nee


# Debug/experiment switch: unroll the bounce loop instead of lax.scan.
_UNROLL_BOUNCES = False

# Lane->pixel swizzle block size.  The Pallas traverser votes per
# 1024-ray tile; mapping a tile to a 32x32 PIXEL BLOCK (instead of a
# 2.5-row scan-order sliver) shrinks the tile's visited-node union and
# with it the whole leaf-test phase.  Pure permutation: per-pixel
# results are bitwise identical, only lane placement changes.
_SWIZZLE_BS = 32
_PERM_CACHE = {}


def _block_perm(width, height, bs=_SWIZZLE_BS):
    """(perm, inv): lane i traces pixel perm[i]; image[p] = out[inv[p]]."""
    key = (width, height, bs)
    if key not in _PERM_CACHE:
        ids = []
        for y0 in range(0, height, bs):
            for x0 in range(0, width, bs):
                yy, xx = np.mgrid[y0:min(y0 + bs, height), x0:min(x0 + bs, width)]
                ids.append((yy * width + xx).ravel())
        perm = np.concatenate(ids).astype(np.int32)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm), dtype=np.int32)
        _PERM_CACHE[key] = (perm, inv)
    return _PERM_CACHE[key]


def eval_hit(scene, ro, rd, hit):
    """Resolve hit attributes (position, normals, uv, material, light id).

    Counterpart of evaluate_hit_result (geometry/EvaluateHitResult.h:10-72).
    The position/normals are recomputed differentiably from barycentrics.
    """
    prim = hit["prim"]
    num_tris = scene["num_tris"]
    T = scene["tri_v0"].shape[0]
    S = scene["sph_center"].shape[0]
    is_tri = prim < num_tris
    tid = jnp.clip(prim, 0, T - 1)
    sid = jnp.clip(prim - num_tris, 0, S - 1)
    # Missed lanes carry t = INF; clamp so downstream (masked-out) shading
    # math stays finite — inf/nan on dead lanes would otherwise leak into
    # shared-parameter gradients through 0*inf in the backward pass.
    t_safe = jnp.where(hit["hit"], hit["t"], 1.0)
    p = ro + t_safe[..., None] * rd

    # Instanced hit: primitive data is object-local; resolve sphere
    # normals against the local-space position and transform normals to
    # world with the instance normal matrix W2L^T (EvaluateHitResult.h's
    # L2W transform of hit attributes).
    instanced = "inst_nmtx" in scene and hit.get("inst") is not None
    if instanced:
        iid = jnp.where(hit["inst"] >= 0, hit["inst"], scene["num_instances"])
        w2l = jnp.take(scene["inst_w2l"], iid, axis=0)  # [N,3,4]
        p_loc = jnp.einsum("nij,nj->ni", w2l[:, :, :3], p) + w2l[:, :, 3]
        nmtx = jnp.take(scene["inst_nmtx"], iid, axis=0)
    else:
        p_loc = p

    u = hit["u"][..., None]
    v = hit["v"][..., None]
    w = 1.0 - u - v
    # All per-triangle attributes pull in ONE fused gather: one-hot MXU
    # matmul for small pools (ops/gather.py; measured 9.2 -> ~1 ms per
    # bounce at 262k lanes) or, above the MXU limit, one [T,24] packed
    # row take built at scene build ("tri_attr"; ~2.5x faster than 11
    # per-field takes at 1M lanes on v5e).
    from aten_tpu.ops.gather import take_fields

    if "tri_attr" in scene:
        rows = jnp.take(scene["tri_attr"], tid, axis=0)
        tg = {
            "n0": rows[:, 0:3], "n1": rows[:, 3:6], "n2": rows[:, 6:9],
            "e1": rows[:, 9:12], "e2": rows[:, 12:15],
            "uv0": rows[:, 15:17], "uv1": rows[:, 17:19],
            "uv2": rows[:, 19:21],
            "mtl": rows[:, 21].astype(jnp.int32),
            "light": rows[:, 22].astype(jnp.int32),
            "mesh": rows[:, 23].astype(jnp.int32),
        }
    else:
        tg = take_fields(
            {
                "n0": scene["tri_n0"], "n1": scene["tri_n1"],
                "n2": scene["tri_n2"],
                "e1": scene["tri_e1"], "e2": scene["tri_e2"],
                "uv0": scene["tri_uv0"], "uv1": scene["tri_uv1"],
                "uv2": scene["tri_uv2"],
                "mtl": scene["tri_mtl"], "light": scene["tri_light"],
                "mesh": scene["tri_mesh"],
            },
            tid,
            int_fields=("mtl", "light", "mesh"),
        )
    ns_tri = vm.normalize(w * tg["n0"] + u * tg["n1"] + v * tg["n2"])
    ng_tri = vm.normalize(vm.cross(tg["e1"], tg["e2"]))
    uv_tri = w[..., :1] * tg["uv0"] + u[..., :1] * tg["uv1"] + v[..., :1] * tg["uv2"]
    mtl_tri = tg["mtl"]
    light_tri = tg["light"]

    sg = take_fields(
        {
            "c": scene["sph_center"], "r": scene["sph_radius"],
            "mtl": scene["sph_mtl"], "light": scene["sph_light"],
        },
        sid,
        int_fields=("mtl", "light"),
    )
    c = sg["c"]
    r = sg["r"][..., None]
    ns_sph = (p_loc - c) / jnp.maximum(r, 1e-12)
    mtl_sph = sg["mtl"]
    light_sph = sg["light"]

    m3 = is_tri[..., None]
    ns = jnp.where(m3, ns_tri, ns_sph)
    ng = jnp.where(m3, ng_tri, ns_sph)
    if instanced:
        ns = vm.normalize(jnp.einsum("nij,nj->ni", nmtx, ns))
        ng = vm.normalize(jnp.einsum("nij,nj->ni", nmtx, ng))
    uv = jnp.where(is_tri[..., None], uv_tri, 0.5)
    out = {
        "p": p,
        "ns": ns,
        "ng": ng,
        "uv": uv,
        "mtl": jnp.where(is_tri, mtl_tri, mtl_sph),
        "light": jnp.where(is_tri, light_tri, light_sph),
        # mesh id (TriangleGroupMesh role); spheres get unique synthetic ids
        "mesh": jnp.where(is_tri, tg["mesh"], jnp.int32(1 << 20) + sid),
    }
    if scene.get("has_voxel_lod"):
        # Voxel-LOD hit resolution (EvaluateHitResult.h voxel branch +
        # FillMaterial's voxel color fill, material_impl.h:232-262): the
        # "surface" is the node AABB entry face; material is the node's
        # dominant material (accel/voxel.py).
        vox_base = scene["num_tris"] + scene["num_spheres"]
        is_vox = hit["prim"] >= vox_base
        K = scene["nodes_bmin"].shape[0]
        node = jnp.clip(hit["prim"] - vox_base, 0, K - 1)
        nb0 = jnp.take(scene["nodes_bmin"], node, axis=0)
        nb1 = jnp.take(scene["nodes_bmax"], node, axis=0)
        inv = jnp.where(jnp.abs(rd) > 1e-12, 1.0 / rd, 1e12)
        tA = (nb0 - ro) * inv
        tB = (nb1 - ro) * inv
        t_near_ax = jnp.minimum(tA, tB)  # [N,3] per-axis entry
        axis = jnp.argmax(t_near_ax, axis=-1)
        n_vox = -jnp.sign(rd) * jax.nn.one_hot(axis, 3, dtype=rd.dtype)
        n_vox = vm.normalize(jnp.where(vm.dot(n_vox, rd) < 0, n_vox, -rd))
        v3 = is_vox[..., None]
        out["ns"] = jnp.where(v3, n_vox, out["ns"])
        out["ng"] = jnp.where(v3, n_vox, out["ng"])
        out["mtl"] = jnp.where(
            is_vox, jnp.take(scene["nodes_voxel_mtl"], node), out["mtl"]
        )
        out["light"] = jnp.where(is_vox, -1, out["light"])
        out["is_voxel"] = is_vox
    return out


def _resolve_stencil(scene, ro, rd, max_lookups=4, eps=1e-3):
    """Bounce-0 stencil punch-through (CheckStencil,
    pathtracing_impl.h:612-678): where the primary hit is a STENCIL
    material, walk forward through surfaces looking for an ALWAYS
    (front-facing) surface; if found, restart the primary ray just
    before it so the main trace sees THAT hit.  NONE hits or exhausted
    lookups leave the original ray (the stencil surface shades
    normally, matching the reference's `return false`)."""
    hit0 = traverse(scene, ro, rd)
    h0 = eval_hit(scene, ro, rd, hit0)
    m0 = gather_material(scene["materials"], h0["mtl"])
    pending = hit0["hit"] & (m0["stencil"] == 1.0)

    cur = h0["p"] + rd * eps
    ro_out = ro
    done = ~pending
    for _ in range(max_lookups):
        res = traverse(scene, cur, rd, t_min=eps)
        h = eval_hit(scene, cur, rd, res)
        m = gather_material(scene["materials"], h["mtl"])
        front = vm.dot(h["ns"], -rd, keepdims=False) > 0.0
        take = ~done & res["hit"] & (m["stencil"] == 2.0) & front
        ro_out = jnp.where(take[..., None], h["p"] - rd * eps, ro_out)
        stop = take | ~res["hit"] | (m["stencil"] == 0.0) | (
            (m["stencil"] == 2.0) & ~front
        )
        done = done | stop
        cur = jnp.where(res["hit"][..., None], h["p"] + rd * eps, cur)
    return ro_out


_BLUENOISE = None


def _get_bluenoise():
    global _BLUENOISE
    if _BLUENOISE is None:
        from aten_tpu.core.bluenoise import BlueNoiseSampler

        _BLUENOISE = BlueNoiseSampler()
    return _BLUENOISE


def _trace_paths(
    scene, cam_arrays, width, height, frame, sample, spp, max_depth, rr_depth,
    y0=0, tile_h=None, want_aovs=False, spp_chunk=1, cam_type="pinhole",
    sampler="cmj",
):
    """Path-traced radiance [tile_h*width, 3], averaged over spp_chunk
    TRUE samples per pixel traced in ONE dispatch.

    y0/tile_h select a horizontal band of the image — the unit of
    data-parallel sharding across chips (rays/tiles are the only
    parallel axis a renderer needs; SURVEY.md §2.12).  Seeding uses
    GLOBAL pixel ids so a sharded render is bitwise identical to the
    single-chip one.

    spp_chunk: lane-level sample batching.  Each dispatch on this
    hardware carries a ~50 ms floor (measured: 512x512x1spp at depth 5
    costs the same wall time as 16 chunked samples); a per-sample host
    loop leaves the chip >90% idle.  Lanes are (chunk, pixel) pairs —
    lane c*Npix+p traces sample `sample+c` of pixel p — so the result
    is bitwise the mean of the corresponding spp_chunk=1 dispatches.

    want_aovs: also return first-hit G-buffer aovs {normal, depth, albedo,
    prim, pos, mtl} (FillAOVs role, renderer/svgf/svgf_impl.h:63) feeding
    the SVGF denoiser and debug views.  AOVs come from the first chunk
    (one sample's G-buffer, like the reference's AOV fill).
    """
    if tile_h is None:
        tile_h = height
    n_pix = width * tile_h
    N = n_pix * spp_chunk
    bs = _SWIZZLE_BS
    even = (width % bs == 0) and (tile_h % bs == 0)
    lane = jnp.arange(N, dtype=jnp.uint32)
    p_in = lane % jnp.uint32(n_pix)
    if even:
        # closed-form block swizzle: the perm-table gather cost ~112 ms
        # per 13.1M-lane cornell dispatch (xplane r5); div/mod by
        # constants is near-free VPU arithmetic, and the un-swizzle at
        # the tail becomes a pure reshape/transpose (no gather at all)
        bpr = jnp.uint32(width // bs)
        ppb = jnp.uint32(bs * bs)
        b = p_in // ppb
        r = p_in % ppb
        lpix = ((b // bpr) * jnp.uint32(bs) + r // jnp.uint32(bs)) \
            * jnp.uint32(width) \
            + (b % bpr) * jnp.uint32(bs) + r % jnp.uint32(bs)
    else:
        perm_np, inv_np = _block_perm(width, tile_h)
        perm = jnp.asarray(perm_np, jnp.uint32)
        lpix = jnp.take(perm, p_in)
    samp_idx = jnp.uint32(sample) + lane // jnp.uint32(n_pix)
    px = (lpix % width).astype(jnp.float32)
    py_local = (lpix // width).astype(jnp.float32)
    py = py_local + jnp.asarray(y0, jnp.float32)
    pix = (py.astype(jnp.uint32) * jnp.uint32(width)) + (lpix % width)
    pixel_seed = smp.wang_hash(pix + jnp.uint32(1))

    state = smp.make_state(pixel_seed, frame, samp_idx, spp, bounce=0)
    ju, jv, state = smp.next_2d(state)
    if sampler == "bluenoise":
        # blue-noise pixel jitter (the reference registers 256x256xN
        # noise masks with the PT sampler, libidaten/kernel/
        # pathtracing.h:23); deeper dims fall back to CMJ like the
        # reference falls back past its registered layer count
        bn = _get_bluenoise()
        fkey = frame * jnp.uint32(64) + samp_idx
        ju = bn.sample(px, py, fkey, jnp.uint32(0))
        jv = bn.sample(px, py, fkey, jnp.uint32(1))
    s = (px + ju) / width
    t = (jnp.float32(height - 1) - py + jv) / height
    # camera dispatch (the reference's per-app camera choice; ThinLens
    # draws its lens-disc sample from the same CMJ stream)
    if cam_type == "thinlens":
        ul1, ul2, state = smp.next_2d(state)
        ro, rd = cam_mod.generate_ray_thinlens(cam_arrays, s, t, ul1, ul2)
    elif cam_type == "equirect":
        ro, rd = cam_mod.generate_ray_equirect(cam_arrays, s, t)
    else:
        ro, rd = cam_mod.generate_ray(cam_arrays, s, t)

    # vma-seeded carries (see traverse.py note): inherit sharding tag from rd.
    vz = rd[..., 0] * 0.0
    ro = ro + vz[..., None]  # camera origin broadcast is unvarying otherwise
    if scene.get("has_stencil"):
        ro = _resolve_stencil(scene, ro, rd)
    radiance = jnp.zeros((N, 3), jnp.float32) + vz[..., None]
    throughput = jnp.ones((N, 3), jnp.float32) + vz[..., None]
    alive = vz == 0.0
    pdf_prev = jnp.ones((N,), jnp.float32) + vz
    prev_singular = vz == 0.0  # bounce 0: full weight on emitters

    # Alpha-translucent scenes route shadow rays through the bounded
    # punch-through transmittance walk (HitTestToTargetLight's alpha
    # loop); opaque scenes keep the cheaper binary any-hit.
    if scene.get("has_alpha"):
        from aten_tpu.accel.traverse import occlusion_alpha

        occluded_fn = lambda o, d, dist: occlusion_alpha(scene, o, d, dist)
    else:
        occluded_fn = lambda o, d, dist: occluded(scene, o, d, dist)

    aovs = {
        "normal": jnp.zeros((N, 3), jnp.float32) + vz[..., None],
        "depth": jnp.full((N,), -1.0, jnp.float32) + vz,
        "albedo": jnp.zeros((N, 3), jnp.float32) + vz[..., None],
        "pos": jnp.zeros((N, 3), jnp.float32) + vz[..., None],
        "prim": jnp.full((N,), -1, jnp.int32) + vz.astype(jnp.int32),
        "mtl": jnp.full((N,), -1, jnp.int32) + vz.astype(jnp.int32),
        # first-hit instance id (-1 static): feeds object motion
        # vectors in SVGF (the reference rasterizes a motion-depth
        # buffer per frame, host_renderer/main.cpp:150-163)
        "inst": jnp.full((N,), -1, jnp.int32) + vz.astype(jnp.int32),
    }

    def bounce_body(carry, bounce):
        ro, rd, throughput, radiance, alive, pdf_prev, prev_singular, aovs = carry
        # sorted traversal: bounce rays are BRDF-scattered and tile-
        # incoherent; regrouping by (octant, origin morton) keeps the
        # Pallas tile votes tight (no-op permutation semantically).
        # Dead lanes get t_max = 0 so they drop out of the tile votes
        # entirely (by depth 4-5 half the lanes are dead; their stale
        # rays otherwise keep inflating every tile's visited union).
        hit = traverse_sorted(
            scene, ro, rd, t_max=jnp.where(alive, vm.INF, 0.0)
        )
        h = eval_hit(scene, ro, rd, hit)
        mat = gather_material(scene["materials"], h["mtl"])
        # shade-time texture fetches (sampleTexture role)
        from aten_tpu.scene import textures as tex_mod

        mat = tex_mod.apply_albedo(scene, mat, h["uv"])
        mat = tex_mod.apply_roughness_map(scene, mat, h["uv"])
        h["ns"] = tex_mod.apply_normal_map(scene, mat, h["ns"], h["uv"])
        used_types = scene.get("used_mtl_types")
        if used_types is None or int(MaterialType.CAR_PAINT) in used_types:
            # procedural flake coverage + flake normal at this uv
            # (CarPaint::applyNormalMap + FlakesNormal::gen role)
            mat = brdf_mod.carpaint_flake_fields(mat, h["uv"], h["ns"])
        if scene.get("has_voxel_lod"):
            # voxel hits shade as forced Diffuse (FillMaterial,
            # material_impl.h:232-262)
            mat["type"] = jnp.where(
                h["is_voxel"], jnp.int32(MaterialType.DIFFUSE), mat["type"]
            )

        if want_aovs:
            # First-hit G-buffer (FillAOVs, svgf_impl.h:63): normal/depth/
            # albedo/ids/world pos captured at bounce 0 on hit lanes.
            first = (bounce == 0) & hit["hit"]
            f3 = first[..., None]
            inst_cur = hit.get("inst")
            if inst_cur is None:
                inst_cur = jnp.full((N,), -1, jnp.int32)
            aovs = {
                "normal": jnp.where(f3, h["ns"], aovs["normal"]),
                "depth": jnp.where(first, hit["t"], aovs["depth"]),
                "albedo": jnp.where(f3, mat["base_color"], aovs["albedo"]),
                "pos": jnp.where(f3, h["p"], aovs["pos"]),
                "prim": jnp.where(first, hit["prim"], aovs["prim"]),
                "mtl": jnp.where(first, h["mtl"], aovs["mtl"]),
                "inst": jnp.where(first, inst_cur, aovs["inst"]),
            }

        # ---- miss: environment/background (ShadeMiss, incl. IBL MIS)
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

        # ---- per-bounce sampler re-seed (reference bounce-dim offset);
        # created before shading so alpha punch-through can draw from it
        state = smp.make_state(pixel_seed, frame, samp_idx, spp, bounce=bounce + 1)

        # ---- translucent-by-alpha punch-through
        # (CheckMaterialTranslucentByAlpha, pathtracing_impl.h:511-610):
        # with probability 1 - alpha the surface is skipped — the ray
        # continues straight through, keeping its MIS state.  Stochastic
        # (one ray, unbiased) instead of the reference's accumulated
        # alpha blend; the bounce budget bounds punch-throughs like the
        # reference's max_lookups=10.
        if scene.get("has_alpha"):
            u_alpha, state = smp.next_1d(state)
            a_eff = mat["alpha"] * mat.get("tex_alpha", 1.0)
            punch = alive & hit["hit"] & (u_alpha >= a_eff)
        else:
            punch = jnp.zeros_like(alive)

        # ---- toon-as-light termination (HitTeminatedMaterial toon branch,
        # pathtracing_impl.h:453-509): at bounce 0 the toon term is added
        # like an emitter and the path ends; deeper bounces end silently.
        used_types = scene.get("used_mtl_types")
        has_toon = used_types is None or (
            int(MaterialType.TOON) in used_types
            or int(MaterialType.STYLIZED_BRDF) in used_types
        )
        if has_toon:
            from aten_tpu.shading.toon import toon_term

            is_toon = (mat["type"] == MaterialType.TOON) | (
                mat["type"] == MaterialType.STYLIZED_BRDF
            )
            occ_toon = (
                lambda o, d, dist, a=alive: occluded_fn(
                    o, d, jnp.where(a, dist, 0.0))
            )
            t_rgb, state = toon_term(
                scene, mat, h["p"], h["ns"], rd, state, occ_toon,
                stylized=mat["type"] == MaterialType.STYLIZED_BRDF,
            )
            toon_add = alive & hit["hit"] & is_toon & ~punch & (bounce == 0)
            radiance = radiance + jnp.where(
                toon_add[..., None], throughput * t_rgb, 0.0
            )
            alive = alive & (~is_toon | punch)

        # ---- implicit emitter hit (HitImplicitLight)
        is_emis = mat["type"] == MaterialType.EMISSIVE
        cos_l = vm.dot(h["ng"], -rd, keepdims=False)
        hit_emit = alive & hit["hit"] & is_emis
        w_imp = nee.implicit_light_weight(
            scene, h["light"], pdf_prev, prev_singular, hit["t"], cos_l
        )
        w_imp = jnp.where(h["light"] >= 0, w_imp, 1.0)
        # only front side emits
        front = cos_l > 0.0
        radiance = radiance + jnp.where(
            (hit_emit & front & ~punch)[..., None],
            throughput * mat["base_color"] * w_imp[..., None],
            0.0,
        )
        alive = alive & hit["hit"] & (~is_emis | punch)

        wo = -rd
        # ---- NEE (skipped for singular BSDFs); dead lanes pass dist=0
        # so their shadow rays drop out of the traversal votes
        occ_nee = (
            lambda o, d, dist, a=alive: occluded_fn(
                o, d, jnp.where(a, dist, 0.0))
        )
        contrib, state = nee.nee_contribution(
            scene, mat, h["p"], h["ns"], wo, state, occ_nee,
            used=scene.get("used_mtl_types"),
        )
        is_singular_mat = (mat["type"] == MaterialType.SPECULAR) | (
            mat["type"] == MaterialType.REFRACTION
        )
        nee_ok = alive & ~is_singular_mat & ~punch
        radiance = radiance + jnp.where(nee_ok[..., None], throughput * contrib, 0.0)

        # ---- russian roulette (ComputeRussianProbability); the survival
        # probability is detached so RR stays an unbiased estimator under AD
        u_rr, state = smp.next_1d(state)
        rr_on = bounce >= rr_depth
        rr_p = jnp.where(
            rr_on, jnp.clip(jnp.max(throughput, axis=-1), 0.01, 0.95), 1.0
        )
        rr_p = jax.lax.stop_gradient(rr_p)
        alive = alive & (u_rr < rr_p)
        throughput = throughput / rr_p[..., None]

        # ---- BSDF sample + next ray (PrepareForNextBounce)
        u1, u2, state = smp.next_2d(state)
        u3, state = smp.next_1d(state)
        if sampler == "bluenoise":
            bn = _get_bluenoise()
            fkey = frame * jnp.uint32(64) + samp_idx
            base = jnp.uint32(2) + bounce.astype(jnp.uint32) * jnp.uint32(3)
            u1 = bn.sample(px, py, fkey, base)
            u2 = bn.sample(px, py, fkey, base + jnp.uint32(1))
            u3 = bn.sample(px, py, fkey, base + jnp.uint32(2))
        from aten_tpu.shading import dispatch as disp_mod

        samp = disp_mod.sample_brdf(
            scene, mat, h["ns"], wo, u1, u2, u3,
            used=scene.get("used_mtl_types")
        )
        n_or = brdf_mod.orient_normal(h["ns"], wo)
        cos_wi = jnp.abs(vm.dot(n_or, samp["wi"], keepdims=False))
        good = (samp["pdf"] > 1e-9) & (cos_wi > 1e-9)
        # detached-pdf estimator: E[d f/p_detached] = d E[f/p] (unbiased)
        pdf_det = jax.lax.stop_gradient(jnp.maximum(samp["pdf"], 1e-9))
        weight = samp["bsdf"] * (cos_wi / pdf_det)[..., None]
        throughput = jnp.where(
            (alive & good & ~punch)[..., None], throughput * weight, throughput
        )
        alive = alive & (good | punch)

        # Detached sampling (SURVEY.md §7 differentiability design): the
        # sampled direction is treated as a constant under AD; parameter
        # gradients flow through bsdf/pdf VALUES, not through the warp.
        off_n = jnp.where(samp["transmission"][..., None], -n_or, n_or)
        ro_next = jax.lax.stop_gradient(h["p"] + off_n * 1e-3)
        # punch-through lanes continue STRAIGHT through the surface,
        # keeping direction and MIS state
        ro = jnp.where(
            punch[..., None],
            jax.lax.stop_gradient(h["p"] + rd * 1e-3),
            ro_next,
        )
        rd = jnp.where(punch[..., None], rd, jax.lax.stop_gradient(samp["wi"]))
        pdf_prev = jnp.where(punch, pdf_prev, samp["pdf"])
        prev_singular = jnp.where(punch, prev_singular, samp["singular"])
        return (ro, rd, throughput, radiance, alive, pdf_prev, prev_singular, aovs), None

    carry = (ro, rd, throughput, radiance, alive, pdf_prev, prev_singular, aovs)
    if _UNROLL_BOUNCES:
        for b in range(max_depth):
            carry, _ = bounce_body(carry, jnp.uint32(b))
    else:
        carry, _ = jax.lax.scan(
            bounce_body, carry, jnp.arange(max_depth, dtype=jnp.uint32)
        )
    radiance = carry[3]
    aovs = carry[7]

    # invalid-radiance guard (Renderer::isInvalidColor, renderer/renderer.h:58)
    bad = ~jnp.all(jnp.isfinite(radiance), axis=-1) | jnp.any(radiance < 0, axis=-1)
    radiance = jnp.where(bad[..., None], 0.0, radiance)
    if spp_chunk > 1:
        # fold the sample-chunk lanes: mean over true samples per pixel
        radiance = radiance.reshape(spp_chunk, n_pix, 3).mean(axis=0)
        if want_aovs:
            aovs = {k: v[:n_pix] for k, v in aovs.items()}
    # un-swizzle lanes back to scan order
    if even:
        nby, nbx = tile_h // bs, width // bs

        def unswz(a):
            extra = a.shape[1:]
            t = a.reshape((nby, nbx, bs, bs) + extra)
            axes = (0, 2, 1, 3) + tuple(range(4, 4 + len(extra)))
            return t.transpose(axes).reshape((n_pix,) + extra)

        radiance = unswz(radiance)
        if want_aovs:
            aovs = {k: unswz(v) for k, v in aovs.items()}
            return radiance, aovs
        return radiance
    inv = jnp.asarray(inv_np)
    radiance = jnp.take(radiance, inv, axis=0)
    if want_aovs:
        aovs = {k: jnp.take(v, inv, axis=0) for k, v in aovs.items()}
        return radiance, aovs
    return radiance


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "rr_depth",
                     "spp_chunk", "cam_type", "sampler"),
)
def render_sample(
    scene, cam_arrays, width, height, frame, sample, spp=1, max_depth=5, rr_depth=3,
    spp_chunk=1, cam_type="pinhole", sampler="cmj",
):
    """Mean radiance of samples [sample, sample+spp_chunk) in ONE dispatch."""
    rad = _trace_paths(
        scene, cam_arrays, width, height, frame, sample, spp, max_depth, rr_depth,
        spp_chunk=spp_chunk, cam_type=cam_type, sampler=sampler,
    )
    return rad.reshape(height, width, 3)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "spp", "max_depth", "rr_depth")
)
def render_sample_with_aovs(
    scene, cam_arrays, width, height, frame, sample, spp=1, max_depth=5, rr_depth=3
):
    """One sample + first-hit G-buffer, reshaped to images (SVGF input)."""
    rad, aovs = _trace_paths(
        scene, cam_arrays, width, height, frame, sample, spp, max_depth, rr_depth,
        want_aovs=True,
    )
    img = rad.reshape(height, width, 3)
    out = {}
    for k, v in aovs.items():
        out[k] = v.reshape((height, width) + v.shape[1:])
    return img, out


def camera_type_of(cam):
    """Static camera-type tag from the camera instance."""
    from aten_tpu.core.camera import EquirectCamera, ThinLensCamera

    if isinstance(cam, ThinLensCamera):
        return "thinlens"
    if isinstance(cam, EquirectCamera):
        return "equirect"
    return "pinhole"


def render_image(scene, cam, spp=16, max_depth=5, rr_depth=3, frame=0,
                 spp_chunk=None):
    """Accumulate spp samples.  Samples are traced spp_chunk at a time
    inside a single dispatch (default: whole spp in one, capped so path
    state stays a few hundred MB) — a host-side per-sample loop pays the
    ~50 ms dispatch floor once per SAMPLE instead of once per CHUNK."""
    cam_arrays = cam.arrays()
    cam_type = camera_type_of(cam)
    if spp_chunk is None:
        # cap lanes at ~4M (512x512x16): carries stay < ~1 GB HBM
        spp_chunk = max(1, min(spp, (4 << 20) // (cam.width * cam.height)))
    while spp % spp_chunk:
        spp_chunk -= 1  # keep equal-weight chunks
    acc = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
    for s in range(0, spp, spp_chunk):
        acc = acc + render_sample(
            scene,
            cam_arrays,
            cam.width,
            cam.height,
            jnp.uint32(frame),
            jnp.uint32(s),
            spp,
            max_depth,
            rr_depth,
            spp_chunk=spp_chunk,
            cam_type=cam_type,
        ) * spp_chunk
    return acc / spp


class PathTracer:
    """Progressive renderer facade mirroring Renderer::render
    (renderer/renderer.h:31) + FilmProgressive accumulation."""

    def __init__(self, scene, cam, spp_per_frame=1, max_depth=5, rr_depth=3):
        self.scene = scene
        self.cam = cam
        self.cam_arrays = cam.arrays()
        self.spp_per_frame = spp_per_frame
        self.max_depth = max_depth
        self.rr_depth = rr_depth
        self.frame = 0
        from aten_tpu.integrator.film import Film

        self.film = Film(cam.height, cam.width)

    def render_frame(self):
        for s in range(self.spp_per_frame):
            img = render_sample(
                self.scene,
                self.cam_arrays,
                self.cam.width,
                self.cam.height,
                jnp.uint32(self.frame),
                jnp.uint32(s),
                self.spp_per_frame,
                self.max_depth,
                self.rr_depth,
            )
            self.film.accumulate(img)
        self.frame += 1
        return self.film.image()

    def reset(self):
        self.film.clear()
        self.frame = 0
