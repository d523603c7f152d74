"""Material-partitioned shading dispatch (VERDICT r5 ask #2).

The branchless zoo pays every used BRDF family on every lane
(brdf.py eval/sample with static `_need` pruning): a scene using ~11
families costs ~11x per shading point.  This module sorts lanes by
material type, cuts the wavefront into fixed-size chunks, and runs a
`lax.switch` per chunk: chunks that are type-PURE (all but the ~one
boundary chunk per segment) execute exactly ONE family's code — the
branch is `fn(used={family})`, so brdf.py's own `_need` pruning builds
the minimal per-family program — while mixed boundary chunks fall back
to the full branchless path.

Bandwidth design (the first cut of this module was 3x SLOWER than
branchless): permutation gathers at wavefront width cost ~2.5-7 ms per
1M indices REGARDLESS of row width (PERF_NOTES_R4), so sorting ~35
separate operand arrays drowned the shading savings.  Instead ALL
operands are packed into ONE [N, K] f32 matrix (ints/bools bitcast) and
each direction pays exactly ONE row gather; the per-lane material rows
are NOT sorted at all — each branch re-gathers them from the (tiny)
material table with the one-hot MXU trick (scene/materials.py) and only
the texture/procedurally-MODIFIED fields (base_color, roughness,
tex_alpha, flake_*) ride the packed sort.

TPU-native form of the reference's shade-kernel material staging
(src/libidaten/kernel/pathtracing_impl.cu:18-238: shared-memory
material cache + per-type switch per thread block).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from aten_tpu.scene.materials import MaterialType

# per-lane mat fields that may have been modified after the table
# gather (texture fetches / procedural flakes); everything else is
# rebuilt in-branch from the table
_OVERRIDE_FIELDS = (
    ("base_color", 3),
    ("roughness", 1),
    ("tex_alpha", 1),
    ("flake_a", 1),
    ("flake_nml", 3),
)

# families whose branchless cost is trivial — partitioning only pays
# when at least two EXPENSIVE families share the wavefront
_CHEAP = {
    int(MaterialType.DIFFUSE),
    int(MaterialType.SPECULAR),
    int(MaterialType.REFRACTION),
    int(MaterialType.EMISSIVE),
}


def _chunk_for(n):
    # small enough that the ~(#families) boundary chunks are a minor
    # fraction, big enough that per-chunk dispatch overhead amortizes
    c = 2048
    while c * 128 < n and c < 16384:
        c *= 2
    return c


import os as _os

# MEASURED OFF by default (round 5): on the 11-family zoo at 8.4M lanes
# the partition's own cost (2 packed wavefront gathers per direction at
# ~5 ms/M indices + scan-of-switch overhead) exceeded the family-sweep
# savings — the branchless sweep was only ~10% of the frame once the
# IBL sampling/gather hot spots were fixed (PERF_NOTES_R5).  Kept as an
# opt-in for genuinely dispatch-bound workloads.
_ENV_PARTITION = _os.environ.get("ATEN_TPU_PARTITION", "0") == "1"


def worth_partitioning(used, n):
    """Static gate: sorted-chunk dispatch only for multi-family scenes
    at real wavefront sizes (small/test batches keep the plain path)."""
    if used is None or not _ENV_PARTITION:
        return False
    expensive = [t for t in used if int(t) not in _CHEAP]
    chunk = _chunk_for(n)
    return (
        len(expensive) >= 2
        and n % chunk == 0
        and n // chunk >= 8
    )


def _pack(arrs):
    """Pack a list of [N]/[N,k] arrays into one [N, K] f32 matrix."""
    cols = []
    for a in arrs:
        if a.dtype in (jnp.int32, jnp.uint32):
            a = jax.lax.bitcast_convert_type(a, jnp.float32)
        elif a.dtype == jnp.bool_:
            a = a.astype(jnp.float32)
        else:
            a = a.astype(jnp.float32)
        if a.ndim == 1:
            a = a[:, None]
        cols.append(a)
    return jnp.concatenate(cols, axis=-1)


def _mat_overrides(mat):
    """(names, widths) of modified per-lane fields present in mat."""
    return [(k, w) for k, w in _OVERRIDE_FIELDS if k in mat]


def _dispatch(scene, mat, lane_arrs, used, run_family, n_out):
    """Shared machinery: pack-sort lanes by material type, scan chunks
    with a per-family switch, unsort.  run_family(sub_used) ->
    fn(mat_chunk_dict, *lane_chunk_arrays) -> [CHUNK, n_out] packed.
    lane_arrs: list of ([N] or [N,k]) arrays handed to run_family in
    order.  Returns the [N, n_out] packed outputs in lane order."""
    mtype = mat["type"]
    n = mtype.shape[0]
    CHUNK = _chunk_for(n)
    fams = sorted(int(t) for t in used)
    over = _mat_overrides(mat)

    packed = _pack([mtype, mat["mtl_id"]]
                   + [mat[k] for k, _ in over] + list(lane_arrs))
    perm = jnp.argsort(mtype)
    inv = jnp.argsort(perm)
    sp = jnp.take(packed, perm, axis=0)

    ms = jax.lax.bitcast_convert_type(sp[:, 0], jnp.int32).reshape(-1, CHUNK)
    fmin = ms.min(axis=1)
    fmax = ms.max(axis=1)
    bidx = jnp.full(fmin.shape, len(fams), jnp.int32)
    for i, fam in enumerate(fams):
        bidx = jnp.where((fmin == fam) & (fmax == fam), i, bidx)

    table = scene["materials"]

    def mk_branch(sub):
        fn = run_family(sub)

        def branch(chunk):
            from aten_tpu.scene.materials import gather_material

            mtl = jax.lax.bitcast_convert_type(chunk[:, 1], jnp.int32)
            m = dict(gather_material(table, mtl))
            # col 0 carries the (possibly modified, e.g. voxel-forced)
            # per-lane type — it overrides the table row's
            m["type"] = jax.lax.bitcast_convert_type(chunk[:, 0], jnp.int32)
            c = 2
            for k, w in over:
                v = chunk[:, c:c + w]
                m[k] = v if w > 1 else v[:, 0]
                c += w
            args = []
            for a in lane_arrs:
                w = 1 if a.ndim == 1 else a.shape[1]
                v = chunk[:, c:c + w]
                args.append(v if a.ndim > 1 else v[:, 0])
                c += w
            return fn(m, *args)

        return branch

    branches = [mk_branch(frozenset({f})) for f in fams] + [
        mk_branch(frozenset(int(t) for t in used))
    ]
    chunked = sp.reshape(-1, CHUNK, sp.shape[-1])

    def body(_, xs):
        bi, ops = xs
        return None, jax.lax.switch(bi, branches, ops)

    _, outs = jax.lax.scan(body, None, (bidx, chunked))
    return jnp.take(outs.reshape(n, n_out), inv, axis=0)


def sample_brdf(scene, mat, ns, wo, u1, u2, u3, used=None):
    """Partitioned drop-in for brdf.sample_brdf."""
    from aten_tpu.shading import brdf as brdf_mod

    if not worth_partitioning(used, ns.shape[0]) or "mtl_id" not in mat:
        return brdf_mod.sample_brdf(mat, ns, wo, u1, u2, u3, used=used)

    def run_family(sub):
        def fn(m, ns, wo, u1, u2, u3):
            s = brdf_mod.sample_brdf(m, ns, wo, u1, u2, u3, used=sub)
            return _pack([s["wi"], s["pdf"], s["bsdf"],
                          s["singular"], s["transmission"]])
        return fn

    out = _dispatch(scene, mat, [ns, wo, u1, u2, u3], used, run_family, 9)
    return {
        "wi": out[:, 0:3],
        "pdf": out[:, 3],
        "bsdf": out[:, 4:7],
        "singular": out[:, 7] > 0.5,
        "transmission": out[:, 8] > 0.5,
    }


def eval_bsdf_pdf(scene, mat, ns, wo, wi, used=None):
    """Partitioned drop-in for brdf.eval_bsdf_pdf (NEE's fused f+pdf)."""
    from aten_tpu.shading import brdf as brdf_mod

    if not worth_partitioning(used, ns.shape[0]) or "mtl_id" not in mat:
        return brdf_mod.eval_bsdf_pdf(mat, ns, wo, wi, used=used)

    def run_family(sub):
        def fn(m, ns, wo, wi):
            f, p = brdf_mod.eval_bsdf_pdf(m, ns, wo, wi, used=sub)
            return _pack([f, p])
        return fn

    out = _dispatch(scene, mat, [ns, wo, wi], used, run_family, 4)
    return out[:, 0:3], out[:, 3]
