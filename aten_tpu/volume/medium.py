"""Participating media: HG phase, homogeneous + heterogeneous sampling.

Counterpart of src/libaten/volume/: the Henyey-Greenstein phase
function (phase_function.h:12-66), homogeneous analytic distance
sampling with absorption/scatter events (medium.h:25-118), and
delta/ratio tracking against a density grid with a grid-max majorant
(medium.cpp:10-150).  The NanoVDB grid becomes a dense [D,H,W] density
array with a world-space bbox (grid ingestion tooling lives in
aten_tpu.volume.grids); tracking loops are bounded fori loops with
masked lanes.

Media attach to materials (MaterialParameter.medium role): crossing a
transmissive surface whose material carries a medium id switches the
path's current-medium register (UpdateMedium,
volume_pathtracing_impl.h:24-48).  A REFRACTION material with ior=1 is
the conventional null boundary.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aten_tpu.core import vecmath as vm

PI = np.float32(np.pi)
MAX_TRACKING_STEPS = 64
BRICK = 4  # voxels per brick edge (brick-majorant empty-space skipping)


class MediumTable:
    def __init__(self):
        self.rows = []
        self.grids = []

    def add(self, sigma_a=(0.1, 0.1, 0.1), sigma_s=(0.5, 0.5, 0.5), g=0.0,
            le=(0.0, 0.0, 0.0), grid=None, grid_bmin=None, grid_bmax=None) -> int:
        """grid: optional [D,H,W] density array (heterogeneous); the grid's
        world bbox is [grid_bmin, grid_bmax]."""
        gid = -1
        if grid is not None:
            gid = len(self.grids)
            self.grids.append(
                (np.asarray(grid, np.float32),
                 np.asarray(grid_bmin, np.float32),
                 np.asarray(grid_bmax, np.float32))
            )
        self.rows.append(
            dict(sigma_a=tuple(map(float, sigma_a)),
                 sigma_s=tuple(map(float, sigma_s)),
                 g=float(g), le=tuple(map(float, le)), grid=gid)
        )
        return len(self.rows) - 1

    def arrays(self):
        rows = self.rows or [dict(sigma_a=(0, 0, 0), sigma_s=(0, 0, 0), g=0.0,
                                  le=(0, 0, 0), grid=-1)]
        out = {
            "med_sigma_a": jnp.asarray([r["sigma_a"] for r in rows], jnp.float32),
            "med_sigma_s": jnp.asarray([r["sigma_s"] for r in rows], jnp.float32),
            "med_g": jnp.asarray([r["g"] for r in rows], jnp.float32),
            "med_le": jnp.asarray([r["le"] for r in rows], jnp.float32),
            "med_grid": jnp.asarray([r["grid"] for r in rows], jnp.int32),
        }
        if self.grids:
            d = max(g[0].shape[0] for g in self.grids)
            h = max(g[0].shape[1] for g in self.grids)
            w = max(g[0].shape[2] for g in self.grids)
            stack = np.zeros((len(self.grids), d, h, w), np.float32)
            bmin = np.zeros((len(self.grids), 3), np.float32)
            bmax = np.ones((len(self.grids), 3), np.float32)
            dim = np.zeros((len(self.grids), 3), np.int32)
            for i, (g, lo, hi) in enumerate(self.grids):
                stack[i, : g.shape[0], : g.shape[1], : g.shape[2]] = g
                bmin[i], bmax[i] = lo, hi
                dim[i] = g.shape
            out["grid_density"] = jnp.asarray(stack)
            # Pre-staged 2x2x2 corner rows: one 8-wide gather fetches a
            # whole trilinear cube.  The 8 separate corner gathers were
            # ~2.1 s of the 3.2 s hetero-volume frame (xplane: 8 x
            # ~0.79 ms per 65k-lane fetch x 319 tracking steps); gather
            # cost is index-count-bound, row width is free.  8x grid
            # memory (48^3 f32 -> 3.5 MB) — negligible.
            cor = np.empty((len(self.grids), d, h, w, 8), np.float32)
            k = 0
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        zi = np.minimum(np.arange(d) + dz, d - 1)
                        yi = np.minimum(np.arange(h) + dy, h - 1)
                        xi = np.minimum(np.arange(w) + dx, w - 1)
                        cor[..., k] = stack[:, zi][:, :, yi][:, :, :, xi]
                        k += 1
            out["grid_corners"] = jnp.asarray(cor.reshape(-1, 8))
            out["grid_bmin"] = jnp.asarray(bmin)
            out["grid_bmax"] = jnp.asarray(bmax)
            out["grid_dim"] = jnp.asarray(dim)
            out["grid_majorant"] = jnp.asarray(
                np.asarray([g[0].max() for g in self.grids], np.float32)
            )
            # Brick-level majorants (BRICK³-voxel blocks, dilated by one
            # voxel so trilinear taps near a brick face are covered): the
            # tracking loops skip a whole empty brick in ONE deterministic
            # step instead of Exp(sigma_bar)-sized blind steps — the
            # delta-tracking estimator is unchanged (a zero-majorant brick
            # can only produce null collisions; the exponential free path
            # is memoryless).  Counterpart of NanoVDB's node-level
            # "active mask" empty-space skipping (the reference's
            # EvalMajorant, medium.cpp:10-25, uses the root-level majorant
            # only; per-brick is strictly tighter).
            nb = -(-np.asarray([d, h, w]) // BRICK)
            bricks = np.zeros((len(self.grids), nb[0], nb[1], nb[2]),
                              np.float32)
            for i, (g, lo_, hi_) in enumerate(self.grids):
                gd = np.zeros((d, h, w), np.float32)
                gd[: g.shape[0], : g.shape[1], : g.shape[2]] = g
                # 3x3x3 max (1-voxel dilation), pure numpy shifted slices
                gp = np.pad(gd, 1)
                dil = gd.copy()
                for dz in range(3):
                    for dy in range(3):
                        for dx in range(3):
                            np.maximum(
                                dil,
                                gp[dz:dz + d, dy:dy + h, dx:dx + w],
                                out=dil,
                            )
                pad = nb * BRICK - np.asarray([d, h, w])
                dilp = np.pad(dil, [(0, pad[0]), (0, pad[1]), (0, pad[2])])
                bricks[i] = dilp.reshape(
                    nb[0], BRICK, nb[1], BRICK, nb[2], BRICK
                ).max(axis=(1, 3, 5))
            out["grid_brickmax"] = jnp.asarray(bricks)
        return out


# ---------------------------------------------------------------------------
# Henyey-Greenstein phase function (phase_function.h:12-66)
# ---------------------------------------------------------------------------


def hg_phase(g, cos_t):
    denom = 1.0 + g * g + 2.0 * g * cos_t
    return (1.0 - g * g) / jnp.maximum(4.0 * PI * denom * jnp.sqrt(jnp.maximum(denom, 1e-8)), 1e-8)


def hg_sample(g, wo, u1, u2):
    """Sample direction about -wo's travel dir. wo = direction TO previous
    vertex; the new direction continues the path. Returns (wi, pdf)."""
    d = -wo  # propagation direction
    g = jnp.clip(g, -0.999, 0.999)
    safe = jnp.abs(g) > 1e-3
    denom1 = 1.0 - g + 2.0 * g * u1
    sq = (1.0 - g * g) / jnp.where(jnp.abs(denom1) > 1e-6, denom1, 1e-6)
    denom2 = 2.0 * g
    cos_t_g = (1.0 + g * g - sq * sq) / jnp.where(
        jnp.abs(denom2) > 1e-6, denom2, 1e-6
    )
    cos_t = jnp.where(safe, cos_t_g, 1.0 - 2.0 * u1)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * PI * u2
    local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    wi = vm.normalize(vm.to_world(local, d))
    pdf = hg_phase(g, cos_t)
    return wi, pdf


# ---------------------------------------------------------------------------
# Grid sampling (heterogeneous density)
# ---------------------------------------------------------------------------


def sample_grid_density(scene, gid, p):
    """Trilinear density lookup at world point p for grid gid (per lane)."""
    if "grid_density" not in scene:
        return jnp.zeros(p.shape[:-1], jnp.float32)
    g = jnp.clip(gid, 0, scene["grid_density"].shape[0] - 1)
    lo = jnp.take(scene["grid_bmin"], g, axis=0)
    hi = jnp.take(scene["grid_bmax"], g, axis=0)
    dim = jnp.take(scene["grid_dim"], g, axis=0).astype(jnp.float32)
    uvw = (p - lo) / jnp.maximum(hi - lo, 1e-8)
    inside = jnp.all((uvw >= 0.0) & (uvw <= 1.0), axis=-1)
    ijk = uvw * (dim - 1.0)
    i0 = jnp.floor(ijk).astype(jnp.int32)
    f = ijk - i0.astype(jnp.float32)
    D = scene["grid_density"]
    dmax = jnp.asarray(D.shape[1:], jnp.int32) - 1

    if "grid_corners" in scene:
        # one 8-wide row gather per sample instead of 8 corner gathers
        # (see arrays()); inside lanes have i0 in [0, dim-1] so the
        # clipped base + pre-staged +1 shifts reproduce the per-corner
        # clip exactly (outside lanes are masked to 0 below).
        Dd, Hh, Ww = D.shape[1], D.shape[2], D.shape[3]
        base = jnp.clip(i0, 0, dmax)
        flat_idx = ((g * Dd + base[..., 0]) * Hh
                    + base[..., 1]) * Ww + base[..., 2]
        rows = jnp.take(scene["grid_corners"], flat_idx, axis=0)

        def fetch(off):
            return rows[..., off[0] * 4 + off[1] * 2 + off[2]]
    else:
        def fetch(off):
            idx = jnp.clip(i0 + jnp.asarray(off, jnp.int32), 0, dmax)
            return D[g, idx[..., 0], idx[..., 1], idx[..., 2]]

    fz, fy, fx = f[..., 0], f[..., 1], f[..., 2]
    c = (
        fetch((0, 0, 0)) * (1 - fz) * (1 - fy) * (1 - fx)
        + fetch((0, 0, 1)) * (1 - fz) * (1 - fy) * fx
        + fetch((0, 1, 0)) * (1 - fz) * fy * (1 - fx)
        + fetch((0, 1, 1)) * (1 - fz) * fy * fx
        + fetch((1, 0, 0)) * fz * (1 - fy) * (1 - fx)
        + fetch((1, 0, 1)) * fz * (1 - fy) * fx
        + fetch((1, 1, 0)) * fz * fy * (1 - fx)
        + fetch((1, 1, 1)) * fz * fy * fx
    )
    return jnp.where(inside, c, 0.0)


def _medium_row(scene, mid):
    m = jnp.clip(mid, 0, scene["med_sigma_a"].shape[0] - 1)
    return {
        "sigma_a": jnp.take(scene["med_sigma_a"], m, axis=0),
        "sigma_s": jnp.take(scene["med_sigma_s"], m, axis=0),
        "g": jnp.take(scene["med_g"], m),
        "le": jnp.take(scene["med_le"], m, axis=0),
        "grid": jnp.take(scene["med_grid"], m),
    }


def sample_medium_distance(scene, mid, ro, rd, t_surf, u_dist, u_chan, seed):
    """Sample a scattering distance inside medium `mid` along [0, t_surf].

    Homogeneous: analytic exponential sampling on a hero wavelength
    channel (medium.h:25-118).  Heterogeneous: delta tracking against
    the grid majorant (medium.cpp:58-150) with a bounded step loop.

    Returns dict {t, scattered(bool), weight[ N,3 ]} where weight is the
    throughput factor for either outcome.
    """
    med = _medium_row(scene, mid)
    sigma_t = med["sigma_a"] + med["sigma_s"]
    in_medium = mid >= 0

    # hero-channel homogeneous sampling
    ch = jnp.minimum((u_chan * 3).astype(jnp.int32), 2)
    s_t_hero = jnp.take_along_axis(sigma_t, ch[..., None], axis=-1)[..., 0]
    s_t_hero = jnp.maximum(s_t_hero, 1e-6)
    t_hom = -jnp.log(jnp.clip(1.0 - u_dist, 1e-7, 1.0)) / s_t_hero
    scat_hom = t_hom < t_surf
    # single-channel MIS weights over the 3 channels (spectral balance)
    tr_t = jnp.exp(-sigma_t * jnp.minimum(t_hom, t_surf)[..., None])
    pdf_scat = jnp.mean(sigma_t * tr_t, axis=-1)
    pdf_pass = jnp.mean(tr_t, axis=-1)
    w_scat = med["sigma_s"] * tr_t / jnp.maximum(pdf_scat, 1e-10)[..., None]
    w_pass = tr_t / jnp.maximum(pdf_pass, 1e-10)[..., None]

    is_hetero = med["grid"] >= 0
    if "grid_density" in scene:
        t_het, scat_het = _delta_track(
            scene, med, ro, rd, t_surf, seed, active=in_medium & is_hetero
        )
        # null-collision estimator: weight sigma_s/sigma_t at real events
        albedo = med["sigma_s"] / jnp.maximum(sigma_t, 1e-8)
        t = jnp.where(is_hetero, t_het, t_hom)
        scattered = jnp.where(is_hetero, scat_het, scat_hom) & in_medium
        w_scat = jnp.where(is_hetero[..., None], albedo, w_scat)
        w_pass = jnp.where(is_hetero[..., None], jnp.ones_like(w_pass), w_pass)
    else:
        t = t_hom
        scattered = scat_hom & in_medium

    weight = jnp.where(scattered[..., None], w_scat, w_pass)
    weight = jnp.where(in_medium[..., None], weight, 1.0)
    return {"t": jnp.where(scattered, t, t_surf), "scattered": scattered,
            "weight": weight, "g": med["g"], "le": med["le"],
            "sigma_a": med["sigma_a"]}


def _brick_step(scene, gid, p, rd, t):
    """(brick majorant at p, absolute t at the brick's exit along rd).

    The brick grid (MediumTable.arrays grid_brickmax) is a BRICK³-voxel
    block-max dilated by one voxel, so mb == 0 certifies every trilinear
    tap inside the brick is zero → the segment to the brick exit can be
    crossed in one deterministic step with no collision test."""
    g = jnp.clip(gid, 0, scene["grid_brickmax"].shape[0] - 1)
    lo = jnp.take(scene["grid_bmin"], g, axis=0)
    hi = jnp.take(scene["grid_bmax"], g, axis=0)
    dim = jnp.take(scene["grid_dim"], g, axis=0).astype(jnp.float32)
    BM = scene["grid_brickmax"]
    nb = jnp.asarray(BM.shape[1:], jnp.int32) - 1
    ijk = (p - lo) / jnp.maximum(hi - lo, 1e-8) * (dim - 1.0)
    fb = jnp.floor(ijk / BRICK)
    bidx = jnp.clip(fb.astype(jnp.int32), 0, nb)
    mb = BM[g, bidx[..., 0], bidx[..., 1], bidx[..., 2]]
    step_w = (hi - lo) / jnp.maximum(dim - 1.0, 1.0)  # world units / voxel
    bound_w = lo + (fb + (rd > 0)) * BRICK * step_w
    tex = jnp.where(jnp.abs(rd) > 1e-12, (bound_w - p) / rd, jnp.float32(3e38))
    t_rel = jnp.min(tex, axis=-1)
    eps = 0.05 * jnp.min(step_w, axis=-1)
    return mb, t + jnp.maximum(t_rel, 0.0) + eps


def _delta_track(scene, med, ro, rd, t_surf, seed, active=None):
    """Delta (Woodcock) tracking: returns (t, scattered).

    `active` masks lanes that need tracking at all; inactive lanes are
    seeded done so the early-exit while_loop costs nothing once every
    live lane has resolved (VERDICT r3 #4: the old fixed 64-step
    fori_loop ran all 64 steps for every lane every call)."""
    gid = med["grid"]
    g = jnp.clip(gid, 0, scene["grid_majorant"].shape[0] - 1)
    maj = jnp.maximum(jnp.take(scene["grid_majorant"], g), 1e-6)
    sigma_t_bar = maj * jnp.maximum(
        jnp.max(med["sigma_a"] + med["sigma_s"], axis=-1), 1e-6
    )
    has_bricks = "grid_brickmax" in scene
    need = t_surf > 0.0
    if active is not None:
        need = need & active

    def cond(st):
        i, t, done, scat, key = st
        return (i < MAX_TRACKING_STEPS) & jnp.any(~done)

    def body(st):
        i, t, done, scat, key = st
        key = key * jnp.uint32(747796405) + jnp.uint32(2891336453)
        u1 = (key >> 9).astype(jnp.float32) / jnp.float32(1 << 23)
        key2 = key * jnp.uint32(747796405) + jnp.uint32(2891336453)
        u2 = (key2 >> 9).astype(jnp.float32) / jnp.float32(1 << 23)
        step = -jnp.log(jnp.clip(1.0 - u1, 1e-7, 1.0)) / sigma_t_bar
        if has_bricks:
            p_cur = ro + t[..., None] * rd
            mb, t_exit = _brick_step(scene, gid, p_cur, rd, t)
            skip = mb <= 0.0
            t_new = jnp.where(skip, t_exit, t + step)
        else:
            skip = jnp.zeros_like(done)
            t_new = t + step
        p = ro + t_new[..., None] * rd
        dens = sample_grid_density(scene, gid, p)
        real = ~skip & (u2 < (dens / maj))
        escaped = t_new >= t_surf
        newly_done = ~done & (real | escaped)
        scat = jnp.where(newly_done, real & ~escaped, scat)
        t = jnp.where(done, t, t_new)
        done = done | newly_done
        return (i + 1, t, done, scat, key2)

    n = ro.shape[0]
    key0 = seed * jnp.uint32(0x9E3779B9) + jnp.uint32(1)
    t0 = jnp.zeros((n,), jnp.float32)
    scat0 = jnp.zeros((n,), bool)
    _, t, done, scat, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, ~need, scat0, key0)
    )
    return jnp.minimum(t, t_surf), scat & done & need


def transmittance(scene, mid, ro, rd, dist, seed, active=None):
    """Transmittance along a shadow segment inside medium `mid`
    (TraverseRayInMedium role for a single segment).  Homogeneous:
    analytic Beer-Lambert; heterogeneous: ratio tracking.  `active`
    gates the ratio-tracking loop (lanes outside it return 1)."""
    med = _medium_row(scene, mid)
    sigma_t = med["sigma_a"] + med["sigma_s"]
    in_medium = mid >= 0
    tr_hom = jnp.exp(-sigma_t * dist[..., None])
    if "grid_density" in scene:
        is_het = med["grid"] >= 0
        act = in_medium & is_het
        if active is not None:
            act = act & active
        tr_het = _ratio_track(scene, med, ro, rd, dist, seed, active=act)
        tr = jnp.where(is_het[..., None], tr_het, tr_hom)
    else:
        tr = tr_hom
    return jnp.where(in_medium[..., None], tr, 1.0)


def _ratio_track(scene, med, ro, rd, dist, seed, active=None):
    """Ratio tracking with brick empty-space skipping + early exit
    (same structure as _delta_track)."""
    gid = med["grid"]
    g = jnp.clip(gid, 0, scene["grid_majorant"].shape[0] - 1)
    maj = jnp.maximum(jnp.take(scene["grid_majorant"], g), 1e-6)
    s_scalar = jnp.maximum(jnp.max(med["sigma_a"] + med["sigma_s"], axis=-1), 1e-6)
    sigma_bar = maj * s_scalar
    has_bricks = "grid_brickmax" in scene
    need = dist > 0.0
    if active is not None:
        need = need & active

    def cond(st):
        i, t, tr, done, key = st
        return (i < MAX_TRACKING_STEPS) & jnp.any(~done)

    def body(st):
        i, t, tr, done, key = st
        key = key * jnp.uint32(747796405) + jnp.uint32(2891336453)
        u1 = (key >> 9).astype(jnp.float32) / jnp.float32(1 << 23)
        step = -jnp.log(jnp.clip(1.0 - u1, 1e-7, 1.0)) / sigma_bar
        if has_bricks:
            p_cur = ro + t[..., None] * rd
            mb, t_exit = _brick_step(scene, gid, p_cur, rd, t)
            skip = mb <= 0.0
            t_new = jnp.where(skip, t_exit, t + step)
        else:
            skip = jnp.zeros_like(done)
            t_new = t + step
        alivem = ~done & (t_new < dist)
        p = ro + t_new[..., None] * rd
        dens = sample_grid_density(scene, gid, p)
        tr = jnp.where(alivem & ~skip, tr * (1.0 - dens / maj), tr)
        t = jnp.where(alivem, t_new, t)
        done = done | ~alivem
        return (i + 1, t, tr, done, key)

    n = ro.shape[0]
    key0 = seed * jnp.uint32(0x85157AF5) + jnp.uint32(7)
    _, t, tr, done, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.zeros((n,), jnp.float32),
         jnp.ones((n,), jnp.float32), ~need, key0),
    )
    return tr[..., None] * jnp.ones((1, 3), jnp.float32)
