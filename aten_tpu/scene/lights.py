"""Light parameter model + batched light sampling.

Counterpart of src/libaten/light/: `LightType` (light_parameter.h:37),
POD `LightParameter` (:47-85), `LightSampleResult` (:19-27) and the
static dispatch `Light::sample` (light_impl.h:13-45).  Area lights
reference scene geometry (a sphere or a triangle range) and sample a
point uniformly by area, converting radiant flux to radiance exactly
like arealight.h:38-60.  IBL importance sampling uses the 2D
luminance CDF scheme of ibl.cpp:10-118.

All sampling is batched: one lane per shading point, type dispatch by
masked select.
"""
from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

from aten_tpu.core import vecmath as vm


class LightType(enum.IntEnum):
    AREA = 0
    IBL = 1
    DIRECTIONAL = 2
    POINT = 3
    SPOT = 4


class LightTable:
    def __init__(self):
        self.rows = []

    def add(
        self,
        ltype: LightType,
        le=(1.0, 1.0, 1.0),
        pos=(0.0, 0.0, 0.0),
        dir=(0.0, -1.0, 0.0),
        inner_angle=0.5,
        outer_angle=0.6,
        obj_kind=-1,  # 0 = triangle range, 1 = sphere, -1 = none
        tri_start=0,
        tri_count=0,
        sphere_id=-1,
        area=1.0,
    ) -> int:
        d = np.asarray(dir, np.float32)
        d = d / max(np.linalg.norm(d), 1e-20)
        self.rows.append(
            dict(
                type=int(ltype),
                le=tuple(float(c) for c in le),
                pos=tuple(float(c) for c in pos),
                dir=tuple(float(c) for c in d),
                inner_angle=float(inner_angle),
                outer_angle=float(outer_angle),
                obj_kind=int(obj_kind),
                tri_start=int(tri_start),
                tri_count=int(tri_count),
                sphere_id=int(sphere_id),
                area=float(area),
            )
        )
        return len(self.rows) - 1

    def arrays(self, tri_areas: np.ndarray):
        """Build SoA arrays; per-area-light triangle CDFs are padded to the
        widest emitter so sampling is a fixed-shape searchsorted."""
        rows = self.rows
        n = len(rows)
        if n == 0:
            # One dummy row so gathers stay well-formed; num_lights=0 masks it.
            dummy = LightTable()
            dummy.add(LightType.POINT, le=(0.0, 0.0, 0.0))
            rows = dummy.rows
        max_tris = max([r["tri_count"] for r in rows] + [1])
        cdf = np.ones((len(rows), max_tris), np.float32)
        for i, r in enumerate(rows):
            if r["obj_kind"] == 0 and r["tri_count"] > 0:
                a = tri_areas[r["tri_start"] : r["tri_start"] + r["tri_count"]]
                c = np.cumsum(a) / max(a.sum(), 1e-20)
                cdf[i, : r["tri_count"]] = c
                cdf[i, r["tri_count"] :] = 1.0
        out = {
            "type": jnp.asarray([r["type"] for r in rows], jnp.int32),
            "le": jnp.asarray([r["le"] for r in rows], jnp.float32),
            "pos": jnp.asarray([r["pos"] for r in rows], jnp.float32),
            "dir": jnp.asarray([r["dir"] for r in rows], jnp.float32),
            "inner_angle": jnp.asarray([r["inner_angle"] for r in rows], jnp.float32),
            "outer_angle": jnp.asarray([r["outer_angle"] for r in rows], jnp.float32),
            "obj_kind": jnp.asarray([r["obj_kind"] for r in rows], jnp.int32),
            "tri_start": jnp.asarray([r["tri_start"] for r in rows], jnp.int32),
            "tri_count": jnp.asarray([r["tri_count"] for r in rows], jnp.int32),
            "sphere_id": jnp.asarray([r["sphere_id"] for r in rows], jnp.int32),
            "area": jnp.asarray([r["area"] for r in rows], jnp.float32),
            "tri_cdf": jnp.asarray(cdf),
            "num": jnp.int32(n),
        }
        return out


def _sample_area_light(scene, lrow, p, u1, uv):
    """Uniform point on the emitter's surface; pdf in AREA measure.

    Triangle-range emitters pick a triangle from the per-light area CDF
    then a uniform barycentric point (sqrt warp); sphere emitters pick a
    uniform point on the sphere.
    """
    from aten_tpu.ops.gather import take_fields, take_rows

    lights = scene["lights"]
    # --- triangle-range branch
    li = lrow["_index"]
    cdf_rows = take_rows(lights["tri_cdf"], li)  # [N, MT]
    k = jnp.sum((u1[..., None] > cdf_rows).astype(jnp.int32), axis=-1)
    k = jnp.clip(k, 0, jnp.maximum(lrow["tri_count"] - 1, 0))
    tidx = lrow["tri_start"] + k
    tidx_c = jnp.clip(tidx, 0, scene["tri_v0"].shape[0] - 1)
    tg = take_fields(
        {"v0": scene["tri_v0"], "e1": scene["tri_e1"],
         "e2": scene["tri_e2"]}, tidx_c)
    v0, e1, e2 = tg["v0"], tg["e1"], tg["e2"]
    su = jnp.sqrt(jnp.clip(uv[0], 1e-8, 1.0))
    b1 = (1.0 - su)[..., None]
    b2 = (uv[1] * su)[..., None]
    tri_pos = v0 + b1 * e1 + b2 * e2
    tri_nml = vm.normalize(vm.cross(e1, e2))
    # --- sphere branch
    sid = jnp.clip(lrow["sphere_id"], 0, scene["sph_center"].shape[0] - 1)
    sg = take_fields(
        {"c": scene["sph_center"], "r": scene["sph_radius"]}, sid)
    c = sg["c"]
    r = sg["r"][..., None]
    z = 1.0 - 2.0 * uv[0]
    s = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    phi = 2.0 * np.pi * uv[1]
    sph_nml = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
    sph_pos = c + r * sph_nml

    is_tri = (lrow["obj_kind"] == 0)[..., None]
    pos = jnp.where(is_tri, tri_pos, sph_pos)
    nml = jnp.where(is_tri, tri_nml, sph_nml)
    to_l = pos - p
    dist = vm.length(to_l, keepdims=False)
    wi = to_l / jnp.maximum(dist[..., None], 1e-20)
    pdf_area = 1.0 / jnp.maximum(lrow["area"], 1e-20)
    return {
        "pos": pos,
        "nml": nml,
        "dir": wi,
        "dist": dist,
        "le": lrow["le"],
        "pdf": pdf_area,  # area measure
        "singular": jnp.zeros_like(dist, bool),
        "infinite": jnp.zeros_like(dist, bool),
        "area_measure": jnp.ones_like(dist, bool),
    }


def _sample_point_light(lrow, p):
    to_l = lrow["pos"] - p
    dist = vm.length(to_l, keepdims=False)
    wi = to_l / jnp.maximum(dist[..., None], 1e-20)
    # Inverse-square falloff folded into le (reference pointlight.h).
    le = lrow["le"] / jnp.maximum(dist * dist, 1e-8)[..., None]
    return {
        "pos": lrow["pos"],
        "nml": -wi,
        "dir": wi,
        "dist": dist,
        "le": le,
        "pdf": jnp.ones_like(dist),
        "singular": jnp.ones_like(dist, bool),
        "infinite": jnp.zeros_like(dist, bool),
        "area_measure": jnp.zeros_like(dist, bool),
    }


def _sample_spot_light(lrow, p):
    base = _sample_point_light(lrow, p)
    cos_dir = vm.dot(-base["dir"], lrow["dir"], keepdims=False)
    cos_in = jnp.cos(lrow["inner_angle"])
    cos_out = jnp.cos(lrow["outer_angle"])
    t = jnp.clip((cos_dir - cos_out) / jnp.maximum(cos_in - cos_out, 1e-6), 0.0, 1.0)
    falloff = t * t * (3.0 - 2.0 * t)
    base = dict(base, le=base["le"] * falloff[..., None])
    return base


def _sample_directional_light(lrow, p):
    wi = -lrow["dir"]
    big = jnp.full(p.shape[:-1], 1e30, jnp.float32)
    return {
        "pos": p + wi * 1e30,
        "nml": lrow["dir"],
        "dir": wi,
        "dist": big,
        "le": lrow["le"],
        "pdf": jnp.ones(p.shape[:-1], jnp.float32),
        "singular": jnp.ones(p.shape[:-1], bool),
        "infinite": jnp.ones(p.shape[:-1], bool),
        "area_measure": jnp.zeros(p.shape[:-1], bool),
    }


def sample_light(scene, light_idx, p, u1, uv):
    """Dispatch over light type (masked select). light_idx: int32 [N]."""
    lights = scene["lights"]
    li = jnp.clip(light_idx, 0, lights["type"].shape[0] - 1)
    from aten_tpu.ops.gather import take_fields

    fields = {k: v for k, v in lights.items() if k not in ("tri_cdf", "num")}
    lrow = take_fields(
        fields, li,
        int_fields=tuple(k for k, v in fields.items() if v.dtype == jnp.int32),
    )
    lrow["_index"] = li
    ltype = lrow["type"]

    res_area = _sample_area_light(scene, lrow, p, u1, uv)
    res_point = _sample_point_light(lrow, p)
    res_spot = _sample_spot_light(lrow, p)
    res_dir = _sample_directional_light(lrow, p)
    if scene.get("envmap") is not None:
        from aten_tpu.scene.envmap import sample_ibl

        res_ibl = sample_ibl(scene, p, uv)
    else:
        res_ibl = res_dir

    def sel(key):
        vals = [res_area[key], res_ibl[key], res_dir[key], res_point[key], res_spot[key]]
        out = vals[0]
        for t, v in enumerate(vals[1:], start=1):
            m = ltype == t
            if out.ndim > m.ndim:
                m = m[..., None]
            out = jnp.where(m, v, out)
        return out

    return {k: sel(k) for k in res_area}
