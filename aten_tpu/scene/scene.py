"""Scene registry and the flat device-array scene representation.

Counterpart of `aten::context` (src/libaten/scene/host_scene_context.h:38-683),
the reference's central asset registry of id-linked vertices, triangles,
materials, textures, matrices and lights.  That design is already
array-indexed; here it becomes literally that: `SceneBuilder` is the
mutable host-side registry, `SceneBuilder.build()` freezes everything
into `SceneData` — a dict pytree of flat jnp arrays (vertices,
pre-expanded triangle data, spheres, material/light SoA tables, threaded
BVH node arrays, envmap CDFs) that is donated to device once per scene,
mirroring idaten's one-shot `UpdateSceneData` upload
(src/libidaten/kernel/renderer.h:103).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from aten_tpu.accel.build import build_bvh
from aten_tpu.scene.envmap import build_env_tables
from aten_tpu.scene.lights import LightTable, LightType
from aten_tpu.scene.materials import MaterialTable, MaterialType

import jax


@jax.tree_util.register_pytree_node_class
class SceneData:
    """Frozen scene: dict-like access over device arrays + static metadata.

    Array fields (vertices, BVH nodes, material/light tables, ...) are
    pytree leaves and trace through jit; static fields (num_tris,
    num_lights, ...) are Python ints baked into the compiled program —
    the analogue of the reference baking scene shape into its kernels at
    UpdateSceneData time.
    """

    def __init__(self, arrays: dict, static: dict):
        self._arrays = arrays
        self._static = static

    def __getitem__(self, k):
        if k in self._arrays:
            return self._arrays[k]
        return self._static[k]

    def get(self, k, default=None):
        if k in self._arrays:
            return self._arrays[k]
        return self._static.get(k, default)

    def __contains__(self, k):
        return k in self._arrays or k in self._static

    def replace(self, **kw):
        """Functional update of array fields (e.g. swapping materials for
        gradient-based optimization)."""
        arrays = dict(self._arrays)
        static = dict(self._static)
        for k, v in kw.items():
            if k in static:
                static[k] = v
            else:
                arrays[k] = v
        return SceneData(arrays, static)

    def drop(self, *keys):
        """Functional removal of array fields (e.g. a stale Pallas layout
        after an on-device BVH rebuild)."""
        arrays = {k: v for k, v in self._arrays.items() if k not in keys}
        return SceneData(arrays, dict(self._static))

    @property
    def arrays(self):
        return self._arrays

    @property
    def static(self):
        return self._static

    def tree_flatten(self):
        keys = tuple(sorted(self._arrays))
        children = tuple(self._arrays[k] for k in keys)
        return children, (keys, tuple(sorted(self._static.items())))

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, static = aux
        return cls(dict(zip(keys, children)), dict(static))


class SceneBuilder:
    def __init__(self):
        from aten_tpu.scene.textures import TextureTable
        from aten_tpu.volume.medium import MediumTable

        self.materials = MaterialTable()
        self.lights = LightTable()
        self.textures = TextureTable()
        self.media = MediumTable()
        self._vpos = []
        self._vnml = []
        self._vuv = []
        self._faces = []  # (i0, i1, i2, mtl_id)
        self._spheres = []  # (cx, cy, cz, r, mtl_id)
        self._tri_light = []  # per-face light id (-1)
        self._sph_light = []
        self._face_obj = []  # per-face object id (-1 = world)
        self._sph_obj = []
        self._face_mesh = []  # per-face mesh id (one per add_mesh call)
        self._mesh_counter = 0
        self._num_objects = 0
        self._instances = []  # (obj_id, l2w 4x4)
        self._envmap = None
        self._bg = (0.0, 0.0, 0.0)

    # -- materials / textures ---------------------------------------------
    def add_material(self, mtype: MaterialType, **kw) -> int:
        return self.materials.add(mtype, **kw)

    def add_texture(self, img) -> int:
        return self.textures.add(img)

    def add_medium(self, **kw) -> int:
        """Register a participating medium (MediumTable.add); attach to a
        transmissive material via add_material(..., medium=id)."""
        return self.media.add(**kw)

    # -- objects / instances (two-level TLAS/BLAS) -------------------------
    def create_object(self) -> int:
        """New instanceable object; pass as obj= to geometry adds, whose
        coordinates are then OBJECT-LOCAL (counterpart of PolygonObject +
        instance<T>, src/libaten/geometry/instance.h)."""
        self._num_objects += 1
        return self._num_objects - 1

    def add_instance(self, obj_id: int, l2w) -> int:
        """Instance `obj_id` with a 4x4 local-to-world transform."""
        assert 0 <= obj_id < self._num_objects
        m = np.asarray(l2w, np.float32).reshape(4, 4)
        self._instances.append((int(obj_id), m))
        return len(self._instances) - 1

    # -- geometry ----------------------------------------------------------
    def add_sphere(self, center, radius, mtl_id: int, obj: int | None = None) -> int:
        self._spheres.append((*map(float, center), float(radius), int(mtl_id)))
        self._sph_light.append(-1)
        self._sph_obj.append(-1 if obj is None else int(obj))
        return len(self._spheres) - 1

    def add_mesh(self, pos, faces, mtl_id, nml=None, uv=None, obj=None):
        """Add an indexed triangle mesh. Returns (tri_start, tri_count).

        pos [V,3]; faces [F,3] int; mtl_id scalar or [F]; nml [V,3] or None
        (derived per-face); uv [V,2] or None.
        """
        pos = np.asarray(pos, np.float32).reshape(-1, 3)
        faces = np.asarray(faces, np.int64).reshape(-1, 3)
        base = len(self._vpos)
        if nml is None:
            # Per-face normals; duplicate vertices so interpolation is flat.
            nml = np.zeros_like(pos)
            fn = np.cross(
                pos[faces[:, 1]] - pos[faces[:, 0]],
                pos[faces[:, 2]] - pos[faces[:, 0]],
            )
            fl = np.linalg.norm(fn, axis=1, keepdims=True)
            fn = fn / np.maximum(fl, 1e-20)
            counts = np.zeros(len(pos))
            for a in range(3):
                np.add.at(nml, faces[:, a], fn)
                np.add.at(counts, faces[:, a], 1)
            nml = nml / np.maximum(np.linalg.norm(nml, axis=1, keepdims=True), 1e-20)
        else:
            nml = np.asarray(nml, np.float32).reshape(-1, 3)
        if uv is None:
            uv = np.zeros((len(pos), 2), np.float32)
        else:
            uv = np.asarray(uv, np.float32).reshape(-1, 2)
        self._vpos.extend(pos.tolist())
        self._vnml.extend(nml.tolist())
        self._vuv.extend(uv.tolist())
        mtl = np.broadcast_to(np.asarray(mtl_id, np.int64), (len(faces),))
        tri_start = len(self._faces)
        oid = -1 if obj is None else int(obj)
        mesh_id = self._mesh_counter  # TriangleGroupMesh mesh_id role
        self._mesh_counter += 1
        for f, m in zip(faces, mtl):
            self._faces.append((base + int(f[0]), base + int(f[1]), base + int(f[2]), int(m)))
            self._tri_light.append(-1)
            self._face_obj.append(oid)
            self._face_mesh.append(mesh_id)
        return tri_start, len(faces)

    def add_quad(self, p0, p1, p2, p3, mtl_id: int, obj=None):
        """Two-triangle quad from 4 corners (ccw). Returns (tri_start, 2)."""
        pos = np.asarray([p0, p1, p2, p3], np.float32)
        return self.add_mesh(pos, [[0, 1, 2], [0, 2, 3]], mtl_id, obj=obj)

    # -- lights ------------------------------------------------------------
    def add_area_light_tris(self, tri_start, tri_count, le) -> int:
        assert all(
            self._face_obj[t] < 0 for t in range(tri_start, tri_start + tri_count)
        ), "area lights on instanced objects are not supported (light-sampling"
        " positions would need per-instance L2W; add the emitter as world geometry)"
        pos = np.asarray(self._vpos, np.float32)
        area = 0.0
        for t in range(tri_start, tri_start + tri_count):
            i0, i1, i2, _ = self._faces[t]
            area += 0.5 * np.linalg.norm(
                np.cross(pos[i1] - pos[i0], pos[i2] - pos[i0])
            )
        lid = self.lights.add(
            LightType.AREA, le=le, obj_kind=0, tri_start=tri_start,
            tri_count=tri_count, area=float(area),
        )
        for t in range(tri_start, tri_start + tri_count):
            self._tri_light[t] = lid
        return lid

    def add_area_light_sphere(self, sphere_id, le) -> int:
        r = self._spheres[sphere_id][3]
        lid = self.lights.add(
            LightType.AREA, le=le, obj_kind=1, sphere_id=sphere_id,
            area=float(4.0 * np.pi * r * r),
        )
        self._sph_light[sphere_id] = lid
        return lid

    def add_point_light(self, pos, le) -> int:
        return self.lights.add(LightType.POINT, le=le, pos=pos)

    def add_spot_light(self, pos, dir, le, inner_angle, outer_angle) -> int:
        return self.lights.add(
            LightType.SPOT, le=le, pos=pos, dir=dir,
            inner_angle=inner_angle, outer_angle=outer_angle,
        )

    def add_directional_light(self, dir, le) -> int:
        return self.lights.add(LightType.DIRECTIONAL, le=le, dir=dir)

    def set_envmap(self, img, add_light=True) -> None:
        self._envmap = np.asarray(img, np.float32)
        if add_light:
            self.lights.add(LightType.IBL)

    def set_background(self, color) -> None:
        self._bg = tuple(float(c) for c in color)

    # -- freeze ------------------------------------------------------------
    def build(self, bvh_cache: str | None = None) -> SceneData:
        """Freeze into SceneData.  bvh_cache: optional .npz produced by
        `python -m aten_tpu.cli.bvh_builder` (the SbvhBuilder-tool
        import path, accelerator.h:158-176); used when its primitive
        count matches, else the BVH is rebuilt."""
        self._bvh_cache = bvh_cache
        return self._build()

    def _build(self) -> SceneData:
        vpos = np.asarray(self._vpos, np.float32).reshape(-1, 3)
        vnml = np.asarray(self._vnml, np.float32).reshape(-1, 3)
        vuv = np.asarray(self._vuv, np.float32).reshape(-1, 2)
        faces = np.asarray(self._faces, np.int64).reshape(-1, 4)
        num_tris = len(faces)
        num_sph = len(self._spheres)
        assert num_tris + num_sph > 0, "empty scene"

        # Pre-expanded triangle data (v0, edges, per-vertex attrs).
        if num_tris > 0:
            i0, i1, i2 = faces[:, 0], faces[:, 1], faces[:, 2]
            tv0 = vpos[i0]
            te1 = vpos[i1] - vpos[i0]
            te2 = vpos[i2] - vpos[i0]
            tn0, tn1, tn2 = vnml[i0], vnml[i1], vnml[i2]
            tuv0, tuv1, tuv2 = vuv[i0], vuv[i1], vuv[i2]
            tmtl = faces[:, 3].astype(np.int32)
            tlight = np.asarray(self._tri_light, np.int32)
            tmesh = np.asarray(self._face_mesh, np.int32)
            tarea = 0.5 * np.linalg.norm(np.cross(te1, te2), axis=1)
        else:  # dummy row so gathers stay shaped
            tv0 = np.zeros((1, 3), np.float32)
            te1 = np.array([[1e-12, 0, 0]], np.float32)
            te2 = np.array([[0, 1e-12, 0]], np.float32)
            tn0 = tn1 = tn2 = np.array([[0, 0, 1]], np.float32)
            tuv0 = tuv1 = tuv2 = np.zeros((1, 2), np.float32)
            tmtl = np.zeros(1, np.int32)
            tlight = np.full(1, -1, np.int32)
            tmesh = np.full(1, -1, np.int32)
            tarea = np.zeros(1, np.float32)

        if num_sph > 0:
            sc = np.asarray([s[:3] for s in self._spheres], np.float32)
            sr = np.asarray([s[3] for s in self._spheres], np.float32)
            smtl = np.asarray([s[4] for s in self._spheres], np.int32)
            slight = np.asarray(self._sph_light, np.int32)
        else:
            sc = np.zeros((1, 3), np.float32)
            sr = np.zeros(1, np.float32)
            smtl = np.zeros(1, np.int32)
            slight = np.full(1, -1, np.int32)

        # Primitive boxes: tris then spheres (global prim id space).
        boxes_min, boxes_max = [], []
        if num_tris > 0:
            p0 = tv0
            p1 = tv0 + te1
            p2 = tv0 + te2
            boxes_min.append(np.minimum(np.minimum(p0, p1), p2) - 1e-5)
            boxes_max.append(np.maximum(np.maximum(p0, p1), p2) + 1e-5)
        if num_sph > 0:
            boxes_min.append(sc - sr[:, None] - 1e-5)
            boxes_max.append(sc + sr[:, None] + 1e-5)
        all_bmin = np.concatenate(boxes_min)
        all_bmax = np.concatenate(boxes_max)

        num_instances = 0
        if self._instances:
            # Two-level TLAS/BLAS: group prims per object (world geometry
            # becomes an implicit identity-instanced object), build the
            # unified node pool (accel/tlas.py).
            from aten_tpu.accel.tlas import build_two_level

            face_obj = np.asarray(self._face_obj, np.int64) if num_tris else np.zeros(0, np.int64)
            sph_obj = np.asarray(self._sph_obj, np.int64) if num_sph else np.zeros(0, np.int64)
            prim_obj = np.concatenate([face_obj, sph_obj])
            instances = list(self._instances)
            obj_of = {}
            next_o = 0
            for o in range(self._num_objects):
                obj_of[o] = next_o
                next_o += 1
            if (prim_obj < 0).any():
                world_o = next_o
                next_o += 1
                prim_obj = np.where(prim_obj < 0, world_o, prim_obj)
                instances.append((world_o, np.eye(4, dtype=np.float32)))
            obj_prim_boxes = []
            for o in range(next_o):
                pids = np.nonzero(prim_obj == o)[0].astype(np.int32)
                assert len(pids) > 0, f"object {o} has no geometry"
                obj_prim_boxes.append((all_bmin[pids], all_bmax[pids], pids))
            inst_obj = np.asarray([i[0] for i in instances], np.int32)
            inst_l2w = np.stack([i[1] for i in instances])
            bvh = build_two_level(
                obj_prim_boxes, inst_obj, inst_l2w, return_pieces=True
            )
            pieces = bvh.pop("_pieces")
            num_instances = len(instances)
            # Pallas instanced-treelet layout: TLAS + BLAS tops resident
            # (<= ~4 MB of 512 B node rows), prim blocks streamed from HBM
            if (pieces["Kt"] + sum(
                b["nodes_bmin"].shape[0] for b in pieces["blas"]
            )) * 512 < 64 * 1024 * 1024:  # rough sanity cap on host work
                from aten_tpu.ops.traverse_pallas import (
                    build_tlas_treelet_layout,
                )

                tt = build_tlas_treelet_layout(
                    pieces, bvh["tl_prim_order"], bvh["inst_w2l"],
                    tv0, te1, te2, sc, sr, num_tris,
                )
                if tt["tt_nodes"].shape[0] * 512 < 4 * 1024 * 1024:
                    bvh.update(tt)
        else:
            bvh = None
            cache = getattr(self, "_bvh_cache", None)
            if cache:
                import os

                if os.path.exists(cache):
                    with np.load(cache) as z:
                        if z["prim_order"].shape[0] == all_bmin.shape[0]:
                            bvh = {k: z[k] for k in z.files}
            if bvh is None:
                bvh = build_bvh(all_bmin, all_bmax)

        tri_areas = tarea[:num_tris] if num_tris else np.zeros(0, np.float32)
        # Packed per-triangle attribute rows for eval_hit: above the MXU
        # one-hot gather limit, 11 separate per-field takes cost ~2.5x
        # one [T,24] row take (measured at 1M lanes on v5e); ids are
        # exact in f32 (< 2^24).
        T_rows = tv0.shape[0]
        tri_attr = None
        if num_tris > 2048:
            tri_attr = np.concatenate([
                tn0, tn1, tn2, te1, te2,
                tuv0, tuv1, tuv2,
                tmtl.astype(np.float32)[:, None],
                tlight.astype(np.float32)[:, None],
                tmesh.astype(np.float32)[:, None],
            ], axis=1).astype(np.float32)
        arrays = {
            "tri_v0": jnp.asarray(tv0),
            "tri_e1": jnp.asarray(te1),
            "tri_e2": jnp.asarray(te2),
            "tri_n0": jnp.asarray(tn0),
            "tri_n1": jnp.asarray(tn1),
            "tri_n2": jnp.asarray(tn2),
            "tri_uv0": jnp.asarray(tuv0),
            "tri_uv1": jnp.asarray(tuv1),
            "tri_uv2": jnp.asarray(tuv2),
            "tri_mtl": jnp.asarray(tmtl),
            "tri_light": jnp.asarray(tlight),
            "tri_mesh": jnp.asarray(tmesh),
            "tri_area": jnp.asarray(tarea.astype(np.float32)),
            "sph_center": jnp.asarray(sc),
            "sph_radius": jnp.asarray(sr),
            "sph_mtl": jnp.asarray(smtl),
            "sph_light": jnp.asarray(slight),
            "materials": self.materials.arrays(),
            "lights": self.lights.arrays(tri_areas),
            "bg": jnp.asarray(self._bg, jnp.float32),
        }
        if tri_attr is not None:
            arrays["tri_attr"] = jnp.asarray(tri_attr)
        for k, v in bvh.items():
            arrays[k] = jnp.asarray(v)
        # Pallas tile-traversal layout (VMEM structure-of-rows); only for
        # single-level scenes whose pools fit comfortably in VMEM (~<6 MB).
        if num_instances == 0:
            K = bvh["nodes_bmin"].shape[0]
            P = bvh["prim_order"].shape[0]
            # resident kernel rows are 512 B/record; VMEM ceiling measured
            # ~8 MB on v5e -> resident for small scenes, treelet-streamed
            # (top tree in VMEM, prim blocks DMA'd from HBM) for the rest
            pool_bytes = (K + P) * 512
            if pool_bytes < 5 * 1024 * 1024:
                from aten_tpu.ops.traverse_pallas import build_pallas_layout

                layout = build_pallas_layout(
                    bvh, tv0, te1, te2, sc, sr, num_tris
                )
            else:
                from aten_tpu.ops.traverse_pallas import build_treelet_layout

                layout = build_treelet_layout(
                    bvh, tv0, te1, te2, sc, sr, num_tris
                )
            trl_window = layout.pop("_window", None)
            for k, v in layout.items():
                arrays[k] = jnp.asarray(v)
        else:
            trl_window = None
        if self._envmap is not None:
            arrays.update(build_env_tables(self._envmap))
        if self.textures.images:
            arrays.update(self.textures.arrays())
        if self.media.rows:
            arrays.update(self.media.arrays())
        static = {
            "num_tris": num_tris,
            "num_spheres": num_sph,
            "num_lights": len(self.lights.rows),
            "num_instances": num_instances,
            # treelet-kernel drain window chosen at layout build (per
            # scene: big scenes take 128-prim fat leaves to halve the
            # serial top-tree walk; see build_treelet_layout)
            **({"trl_window": trl_window} if trl_window else {}),
            # any alpha<1 material switches shadow rays to the
            # transmittance walk and enables primary punch-through
            "has_alpha": any(r["alpha"] < 1.0 for r in self.materials.rows),
            # any stencil-tagged material enables the bounce-0 stencil
            # punch-through pre-pass (CheckStencil role)
            "has_stencil": any(r["stencil"] != 0.0 for r in self.materials.rows),
            # static per-map presence: a texture fetch is ~6 gathers per
            # map per bounce at wavefront width — skip maps NO material
            # carries (measured ~24 ms/map/bounce at 1M lanes on v5e)
            "has_albedo_maps": any(
                r.get("albedo_map", -1) >= 0 for r in self.materials.rows),
            "has_roughness_maps": any(
                r.get("roughness_map", -1) >= 0 for r in self.materials.rows),
            "has_normal_maps": any(
                r.get("normal_map", -1) >= 0 for r in self.materials.rows),
            # static used-material-type set: jit prunes absent BRDF
            # families from the shading dispatch (shading/brdf._need)
            "used_mtl_types": tuple(sorted(
                {r["type"] for r in self.materials.rows}
                | {int(MaterialType.DIFFUSE)}
            )),
        }
        return SceneData(arrays, static)
