"""Density-grid ingestion tooling (volume/grids.py)."""
import numpy as np
import pytest

from aten_tpu.volume.grids import (
    add_grid_medium, load_grid, read_nvdb_header, save_grid, smoke_plume,
    sphere_shell,
)


def test_grid_npz_roundtrip(tmp_path):
    d = smoke_plume(res=16)
    assert d.shape == (16, 16, 16) and d.max() > 0
    p = str(tmp_path / "g.npz")
    save_grid(p, d, (-1, 0, -1), (1, 2, 1))
    d2, lo, hi = load_grid(p)
    np.testing.assert_array_equal(d2, d)
    np.testing.assert_allclose(lo, [-1, 0, -1])
    np.testing.assert_allclose(hi, [1, 2, 1])


def test_nvdb_header_rejects_garbage(tmp_path):
    p = tmp_path / "x.nvdb"
    p.write_bytes(b"not a nanovdb file at all")
    with pytest.raises(ValueError):
        read_nvdb_header(str(p))
    # a valid magic parses
    import struct

    p2 = tmp_path / "y.nvdb"
    p2.write_bytes(struct.pack("<QIHH", 0x304244566F6E614E, 32 << 21, 1, 0))
    h = read_nvdb_header(str(p2))
    assert h["grid_count"] == 1 and h["codec"] == 0


def test_add_grid_medium_routes_rays(tmp_path):
    """Proxy box + grid medium renders a denser image through the grid
    than around it (end-to-end through the volume integrator)."""
    import jax.numpy as jnp

    from aten_tpu.core.camera import PinholeCamera
    from aten_tpu.integrator.volpt import render_volpt
    from aten_tpu.scene.materials import MaterialType
    from aten_tpu.scene.scene import SceneBuilder

    sb = SceneBuilder()
    lm = sb.add_material(MaterialType.EMISSIVE, base_color=(2, 2, 2))
    # emissive backdrop
    sb.add_quad((-6, -6, -4), (6, -6, -4), (6, 6, -4), (-6, 6, -4), lm)
    d = sphere_shell(res=24) * 8.0
    add_grid_medium(sb, d, (-1, -1, -1), (1, 1, 1),
                    sigma_s=(0.1, 0.1, 0.1), sigma_a=(3.0, 3.0, 3.0))
    sc = sb.build()
    cam = PinholeCamera(origin=(0, 0, 6), lookat=(0, 0, 0), vfov_deg=30,
                        width=24, height=24)
    img = np.asarray(render_volpt(sc, cam, spp=8, max_depth=4))
    assert np.isfinite(img).all()
    c = img[12, 12].mean()       # through the absorbing shell
    edge = img[1, 1].mean()      # around it
    assert c < edge * 0.9


def test_nvdb_write_read_roundtrip(tmp_path):
    """Full NanoVDB codec-NONE blob: write -> tree-walk decode ->
    bit-identical dense grid + world bbox (v32.3 layout)."""
    from aten_tpu.volume.grids import load_nvdb_dense, write_nvdb

    d = smoke_plume(res=32)
    p = str(tmp_path / "plume.nvdb")
    write_nvdb(p, d, bmin=(-1.5, 0.0, -1.5), bmax=(1.5, 3.0, 1.5))
    h = read_nvdb_header(p)
    assert h["grid_count"] == 1 and h["codec"] == 0
    d2, lo, hi = load_nvdb_dense(p)
    np.testing.assert_array_equal(d2, d)
    np.testing.assert_allclose(lo, [-1.5, 0.0, -1.5])
    np.testing.assert_allclose(hi, [1.5, 3.0, 1.5])


def test_nvdb_sparse_and_nonmultiple8(tmp_path):
    """Sparse occupancy + non-multiple-of-8 dims survive the tree walk."""
    from aten_tpu.volume.grids import load_nvdb_dense, write_nvdb

    rng = np.random.default_rng(3)
    d = np.zeros((21, 14, 35), np.float32)
    d[2:9, 3:11, 20:33] = rng.uniform(0.1, 2.0, (7, 8, 13)).astype(np.float32)
    p = str(tmp_path / "sparse.nvdb")
    write_nvdb(p, d)
    d2, _, _ = load_nvdb_dense(p)
    np.testing.assert_array_equal(d2, d)


def test_nvdb_renders_through_volpt(tmp_path):
    """An .nvdb-ingested grid drives the delta-tracked medium end to
    end (the reference's grid_loader_device.cu -> render path)."""
    import jax.numpy as jnp

    from aten_tpu.core.camera import PinholeCamera
    from aten_tpu.integrator.volpt import render_volpt
    from aten_tpu.scene.materials import MaterialType
    from aten_tpu.scene.scene import SceneBuilder
    from aten_tpu.volume.grids import load_nvdb_dense, write_nvdb

    d = sphere_shell(res=16) * 6.0
    p = str(tmp_path / "shell.nvdb")
    write_nvdb(p, d, bmin=(-1, -1, -1), bmax=(1, 1, 1))
    d2, lo, hi = load_nvdb_dense(p)

    sb = SceneBuilder()
    lm = sb.add_material(MaterialType.EMISSIVE, base_color=(2, 2, 2))
    sb.add_quad((-6, -6, -4), (6, -6, -4), (6, 6, -4), (-6, 6, -4), lm)
    add_grid_medium(sb, d2, lo, hi, sigma_s=(0.1,) * 3, sigma_a=(3.0,) * 3)
    sc = sb.build()
    cam = PinholeCamera(origin=(0, 0, 6), lookat=(0, 0, 0), vfov_deg=30,
                        width=16, height=16)
    img = np.asarray(render_volpt(sc, cam, spp=4, max_depth=4))
    assert np.isfinite(img).all()
    assert img[8, 8].mean() < img[1, 1].mean()  # shell absorbs


def test_nvdb_published_struct_offsets(tmp_path):
    """Independent layout gate (VERDICT r3 #9): hard-coded offsets from
    the PUBLISHED NanoVDB v32.3 layout (NanoVDB.h GridData 672 B;
    nanovdb/util/IO.h FileHeader 16 B + FileMetaData 176 B), asserted
    against freshly written bytes — not a read-what-we-wrote roundtrip."""
    import struct

    import numpy as np

    from aten_tpu.volume.grids import (
        NANOVDB_MAGIC, write_nvdb,
    )

    dens = np.zeros((8, 8, 8), np.float32)
    dens[2:6, 2:6, 2:6] = 0.5
    p = tmp_path / "g.nvdb"
    write_nvdb(p, dens, bmin=(-1, -2, -3), bmax=(1, 2, 3))
    data = p.read_bytes()

    # FileHeader {magic u64 @0, version u32 @8, gridCount u16 @12,
    # codec u16 @14}
    assert struct.unpack_from("<Q", data, 0)[0] == NANOVDB_MAGIC
    assert struct.unpack_from("<H", data, 12)[0] == 1
    assert struct.unpack_from("<H", data, 14)[0] == 0  # codec NONE
    ver = struct.unpack_from("<I", data, 8)[0]
    assert ver >> 21 == 32  # major 32

    # FileMetaData at published offsets
    m = 16
    grid_size = struct.unpack_from("<Q", data, m + 0)[0]
    file_size = struct.unpack_from("<Q", data, m + 8)[0]
    assert grid_size == file_size  # codec NONE stores the raw blob
    assert struct.unpack_from("<I", data, m + 32)[0] == 1  # GridType::Float
    assert struct.unpack_from("<I", data, m + 36)[0] == 3  # FogVolume
    wb = struct.unpack_from("<6d", data, m + 40)
    assert wb == (-1.0, -2.0, -3.0, 1.0, 2.0, 3.0)
    ib = struct.unpack_from("<6i", data, m + 88)
    assert ib == (0, 0, 0, 7, 7, 7)
    vox = struct.unpack_from("<3d", data, m + 112)
    assert np.allclose(vox, (2 / 8, 4 / 8, 6 / 8))
    name_size = struct.unpack_from("<I", data, m + 136)[0]
    assert name_size == len(b"density") + 1
    assert struct.unpack_from("<H", data, m + 168)[0] == 0  # codec
    assert struct.unpack_from("<I", data, m + 172)[0] == ver

    # GridData blob at published offsets (NanoVDB.h v32.3)
    b = m + 176 + name_size
    assert struct.unpack_from("<Q", data, b + 0)[0] == NANOVDB_MAGIC
    assert struct.unpack_from("<Q", data, b + 32)[0] == grid_size
    assert data[b + 40:b + 47] == b"density"            # gridName[256]@40
    wb2 = struct.unpack_from("<6d", data, b + 560)      # worldBBox@560
    assert wb2 == (-1.0, -2.0, -3.0, 1.0, 2.0, 3.0)
    vs = struct.unpack_from("<3d", data, b + 608)       # voxelSize@608
    assert np.allclose(vs, (2 / 8, 4 / 8, 6 / 8))
    assert struct.unpack_from("<I", data, b + 632)[0] == 3  # gridClass@632
    assert struct.unpack_from("<I", data, b + 636)[0] == 1  # gridType@636
    # TreeData directly after the 672-byte GridData
    t = b + 672
    leaf_off, lower_off, upper_off, root_off = struct.unpack_from(
        "<4Q", data, t)
    assert root_off == 64  # TreeData is 64 B; root follows it
    n_leaf, n_lower, n_upper = struct.unpack_from("<3I", data, t + 32)
    assert (n_leaf, n_lower, n_upper) == (1, 1, 1)


def test_nvdb_zip_codec_and_committed_fixture():
    """ZIP (zlib) codec decode + byte-pinned fixture: the committed
    smoke8_zip.nvdb must decode to the committed density array.  Guards
    reader/writer drift against bytes frozen in git, not a same-process
    roundtrip."""
    import os
    import struct

    import numpy as np

    from aten_tpu.volume.grids import NANOVDB_MAGIC, load_nvdb_dense

    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       "smoke8_zip.nvdb")
    raw = open(fix, "rb").read()
    assert struct.unpack_from("<Q", raw, 0)[0] == NANOVDB_MAGIC
    assert struct.unpack_from("<H", raw, 14)[0] == 1  # codec ZIP
    dens, lo, hi = load_nvdb_dense(fix)
    ref = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                               "smoke8_dens.npy"))
    np.testing.assert_allclose(dens, ref)
    np.testing.assert_allclose(lo, (-1, -1, -1))
    np.testing.assert_allclose(hi, (1, 1, 1))
