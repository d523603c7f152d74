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
