"""Texture mip chain + trilinear LOD sampling (GenMipMaps counterpart)."""
import jax.numpy as jnp
import numpy as np

from aten_tpu.scene.textures import (
    TextureTable, footprint_lod, num_mip_levels, sample_texture,
    sample_texture_lod,
)


def _checker(n=32):
    y, x = np.mgrid[0:n, 0:n]
    c = ((x + y) % 2).astype(np.float32)
    return np.stack([c, c, c], -1)


def test_mip_chain_shapes_and_means():
    tt = TextureTable()
    tt.add(_checker(32))
    tex = tt.arrays()
    L = num_mip_levels(tex)
    assert L == 6  # 32 -> 16 -> 8 -> 4 -> 2 -> 1
    # box filtering preserves the mean at every level
    for l in range(1, L):
        m = np.asarray(tex[f"tex_mip{l}"])
        np.testing.assert_allclose(m[..., :3].mean(), 0.5, atol=1e-6)
    assert tex["tex_mip5"].shape == (1, 1, 1, 4)


def test_lod_sampling_converges_to_average():
    tt = TextureTable()
    # 8-texel vertical stripes (survive several mip levels)
    x = np.mgrid[0:32, 0:32][1]
    stripes = ((x // 8) % 2).astype(np.float32)
    tt.add(np.stack([stripes] * 3, -1))
    tex = tt.arrays()
    tid = jnp.zeros(16, jnp.int32)
    u = jnp.linspace(0.05, 0.95, 16)
    v = jnp.full(16, 1.0 - 16.5 / 32)  # a texel-center row
    # lod 0 == plain bilinear
    c0 = np.asarray(sample_texture_lod(tex, tid, u, v, jnp.zeros(16)))
    cb = np.asarray(sample_texture(tex, tid, u, v))
    np.testing.assert_allclose(c0, cb, atol=1e-6)
    # max lod -> flat 0.5 average everywhere
    cmax = np.asarray(sample_texture_lod(tex, tid, u, v, jnp.full(16, 5.0)))
    np.testing.assert_allclose(cmax[..., :3], 0.5, atol=1e-6)
    # fractional lod interpolates between levels (monotone variance)
    var = []
    for lod in (0.0, 2.0, 4.0):
        c = np.asarray(
            sample_texture_lod(tex, tid, u, v, jnp.full(16, lod))
        )[..., 0]
        var.append(c.var())
    assert var[0] > var[1] > var[2]


def test_footprint_lod_monotone():
    tt = TextureTable()
    tt.add(_checker(64))
    tex = tt.arrays()
    tid = jnp.zeros(3, jnp.int32)
    t = jnp.asarray([0.1, 1.0, 10.0])
    lod = np.asarray(footprint_lod(tex, tid, t, pixel_spread=0.1))
    assert lod[0] < lod[1] < lod[2]
    assert lod[0] >= 0.0
