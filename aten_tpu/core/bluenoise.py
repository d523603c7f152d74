"""Blue-noise masks + sampler.

Counterpart of the reference's blue-noise sampler
(src/libidaten/kernel/bluenoiseSampler.cuh: 256x256xN pre-baked mask
textures registered with the renderer, pathtracing.h:23; masks shipped
under asset/bluenoise).  Shipping 121 MB of mask PNGs is replaced by
generating masks once with the void-and-cluster algorithm (Ulichney
1993) — toroidal Gaussian energy, incremental updates — and caching the
result as an .npz.  Sampling decorrelates across frames/dimensions with
a Cranley-Patterson toroidal shift driven by the R2 sequence, giving
the same low-frequency-free error distribution per pixel.
"""
from __future__ import annotations

import os

import numpy as np

_CACHE = os.environ.get(
    "ATEN_BLUENOISE_CACHE", "/tmp/aten_tpu_bluenoise_{size}x{layers}.npz"
)


def _toroidal_gaussian(size, sigma=1.9):
    ax = np.arange(size)
    d = np.minimum(ax, size - ax).astype(np.float64)
    dx2 = d[None, :] ** 2
    dy2 = d[:, None] ** 2
    return np.exp(-(dx2 + dy2) / (2.0 * sigma * sigma))


def _energy_at(kernel, y, x):
    return np.roll(np.roll(kernel, y, axis=0), x, axis=1)


def make_blue_noise(size=64, seed=0):
    """Void-and-cluster rank matrix [size,size] with values 0..size^2-1."""
    rng = np.random.default_rng(seed)
    n = size * size
    n1 = n // 10
    kernel = _toroidal_gaussian(size)

    # initial random binary pattern with n1 ones
    binary = np.zeros((size, size), bool)
    idx = rng.choice(n, n1, replace=False)
    binary.ravel()[idx] = True
    energy = np.zeros((size, size))
    for y, x in zip(*np.nonzero(binary)):
        energy += _energy_at(kernel, y, x)

    # phase 0: relax prototype (swap tightest cluster with largest void)
    for _ in range(n):
        e1 = np.where(binary, energy, -np.inf)
        cy, cx = np.unravel_index(np.argmax(e1), e1.shape)
        binary[cy, cx] = False
        energy -= _energy_at(kernel, cy, cx)
        e0 = np.where(binary, np.inf, energy)
        vy, vx = np.unravel_index(np.argmin(e0), e0.shape)
        binary[vy, vx] = True
        energy += _energy_at(kernel, vy, vx)
        if (vy, vx) == (cy, cx):
            break

    rank = np.full((size, size), -1, np.int64)
    # phase 1: remove tightest clusters, ranks n1-1 .. 0
    b = binary.copy()
    e = energy.copy()
    for r in range(n1 - 1, -1, -1):
        e1 = np.where(b, e, -np.inf)
        cy, cx = np.unravel_index(np.argmax(e1), e1.shape)
        b[cy, cx] = False
        e -= _energy_at(kernel, cy, cx)
        rank[cy, cx] = r
    # phase 2: fill largest voids, ranks n1 .. n-1
    b = binary.copy()
    e = energy.copy()
    for r in range(n1, n):
        e0 = np.where(b, np.inf, e)
        vy, vx = np.unravel_index(np.argmin(e0), e0.shape)
        b[vy, vx] = True
        e += _energy_at(kernel, vy, vx)
        rank[vy, vx] = r
    assert (rank >= 0).all()
    return rank


def get_masks(size=64, layers=4, cache=None):
    """[L,S,S] float32 masks in [0,1), generated once and cached."""
    path = (cache or _CACHE).format(size=size, layers=layers)
    if os.path.exists(path):
        with np.load(path) as z:
            return z["masks"]
    masks = np.stack(
        [make_blue_noise(size, seed=s) for s in range(layers)]
    ).astype(np.float32)
    masks = (masks + 0.5) / (size * size)
    try:
        np.savez_compressed(path, masks=masks)
    except OSError:
        pass
    return masks


# R2 low-discrepancy sequence constants (plastic number)
_R2A = 0.7548776662466927
_R2B = 0.5698402909980532


class BlueNoiseSampler:
    """Per-pixel blue-noise sample streams.

    sample(px, py, frame, dim) returns a [N]-shaped float in [0,1):
    the mask value at the pixel, toroidally shifted per (frame, dim) by
    the R2 sequence and Cranley-Patterson rotated — mirroring the
    reference's (x, y, frame/dim-indexed mask stack) lookup.
    """

    def __init__(self, size=64, layers=4):
        import jax.numpy as jnp

        self.size = size
        self.layers = layers
        self.masks = jnp.asarray(get_masks(size, layers))

    def sample(self, px, py, frame, dim):
        import jax.numpy as jnp

        layer = dim % self.layers
        # toroidal shift per (frame, dim): R2 sequence points
        k = frame * 17 + dim
        kf = k.astype(jnp.float32) if hasattr(k, "astype") else float(k)
        sx = jnp.int32(jnp.floor((kf * _R2A % 1.0) * self.size))
        sy = jnp.int32(jnp.floor((kf * _R2B % 1.0) * self.size))
        x = (px.astype(jnp.int32) + sx) % self.size
        y = (py.astype(jnp.int32) + sy) % self.size
        v = self.masks[layer, y, x]
        # Cranley-Patterson rotation keeps the spatial spectrum but
        # decorrelates successive frames
        rot = (kf * 0.6180339887498949) % 1.0
        return (v + rot) % 1.0

    def sample2d(self, px, py, frame, dim):
        return (
            self.sample(px, py, frame, dim),
            self.sample(px, py, frame, dim + 1),
        )
