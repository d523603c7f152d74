"""Correlated multi-jittered (CMJ) QMC sampler, fully batched & stateless.

The reference renderer's only production sampler is CMJ with a 16x16
grid (src/libaten/sampler/cmj.h:9, sampler/sampler.h:18-30), re-seeded
per (frame, sample, pixel, bounce) so no RNG state is ever carried
across kernel launches.  That purity is exactly what JAX wants: here
the sampler is a pure function of a small uint32 state
{index, dimension, scramble} and every draw advances the dimension
counter, mirroring cmj.h:121-123's 12-byte state.

The algorithm is Kensler, "Correlated Multi-Jittered Sampling"
(Pixar TM-13-01).  We fix the pattern to 16x16 = 256 samples; with a
power-of-two period the cycle-walking permutation terminates after a
single round, so the whole sampler is branch-free vector code.
"""
from __future__ import annotations

import jax.numpy as jnp

CMJ_DIM = 16  # 16x16 grid, as the reference (cmj.h:9)
CMJ_N = CMJ_DIM * CMJ_DIM

_U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, _U32)


def wang_hash(seed):
    """Wang integer hash (reference fallback sampler, sampler/wanghash.h:8)."""
    seed = _u32(seed)
    seed = (seed ^ _u32(61)) ^ (seed >> 16)
    seed = seed * _u32(9)
    seed = seed ^ (seed >> 4)
    seed = seed * _u32(0x27D4EB2D)
    seed = seed ^ (seed >> 15)
    return seed


_ROUND_MULS = (0x9E3779B9, 0x85157AF5, 0xC2B2AE35, 0x27D4EB2F)  # all odd


def _permute_pow2(i, l, p):
    """Randomized permutation of [0, l) for power-of-two l (static int).

    Four rounds of {odd multiply, xorshift, add round key} — every step is
    a bijection mod a power of two, so the whole map provably permutes the
    strata (the property CMJ needs; Kensler's masked hash only guarantees
    it with cycle-walking, which is branchy and vector-hostile).
    """
    i = _u32(i)
    p = _u32(p)
    w = _u32(l - 1)
    bits = int(l).bit_length() - 1
    s = max(1, bits // 2)
    i &= w
    k = wang_hash(p ^ _u32(0x55555555))
    for r, mul in enumerate(_ROUND_MULS):
        i = (i * _u32(mul)) & w
        i ^= (i >> s)
        i = (i + (k >> _u32(r * 7))) & w
        i ^= (i >> 1)
    return i & w


def _randfloat(i, p):
    """Kensler's hash-to-float in [0, 1)."""
    i = _u32(i)
    p = _u32(p)
    i ^= p
    i ^= i >> 17
    i ^= i >> 10
    i *= _u32(0xB36534E5)
    i ^= i >> 12
    i ^= i >> 21
    i *= _u32(0x93FC4795)
    i ^= _u32(0xDF6E307F)
    i ^= i >> 17
    i *= _u32(1) | (p >> 18)
    return i.astype(jnp.float32) * jnp.float32(1.0 / 4294967808.0)


def _permute_256(s, p):
    """Bijection of [0,256) from two 16-wide permutations (lo nibble, then
    hi nibble keyed on the permuted lo)."""
    lo = _permute_pow2(s & _u32(15), CMJ_DIM, p * _u32(0x51633E2D))
    hi = _permute_pow2(s >> 4, CMJ_DIM, (p ^ (lo * _u32(0x68BC21EB))) * _u32(0x02E5BE93))
    return hi * _u32(CMJ_DIM) + lo


def cmj_2d(s, p):
    """The s-th sample of 16x16 CMJ pattern p. Returns (x, y) in [0,1)."""
    s = _u32(s) & _u32(CMJ_N - 1)
    p = _u32(p)
    # Kensler's initial index shuffle: without it, consecutive sample
    # indices enumerate strata in raster order, so a LOW-spp prefix of the
    # pattern is confined to a few y-strata and frames correlate badly.
    s = _permute_256(s, p * _u32(0xA399D265))
    m = CMJ_DIM
    sx = _permute_pow2(s & _u32(m - 1), m, p * _u32(0xA511E9B3))
    sy = _permute_pow2(s >> 4, m, p * _u32(0x63D83595))
    jx = _randfloat(s, p * _u32(0xA399D265))
    jy = _randfloat(s, p * _u32(0x711AD6A5))
    col = (s & _u32(m - 1)).astype(jnp.float32)
    row = (s >> 4).astype(jnp.float32)
    inv_m = jnp.float32(1.0 / m)
    x = (col + (sy.astype(jnp.float32) + jx) * inv_m) * inv_m
    y = (row + (sx.astype(jnp.float32) + jy) * inv_m) * inv_m
    return x, y


def cmj_1d(s, p):
    """Stratified-permutation 1D sample: a bijection of the 256 strata built
    from two 16-wide permutations (the 16-wide Kensler hash is bijective
    without the cycle-walk; wider widths are not)."""
    s = _u32(s) & _u32(CMJ_N - 1)
    p = _u32(p)
    sx = _permute_256(s, p * _u32(0x85157AF5))
    j = _randfloat(s, p * _u32(0x967A889B))
    return (sx.astype(jnp.float32) + j) * jnp.float32(1.0 / CMJ_N)


# --- batched sampler state --------------------------------------------------
#
# State mirrors the reference's {idx, dimension, scramble}
# (sampler/cmj.h:121-123). `idx` selects the sample within a pattern;
# `scramble` decorrelates pixels; `dimension` advances per draw so every
# random decision on a path gets an independent stratified stream.


def make_state(pixel_seed, frame, sample, spp, bounce=0):
    """Build a batched sampler state.

    pixel_seed: uint32 [...] per-pixel scramble (e.g. wang_hash(pixel_idx)).
    frame:      accumulation frame counter (temporal sample index).
    sample:     sample-in-frame index.
    bounce:     decorrelates the per-bounce re-seed as the reference does
                (kernel/pathtracing_impl.cu:72-80 offsets dims by bounce).
    """
    idx = _u32(frame) * _u32(spp) + _u32(sample)
    epoch = idx >> 8  # pattern exhausted every 256 samples -> new pattern
    scramble = wang_hash(_u32(pixel_seed) ^ wang_hash(epoch * _u32(0x9E3779B9)))
    dim = _u32(bounce) * _u32(300) + _u32(4)
    dim = jnp.broadcast_to(dim, jnp.shape(scramble))
    return {
        "idx": jnp.broadcast_to(idx & _u32(CMJ_N - 1), jnp.shape(scramble)),
        "dim": dim,
        "scramble": scramble,
    }


def next_1d(state):
    p = state["scramble"] ^ wang_hash(state["dim"])
    u = cmj_1d(state["idx"], p)
    state = dict(state, dim=state["dim"] + _u32(1))
    return u, state


def next_2d(state):
    p = state["scramble"] ^ wang_hash(state["dim"])
    x, y = cmj_2d(state["idx"], p)
    state = dict(state, dim=state["dim"] + _u32(2))
    return x, y, state
