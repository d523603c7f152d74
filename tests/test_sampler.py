"""CMJ sampler distribution tests (no analogue exists in the reference —
SURVEY.md §4 calls for proper sampler coverage)."""
import jax.numpy as jnp
import numpy as np

from aten_tpu.core import sampler as smp


def test_cmj_range_and_stratification():
    # All 256 samples of one pattern must land in [0,1)^2 and be perfectly
    # stratified: one sample per 16x16 stratum (the defining CMJ property).
    s = jnp.arange(256, dtype=jnp.uint32)
    x, y = smp.cmj_2d(s, jnp.uint32(1234))
    x, y = np.asarray(x), np.asarray(y)
    assert (x >= 0).all() and (x < 1).all()
    assert (y >= 0).all() and (y < 1).all()
    cells = set(zip((x * 16).astype(int).tolist(), (y * 16).astype(int).tolist()))
    assert len(cells) == 256  # one per stratum


def test_cmj_patterns_decorrelated():
    s = jnp.arange(256, dtype=jnp.uint32)
    x1, _ = smp.cmj_2d(s, jnp.uint32(111))
    x2, _ = smp.cmj_2d(s, jnp.uint32(222))
    assert not np.allclose(np.asarray(x1), np.asarray(x2))


def test_cmj_1d_stratified():
    s = jnp.arange(256, dtype=jnp.uint32)
    x = np.sort(np.asarray(smp.cmj_1d(s, jnp.uint32(7))))
    # one sample per 1/256 stratum
    strata = (x * 256).astype(int)
    assert len(set(strata.tolist())) == 256


def test_state_stream_mean():
    # Averages of many draws approach 0.5.
    import jax

    @jax.jit
    def draw():
        pix = jnp.arange(4096, dtype=jnp.uint32)
        state = smp.make_state(smp.wang_hash(pix), frame=0, sample=0, spp=1)
        total = 0.0
        for _ in range(8):
            u, state = smp.next_1d(state)
            total += jnp.mean(u)
        return total / 8

    assert abs(float(draw()) - 0.5) < 0.01


def test_reseed_is_deterministic():
    pix = jnp.arange(16, dtype=jnp.uint32)
    s1 = smp.make_state(pix, 3, 1, 4, bounce=2)
    s2 = smp.make_state(pix, 3, 1, 4, bounce=2)
    u1, _ = smp.next_1d(s1)
    u2, _ = smp.next_1d(s2)
    assert np.array_equal(np.asarray(u1), np.asarray(u2))
