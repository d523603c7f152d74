"""Active-ray compaction (StreamCompaction counterpart) + policy bench.

The reference compacts the active-ray set every bounce with a Blelloch
scan + scatter (src/libidaten/kernel/StreamCompaction.{h,cu}:51-232) so
its CUDA `shade` kernel launches over exactly hitnum threads.  On TPU
the equivalent primitives are `jnp.cumsum` (the scan) and a stable
argsort partition (the scatter); but XLA executes MASKED lanes at full
vector width anyway, so the integrator only wins if the per-bounce work
saved exceeds the sort+gather(+scatter-back) cost.

The measured policy (bench_compaction below, TPU v5e, 1M lanes): the
sort+gather+scatter round trip itself is CHEAP (~0.07 ms — comparable
to one masked elementwise pass).  The real obstacle is XLA's static
shapes: the compacted arrays are still N long, so shading them costs
exactly the same — the saving only materializes by shading fixed-size
CHUNKS under a `while_loop` whose trip count is ceil(live/chunk),
which adds per-chunk dispatch overhead and a ragged tail.  That pays
off only when the live fraction is small for many bounces; in the
gallery configs (5 bounces, RR from bounce 3) the live fraction stays
high until the tail, so the integrator keeps masked lanes
(pathtracer.py docstring).  This module provides the primitives for
workloads that DO run sparse (deep volumetric paths) and the benchmark
to re-measure the trade.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def compaction_order(alive):
    """Stable permutation putting live lanes first (scan+scatter role).

    Returns (perm [N] i32, live_count).  perm[:live_count] are the live
    lane indices in original order — mirroring StreamCompaction's
    compacted index list."""
    key = (~alive).astype(jnp.int32)
    # stable argsort: False(0) keys first = live lanes, original order kept
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    return perm, jnp.sum(alive.astype(jnp.int32))


def compact(alive, *arrays):
    """Gather `arrays` into live-first order; returns (perm, count, gathered)."""
    perm, count = compaction_order(alive)
    return perm, count, tuple(jnp.take(a, perm, axis=0) for a in arrays)


def scatter_back(perm, *arrays):
    """Inverse of compact: scatter results back to original lane order."""
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype))
    return tuple(jnp.take(a, inv, axis=0) for a in arrays)


def bench_compaction(n=1 << 20, live_frac=0.5, iters=20):
    """Measure sort+gather+scatter round-trip vs a masked shading bounce
    proxy (the policy experiment; run on TPU)."""
    import time

    import numpy as np

    rng = np.random.default_rng(0)
    alive = jnp.asarray(rng.uniform(size=n) < live_frac)
    payload = [jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
               for _ in range(4)]

    @jax.jit
    def roundtrip(alive, *arrs):
        perm, cnt, g = compact(alive, *arrs)
        out = tuple(x * 2.0 for x in g)
        return scatter_back(perm, *out)

    @jax.jit
    def masked(alive, *arrs):
        m = alive[:, None]
        return tuple(jnp.where(m, x * 2.0, x) for x in arrs)

    def timeit(f):
        r = f(alive, *payload)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(alive, *payload)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters * 1000

    return {"compact_ms": timeit(roundtrip), "masked_ms": timeit(masked)}


if __name__ == "__main__":
    print(bench_compaction())
