"""Microbenchmark: per-iteration latency of a pointer-chase while_loop.

Variants:
  chase    : load row -> extract next index (pure scalar chase)
  reduce   : chase + vector math + jnp.any reduce feeding a select
  extracts : chase + 10 extra lane extracts per step
  smt4     : four independent chases interleaved in one loop body
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 1 << 14
STEPS = int(os.environ.get("STEPS", 8192))

F2I = lambda x: pltpu.bitcast(x, jnp.int32)


def build_chain(seed):
    rng = np.random.default_rng(seed)
    nxt = rng.permutation(K).astype(np.int32)
    rows = np.zeros((K, 128), np.float32)
    rows[:, 7] = nxt.view(np.float32)
    rows[:, 0:6] = rng.random((K, 6), np.float32).astype(np.float32)
    for k in range(1, 6):
        rows[:, 7 + 2 * k] = nxt.view(np.float32)
    return jnp.asarray(rows)


def make_kernel(variant):
    def kernel(nodes_ref, x_ref, out_ref):
        x = x_ref[:]

        def cond(c):
            return c[0] < STEPS

        if variant == "chase":
            def body(c):
                i, cur, acc = c
                row = nodes_ref[pl.ds(cur, 1), :]
                return (i + 1, F2I(row)[0, 7], acc)
        elif variant == "reduce":
            def body(c):
                i, cur, acc = c
                row = nodes_ref[pl.ds(cur, 1), :]
                nxt = F2I(row)[0, 7]
                v = (row[0, 0] - x) * (row[0, 3] - x)
                hit = jnp.any(v > 0.2)
                nxt = jnp.where(hit, nxt, nxt)
                acc = acc + jnp.where(hit, 1, 0)
                return (i + 1, nxt, acc)
        elif variant == "extracts":
            def body(c):
                i, cur, acc = c
                row = nodes_ref[pl.ds(cur, 1), :]
                irow = F2I(row)
                s = irow[0, 7]
                for k in range(1, 6):
                    s = jnp.where(i == -k, irow[0, 7 + 2 * k], s)
                    acc = acc + irow[0, 6 + 2 * k]
                return (i + 1, s, acc)
        elif variant == "smt4":
            def body(c):
                i, cur, acc = c
                # cur packs 4 chases started at different nodes
                c0, c1, c2, c3 = cur
                r0 = nodes_ref[pl.ds(c0, 1), :]
                r1 = nodes_ref[pl.ds(c1, 1), :]
                r2 = nodes_ref[pl.ds(c2, 1), :]
                r3 = nodes_ref[pl.ds(c3, 1), :]
                return (i + 1, (F2I(r0)[0, 7], F2I(r1)[0, 7],
                                F2I(r2)[0, 7], F2I(r3)[0, 7]), acc)
        elif variant == "scalar":
            def body(c):
                i, cur, acc = c
                return (i + 1, (cur * 1103515245 + 12345) & (K - 1), acc)
        elif variant == "cond":
            def body(c):
                i, cur, acc = c
                row = nodes_ref[pl.ds(cur, 1), :]
                nxt = F2I(row)[0, 7]
                acc = jax.lax.cond(nxt > K, lambda a: a + 1, lambda a: a, acc)
                return (i + 1, nxt, acc)
        elif variant == "smt4cond":
            def body(c):
                i, cur, acc = c
                c0, c1, c2, c3 = cur
                r0 = nodes_ref[pl.ds(c0, 1), :]
                r1 = nodes_ref[pl.ds(c1, 1), :]
                r2 = nodes_ref[pl.ds(c2, 1), :]
                r3 = nodes_ref[pl.ds(c3, 1), :]
                n = (F2I(r0)[0, 7], F2I(r1)[0, 7],
                     F2I(r2)[0, 7], F2I(r3)[0, 7])
                for q in range(4):
                    acc = jax.lax.cond(
                        n[q] > K, lambda a: a + 1, lambda a: a, acc)
                return (i + 1, n, acc)
        elif variant == "vec2scalar":
            def body(c):
                i, cur, acc = c
                row = nodes_ref[pl.ds(cur, 1), :]
                nxt = F2I(row)[0, 7]
                hit = jnp.any((row - x) > 0.5)
                acc = acc + jnp.where(hit, 1, 0)
                return (i + 1, nxt, acc)
        elif variant == "red_kd":
            # reduce to (8,1) in vector domain, OR the 8 lanes in scalar
            def body(c):
                i, cur, acc = c
                row = nodes_ref[pl.ds(cur, 1), :]
                nxt = F2I(row)[0, 7]
                v = (row - x) > 0.5
                s8 = jnp.sum(jnp.where(v, 1, 0), axis=1, keepdims=True)
                h = s8[0, 0]
                for g in range(1, 8):
                    h = h | s8[g, 0]
                acc = acc + jnp.where(h > 0, 1, 0)
                return (i + 1, nxt, acc)
        elif variant == "red_11":
            def body(c):
                i, cur, acc = c
                row = nodes_ref[pl.ds(cur, 1), :]
                nxt = F2I(row)[0, 7]
                v = (row - x) > 0.5
                s = jnp.sum(jnp.where(v, 1, 0), axis=(0, 1), keepdims=True)
                acc = acc + jnp.where(s[0, 0] > 0, 1, 0)
                return (i + 1, nxt, acc)
        elif variant == "fori":
            def body(c):
                i, cur, acc = c
                row = nodes_ref[pl.ds(cur, 1), :]
                return (i + 1, F2I(row)[0, 7], acc)

            def run_fori():
                def fbody(k, st):
                    cur, acc = st
                    row = nodes_ref[pl.ds(cur, 1), :]
                    return (F2I(row)[0, 7], acc)
                cur, acc = jax.lax.fori_loop(
                    0, STEPS, fbody, (jnp.int32(0), jnp.int32(0)))
                out_ref[:] = x + cur.astype(jnp.float32) + acc
            run_fori.is_full = True
        elif variant == "unroll8":
            def body(c):
                i, cur, acc = c
                for _ in range(8):
                    row = nodes_ref[pl.ds(cur, 1), :]
                    cur = F2I(row)[0, 7]
                return (i + 8, cur, acc)

        if variant == "fori":
            def fbody(k, st):
                cur, acc = st
                row = nodes_ref[pl.ds(cur, 1), :]
                return (F2I(row)[0, 7], acc)
            cur, acc = jax.lax.fori_loop(
                0, STEPS, fbody, (jnp.int32(0), jnp.int32(0)))
            out_ref[:] = x + cur.astype(jnp.float32) + acc
            return
        cur0 = (jnp.int32(0), jnp.int32(1), jnp.int32(2), jnp.int32(3)) \
            if variant.startswith("smt4") else jnp.int32(0)
        out = jax.lax.while_loop(cond, body, (jnp.int32(0), cur0, jnp.int32(0)))
        last = out[1][0] if variant.startswith("smt4") else out[1]
        out_ref[:] = x + last.astype(jnp.float32) + out[2]

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run(nodes, x, variant):
    return pl.pallas_call(
        make_kernel(variant),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(nodes, x)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "chase"
    nodes = build_chain(0)
    x = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def chained():
        acc = jnp.float32(0)
        for i in range(4):
            o = run(nodes, x + acc, variant)
            acc = acc + o[0, 0]
        return acc

    t0 = time.perf_counter()
    _ = float(chained())
    print(f"compile: {time.perf_counter()-t0:.1f}s")
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(chained())
        best = min(best, time.perf_counter() - t0)
    per_iter = best / 4 / STEPS
    chases = 4 if variant.startswith("smt4") else 1
    print(f"{variant}: {per_iter*1e9:.0f} ns/iter "
          f"({per_iter*1e9/chases:.0f} ns/chase)")


if __name__ == "__main__":
    main()
