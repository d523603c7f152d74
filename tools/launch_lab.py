"""Measure fixed overhead: per jit dispatch vs per pallas launch vs grid size."""
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


def make_kernel(steps):
    def kernel(x_ref, out_ref):
        def body(c):
            i, cur, acc = c
            return (i + 1, (cur * 1103515245 + 12345) & 1023, acc)

        out = jax.lax.while_loop(lambda c: c[0] < steps, body,
                                 (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        out_ref[:] = x_ref[:] + out[1].astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("steps", "nlaunch", "grid"))
def run(x, steps, nlaunch, grid):
    for _ in range(nlaunch):
        x = pl.pallas_call(
            make_kernel(steps),
            grid=(grid,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)
    return x


def timeit(steps, nlaunch, grid):
    x = jnp.ones((8, 128), jnp.float32)
    _ = np.asarray(run(x, steps, nlaunch, grid))[0, 0]
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(run(x, steps, nlaunch, grid))[0, 0]
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    base = timeit(1, 1, 1)
    print(f"1 launch, 1 grid step, 1 iter: {base*1e3:.2f} ms")
    for nl in (2, 4, 8):
        t = timeit(1, nl, 1)
        print(f"{nl} launches: {t*1e3:.2f} ms  (delta/launch "
              f"{(t-base)/(nl-1)*1e3:.3f} ms)")
    for g in (64, 256, 1024):
        t = timeit(1, 1, g)
        print(f"grid={g}: {t*1e3:.2f} ms (delta/step "
              f"{(t-base)/(g-1)*1e6:.2f} us)")
    for s in (1024, 8192):
        t = timeit(s, 1, 1)
        print(f"steps={s}: {t*1e3:.2f} ms (delta/iter "
              f"{(t-base)/s*1e9:.1f} ns)")


if __name__ == "__main__":
    main()
