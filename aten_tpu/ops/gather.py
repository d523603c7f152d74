"""MXU-backed gathers for small tables.

TPU-first design note: the shading core is gather-dominated — resolving
a hit means pulling ~20 per-triangle / per-material attributes by id
(the reference does the same through CUDA texture fetches,
device_scene_context.cuh:30-179, which have dedicated hardware).  The
TPU has no gather hardware: measured on v5e, `jnp.take` chains cost
~9 ms per bounce at 262k lanes while the MXU sits idle.  For SMALL
tables a gather is exactly a one-hot matmul:

    out[n, d] = onehot(idx)[n, k] @ table[k, d]

which the MXU executes orders of magnitude faster (one nonzero per row
-> the f32 result is the exact table row, no accumulation rounding).
Above the size threshold the one-hot work (N*K) stops paying and plain
dynamic gathers win; callers fall back automatically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# one-hot matmul beats jnp.take up to a few thousand rows (measured on
# v5e: crossover well above 1k for the ~20-column tables used here)
MXU_GATHER_MAX_ROWS = 2048


def take_rows(table, idx, *, max_rows=MXU_GATHER_MAX_ROWS):
    """Gather rows of `table` [K, D] (f32) at `idx` [N] -> [N, D].

    Uses a one-hot MXU matmul when K <= max_rows, else jnp.take.
    idx must already be in-range (clip at the call site if needed).
    """
    K = table.shape[0]
    if K > max_rows:
        return jnp.take(table, idx, axis=0)
    oh = jax.nn.one_hot(idx, K, dtype=jnp.float32)
    # precision=HIGHEST: on TPU the default matmul precision feeds the MXU
    # bf16-rounded inputs, which would quantize gathered attributes to 8
    # mantissa bits and corrupt int ids > 256 after the round-trip.  With
    # full precision the one-hot x f32 product is the exact table row.
    return jax.lax.dot_general(
        oh, table.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def take_fields(field_dict, idx, *, int_fields=(), max_rows=MXU_GATHER_MAX_ROWS):
    """Gather a dict of per-row field arrays at `idx` in ONE matmul.

    field_dict: {name: [K] or [K, C] arrays}.  Scalar and vector fields
    are packed into one [K, D] f32 table, gathered together, and
    unpacked; fields named in int_fields are rounded back to int32
    (ids are small integers — exact in f32).  Falls back to per-field
    jnp.take above max_rows.
    """
    K = next(iter(field_dict.values())).shape[0]
    cols = []
    spans = {}
    pos = 0
    for k, v in field_dict.items():
        c = 1 if v.ndim == 1 else v.shape[1]
        cols.append(v.reshape(K, c).astype(jnp.float32))
        spans[k] = (pos, c, v.ndim == 1)
        pos += c
    packed = jnp.concatenate(cols, axis=1)
    # Above the MXU threshold take_rows falls back to ONE jnp.take of the
    # packed table: gather cost is index-count-bound (~5 ms/1M indices on
    # v5e regardless of 1..40 f32 row width, PERF_NOTES_R5), so one
    # D-wide take beats len(field_dict) narrow ones.
    rows = take_rows(packed, idx, max_rows=max_rows)
    out = {}
    for k, (p, c, scalar) in spans.items():
        f = rows[:, p] if scalar else rows[:, p : p + c]
        if k in int_fields:
            f = jnp.round(f).astype(jnp.int32)
        out[k] = f
    return out
