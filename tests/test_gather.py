"""MXU one-hot gather must be bit-exact even under low matmul precision.

Regression test for the TPU default-precision hazard: without
precision=HIGHEST the MXU rounds f32 operands to bfloat16, quantizing
gathered attributes to 8 mantissa bits and corrupting int ids > 256
(tri_start, texture ids, ...) after jnp.round.  CPU runs can't see the
bug natively, so we force jax_default_matmul_precision='bfloat16' here.
"""
import jax
import jax.numpy as jnp
import numpy as np

from aten_tpu.ops.gather import take_fields, take_rows


def test_take_rows_exact_under_bf16_default_precision():
    rng = np.random.default_rng(0)
    K, D, N = 1024, 24, 333
    table = jnp.asarray(rng.standard_normal((K, D)) * 1e3, jnp.float32)
    idx = jnp.asarray(rng.integers(0, K, size=N), jnp.int32)
    with jax.default_matmul_precision("bfloat16"):
        out = jax.jit(take_rows)(table, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[np.asarray(idx)])


def test_take_fields_int_ids_above_256_survive():
    rng = np.random.default_rng(1)
    K, N = 2000, 257
    # int ids well above 256: one bf16 ulp at 1000 is 4, so any rounding
    # through bf16 would shift ids by whole units and fail exact equality.
    ids = jnp.asarray(rng.integers(0, 200_000, size=K), jnp.int32)
    vals = jnp.asarray(rng.standard_normal((K, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, K, size=N), jnp.int32)
    with jax.default_matmul_precision("bfloat16"):
        out = jax.jit(
            lambda i: take_fields({"tri_start": ids, "pos": vals}, i,
                                  int_fields=("tri_start",))
        )(idx)
    np.testing.assert_array_equal(
        np.asarray(out["tri_start"]), np.asarray(ids)[np.asarray(idx)]
    )
    np.testing.assert_array_equal(
        np.asarray(out["pos"]), np.asarray(vals)[np.asarray(idx)]
    )
