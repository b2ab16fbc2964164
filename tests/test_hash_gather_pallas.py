"""Interpret-mode correctness of the DMA-pipelined Pallas row gather."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.ops.hash_gather import BLOCK_ROWS, gather_rows_pallas


def test_gather_rows_matches_plain_indexing():
    rng = np.random.RandomState(0)
    T, W = 4096, 16
    table = jnp.asarray(rng.randn(T, W), jnp.float32)
    idx = jnp.asarray(rng.randint(0, T, (2 * BLOCK_ROWS,)), jnp.int32)
    got = np.asarray(gather_rows_pallas(table, idx, interpret=True))
    want = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_allclose(got, want)


def test_gather_rows_repeated_indices():
    """Pipeline slots must not corrupt repeated / adjacent rows."""
    rng = np.random.RandomState(1)
    T, W = 64, 8
    table = jnp.asarray(rng.randn(T, W), jnp.float32)
    idx = jnp.asarray(np.arange(BLOCK_ROWS) % 3, jnp.int32)  # heavy repeats
    got = np.asarray(gather_rows_pallas(table, idx, interpret=True))
    want = np.asarray(table)[np.asarray(idx)]
    np.testing.assert_allclose(got, want)
