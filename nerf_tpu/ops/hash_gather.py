"""Pallas DMA-pipelined hash-table row gather — the kernel-level experiment
behind the hash-encoder performance story (VERDICT r3 #3).

The reference's CUDA hash encoder
(src/models/encoding/hashencoder/src/hashencoder.cu:78 ``kernel_grid``,
:201 ``kernel_grid_backward``) is a warp-coalesced random-row
gather/scatter-add; its TPU-native analog must answer: can a hand-written
kernel beat XLA's native gather at fetching millions of random narrow rows?

Structural facts that bound the design space on this hardware generation
(evidence: jax/_src/pallas/mosaic/lowering.py ``_gather_lowering_rule``):

- Mosaic's only vector-gather primitive is ``tpu.dynamic_gather`` via
  ``jnp.take_along_axis`` with indices shaped like the operand — a per-lane
  SUBLANE shuffle. A 2^19-row hash level cannot be vector-gathered from
  VMEM; there is no hardware equivalent of the GPU's per-thread random
  load.
- A VMEM-resident table therefore only admits per-row scalar/dynamic-slice
  access (serial) or one-hot MXU contraction (O(N*T) FLOPs — 400+ TFLOP
  per encode at hash sizes; non-starter).
- What remains is the DMA path: the table stays in HBM and a kernel issues
  one async copy per row, pipelined N_BUF deep — this file. The comparison
  against XLA's gather (which drives the same underlying hardware with
  batched descriptors) is the measurement that closes the question.

``gather_rows_pallas(table, idx)`` == ``table[idx]`` for a 2D f32/bf16
table. Correctness is interpret-tested on CPU
(tests/test_hash_gather_pallas.py); scripts/diag_hash_r4.py measures it
against the XLA gather on the TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows gathered per grid step (output block sublanes) and DMA pipeline depth
BLOCK_ROWS = 512
N_BUF = 8


def _gather_kernel(idx_ref, table_ref, out_ref, scratch, sems):
    """One grid step: gather BLOCK_ROWS rows of ``table_ref`` (HBM) into
    ``out_ref`` (VMEM) through an N_BUF-deep async-copy pipeline."""
    block = pl.program_id(0)
    base = block * BLOCK_ROWS

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[base + i], 1), :],
            scratch.at[pl.ds(slot, 1), :],
            sems.at[slot],
        )

    # warm-up: fill the pipeline
    for j in range(N_BUF):
        get_dma(j, j).start()

    def body(i, _):
        slot = jax.lax.rem(i, N_BUF)
        get_dma(slot, i).wait()
        out_ref[pl.ds(i, 1), :] = scratch[pl.ds(slot, 1), :]

        @pl.when(i + N_BUF < BLOCK_ROWS)
        def _():
            get_dma(slot, i + N_BUF).start()

        return 0

    jax.lax.fori_loop(0, BLOCK_ROWS, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(table: jnp.ndarray, idx: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """table: [T, W]; idx: [N] int32 (N % BLOCK_ROWS == 0) -> [N, W]."""
    n = idx.shape[0]
    assert n % BLOCK_ROWS == 0, f"N must be a multiple of {BLOCK_ROWS}"
    w = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # idx lives in SMEM, visible to index math
        grid=(n // BLOCK_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table in HBM
        out_specs=pl.BlockSpec(
            (BLOCK_ROWS, w), lambda b, idx_ref: (b, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, w), table.dtype),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        interpret=interpret,
    )(idx, table)
