"""Pallas TPU kernel: batched posting-block decode with explicit DMA.

The jnp decoder (ops/decode.py) expresses the block fetch as an XLA row
gather from the (B, stride) block arena. This kernel hand-schedules the same
dataflow: each query tile's block rows are streamed HBM -> VMEM with
double-buffered async copies (row indices scalar-prefetched into SMEM),
decoded in VMEM with the VPU (static byte-aligned extraction), and written as
the (TQ, L) output tile — overlap of fetch and decode that XLA's generic
gather lowering does not guarantee.

Arena layout: codec/packing.py horizontal bit-packing with byte-aligned
widths (encode_bulk(byte_align=True)); one block per arena row:
    [header(b | n_blk<<8), anchor, packed bytes...]

Falls back to the jnp path off-TPU; `interpret=True` is used by tests on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode import decode_blocks_ba

BLOCK = 128
TQ = 8             # queries per program (sublane-aligned tile)


def _kernel_factory(stride: int, K: int):
    def _kernel(rows_ref, arena_hbm, out_ref, win_scratch, sems):
        """Grid: (Q//TQ,). rows_ref: scalar-prefetched (Q, K) int32 arena row
        indexes. arena_hbm: (B, stride) block arena (stays in HBM).
        out_ref: (TQ, K*128) output tile in VMEM.
        win_scratch: (2, TQ, stride) double buffer; sems: (2, TQ) DMA sems."""
        q0 = pl.program_id(0) * TQ

        def make_dma(slot, r, k):
            row = rows_ref[q0 + r, k]
            return pltpu.make_async_copy(
                arena_hbm.at[row],
                win_scratch.at[slot, r],
                sems.at[slot, r],
            )

        def start(slot, k):
            for r in range(TQ):  # static unroll: one row DMA per query
                make_dma(slot, r, k).start()

        def wait(slot, k):
            for r in range(TQ):
                make_dma(slot, r, k).wait()

        start(0, 0)

        def body(k, _):
            slot = jax.lax.rem(k, 2)
            nxt = jax.lax.rem(k + 1, 2)

            @pl.when(k + 1 < K)
            def _():
                start(nxt, k + 1)

            wait(slot, k)
            vals, _ = decode_blocks_ba(win_scratch[slot])
            out_ref[:, pl.ds(k * BLOCK, BLOCK)] = vals
            return 0

        jax.lax.fori_loop(0, K, body, 0, unroll=False)

    return _kernel


@functools.partial(jax.jit, static_argnames=("L", "interpret"))
def decode_postings_pallas(
    blocks: jnp.ndarray,
    term_block_start: jnp.ndarray,
    counts: jnp.ndarray,
    term_idx: jnp.ndarray,
    L: int,
    interpret: bool = False,
):
    """Pallas twin of ops/decode.gather_postings_arena: (Q, L) values + counts.

    Q must be a multiple of TQ (callers pad); L a multiple of 128.
    """
    assert L % BLOCK == 0
    Q = term_idx.shape[0]
    assert Q % TQ == 0, f"Q={Q} must be a multiple of {TQ}"
    K = L // BLOCK
    stride = int(blocks.shape[1])

    tbs = term_block_start[term_idx]
    n = counts[term_idx]
    nb = (n + BLOCK - 1) // BLOCK
    k = jnp.arange(K, dtype=jnp.int32)
    rows = (tbs[:, None] + jnp.minimum(k[None, :], jnp.maximum(nb[:, None] - 1, 0))).astype(
        jnp.int32
    )  # (Q, K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q // TQ,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # arena stays in HBM
        out_specs=pl.BlockSpec(
            (TQ, L), lambda i, rows_ref: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TQ, stride), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, TQ)),
        ],
    )
    vals = pl.pallas_call(
        _kernel_factory(stride, K),
        out_shape=jax.ShapeDtypeStruct((Q, L), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rows, blocks)
    return vals, jnp.minimum(n, L)
