"""Pallas TPU kernel: batched posting-block decode with explicit DMA.

The jnp decoder (ops/decode.py) expresses the block fetch as an XLA row
gather from the (B, stride) block arena. This kernel hand-schedules the same
dataflow: a term's K block rows are CONSECUTIVE in the arena, so each query
needs exactly ONE (K, stride) DMA HBM -> VMEM, decoded in VMEM and written
as (TQ, L) output tiles — explicit fetch/decode overlap that XLA's generic
gather lowering does not provide.

Arena layout: codec/packing.py horizontal bit-packing with power-of-two
byte widths (encode_bulk(byte_align=2)); one block per arena row:
    [header(b | n_blk<<8), anchor, packed bytes...]
The arena must be built with stride_align=128 (Mosaic DMA slices must be
lane-tile aligned) and have >= L//128 trailing slack rows (windows of terms
near the arena end read into the slack; decode masks them out) — see
build_snapshot_arrays(stride_align=128).

The lane interleave runs as a constant permutation MATMUL on the MXU
(decode_blocks_pow2(use_mxu=True)) — the stack+reshape interleave is
rejected by this environment's Mosaic compiler, and the default-precision
f32 matmul is a single bf16 pass that rounds values above 2^8
(Precision.HIGHEST is set inside the decoder).

Falls back to the jnp path off-TPU; `interpret=True` is used by tests on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode import _P2, _P4, decode_blocks_pow2

BLOCK = 128
TQ = 8             # queries per program (sublane-aligned tile)
SLACK_ROWS = 128   # trailing arena slack so clamped (K, stride) windows stay
                   # in bounds for any L up to SLACK_ROWS*128


def _kernel_factory(stride: int, K: int):
    def _kernel(rows_ref, arena_hbm, p4_ref, p2_ref, out_ref, win_scratch, sems):
        """Grid: (Q//TQ,). rows_ref: scalar-prefetched (Q,) int32 FIRST arena
        row of each query's term (blocks are consecutive; K rows arrive in
        one DMA). arena_hbm: (B+slack, stride) block arena (stays in HBM).
        p4_ref/p2_ref: (128, 128) permutation matrices for the MXU byte-plane
        interleave (Pallas kernels cannot capture constants).
        out_ref: (TQ, K*128) output tile in VMEM.
        win_scratch: (TQ, K, stride) landing buffer; sems: (TQ,) DMA."""
        q0 = pl.program_id(0) * TQ

        def make_dma(r):
            row = rows_ref[q0 + r]
            return pltpu.make_async_copy(
                arena_hbm.at[pl.ds(row, K)],
                win_scratch.at[r],
                sems.at[r],
            )

        # all TQ window DMAs in flight at once, then decode as they land
        for r in range(TQ):
            make_dma(r).start()
        for r in range(TQ):
            make_dma(r).wait()

        def body(k, _):
            vals, _nb = decode_blocks_pow2(
                win_scratch[:, k, :], use_mxu=True, perms=(p4_ref[:], p2_ref[:])
            )
            out_ref[:, pl.ds(k * BLOCK, BLOCK)] = vals
            return 0

        jax.lax.fori_loop(0, K, body, 0, unroll=True)

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
    """Pallas twin of ops/decode.gather_postings_arena: (Q, L) values + RAW
    counts. Q must be a multiple of TQ (callers pad); L a multiple of 128.
    `blocks` must include >= L//128 trailing slack rows (the snapshot builder
    adds SLACK_ROWS when stride_align=128).
    """
    assert L % BLOCK == 0
    Q = term_idx.shape[0]
    assert Q % TQ == 0, f"Q={Q} must be a multiple of {TQ}"
    K = L // BLOCK
    assert K <= SLACK_ROWS
    stride = int(blocks.shape[1])

    row0 = term_block_start[term_idx].astype(jnp.int32)  # (Q,)
    n = counts[term_idx]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q // TQ,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # arena stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P4 permutation
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P2 permutation
        ],
        out_specs=pl.BlockSpec(
            (TQ, L), lambda i, rows_ref: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TQ, K, stride), jnp.uint32),
            pltpu.SemaphoreType.DMA((TQ,)),
        ],
    )
    vals = pl.pallas_call(
        _kernel_factory(stride, K),
        out_shape=jax.ShapeDtypeStruct((Q, L), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(row0, blocks, jnp.asarray(_P4), jnp.asarray(_P2))
    return vals, n
