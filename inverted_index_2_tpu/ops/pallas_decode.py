"""Pallas TPU kernel: batched posting-block decode with explicit DMA.

The jnp decoder (ops/decode.py) expresses the block gather as one big XLA
gather from HBM. This kernel instead streams each query's block windows
HBM -> VMEM with double-buffered async copies (offsets scalar-prefetched into
SMEM), decodes in VMEM with the VPU, and writes the (TQ, L) tile — the
hand-scheduled version of the same dataflow, avoiding the materialized
(Q, K, WIN) gather intermediate in HBM.

Wire layout: codec/packing.py horizontal bit-packing
    [header(b | n_blk<<8), anchor, ceil((n_blk-1)*b/32) packed words]
Decode per lane j (0..127): d_j = (packed >> (j*b)) & ((1<<b)-1) via a
double-word fetch, then v = anchor + cumsum(d + 1).

Falls back to the jnp path off-TPU; `interpret=True` is used by tests on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
WIN = 130          # header + anchor + up to 127 packed + 1 slack
WIN_PAD = 256      # VMEM row width (lane-aligned)
TQ = 8             # queries per program (sublane-aligned tile)


def _decode_tile(window: jnp.ndarray) -> jnp.ndarray:
    """(TQ, WIN_PAD) uint32 window rows -> (TQ, 128) decoded values."""
    header = window[:, 0]
    b = (header & 0xFF).astype(jnp.int32)              # (TQ,)
    anchor = window[:, 1]
    j = jax.lax.broadcasted_iota(jnp.int32, (TQ, BLOCK), 1)
    bitpos = j * b[:, None]
    w0 = 2 + (bitpos >> 5)                              # (TQ, 128)
    s = (bitpos & 31).astype(jnp.uint32)
    g0 = jnp.take_along_axis(window, w0, axis=1)
    g1 = jnp.take_along_axis(window, w0 + 1, axis=1)
    lo = g0 >> s
    hi = jnp.where(s > 0, g1 << (jnp.uint32(32) - s), jnp.uint32(0))
    mask = jnp.where(
        b > 0,
        jnp.uint32(0xFFFFFFFF) >> (jnp.uint32(32) - jnp.minimum(b, 32).astype(jnp.uint32)),
        jnp.uint32(0),
    )
    d = (lo | hi) & mask[:, None]
    steps = d[:, : BLOCK - 1] + jnp.uint32(1)
    csum = jnp.cumsum(steps, axis=1, dtype=jnp.uint32)
    return anchor[:, None] + jnp.concatenate(
        [jnp.zeros((TQ, 1), dtype=jnp.uint32), csum], axis=1
    )


def _kernel(woff_ref, words_hbm, out_ref, win_scratch, sems):
    """Grid: (Q//TQ,). woff_ref: scalar-prefetched (Q, K) int32 window offsets.
    words_hbm: full packed words array (stays in HBM/ANY; rows DMA'd here).
    out_ref: (TQ, L) output tile in VMEM.
    win_scratch: (2, TQ, WIN_PAD) double buffer. sems: (2, TQ) DMA semaphores.
    """
    q0 = pl.program_id(0) * TQ
    K = out_ref.shape[1] // BLOCK

    def start(slot, k):
        for r in range(TQ):  # static unroll: TQ row DMAs per block column
            off = woff_ref[q0 + r, k]
            cp = pltpu.make_async_copy(
                words_hbm.at[pl.ds(off, WIN)],
                win_scratch.at[slot, r, pl.ds(0, WIN)],
                sems.at[slot, r],
            )
            cp.start()

    def wait(slot, k):
        for r in range(TQ):
            off = woff_ref[q0 + r, k]
            pltpu.make_async_copy(
                words_hbm.at[pl.ds(off, WIN)],
                win_scratch.at[slot, r, pl.ds(0, WIN)],
                sems.at[slot, r],
            ).wait()

    start(0, 0)

    def body(k, _):
        slot = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)

        @pl.when(k + 1 < K)
        def _():
            start(nxt, k + 1)

        wait(slot, k)
        vals = _decode_tile(win_scratch[slot])
        out_ref[:, pl.ds(k * BLOCK, BLOCK)] = vals
        return 0

    jax.lax.fori_loop(0, K, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("L", "interpret"))
def decode_postings_pallas(
    words: jnp.ndarray,
    block_woff: jnp.ndarray,
    term_block_start: jnp.ndarray,
    counts: jnp.ndarray,
    term_idx: jnp.ndarray,
    L: int,
    interpret: bool = False,
):
    """Pallas twin of ops/decode.gather_postings: (Q, L) values + counts.

    Q must be a multiple of TQ (callers pad); L a multiple of 128.
    """
    assert L % BLOCK == 0
    Q = term_idx.shape[0]
    assert Q % TQ == 0, f"Q={Q} must be a multiple of {TQ}"
    K = L // BLOCK

    # window offsets per (query, block column), computed in plain XLA and
    # scalar-prefetched into SMEM for DMA addressing
    tbs = term_block_start[term_idx]
    n = counts[term_idx]
    nb = (n + BLOCK - 1) // BLOCK
    k = jnp.arange(K, dtype=jnp.int32)
    g = tbs[:, None] + jnp.minimum(k[None, :], jnp.maximum(nb[:, None] - 1, 0))
    woff = block_woff[g].astype(jnp.int32)  # (Q, K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q // TQ,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # words stay in HBM
        out_specs=pl.BlockSpec(
            (TQ, L), lambda i, woff_ref: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TQ, WIN_PAD), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, TQ)),
        ],
    )
    vals = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Q, L), jnp.uint32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(woff, words)
    return vals, jnp.minimum(n, L)
