"""Pallas TPU kernel: batched sorted-set AND (boolean intersection).

The XLA path (ops/setops.intersect_many) intersects K sorted posting lists
per query with ONE sort of the (Q, K*L) concatenation — correct, but the
bitonic sort is HBM-bound on TPU (~60ms of a 107ms config-3 batch at
Q=2048, K=8, L=2048). This kernel replaces the sort with VMEM-resident
broadcast membership: for each query the K lists sit in VMEM, and base-list
membership in every other list is a pure VPU compare-reduce — no sort, no
HBM round trips, no gathers (reference behavior being matched: pairwise
union/member semantics of MergeTermValues, /root/reference/file/types.go).

Mosaic notes (this environment's compiler):
 * lists are fed as (Q, K, C, 128) — the chunk axis must NOT be the lane
   axis, because dynamic lane-offset vector loads fail to legalize;
 * lax.cond fails to legalize ('scf.if') — inactive pairs are computed and
   masked instead;
 * scalar VMEM stores are rejected — per-query counts are broadcast across
   a 128-lane row;
 * fully unrolling the TQ*K*C loop nest (~900 compare blocks) stalls the
   remote compiler — pair/chunk loops are lax.fori_loop.

Output convention matches setops.intersect_many: (Q, L) values compacted
ascending (SENTINEL-padded) + out_counts (Q,). Compaction happens OUTSIDE
the kernel with a (Q, L) jnp.sort of the SENTINEL-masked base (16x smaller
than the (Q, K*L) sort it replaces); genuine 0xFFFFFFFF values stay correct
because the kernel emits exact counts.

STATUS: design-ladder artifact, bit-identical to setops.intersect_many and
4.3x faster than it standalone on-chip — but NOT the production path: its
win evaporates end to end because the XLA decode feeding it costs as much
as the sort it removes (PERFORMANCE.md). Production AND is the FUSED
kernel (ops/pallas_fused.py), which decodes in-kernel. This kernel has no
off-TPU fallback: off-TPU callers must pass interpret=True (as the tests
do); setops.intersect_many is the XLA twin to use instead.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SENT = np.uint32(0xFFFFFFFF)  # numpy literal: Pallas kernels cannot
                               # capture traced (jnp) constants

TQ = 8        # queries per program (sublane-aligned tile)
CHUNK = 128   # lane-width chunk of the probed list


def _kernel_factory(K: int, C: int):
    def _kernel(counts_ref, kvalid_ref, lists_ref, out_ref, cnt_ref):
        """Grid: (Q//TQ,). counts_ref (Q*K,) i32 (flat — 2D SMEM operands
        are lane-padded 8->128 and overflow the 1MB SMEM at Q=2048) +
        kvalid_ref (Q,) i32, both scalar-prefetched. lists_ref:
        (TQ, K, C, 128) u32, each (C, 128) row sorted ascending in
        row-major order. out_ref: (TQ, C, 128) u32 masked base;
        cnt_ref: (TQ, 128) i32 keep counts (all lanes equal)."""
        q0 = pl.program_id(0) * TQ
        # base element positions in row-major (C, 128) order
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (C, CHUNK), 0) * CHUNK
            + jax.lax.broadcasted_iota(jnp.int32, (C, CHUNK), 1)
        )
        # probe-chunk element index along the SUBLANE axis of the (C, S, B)
        # compare (reducing over lanes is a cross-lane shuffle cascade;
        # sublane reduction is the cheap direction)
        sid = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK, 1), 1)

        for r in range(TQ):
            q = q0 + r
            base = lists_ref[r, 0]                          # (C, 128)
            n0 = counts_ref[q * K]
            kv = kvalid_ref[q]
            # loop carries are int32 0/1 masks: Mosaic fails to legalize
            # scf.for with vector<i1> carries
            keep0 = (pos < n0).astype(jnp.int32)            # (C, 128)

            def jbody(j, keep, r=r, q=q, base=base):
                nj = counts_ref[q * K + j]

                def cbody(c, hit, r=r, j=j, nj=nj, base=base):
                    ch = lists_ref[r, j, c]                 # (128,)
                    cvalid = (sid + c * CHUNK) < nj         # (1, 128, 1)
                    # probe chunk on sublanes, base lanes intact:
                    # (C, S=128, B=128), reduced over sublanes
                    eq = base[:, None, :] == ch[None, :, None]
                    return hit | jnp.any(eq & cvalid, axis=1).astype(jnp.int32)

                # dynamic trip count: only the chunks nj actually covers
                # (mean posting length ~1k fills half of L=2048)
                hit = jax.lax.fori_loop(
                    0,
                    (nj + CHUNK - 1) // CHUNK,
                    cbody,
                    jnp.zeros((C, CHUNK), dtype=jnp.int32),
                )
                return keep & hit

            # dynamic pair bound: queries carry 2..K terms (mean ~5)
            keep = jax.lax.fori_loop(1, kv, jbody, keep0) > 0
            out_ref[r] = jnp.where(keep, base, _SENT)
            cnt_ref[r, :] = jnp.full(
                (CHUNK,), jnp.sum(keep.astype(jnp.int32)), dtype=jnp.int32
            )

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_pallas(
    lists: jnp.ndarray,
    counts: jnp.ndarray,
    k_valid: jnp.ndarray,
    interpret: bool = False,
):
    """Pallas twin of setops.intersect_many: AND of K sorted lists per query.

    lists: (Q, K, L) sorted rows; counts: (Q, K) i32; k_valid: (Q,) i32.
    Q must be a multiple of TQ (callers pad); L a multiple of 128.
    Returns (vals (Q, L) compacted ascending, out_counts (Q,) i32).
    """
    Q, K, L = lists.shape
    assert Q % TQ == 0, f"Q={Q} must be a multiple of {TQ}"
    assert L % CHUNK == 0
    C = L // CHUNK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Q // TQ,),
        in_specs=[
            pl.BlockSpec(
                (TQ, K, C, CHUNK), lambda i, c_ref, k_ref: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (TQ, C, CHUNK), lambda i, c_ref, k_ref: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TQ, CHUNK), lambda i, c_ref, k_ref: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    masked, cnt = pl.pallas_call(
        _kernel_factory(K, C),
        out_shape=[
            jax.ShapeDtypeStruct((Q, C, CHUNK), jnp.uint32),
            jax.ShapeDtypeStruct((Q, CHUNK), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        counts.astype(jnp.int32).reshape(Q * K),
        k_valid.astype(jnp.int32),
        lists.reshape(Q, K, C, CHUNK),
    )
    return jnp.sort(masked.reshape(Q, L), axis=1), cnt[:, 0]
