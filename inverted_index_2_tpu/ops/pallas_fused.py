"""Pallas TPU kernel: FUSED decode + boolean AND over the block arena.

The two-stage AND pipeline (XLA row-gather decode to (Q*K, L), then a set
op — boolean_step) pays three times for padding: the decode gathers L slots
per term regardless of its real length, the set op sorts or compares padded
volume, and any term longer than L clips the whole query into a ladder
re-serve at 4x the cost (measured re-serve fraction 0.48 at L=2048 on the
config-3 shape, mean posting length 1k).

This kernel replaces the pipeline for AND queries:

  * the BASE list (slot 0 — the host reorders each query so slot 0 is its
    SMALLEST term; an AND result is a subset of every input list) is
    DMA'd from the arena and decoded into VMEM at pad L;
  * every PROBE list is walked in GP-block groups to its FULL length —
    DMA group -> decode in VMEM (MXU permutation interleave, same path as
    ops/pallas_decode) -> broadcast membership compare against the base —
    no L bound, no truncation, no HBM round trip for decoded values;
  * a query re-serves only when its SMALLEST list exceeds L:
    P(min > L) ~ P(single > L)^k, so the 0.48 re-serve fraction collapses
    to ~2% at k=2 (and vanishes for wider queries).

Reference behavior matched: pairwise member semantics of MergeTermValues
(/root/reference/file/types.go) with merge-only tombstone purge left to the
caller's filter step. Arena requirements: build_snapshot_arrays(
stride_align=128) — lane-aligned rows for in-kernel DMA slices, with
trailing slack rows covering the group overrun (SLACK_ROWS >= GP).

Mosaic notes: see ops/pallas_bool.py (lane-axis layout, no lax.cond, i32
loop carries, flat SMEM prefetch operands, sublane-direction reductions).

Falls back to the jnp path off-TPU; `interpret=True` is used by tests on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode import _P2, _P4, decode_blocks_pow2

_SENT = np.uint32(0xFFFFFFFF)

TQ = 8        # queries per program
CHUNK = 128   # values per block
GP = 16       # probe blocks fetched per DMA group (covers the mean config-3
              # list in one group; overruns land in the arena slack rows)
BG0 = 4       # base chunks per compare group (bounds compare volume by the
              # BASE list's real length, not the static pad C)
PP = 4        # probe chunks folded into one compare op (op-issue bound)


def _kernel_factory(K: int, C: int, stride: int, prune: bool = False):
    BG = min(BG0, C)  # base group cannot exceed the pad
    # base_buf/hit_buf rows pad to a BG multiple so the LAST base window
    # [bs, bs+BG) stays in bounds when C % BG != 0 (ladder levels like
    # C=17); rows >= C hold garbage whose hits land in hit rows >= C,
    # which are never read back
    CP = -(-C // BG) * BG
    NBG_MAX = CP // BG
    def _kernel(rows_ref, counts_ref, kvalid_ref, arena, p4_ref, p2_ref,
                out_ref, cnt_ref, base_win, probe_win, probe_pre, pv_buf,
                base_buf, hit_buf, sems, psems):
        """Grid: (Q//TQ,). rows_ref/counts_ref (Q*K,) i32 + kvalid_ref (Q,)
        i32 scalar-prefetched (slot 0 = smallest list per query). arena:
        (B+slack, stride) u32 in HBM. out_ref: (TQ, C, 128) masked base;
        cnt_ref: (TQ, 128) keep counts. base_win (C, stride) / probe_win
        (GP, stride) DMA landing buffers; base_buf (C, 128) decoded base
        (a VMEM ref so base GROUPS can be sliced at dynamic offsets);
        hit_buf (C, 128) i32 per-pair hit accumulator (dynamic-offset
        read-modify-write); sems: (2,) DMA."""
        q0 = pl.program_id(0) * TQ
        perms = (p4_ref[:], p2_ref[:])
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (C, CHUNK), 0) * CHUNK
            + jax.lax.broadcasted_iota(jnp.int32, (C, CHUNK), 1)
        )
        # probe element index within a PP-chunk op-group: chunk id on axis
        # 1, lane on axis 2 (sublane-direction reductions stay cheap)
        pid = (
            jax.lax.broadcasted_iota(jnp.int32, (1, PP, CHUNK, 1), 1) * CHUNK
            + jax.lax.broadcasted_iota(jnp.int32, (1, PP, CHUNK, 1), 2)
        )
        # flat element index over one PP-chunk probe group (bounds masking)
        gid = (
            jax.lax.broadcasted_iota(jnp.int32, (PP, CHUNK), 0) * CHUNK
            + jax.lax.broadcasted_iota(jnp.int32, (PP, CHUNK), 1)
        )
        # anchor-word positions in a base window: word 1 of each block row
        # (codec/packing.py block layout [header, anchor, planes...]) —
        # full-(C, stride) masks keep layouts Mosaic-friendly (width-1 lane
        # slices risk the (C,)->(C,1) relayout crash, see ops/pallas_bool.py)
        lane_cs = jax.lax.broadcasted_iota(jnp.int32, (C, stride), 1)
        row_cs = jax.lax.broadcasted_iota(jnp.int32, (C, stride), 0)

        # ALL TQ base windows DMA'd in flight, then ONE batched decode:
        # a per-query decode of (C, 128) is 2-vreg ops at full issue cost
        # (measured ~17us/query of pure overhead); batching across the
        # tile amortizes it 8x
        def base_dma(r):
            return pltpu.make_async_copy(
                arena.at[pl.ds(rows_ref[(q0 + r) * K], C)],
                base_win.at[r],
                sems.at[r],
            )

        for r in range(TQ):
            base_dma(r).start()
        for r in range(TQ):
            base_dma(r).wait()
        bases, _ = decode_blocks_pow2(
            base_win[:], use_mxu=True, perms=perms
        )                                                   # (TQ, C, 128)
        base_buf[:, pl.ds(0, C), :] = bases

        for r in range(TQ):
            q = q0 + r
            n0 = counts_ref[q * K]
            kv = kvalid_ref[q]
            base = base_buf[r, pl.ds(0, C), :]              # (C, 128)
            keep0 = (pos < n0).astype(jnp.int32)
            # STAIRCASE PRUNING state: the flipped (sign-flip bitcast —
            # Mosaic has no unsigned compares/reductions) base window words
            # plus a mask selecting the LIVE anchor words. A probe group's
            # overlapping base span is then two masked-count reductions
            # (vector searchsorted): base chunks are value-ascending, so
            # "chunks with anchor <= x" is a prefix whose length is the
            # count. Compare volume collapses from the full base x probe
            # cross to the merge staircase of the two sorted lists.
            wf = jax.lax.bitcast_convert_type(
                base_win[r] ^ np.uint32(0x80000000), jnp.int32
            )                                               # (C, stride)
            nb0c = jnp.minimum((n0 + CHUNK - 1) // CHUNK, C)
            is_anchor = (lane_cs == 1) & (row_cs < nb0c)    # (C, stride)

            # hide probe-DMA latency AND decode-op overhead: every pair's
            # FIRST group goes in flight before the pair loop, then ONE
            # batched decode covers all of them (the mean config-3 list
            # fits one GP group, so most pairs never issue a serial
            # follow-up DMA and never decode again)
            def pre_dma(j1):
                return pltpu.make_async_copy(
                    arena.at[pl.ds(rows_ref[q * K + j1], GP)],
                    probe_pre.at[j1 - 1],
                    psems.at[j1 - 1],
                )

            for j1 in range(1, K):
                @pl.when(j1 < kv)
                def _(j1=j1):
                    pre_dma(j1).start()

            for j1 in range(1, K):
                @pl.when(j1 < kv)
                def _(j1=j1):
                    pre_dma(j1).wait()

            pv_all, _ = decode_blocks_pow2(
                probe_pre[:], use_mxu=True, perms=perms
            )                                               # (K-1, GP, 128)
            pv_buf[:] = pv_all

            def jbody(j, keep, r=r, q=q, wf=wf, is_anchor=is_anchor):
                nj = counts_ref[q * K + j]
                rj = rows_ref[q * K + j]
                ngrp = (nj + GP * CHUNK - 1) // (GP * CHUNK)
                hit_buf[:] = jnp.zeros((CP, CHUNK), dtype=jnp.int32)

                def probe_block(pv, g, carry, r=r, nj=nj, wf=wf,
                                is_anchor=is_anchor):
                    pvf = jax.lax.bitcast_convert_type(
                        pv ^ np.uint32(0x80000000), jnp.int32
                    )                                       # (GP, 128)
                    for p in range(0, GP, PP):
                        # PP chunks per compare op (op-issue bound); skip
                        # op-groups past the list's real length, and for
                        # live groups compare ONLY against the base window
                        # span [s0, e) their value range can intersect
                        @pl.when((g * GP + p) * CHUNK < nj)
                        def _(p=p, pv=pv, pvf=pvf, g=g, nj=nj, r=r, wf=wf,
                              is_anchor=is_anchor):
                            grp = pvf[p:p + PP]             # (PP, 128) i32
                            gvalid = (gid + (g * GP + p) * CHUNK) < nj
                            lo_f = jnp.min(jnp.where(
                                gvalid, grp, jnp.int32(0x7FFFFFFF)))
                            hi_f = jnp.max(jnp.where(
                                gvalid, grp, jnp.int32(-0x80000000)))
                            # base chunks are value-ascending: chunks with
                            # anchor <= lo form a prefix; the last of them
                            # is the first that can contain lo. Chunks past
                            # e (anchor > hi) start above the group's max.
                            if prune:
                                s_cnt = jnp.sum(
                                    ((wf <= lo_f) & is_anchor).astype(jnp.int32))
                                e_cnt = jnp.sum(
                                    ((wf <= hi_f) & is_anchor).astype(jnp.int32))
                                s0 = jnp.maximum(s_cnt - 1, 0) // BG * BG
                                ng = jnp.minimum(
                                    jnp.maximum((e_cnt - s0 + BG - 1) // BG, 0),
                                    NBG_MAX,
                                )
                            else:  # A/B baseline: full cross, no staircase
                                s0 = jnp.int32(0)
                                ng = jnp.minimum(
                                    (nb0c + BG - 1) // BG, NBG_MAX)
                            ch = pv[p:p + PP]               # (PP, 128)
                            cvalid = (
                                pid + (g * GP + p) * CHUNK
                            ) < nj                          # (1, PP, 128, 1)

                            def bgbody(t, c2, r=r, ch=ch, cvalid=cvalid,
                                       s0=s0):
                                bs = s0 + t * BG
                                base_g = base_buf[r, pl.ds(bs, BG), :]
                                eq = (
                                    base_g[:, None, None, :]
                                    == ch[None, :, :, None]
                                )                           # (BG, PP, 128, 128)
                                hit_buf[pl.ds(bs, BG), :] = hit_buf[
                                    pl.ds(bs, BG), :
                                ] | jnp.any(
                                    eq & cvalid, axis=(1, 2)
                                ).astype(jnp.int32)
                                return c2

                            jax.lax.fori_loop(0, ng, bgbody, jnp.int32(0))
                    return carry

                probe_block(pv_buf[jnp.maximum(j - 1, 0)], 0, jnp.int32(0))

                def gbody(g, carry, rj=rj, nj=nj):
                    pdma = pltpu.make_async_copy(
                        arena.at[pl.ds(rj + g * GP, GP)], probe_win,
                        sems.at[TQ],
                    )
                    pdma.start()
                    pdma.wait()
                    pv, _ = decode_blocks_pow2(
                        probe_win[:], use_mxu=True, perms=perms
                    )                                       # (GP, 128)
                    return probe_block(pv, g, carry)

                jax.lax.fori_loop(1, ngrp, gbody, jnp.int32(0))
                return keep & hit_buf[pl.ds(0, C), :]

            keep = jax.lax.fori_loop(1, kv, jbody, keep0) > 0
            out_ref[r] = jnp.where(keep, base, _SENT)
            cnt_ref[r, :] = jnp.full(
                (CHUNK,), jnp.sum(keep.astype(jnp.int32)), dtype=jnp.int32
            )

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("L", "compact", "interpret", "prune")
)
def fused_and_pallas(
    blocks: jnp.ndarray,
    rows: jnp.ndarray,
    counts: jnp.ndarray,
    k_valid: jnp.ndarray,
    L: int,
    compact: bool = True,
    interpret: bool = False,
    prune: bool = False,
):
    """AND over arena-resident posting lists, decode fused in-kernel.

    blocks: (B+slack, stride) u32 arena (stride_align=128, slack >= GP).
    rows:   (Q, K) i32 first arena row per term; slot 0 = SMALLEST list
            (callers reorder); 0 for missing terms.
    counts: (Q, K) i32 raw counts; 0 for missing terms (a missing required
            term empties the AND by contributing an empty base/probe).
    k_valid: (Q,) i32 number of terms per query (>= 1).
    L: static base pad (multiple of 128). Probe lists are walked to their
       FULL length regardless of L; only counts[:, 0] > L needs a re-serve.
    prune: staircase anchor pruning (A/B variant; results bit-identical).
       MEASURED SLOWER at the config-3 shape on this chip (56k vs 70k QPS,
       same-process A/B): the per-op-group masked min/max + anchor-count
       reductions and their scalar->loop-bound dependency stalls cost more
       than the skipped compares save — the base list is the per-query
       MINIMUM, so its live window count is already ~1 and the full cross
       is close to the staircase. Off by default; revisit only with
       scalar-load-based guards (see PERFORMANCE.md negative results).

    Returns (vals (Q, L) compacted ascending, oc (Q,) i32).
    """
    from .pallas_decode import SLACK_ROWS

    Q, K = rows.shape
    assert Q % TQ == 0, f"Q={Q} must be a multiple of {TQ}"
    assert K >= 2, "K=1 batches have no probe lists; callers pad K"
    assert L % CHUNK == 0
    C = L // CHUNK
    # the base window DMAs C consecutive arena rows per query; terms near
    # the arena end read into the trailing slack, which must cover them
    assert C <= SLACK_ROWS, f"L={L} exceeds the arena slack bound"
    stride = int(blocks.shape[1])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Q // TQ,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # arena stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P4 permutation
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P2 permutation
        ],
        out_specs=[
            pl.BlockSpec(
                (TQ, C, CHUNK),
                lambda i, r_ref, c_ref, k_ref: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TQ, CHUNK),
                lambda i, r_ref, c_ref, k_ref: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((TQ, C, stride), jnp.uint32),      # base_win
            pltpu.VMEM((GP, stride), jnp.uint32),         # probe_win
            pltpu.VMEM((K - 1, GP, stride), jnp.uint32),  # probe_pre
            pltpu.VMEM((K - 1, GP, CHUNK), jnp.uint32),   # pv_buf (decoded)
            pltpu.VMEM((TQ, -(-C // min(BG0, C)) * min(BG0, C), CHUNK),
                       jnp.uint32),                       # base_buf (BG-padded)
            pltpu.VMEM((-(-C // min(BG0, C)) * min(BG0, C), CHUNK),
                       jnp.int32),                        # hit_buf (BG-padded)
            pltpu.SemaphoreType.DMA((TQ + 1,)),
            pltpu.SemaphoreType.DMA((K - 1,)),            # prefetch sems
        ],
    )
    masked, cnt = pl.pallas_call(
        _kernel_factory(K, C, stride, prune),
        out_shape=[
            jax.ShapeDtypeStruct((Q, C, CHUNK), jnp.uint32),
            jax.ShapeDtypeStruct((Q, CHUNK), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        rows.astype(jnp.int32).reshape(Q * K),
        counts.astype(jnp.int32).reshape(Q * K),
        k_valid.astype(jnp.int32),
        blocks,
        jnp.asarray(_P4),
        jnp.asarray(_P2),
    )
    flat = masked.reshape(Q, L)
    if not compact:
        # lazy-compaction serving: AND results are typically tiny (the
        # intersection of independent lists), so callers download the
        # counts first and run the (Q, L) compaction sort — measured as
        # expensive as the whole kernel — only over nonzero-result rows
        return flat, cnt[:, 0]
    return jnp.sort(flat, axis=1), cnt[:, 0]


def reorder_smallest_base(rows: jnp.ndarray, counts: jnp.ndarray,
                          k_valid: jnp.ndarray):
    """Swap each query's smallest-count ACTIVE slot into slot 0.

    Missing terms carry count 0 and win the argmin — an empty base empties
    the AND, which is exactly the required semantics. Inactive slots
    (>= k_valid) are excluded. Returns (rows', counts', need) where need is
    the base (smallest) count per query — the only count whose excess over
    L forces a ladder re-serve."""
    Q, K = rows.shape
    kmask = jnp.arange(K, dtype=jnp.int32)[None, :] < k_valid[:, None]
    guarded = jnp.where(kmask, counts, jnp.int32(0x7FFFFFFF))
    b = jnp.argmin(guarded, axis=1).astype(jnp.int32)       # (Q,)
    cols = jnp.arange(K, dtype=jnp.int32)[None, :]
    perm = jnp.where(
        cols == 0, b[:, None], jnp.where(cols == b[:, None], 0, cols)
    )
    rows2 = jnp.take_along_axis(rows, perm, axis=1)
    counts2 = jnp.take_along_axis(counts, perm, axis=1)
    need = jnp.where(k_valid > 0, counts2[:, 0], 0)
    return rows2, counts2, need
