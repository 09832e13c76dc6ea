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

import os as _os

TQ = 8        # queries per program
CHUNK = 128   # values per block
GP = int(_os.environ.get("TPI_FUSED_GP", "8"))
              # probe blocks fetched per DMA group. Swept on-chip at
              # config-3 (same process, bit-identical checksums):
              # GP=8 94.4k QPS vs GP=16 85.1k — the batched pre-decode of
              # (K-1, GP) chunks dominates, and GP=8 halves it while the
              # mean list still fits one group; GP=4 (77.5k), TQ=16
              # (87.3k) and PP=8 (84.8k) all lost. Env-tunable for A/Bs.
BG0 = 4       # base chunks per compare group (bounds compare volume by the
              # BASE list's real length, not the static pad C)
PP = 4        # probe chunks folded into one compare op (op-issue bound)


def _kernel_factory(K: int, C: int, stride: int, prune: bool = True,
                    tq: int = None, gp: int = None, pp: int = None,
                    bg0: int = None, batch_pre: bool = True,
                    early_exit: bool = True):
    tq = tq or TQ
    gp = gp or GP
    pp = pp or PP
    bg0 = bg0 or BG0
    BG = min(bg0, C)  # base group cannot exceed the pad
    # base_buf/hit_buf rows pad to a BG multiple so the LAST base window
    # [bs, bs+BG) stays in bounds when C % BG != 0 (ladder levels like
    # C=17); rows >= C hold garbage whose hits land in hit rows >= C,
    # which are never read back
    CP = -(-C // BG) * BG
    NBG_MAX = CP // BG
    # the scalar-guard formulation statically unrolls NBG_MAX base windows
    # per probe op-group; cap the predicated-region count at large ladder
    # levels (fully-unrolled nests near ~900 regions stall this remote
    # compiler) — big-C programs fall back to the fori formulation
    prune = prune and NBG_MAX <= 8
    def _kernel(rows_ref, counts_ref, kvalid_ref, arena, p4_ref, p2_ref,
                out_ref, cnt_ref, base_win, probe_win, probe_pre, pv_buf,
                base_buf, hit_buf, sems, psems):
        """Grid: (Q//tq,). rows_ref/counts_ref (Q*K,) i32 + kvalid_ref (Q,)
        i32 scalar-prefetched (slot 0 = smallest list per query). arena:
        (B+slack, stride) u32 in HBM. out_ref: (tq, C, 128) masked base;
        cnt_ref: (tq, 128) keep counts. base_win (C, stride) / probe_win
        (gp, stride) DMA landing buffers; base_buf (C, 128) decoded base
        (a VMEM ref so base GROUPS can be sliced at dynamic offsets);
        hit_buf (C, 128) i32 per-pair hit accumulator (dynamic-offset
        read-modify-write); sems: (2,) DMA."""
        q0 = pl.program_id(0) * tq
        perms = (p4_ref[:], p2_ref[:])
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (C, CHUNK), 0) * CHUNK
            + jax.lax.broadcasted_iota(jnp.int32, (C, CHUNK), 1)
        )
        # probe element index within a pp-chunk op-group: chunk id on axis
        # 1, lane on axis 2 (sublane-direction reductions stay cheap)
        pid = (
            jax.lax.broadcasted_iota(jnp.int32, (1, pp, CHUNK, 1), 1) * CHUNK
            + jax.lax.broadcasted_iota(jnp.int32, (1, pp, CHUNK, 1), 2)
        )
        def flip_v(x):
            """VECTOR sign-flip bitcast into the signed-order domain
            (order-preserving u32 -> i32 bijection). Mosaic's tpu.bitcast
            requires VECTOR operands — scalars must be extracted AFTER the
            flip (scalar extracts from vector values are supported; scalar
            bitcasts are rejected by the verifier)."""
            return jax.lax.bitcast_convert_type(
                x ^ np.uint32(0x80000000), jnp.int32
            )

        # ALL tq base windows DMA'd in flight, then ONE batched decode:
        # a per-query decode of (C, 128) is 2-vreg ops at full issue cost
        # (measured ~17us/query of pure overhead); batching across the
        # tile amortizes it 8x
        def base_dma(r):
            return pltpu.make_async_copy(
                arena.at[pl.ds(rows_ref[(q0 + r) * K], C)],
                base_win.at[r],
                sems.at[r],
            )

        for r in range(tq):
            base_dma(r).start()

        if batch_pre:
            # ALL tq x (K-1) first probe groups go in flight behind the
            # base DMAs, then ONE decode covers the whole tile: the
            # per-query (K-1, gp)-chunk pre-decode is the dominant op-issue
            # cost (the GP=16->8 sweep moved it 11%) — batching it across
            # the tile amortizes that issue overhead tq-fold, and the
            # probe DMAs overlap the base decode.
            def pre_dma_b(r, j1):
                return pltpu.make_async_copy(
                    arena.at[pl.ds(rows_ref[(q0 + r) * K + j1], gp)],
                    probe_pre.at[r, j1 - 1],
                    psems.at[r, j1 - 1],
                )

            for r in range(tq):
                for j1 in range(1, K):
                    @pl.when(j1 < kvalid_ref[q0 + r])
                    def _(r=r, j1=j1):
                        pre_dma_b(r, j1).start()

        for r in range(tq):
            base_dma(r).wait()
        bases, _ = decode_blocks_pow2(
            base_win[:], use_mxu=True, perms=perms
        )                                                   # (tq, C, 128)
        base_buf[:, pl.ds(0, C), :] = bases

        if batch_pre:
            for r in range(tq):
                for j1 in range(1, K):
                    @pl.when(j1 < kvalid_ref[q0 + r])
                    def _(r=r, j1=j1):
                        pre_dma_b(r, j1).wait()
            pv_all, _ = decode_blocks_pow2(
                probe_pre[:].reshape(tq * (K - 1), gp, stride),
                use_mxu=True, perms=perms,
            )                                               # (tq*(K-1), gp, 128)
            pv_buf[:] = pv_all.reshape(tq, K - 1, gp, CHUNK)

        for r in range(tq):
            q = q0 + r
            n0 = counts_ref[q * K]
            kv = kvalid_ref[q]
            base = base_buf[r, pl.ds(0, C), :]              # (C, 128)
            keep0 = (pos < n0).astype(jnp.int32)
            nb0c = jnp.minimum((n0 + CHUNK - 1) // CHUNK, C)
            if prune:
                # SCALAR staircase-pruning state: the base list's true max
                # (ONE masked reduction per query, amortized over all its
                # pairs/groups) and the anchor of every BG-aligned base
                # window (block layout [header, anchor, planes...]) —
                # extracted as scalars from vector-flipped words. Guards
                # are then pure scalar compares; the vector-reduction
                # variant of this measured SLOWER than no pruning at all.
                basef = flip_v(base)
                base_hi_f = jnp.max(jnp.where(
                    keep0 > 0, basef, jnp.int32(-0x80000000)))
                wff = flip_v(base_win[r])                   # (C, stride)
                aw = [wff[w * BG, 1] for w in range(NBG_MAX)]
                aw_nxt = []
                for w in range(NBG_MAX):
                    nxt = (w + 1) * BG
                    if nxt < C:
                        aw_nxt.append(jnp.where(
                            nxt < nb0c, wff[nxt, 1],
                            jnp.int32(0x7FFFFFFF)))
                    else:
                        aw_nxt.append(jnp.int32(0x7FFFFFFF))
            else:
                base_hi_f = jnp.int32(0x7FFFFFFF)
                aw = aw_nxt = None

            # hide probe-DMA latency AND decode-op overhead: every pair's
            # FIRST group goes in flight before the pair loop, then ONE
            # batched decode covers all of them (the mean config-3 list
            # fits one gp group, so most pairs never issue a serial
            # follow-up DMA and never decode again)
            if not batch_pre:
                def pre_dma(j1):
                    return pltpu.make_async_copy(
                        arena.at[pl.ds(rows_ref[q * K + j1], gp)],
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
                )                                           # (K-1, gp, 128)
                pv_buf[:] = pv_all

            def compare_op(bs, ch, cvalid, r=r):
                """One (BG, pp, 128, 128) membership compare of probe
                op-group `ch` against base window [bs, bs+BG), OR'd into
                the hit accumulator (bs static, BG-aligned, <= CP-BG)."""
                base_g = base_buf[r, pl.ds(bs, BG), :]
                eq = (
                    base_g[:, None, None, :] == ch[None, :, :, None]
                )                                           # (BG, pp, 128, 128)
                hit_buf[pl.ds(bs, BG), :] = hit_buf[
                    pl.ds(bs, BG), :
                ] | jnp.any(eq & cvalid, axis=(1, 2)).astype(jnp.int32)

            def jbody(j, keep, r=r, q=q, nb0c=nb0c, base_hi_f=base_hi_f,
                      aw=aw, aw_nxt=aw_nxt):
                nj = counts_ref[q * K + j]
                rj = rows_ref[q * K + j]
                ngrp = (nj + gp * CHUNK - 1) // (gp * CHUNK)
                hit_buf[:] = jnp.zeros((CP, CHUNK), dtype=jnp.int32)

                def probe_block(pv, g, carry, nj=nj, nb0c=nb0c,
                                base_hi_f=base_hi_f, aw=aw, aw_nxt=aw_nxt):
                    pvf = flip_v(pv) if prune else None     # (gp, 128)
                    for p in range(0, gp, pp):
                        # pp chunks per compare op (op-issue bound); skip
                        # op-groups past the list's real length
                        @pl.when((g * gp + p) * CHUNK < nj)
                        def _(p=p, pv=pv, pvf=pvf, g=g, nj=nj, nb0c=nb0c):
                            ch = pv[p:p + pp]               # (pp, 128)
                            cvalid = (
                                pid + (g * gp + p) * CHUNK
                            ) < nj                          # (1, pp, 128, 1)
                            if not prune:
                                # full cross: every live base window
                                def bgbody(t, c2, ch=ch, cvalid=cvalid):
                                    compare_op_dyn(t * BG, ch, cvalid)
                                    return c2

                                jax.lax.fori_loop(
                                    0,
                                    jnp.minimum((nb0c + BG - 1) // BG, NBG_MAX),
                                    bgbody, jnp.int32(0),
                                )
                                return
                            # SCALAR STAIRCASE GUARDS: the op-group's value
                            # range is [first value, next group's first
                            # value) — both single scalar extracts from the
                            # vector-flipped decode (probe lists are
                            # sorted; the first element of a LIVE group is
                            # always valid). A base window [w*BG, (w+1)*BG)
                            # overlaps iff its anchor span intersects —
                            # pure scalar compares, no vector reductions,
                            # no scalar->loop-bound stalls.
                            lo_f = pvf[p, 0]
                            if p + pp < gp:
                                hi_f = jnp.where(
                                    (g * gp + p + pp) * CHUNK < nj,
                                    pvf[p + pp, 0],
                                    jnp.int32(0x7FFFFFFF),
                                )
                            else:
                                hi_f = jnp.int32(0x7FFFFFFF)

                            @pl.when(lo_f <= base_hi_f)
                            def _(p=p, ch=ch, cvalid=cvalid, lo_f=lo_f,
                                  hi_f=hi_f, nb0c=nb0c):
                                for w in range(NBG_MAX):
                                    @pl.when(
                                        ((w * BG) < nb0c)
                                        & (aw_nxt[w] > lo_f)
                                        & (aw[w] <= hi_f)
                                    )
                                    def _(w=w, ch=ch, cvalid=cvalid):
                                        compare_op(w * BG, ch, cvalid)
                    return carry

                def compare_op_dyn(bs, ch, cvalid, r=r):
                    """fori-driven variant (dynamic bs) for the unpruned
                    baseline path."""
                    base_g = base_buf[r, pl.ds(bs, BG), :]
                    eq = (
                        base_g[:, None, None, :] == ch[None, :, :, None]
                    )
                    hit_buf[pl.ds(bs, BG), :] = hit_buf[
                        pl.ds(bs, BG), :
                    ] | jnp.any(eq & cvalid, axis=(1, 2)).astype(jnp.int32)

                pv_first = (
                    pv_buf[r, jnp.maximum(j - 1, 0)]
                    if batch_pre else pv_buf[jnp.maximum(j - 1, 0)]
                )
                probe_block(pv_first, 0, jnp.int32(0))

                def gbody(g, carry, rj=rj, nj=nj, base_hi_f=base_hi_f):
                    pdma = pltpu.make_async_copy(
                        arena.at[pl.ds(rj + g * gp, gp)], probe_win,
                        sems.at[tq],
                    )
                    pdma.start()
                    pdma.wait()

                    if prune:
                        # whole-group skip: probe lists are sorted, so a
                        # group starting past the base's max contributes
                        # nothing — skip its DECODE and compares entirely
                        # (the long-probe tail walk collapses to the base's
                        # value range). The anchor scalar comes from a
                        # vector flip of the window's first row.
                        pw0f = flip_v(probe_win[0:1, :])    # (1, stride)

                        @pl.when(pw0f[0, 1] <= base_hi_f)
                        def _(g=g):
                            pv, _ = decode_blocks_pow2(
                                probe_win[:], use_mxu=True, perms=perms
                            )                               # (gp, 128)
                            probe_block(pv, g, jnp.int32(0))
                        if early_exit:
                            # anchors ascend with g: once one group starts
                            # past the base's max, every later group does
                            # too — hand the while_loop its stop signal so
                            # the tail walk's DMAs stop with the compares
                            return (pw0f[0, 1] > base_hi_f).astype(jnp.int32)
                        return carry
                    pv, _ = decode_blocks_pow2(
                        probe_win[:], use_mxu=True, perms=perms
                    )                                       # (gp, 128)
                    return probe_block(pv, g, carry)

                if prune and early_exit:
                    jax.lax.while_loop(
                        lambda c: (c[0] < ngrp) & (c[1] == 0),
                        lambda c: (c[0] + 1, gbody(c[0], c[1])),
                        (jnp.int32(1), jnp.int32(0)),
                    )
                else:
                    jax.lax.fori_loop(1, ngrp, gbody, jnp.int32(0))
                return keep & hit_buf[pl.ds(0, C), :]

            keep = jax.lax.fori_loop(1, kv, jbody, keep0) > 0
            out_ref[r] = jnp.where(keep, base, _SENT)
            cnt_ref[r, :] = jnp.full(
                (CHUNK,), jnp.sum(keep.astype(jnp.int32)), dtype=jnp.int32
            )

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("L", "compact", "interpret", "prune", "geom")
)
def fused_and_pallas(
    blocks: jnp.ndarray,
    rows: jnp.ndarray,
    counts: jnp.ndarray,
    k_valid: jnp.ndarray,
    L: int,
    compact: bool = True,
    interpret: bool = False,
    prune: bool = True,
    geom=None,
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
    prune: staircase anchor pruning via SCALAR guards (bit-identical
       results). Each probe op-group's value range comes from two scalar
       extracts (its first value and the next group's first value); each
       BG base window's range from static scalar loads of the DMA'd anchor
       words — compare ops and whole-group decodes are then skipped by
       pure scalar pl.when guards. An earlier variant computing the same
       bounds with masked VECTOR reductions measured SLOWER than no
       pruning at all (56k vs 70k QPS — reduction cost + scalar->loop
       dependency stalls); scalar loads are verified on this Mosaic (see
       project memory / PERFORMANCE.md).

    Returns (vals (Q, L) compacted ascending, oc (Q,) i32).
    """
    from .pallas_decode import SLACK_ROWS

    # geom: (tq, gp, pp, bg0[, batch_pre[, early_exit]]) — batch_pre=True
    # batches all tq x (K-1) first-probe-group DMAs + their decode across
    # the tile; early_exit=True stops each probe walk's DMA loop at the
    # first group past the base's max (A/B'd on-chip; see PERFORMANCE.md)
    g = geom or (TQ, GP, PP, BG0)
    tq, gp, pp, bg0 = g[:4]
    batch_pre = bool(g[4]) if len(g) > 4 else True
    early_exit = bool(g[5]) if len(g) > 5 else True
    Q, K = rows.shape
    # non-multiple-of-8 GP measured as a DEVICE FAULT (DMA windows must be
    # sublane-tile aligned); fail loud at trace time instead
    assert gp % 8 == 0 and gp % pp == 0, f"GP={gp} must be 8-aligned, PP-divisible"
    assert Q % tq == 0, f"Q={Q} must be a multiple of {tq}"
    assert K >= 2, "K=1 batches have no probe lists; callers pad K"
    assert L % CHUNK == 0
    C = L // CHUNK
    # the base window DMAs C consecutive arena rows per query; terms near
    # the arena end read into the trailing slack, which must cover them
    assert C <= SLACK_ROWS, f"L={L} exceeds the arena slack bound"
    stride = int(blocks.shape[1])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Q // tq,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # arena stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P4 permutation
            pl.BlockSpec(memory_space=pltpu.VMEM),  # P2 permutation
        ],
        out_specs=[
            pl.BlockSpec(
                (tq, C, CHUNK),
                lambda i, r_ref, c_ref, k_ref: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tq, CHUNK),
                lambda i, r_ref, c_ref, k_ref: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, C, stride), jnp.uint32),      # base_win
            pltpu.VMEM((gp, stride), jnp.uint32),         # probe_win
            pltpu.VMEM(
                (tq, K - 1, gp, stride) if batch_pre else (K - 1, gp, stride),
                jnp.uint32),                              # probe_pre
            pltpu.VMEM(
                (tq, K - 1, gp, CHUNK) if batch_pre else (K - 1, gp, CHUNK),
                jnp.uint32),                              # pv_buf (decoded)
            pltpu.VMEM((tq, -(-C // min(bg0, C)) * min(bg0, C), CHUNK),
                       jnp.uint32),                       # base_buf (BG-padded)
            pltpu.VMEM((-(-C // min(bg0, C)) * min(bg0, C), CHUNK),
                       jnp.int32),                        # hit_buf (BG-padded)
            pltpu.SemaphoreType.DMA((tq + 1,)),
            pltpu.SemaphoreType.DMA(
                (tq, K - 1) if batch_pre else (K - 1,)),  # prefetch sems
        ],
    )
    masked, cnt = pl.pallas_call(
        _kernel_factory(K, C, stride, prune, tq, gp, pp, bg0, batch_pre,
                        early_exit),
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
