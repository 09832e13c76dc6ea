"""Pallas decode kernel vs jnp decoder (interpret mode on CPU).

The kernel itself compiles and runs on the real TPU (verified on-chip, see
PERFORMANCE.md A/B); CI runs it in interpret mode on the CPU platform.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from inverted_index_2_tpu.models.query_engine import build_snapshot_arrays
from inverted_index_2_tpu.ops import decode as D
from inverted_index_2_tpu.ops.pallas_decode import TQ, decode_postings_pallas


def _snap(lists, rng):
    """Pallas-ready snapshot: pow2 arena, 128-aligned stride, slack rows."""
    voffs = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lists], out=voffs[1:])
    blob = b"".join(f"t{i:05d}".encode() for i in range(len(lists)))
    offs = np.arange(len(lists) + 1, dtype=np.int64) * 6
    return build_snapshot_arrays(
        blob, offs, np.concatenate(lists), voffs, stride_align=128
    )


def test_pallas_decode_matches_jnp(rng):
    lists = [
        np.unique(rng.integers(0, 5_000_000, size=int(s), dtype=np.uint32))
        for s in rng.integers(1, 700, size=48)
    ]
    snap = _snap(lists, rng)
    assert snap.blocks.shape[1] % 128 == 0
    Q = 4 * TQ
    term_idx = jnp.asarray(rng.integers(0, len(lists), size=Q).astype(np.int32))
    L = 768
    pv, pc = decode_postings_pallas(
        snap.blocks, snap.term_block_start, snap.counts, term_idx, L, interpret=True
    )
    jv, jc = D.gather_postings_arena(
        snap.blocks, snap.term_block_start, snap.counts, term_idx, L
    )
    pv, pc, jv, jc = map(np.asarray, (pv, pc, jv, jc))
    assert np.array_equal(pc, jc)  # both RAW counts
    for q in range(Q):
        c = min(int(pc[q]), L)
        assert np.array_equal(pv[q, :c], jv[q, :c]), q
    for q, t in enumerate(np.asarray(term_idx)):
        want = lists[t][:L]
        assert np.array_equal(pv[q, : len(want)], want), q


def test_decode_pow2_mxu_matches_repeat(rng):
    """The MXU permutation-matmul interleave (Pallas path) is bit-identical
    to the jnp.repeat interleave across all width classes {0,8,16,32}."""
    from inverted_index_2_tpu.codec import packing as P

    lists = []
    for scale in (1, 120, 60_000, 2**24, 2**30):
        for s in (1, 5, 127, 128, 129, 400):
            g = rng.integers(1, 2 * scale + 1, size=s, dtype=np.int64)
            lists.append(np.unique((np.cumsum(g) % 2**32).astype(np.uint32)))
    voffs = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lists], out=voffs[1:])
    words, outs = P.encode_bulk(np.concatenate(lists), voffs, byte_align=2)
    stride = 256
    win = np.zeros((len(lists), stride), np.uint32)
    for i, o in enumerate(outs):
        blk = words[o + 1 : o + 1 + stride]
        win[i, : len(blk)] = blk
    v_rep, _ = D.decode_blocks_pow2(jnp.asarray(win), use_mxu=False)
    v_mxu, _ = D.decode_blocks_pow2(jnp.asarray(win), use_mxu=True)
    assert np.array_equal(np.asarray(v_rep), np.asarray(v_mxu))
    for i, l in enumerate(lists):
        c = min(128, len(l))
        assert np.array_equal(np.asarray(v_rep)[i, :c], l[:c]), i


def test_pallas_intersect_matches_setops(rng):
    """ops/pallas_bool.intersect_pallas vs setops.intersect_many (bit-exact),
    over overlapping draws incl. empty lists, single-term queries, garbage
    padding, and a genuine 0xFFFFFFFF member."""
    from inverted_index_2_tpu.ops import setops
    from inverted_index_2_tpu.ops.pallas_bool import intersect_pallas

    Q, K, L = 16, 4, 256
    lists = np.zeros((Q, K, L), dtype=np.uint32)
    counts = np.zeros((Q, K), dtype=np.int32)
    kv = rng.integers(1, K + 1, size=Q).astype(np.int32)
    for q in range(Q):
        pool = rng.choice(600, size=400, replace=False).astype(np.uint32)
        for j in range(K):
            n = int(rng.integers(0, L + 1))
            v = np.sort(rng.choice(pool, size=min(n, len(pool)), replace=False))
            counts[q, j] = len(v)
            lists[q, j, : len(v)] = v
            lists[q, j, len(v):] = rng.integers(
                0, 2**32, size=L - len(v), dtype=np.uint32
            )
    # query 0: a genuine 0xFFFFFFFF member of every list (counts, not
    # sentinels, define validity)
    for j in range(K):
        c = counts[0, j]
        lists[0, j, c] = 0xFFFFFFFF
        counts[0, j] = c + 1

    rv, rc = setops.intersect_many(
        jnp.asarray(lists), jnp.asarray(counts), jnp.asarray(kv)
    )
    gv, gc = intersect_pallas(
        jnp.asarray(lists), jnp.asarray(counts), jnp.asarray(kv), interpret=True
    )
    rv, rc, gv, gc = map(np.asarray, (rv, rc, gv, gc))
    assert np.array_equal(rc, gc)
    for q in range(Q):
        assert np.array_equal(rv[q, : rc[q]], gv[q, : gc[q]]), q


def test_fused_and_step_matches_reference(rng):
    """boolean_fused_step (interpret) vs numpy set algebra: probes walked
    past L, missing terms, tombstone filter, smallest-base reorder."""
    import jax.numpy as jnp

    from inverted_index_2_tpu.models.query_engine import boolean_fused_step

    lists = [
        np.unique(rng.integers(0, 3_000, size=int(s), dtype=np.uint32))
        for s in [1, 5, 60, 140, 300, 700, 650, 129, 128, 127, 40, 500]
    ]
    snap = _snap(lists, rng)
    assert snap.arena_aligned
    Q, K, L = 16, 4, 256
    hk = np.asarray(snap.keys)
    idx = rng.integers(0, len(lists), size=(Q, K)).astype(np.int32)
    kv = rng.integers(1, K + 1, size=Q).astype(np.int32)
    qk = np.zeros((Q, K, hk.shape[1]), dtype=np.uint32)
    for i in range(Q):
        qk[i, : kv[i]] = hk[idx[i, : kv[i]]]
    # query 2: an unresolvable term (garbage key) -> empty AND
    if kv[2] < 2:
        kv[2] = 2
    qk[2, 1] = np.arange(hk.shape[1], dtype=np.uint32) + 7_777_777
    removed = np.unique(
        np.concatenate([l[::3] for l in lists[:4]])
    ).astype(np.uint32)

    out, oc, need = boolean_fused_step(
        snap.keys, snap.blocks, snap.term_block_start, snap.counts,
        jnp.asarray(qk), jnp.asarray(kv), L,
        removed=jnp.asarray(removed),
        slots=snap.hash_slots, max_probes=snap.max_probes, interpret=True,
    )
    out, oc, need = map(np.asarray, (out, oc, need))
    for q in range(Q):
        expect = None
        if q == 2:
            expect = np.zeros(0, np.uint32)
        else:
            for t_i in range(kv[q]):
                lv = lists[idx[q, t_i]]
                expect = lv if expect is None else np.intersect1d(expect, lv)
            expect = np.setdiff1d(expect, removed)
        if need[q] > L:
            continue  # engine re-serves these at a ladder level
        assert oc[q] == len(expect), (q, oc[q], len(expect))
        assert np.array_equal(out[q, : oc[q]], expect), q


def test_engine_fused_and_routing(rng, monkeypatch):
    """QueryEngine.boolean routes AND through the fused kernel
    (TPI_FUSED_AND=interp off-TPU) and matches the concat path exactly,
    including ladder re-serves (smallest list > L)."""
    from inverted_index_2_tpu.models.query_engine import QueryEngine

    monkeypatch.setenv("TPI_FUSED_AND", "interp")
    lists = [
        np.unique(rng.integers(0, 2_000, size=int(s), dtype=np.uint32))
        for s in [400, 420, 380, 350, 500, 30, 410, 390]
    ]
    snap = _snap(lists, rng)
    terms = [f"t{i:05d}".encode() for i in range(len(lists))]
    eng = QueryEngine(snap, L=256, q_bucket=8)
    assert eng._use_fused()
    queries = [
        [terms[0], terms[1]],                 # both lists > L: base re-serve
        [terms[5], terms[2]],                 # small base, big probe: no re-serve
        [terms[3], b"missing-term"],          # absent required term
        [terms[4]],                           # single term
        [terms[6], terms[7], terms[1]],
    ]
    got = eng.boolean(queries, "and")
    monkeypatch.setenv("TPI_FUSED_AND", "0")
    want = eng.boolean(queries, "and")
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert np.array_equal(g, w), (g, w)


def test_engine_fused_overflow_falls_back_to_concat(rng, monkeypatch):
    """Base lists beyond the arena slack bound (SLACK_ROWS*128) must route
    through the exact concat path; shrink the bound to exercise it."""
    from inverted_index_2_tpu.models import query_engine as qe
    from inverted_index_2_tpu.models.query_engine import QueryEngine

    monkeypatch.setenv("TPI_FUSED_AND", "interp")
    lists = [
        np.unique(rng.integers(0, 5_000, size=int(s), dtype=np.uint32))
        for s in [900, 950, 40, 800]
    ]
    snap = _snap(lists, rng)
    terms = [f"t{i:05d}".encode() for i in range(len(lists))]
    eng = QueryEngine(snap, L=128, q_bucket=8)
    assert eng._use_fused()
    # bound the ladder at 2 chunks: every base > 256 overflows
    import inverted_index_2_tpu.ops.pallas_decode as pd

    monkeypatch.setattr(pd, "SLACK_ROWS", 2)
    queries = [
        [terms[0], terms[1]],   # base ~900 > 256: overflow -> concat
        [terms[2], terms[3]],   # base 40 <= L: fused fast path
    ]
    got = eng.boolean(queries, "and")
    monkeypatch.setenv("TPI_FUSED_AND", "0")
    want = eng.boolean(queries, "and")
    for g, w in zip(got, want):
        assert np.array_equal(g, w)
    assert len(got[0]) > 0  # overflow path produced the real intersection


def test_engine_fused_single_term_batch(rng, monkeypatch):
    """A batch of ONLY single-term AND queries (K=1) must not crash the
    fused path (the kernel needs >= 2 slots; the engine pads K)."""
    from inverted_index_2_tpu.models.query_engine import QueryEngine

    monkeypatch.setenv("TPI_FUSED_AND", "interp")
    lists = [
        np.unique(rng.integers(0, 2_000, size=int(s), dtype=np.uint32))
        for s in [40, 80, 120, 30]
    ]
    snap = _snap(lists, rng)
    terms = [f"t{i:05d}".encode() for i in range(len(lists))]
    eng = QueryEngine(snap, L=256, q_bucket=8)
    assert eng._use_fused()
    got = eng.boolean([[terms[0]], [terms[2]], [b"missing"]], "and")
    assert np.array_equal(got[0], lists[0])
    assert np.array_equal(got[1], lists[2])
    assert len(got[2]) == 0


def test_engine_unaligned_L_normalizes(rng, monkeypatch):
    """The constructor rounds L up to the 128-value block contract (every
    decode path works in 128-blocks; an unaligned L used to crash only on
    the first dual-tier dispatch). Results stay exact — L is only the
    fast-path pad."""
    from inverted_index_2_tpu.models.query_engine import QueryEngine

    monkeypatch.setenv("TPI_FUSED_AND", "interp")
    lists = [np.unique(rng.integers(0, 500, size=60, dtype=np.uint32))
             for _ in range(3)]
    snap = _snap(lists, rng)
    eng = QueryEngine(snap, L=1000, q_bucket=8)
    assert eng.L == 1024
    assert QueryEngine(snap, L=64, q_bucket=8).L == 128
    terms = [f"t{i:05d}".encode() for i in range(len(lists))]
    got = eng.boolean([[terms[0], terms[1]]], "and")
    assert np.array_equal(got[0], np.intersect1d(lists[0], lists[1]))


def test_engine_fused_filter_removed(rng, monkeypatch):
    """Fused AND with filter_removed=True matches the concat path."""
    from inverted_index_2_tpu.models.query_engine import QueryEngine

    monkeypatch.setenv("TPI_FUSED_AND", "interp")
    lists = [
        np.unique(rng.integers(0, 1_500, size=int(s), dtype=np.uint32))
        for s in [200, 220, 60]
    ]
    removed = np.unique(lists[0][::4]).astype(np.uint32)
    snap = _snap(lists, rng)
    snap.removed = jnp.asarray(removed)
    terms = [f"t{i:05d}".encode() for i in range(len(lists))]
    eng = QueryEngine(snap, L=256, q_bucket=8)
    assert eng._use_fused()
    queries = [[terms[0], terms[1]], [terms[2], terms[0]]]
    got = eng.boolean(queries, "and", filter_removed=True)
    monkeypatch.setenv("TPI_FUSED_AND", "0")
    want = eng.boolean(queries, "and", filter_removed=True)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)
    assert not np.intersect1d(got[0], removed).size


def test_fused_and_adversarial_shapes(rng):
    """Edge shapes: identical lists (result = the whole list), counts at
    exactly L and L+1 (re-serve boundary), genuine 0xFFFFFFFF members."""
    import jax.numpy as jnp

    from inverted_index_2_tpu.models.query_engine import boolean_fused_step

    L = 256
    full = np.sort(rng.choice(10_000, size=L, replace=False)).astype(np.uint32)
    over = np.sort(rng.choice(10_000, size=L + 1, replace=False)).astype(np.uint32)
    with_ff = np.unique(
        np.concatenate([full[:50], np.array([0xFFFFFFFF], np.uint32)])
    )
    lists = [full, full.copy(), over, with_ff, with_ff.copy()]
    snap = _snap(lists, rng)
    hk = np.asarray(snap.keys)
    Q, K = 8, 4
    qk = np.zeros((Q, K, hk.shape[1]), dtype=np.uint32)
    kv = np.zeros(Q, dtype=np.int32)
    cases = [
        ([0, 1], full),                  # identical -> full L-sized result
        ([3, 4], with_ff),               # genuine 0xFFFFFFFF member kept
        ([0, 0], full),                  # same term twice
        ([2, 2], None),                  # smallest = L+1 -> need > L
    ]
    for i, (ts, _) in enumerate(cases):
        kv[i] = len(ts)
        qk[i, : len(ts)] = hk[ts]
    out, oc, need = boolean_fused_step(
        snap.keys, snap.blocks, snap.term_block_start, snap.counts,
        jnp.asarray(qk), jnp.asarray(kv), L,
        slots=snap.hash_slots, max_probes=snap.max_probes, interpret=True,
    )
    out, oc, need = map(np.asarray, (out, oc, need))
    for i, (ts, expect) in enumerate(cases):
        if expect is None:
            assert need[i] > L  # engine re-serves at the next ladder level
            continue
        assert oc[i] == len(expect), (i, oc[i], len(expect))
        assert np.array_equal(out[i, : oc[i]], expect), i


def test_pallas_sort_rows_matches_numpy(rng):
    """ops/pallas_sort bitonic network vs np.sort (interpret mode)."""
    from inverted_index_2_tpu.ops.pallas_sort import sort_rows_pallas

    for Q, M in [(8, 256), (16, 1024)]:
        x = rng.integers(0, 2**32, size=(Q, M), dtype=np.uint32)
        got = np.asarray(sort_rows_pallas(jnp.asarray(x), interpret=True))
        assert np.array_equal(got, np.sort(x, axis=1)), (Q, M)


def test_engine_fused_q_bucket_not_multiple_of_8(rng, monkeypatch):
    """Regression (ADVICE r2): a q_bucket not divisible by the kernel's TQ=8
    tile must pad up instead of raising — the XLA paths accept any bucket."""
    from inverted_index_2_tpu.models.query_engine import QueryEngine

    monkeypatch.setenv("TPI_FUSED_AND", "interp")
    lists = [
        np.unique(rng.integers(0, 2_000, size=int(s), dtype=np.uint32))
        for s in [50, 80, 120, 60]
    ]
    snap = _snap(lists, rng)
    terms = [f"t{i:05d}".encode() for i in range(len(lists))]
    eng = QueryEngine(snap, L=256, q_bucket=12)
    assert eng._use_fused()
    got = eng.boolean([[terms[0], terms[1]], [terms[2], terms[3]]], "and")
    for q, g in zip([[0, 1], [2, 3]], got):
        want = np.intersect1d(lists[q[0]], lists[q[1]])
        assert np.array_equal(g, want)


def test_engine_fused_small_p_overflow(rng, monkeypatch):
    """AND results wider than the small-P single-fetch prefix re-run through
    the sort path (identical lists => result = whole list > _FUSED_SMALL_P)."""
    from inverted_index_2_tpu.models.query_engine import QueryEngine

    monkeypatch.setenv("TPI_FUSED_AND", "interp")
    big = np.unique(rng.integers(0, 4_000, size=200, dtype=np.uint32))
    lists = [big, big.copy(), np.unique(rng.integers(0, 2_000, size=30, dtype=np.uint32))]
    snap = _snap(lists, rng)
    terms = [f"t{i:05d}".encode() for i in range(len(lists))]
    eng = QueryEngine(snap, L=256, q_bucket=8)
    assert eng._use_fused()
    assert len(big) > eng._FUSED_SMALL_P
    got = eng.boolean([[terms[0], terms[1]], [terms[0], terms[2]]], "and")
    assert np.array_equal(got[0], big)
    assert np.array_equal(got[1], np.intersect1d(big, lists[2]))


def test_engine_boolean_staged_matches_plain(rng, monkeypatch):
    """boolean_staged (pipelined stream) is result-identical to boolean()
    per batch, including tombstone filtering and ladder re-serves."""
    from inverted_index_2_tpu.models.query_engine import QueryEngine

    monkeypatch.setenv("TPI_FUSED_AND", "interp")
    lists = [
        np.unique(rng.integers(0, 3_000, size=int(s), dtype=np.uint32))
        for s in [400, 420, 30, 350, 120, 60, 500, 90]
    ]
    snap = _snap(lists, rng)
    terms = [f"t{i:05d}".encode() for i in range(len(lists))]
    eng = QueryEngine(snap, L=256, q_bucket=8)
    assert eng._use_fused()
    rngq = np.random.default_rng(7)
    batches = []
    for _ in range(2):
        qs = []
        for _ in range(6):  # uniform batch shape: ONE compiled program
            k = int(rngq.integers(2, 5))
            qs.append([terms[i] for i in rngq.choice(len(lists), size=k, replace=False)])
        batches.append(qs)
    batches[0].append([terms[0], terms[6]])  # both > L: ladder re-serve
    batches[1].append([terms[2], b"zz-missing"])
    staged = eng.boolean_staged(batches, "and", filter_removed=True)
    columnar = eng.boolean_staged(batches, "and", filter_removed=True,
                                  columnar=True)
    for bi, qs in enumerate(batches):
        plain = eng.boolean(qs, "and", filter_removed=True)
        vals, voffs = columnar[bi]
        assert len(voffs) == len(qs) + 1
        for qi in range(len(qs)):
            assert np.array_equal(staged[bi][qi], plain[qi]), (bi, qi)
            assert np.array_equal(
                vals[voffs[qi]: voffs[qi + 1]], plain[qi]
            ), (bi, qi)


def test_fused_and_geom_batch_pre_variants_agree(rng):
    """geom batch_pre=True (production, tile-batched pre-decode) and
    batch_pre=False (per-query pre-decode) are bit-identical in
    interpret mode — the on-chip 101.2k-vs-95.0k A/B relies on the two
    formulations computing the same thing."""
    import jax.numpy as jnp

    from inverted_index_2_tpu.ops.pallas_fused import (
        fused_and_pallas, reorder_smallest_base,
    )

    lists = [
        np.unique(rng.integers(0, 5_000, size=int(s), dtype=np.uint32))
        for s in [3, 50, 130, 260, 512, 640, 127, 128]
    ]
    snap = _snap(lists, rng)
    Q, K, L = 16, 4, 256
    idx = rng.integers(0, len(lists), size=(Q, K)).astype(np.int32)
    kv = rng.integers(2, K + 1, size=Q).astype(np.int32)
    tbs = np.asarray(snap.term_block_start)
    hc = snap.host_counts
    kmask = np.arange(K)[None, :] < kv[:, None]
    rows = np.where(kmask, tbs[idx], 0).astype(np.int32)
    cnts = np.where(kmask, hc[idx], 0).astype(np.int32)
    r2, c2, _ = reorder_smallest_base(
        jnp.asarray(rows), jnp.asarray(cnts), jnp.asarray(kv)
    )
    outs = {}
    for bp in (False, True):
        out, oc = fused_and_pallas(
            snap.blocks, r2, c2, jnp.asarray(kv), L,
            interpret=True, geom=(8, 8, 4, 4, bp),
        )
        outs[bp] = (np.asarray(out), np.asarray(oc))
    assert np.array_equal(outs[False][1], outs[True][1])
    assert np.array_equal(outs[False][0], outs[True][0])


def test_fused_and_early_exit_variants_agree(rng):
    """geom early_exit=True (production: the probe-group walk's while_loop
    stops at the first group past the base's max) and early_exit=False
    (full fori walk) are bit-identical — on RANGE-CLUSTERED lists the exit
    actually fires (each term's postings sit in a narrow window, so probe
    anchors pass the base max after ~1 group), which is the case the
    on-chip A/B and the log-search deployment shape care about."""
    import jax.numpy as jnp

    from inverted_index_2_tpu.ops.pallas_fused import (
        fused_and_pallas, reorder_smallest_base,
    )

    # clustered multi-group lists: window centers spread over the u32 axis;
    # lengths straddle the gp*128=1024 group size so the walk has tails
    lists = []
    for s, c in [(40, 100), (2600, 5_000_000), (1300, 9_000),
                 (3100, 2_000_000_000), (700, 60_000), (2049, 1_000_000),
                 (90, 1_500_000_000), (1025, 300_000)]:
        w = max(4 * s, 16)
        lists.append(np.unique(rng.integers(c, c + w, size=s, dtype=np.uint32)))
    snap = _snap(lists, rng)
    Q, K, L = 16, 4, 512
    idx = rng.integers(0, len(lists), size=(Q, K)).astype(np.int32)
    kv = rng.integers(2, K + 1, size=Q).astype(np.int32)
    tbs = np.asarray(snap.term_block_start)
    hc = snap.host_counts
    kmask = np.arange(K)[None, :] < kv[:, None]
    rows = np.where(kmask, tbs[idx], 0).astype(np.int32)
    cnts = np.where(kmask, hc[idx], 0).astype(np.int32)
    r2, c2, _ = reorder_smallest_base(
        jnp.asarray(rows), jnp.asarray(cnts), jnp.asarray(kv)
    )
    # clamp only the BASE count to L (a base over L would need the ladder);
    # probe counts stay FULL length so multi-group walks exercise the exit
    c2 = c2.at[:, 0].set(jnp.minimum(c2[:, 0], L))
    outs = {}
    for ee in (False, True):
        out, oc = fused_and_pallas(
            snap.blocks, r2, c2, jnp.asarray(kv), L,
            interpret=True, geom=(8, 8, 4, 4, True, ee),
        )
        outs[ee] = (np.asarray(out), np.asarray(oc))
    assert np.array_equal(outs[False][1], outs[True][1])
    assert np.array_equal(outs[False][0], outs[True][0])


def test_engine_fused_chunked_large_batch(rng, monkeypatch):
    """Batches beyond _FUSED_MAX_Q (the kernel's SMEM scalar-prefetch
    bound: 16384x8 rows/counts operands measured an SMEM overflow on v5e)
    chunk transparently inside _fused_run/_fused_run_staged."""
    from inverted_index_2_tpu.models.query_engine import QueryEngine

    monkeypatch.setenv("TPI_FUSED_AND", "interp")
    lists = [
        np.unique(rng.integers(0, 2_000, size=int(s), dtype=np.uint32))
        for s in [150, 180, 40, 120, 90, 60]
    ]
    snap = _snap(lists, rng)
    terms = [f"t{i:05d}".encode() for i in range(len(lists))]
    eng = QueryEngine(snap, L=256, q_bucket=8)
    assert eng._use_fused()
    monkeypatch.setattr(QueryEngine, "_FUSED_MAX_Q", 8)
    rq = np.random.default_rng(3)
    qs = []
    for _ in range(20):  # pads to 24 > 2 chunks of 8
        k = int(rq.integers(2, 4))
        qs.append([terms[i] for i in rq.choice(len(lists), size=k, replace=False)])
    got = eng.boolean(qs, "and")
    staged = eng.boolean_staged([qs], "and")
    for qi, q in enumerate(qs):
        want = sorted(set(lists[terms.index(q[0])].tolist()).intersection(
            *[set(lists[terms.index(t)].tolist()) for t in q[1:]]))
        assert got[qi].tolist() == want, qi
        assert staged[0][qi].tolist() == want, qi
