"""Device ops vs. host oracles (runs on the CPU test platform)."""
import bisect

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from inverted_index_2_tpu.codec import keys as K
from inverted_index_2_tpu.codec import packing as P
from inverted_index_2_tpu.ops import decode as D
from inverted_index_2_tpu.ops import dict_search as DS
from inverted_index_2_tpu.ops import setops as S

_jit_intersect = jax.jit(S.intersect_many)
_jit_union = jax.jit(S.union_many)
_jit_filter = jax.jit(S.filter_removed)
_jit_gather = jax.jit(D.gather_postings, static_argnums=(5,))


class TestDictSearch:
    def test_searchsorted_and_lookup(self, rng):
        terms = sorted(
            {
                bytes(rng.integers(97, 123, size=int(l), dtype=np.uint8))
                for l in rng.integers(1, 10, size=500)
            }
        )
        keys = K.pack_terms(terms)
        W = keys.shape[1] - 1
        queries = terms[::3] + [
            bytes(rng.integers(97, 123, size=int(l), dtype=np.uint8))
            for l in rng.integers(1, 10, size=100)
        ]
        qk = K.pack_terms(queries, width=W)
        got = np.asarray(DS.searchsorted_rows(jnp.asarray(keys), jnp.asarray(qk)))
        want = [bisect.bisect_left(terms, q) for q in queries]
        assert got.tolist() == want

        idx, found = DS.lookup_rows(jnp.asarray(keys), jnp.asarray(qk))
        idx, found = np.asarray(idx), np.asarray(found)
        for i, q in enumerate(queries):
            if q in terms:
                assert found[i] and terms[idx[i]] == q
            else:
                assert not found[i]

    def test_empty_dict(self):
        keys = jnp.zeros((0, 3), dtype=jnp.uint32)
        q = jnp.zeros((4, 3), dtype=jnp.uint32)
        idx, found = DS.lookup_rows(keys, q)
        assert not np.asarray(found).any()

    def test_jit_compiles(self, rng):
        keys = jnp.asarray(K.pack_terms(sorted({b"aa", b"bb", b"cc"})))
        q = jnp.asarray(K.pack_terms([b"bb", b"zz"], width=keys.shape[1] - 1))
        f = jax.jit(DS.lookup_rows)
        idx, found = f(keys, q)
        assert np.asarray(found).tolist() == [True, False]


def _snapshot_arrays(lists):
    """Encode posting lists and build the device block tables."""
    voffs = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lists], out=voffs[1:])
    words, outs = P.encode_bulk(np.concatenate(lists) if lists else np.zeros(0, np.uint32), voffs)
    counts, nblocks, block_off, block_b = P.scan_term_blocks(words, outs)
    # flatten per-term block offsets into term order
    tbs = np.zeros(len(lists) + 1, dtype=np.int32)
    np.cumsum(np.maximum(nblocks, 1), out=tbs[1:])
    flat = np.zeros(tbs[-1], dtype=np.int32)
    for i in range(len(lists)):
        nbi = max(int(nblocks[i]), 1)
        flat[tbs[i] : tbs[i] + nbi] = block_off[i, :nbi]
    words_pad = np.concatenate([words, np.zeros(D.WIN, dtype=np.uint32)])
    return (
        jnp.asarray(words_pad),
        jnp.asarray(flat),
        jnp.asarray(tbs),
        jnp.asarray(counts.astype(np.int32)),
    )


class TestDecode:
    def test_gather_postings_matches_host(self, rng):
        lists = [
            np.unique(rng.integers(0, 1_000_000, size=int(s), dtype=np.uint32))
            for s in rng.integers(1, 900, size=60)
        ]
        words, flat, tbs, counts = _snapshot_arrays(lists)
        term_idx = jnp.asarray(rng.integers(0, len(lists), size=40).astype(np.int32))
        L = 1024
        vals, cnts = _jit_gather(words, flat, tbs, counts, term_idx, L)
        vals, cnts = np.asarray(vals), np.asarray(cnts)
        for q, t in enumerate(np.asarray(term_idx)):
            want = lists[t]
            assert cnts[q] == len(want)
            assert np.array_equal(vals[q, : len(want)], want)

    def test_long_lists_truncate_to_L(self, rng):
        """Rows longer than L decode their first L postings; the returned
        count is RAW (the true length) so callers detect the clip and
        re-serve at a larger ladder L."""
        lists = [np.unique(rng.integers(0, 2**31, size=5000, dtype=np.uint32))]
        words, flat, tbs, counts = _snapshot_arrays(lists)
        L = 512
        vals, cnts = _jit_gather(words, flat, tbs, counts, jnp.asarray([0], dtype=jnp.int32), L)
        assert int(cnts[0]) == len(lists[0])  # raw count, exceeds L
        assert np.array_equal(np.asarray(vals)[0], lists[0][:L])


def _pad_rows(rows, L):
    Q = len(rows)
    out = np.zeros((Q, L), dtype=np.uint32)
    counts = np.zeros(Q, dtype=np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
        counts[i] = len(r)
    return out, counts


class TestSetOps:
    def test_intersect_many(self, rng):
        Q, Kk, L = 20, 4, 256
        lists = []
        kv = rng.integers(2, Kk + 1, size=Q).astype(np.int32)
        for q in range(Q):
            row = [
                np.unique(rng.integers(0, 400, size=int(rng.integers(1, L)), dtype=np.uint32))
                for _ in range(Kk)
            ]
            lists.append(row)
        mat = np.zeros((Q, Kk, L), dtype=np.uint32)
        cnt = np.zeros((Q, Kk), dtype=np.int32)
        for q in range(Q):
            for j in range(Kk):
                mat[q, j, : len(lists[q][j])] = lists[q][j]
                cnt[q, j] = len(lists[q][j])
        vals, oc = _jit_intersect(jnp.asarray(mat), jnp.asarray(cnt), jnp.asarray(kv))
        vals, oc = np.asarray(vals), np.asarray(oc)
        for q in range(Q):
            want = set(lists[q][0])
            for j in range(1, kv[q]):
                want &= set(lists[q][j])
            got = vals[q, : oc[q]].tolist()
            assert got == sorted(want), q

    def test_union_many(self, rng):
        Q, Kk, L = 12, 3, 128
        kv = rng.integers(1, Kk + 1, size=Q).astype(np.int32)
        rows = [
            [
                np.unique(rng.integers(0, 300, size=int(rng.integers(1, L)), dtype=np.uint32))
                for _ in range(Kk)
            ]
            for _ in range(Q)
        ]
        mat = np.zeros((Q, Kk, L), dtype=np.uint32)
        cnt = np.zeros((Q, Kk), dtype=np.int32)
        for q in range(Q):
            for j in range(Kk):
                mat[q, j, : len(rows[q][j])] = rows[q][j]
                cnt[q, j] = len(rows[q][j])
        vals, oc = _jit_union(jnp.asarray(mat), jnp.asarray(cnt), jnp.asarray(kv))
        vals, oc = np.asarray(vals), np.asarray(oc)
        for q in range(Q):
            want = set()
            for j in range(kv[q]):
                want |= set(rows[q][j])
            assert vals[q, : oc[q]].tolist() == sorted(want), q

    def test_filter_removed(self, rng):
        Q, L = 10, 128
        rows = [
            np.unique(rng.integers(0, 500, size=int(rng.integers(0, L)), dtype=np.uint32))
            for _ in range(Q)
        ]
        vals, cnt = _pad_rows(rows, L)
        removed = np.unique(rng.integers(0, 500, size=60, dtype=np.uint32))
        out, oc = _jit_filter(jnp.asarray(vals), jnp.asarray(cnt), jnp.asarray(removed))
        out, oc = np.asarray(out), np.asarray(oc)
        rs = set(removed.tolist())
        for q in range(Q):
            want = [v for v in rows[q].tolist() if v not in rs]
            assert out[q, : oc[q]].tolist() == want, q

    def test_sentinel_value_is_a_real_value(self):
        # 0xFFFFFFFF must survive set ops as a legitimate posting value
        a = np.array([[5, 0xFFFFFFFF]], dtype=np.uint32)
        b = np.array([[0xFFFFFFFF, 0]], dtype=np.uint32)
        mat = np.zeros((1, 2, 4), dtype=np.uint32)
        mat[0, 0, :2] = a
        mat[0, 1, :2] = [0xFFFFFFFF, 0]
        mat[0, 1, :2].sort()
        cnt = np.array([[2, 2]], dtype=np.int32)
        vals, oc = _jit_intersect(jnp.asarray(mat), jnp.asarray(cnt), jnp.asarray([2]))
        assert np.asarray(vals)[0, : int(oc[0])].tolist() == [0xFFFFFFFF]
        vals, oc = _jit_union(jnp.asarray(mat), jnp.asarray(cnt), jnp.asarray([2]))
        assert np.asarray(vals)[0, : int(oc[0])].tolist() == [0, 5, 0xFFFFFFFF]


class TestByteAlignedDecode:
    def test_ba_decoder_matches_generic(self, rng):
        lists = [
            np.unique(rng.integers(0, 5_000_000, size=int(s), dtype=np.uint32))
            for s in rng.integers(1, 900, size=50)
        ]
        voffs = np.zeros(len(lists) + 1, dtype=np.int64)
        np.cumsum([len(l) for l in lists], out=voffs[1:])
        words, outs = P.encode_bulk(np.concatenate(lists), voffs, byte_align=True)
        counts, nblocks, block_off, _ = P.scan_term_blocks(words, outs)
        nb1 = np.maximum(nblocks, 1)
        tbs = np.zeros(len(lists) + 1, dtype=np.int32)
        np.cumsum(nb1, out=tbs[1:])
        flat = np.zeros(tbs[-1], dtype=np.int32)
        for i in range(len(lists)):
            flat[tbs[i] : tbs[i] + nb1[i]] = block_off[i, : nb1[i]]
        wpad = jnp.asarray(np.concatenate([words, np.zeros(D.WIN, np.uint32)]))
        term_idx = jnp.asarray(rng.integers(0, len(lists), size=40).astype(np.int32))
        L = 1024
        f = jax.jit(D.gather_postings, static_argnums=(5, 6))
        va, ca = f(wpad, jnp.asarray(flat), jnp.asarray(tbs),
                   jnp.asarray(counts.astype(np.int32)), term_idx, L, True)
        va, ca = np.asarray(va), np.asarray(ca)
        for q, t in enumerate(np.asarray(term_idx)):
            want = lists[t][:L]
            assert ca[q] == len(want)
            assert np.array_equal(va[q, : len(want)], want), q


class TestIntersectSort:
    def test_sort_path_matches_sets(self, rng):
        """Large-L intersect takes the sort-based run-length path; fuzz it
        against Python sets incl. genuine 0xFFFFFFFF members and empty
        lists."""
        from inverted_index_2_tpu.ops import setops

        Q, K, L = 48, 5, 1024  # L*L > _BROADCAST_LIMIT -> sort path
        assert L * L > setops._BROADCAST_LIMIT
        lists = np.zeros((Q, K, L), np.uint32)
        counts = np.zeros((Q, K), np.int32)
        kv = rng.integers(1, K + 1, size=Q).astype(np.int32)
        want = []
        for q in range(Q):
            sets = []
            for k in range(kv[q]):
                n = int(rng.integers(0, L + 1))
                v = np.unique(rng.integers(0, 3000, size=n, dtype=np.uint32))
                if rng.random() < 0.3:
                    v = np.unique(
                        np.concatenate([v, [0xFFFFFFFF]])
                    ).astype(np.uint32)
                lists[q, k, : len(v)] = v
                counts[q, k] = len(v)
                sets.append(set(v.tolist()))
            want.append(sorted(set.intersection(*sets)))
        out, oc = jax.jit(setops.intersect_many)(
            jnp.asarray(lists), jnp.asarray(counts), jnp.asarray(kv)
        )
        out, oc = np.asarray(out), np.asarray(oc)
        for q in range(Q):
            assert out[q, : oc[q]].tolist() == want[q], q


class TestCompaction:
    """compact_keep (cumsum + binary-search gather) vs the sort oracle."""

    def test_compact_matches_sort(self):
        from inverted_index_2_tpu.ops import compaction as C

        rng = np.random.default_rng(7)
        for Q, S_ in [(8, 64), (5, 257), (1, 1), (16, 1024)]:
            vals = rng.integers(0, 2**32, size=(Q, S_), dtype=np.uint32)
            vals.sort(axis=1)
            keep = rng.random((Q, S_)) < rng.uniform(0.0, 1.0, (Q, 1))
            out, oc = jax.jit(C.compact_keep)(
                jnp.asarray(vals), jnp.asarray(keep)
            )
            out, oc = np.asarray(out), np.asarray(oc)
            want = np.sort(
                np.where(keep, vals, np.uint32(0xFFFFFFFF)), axis=1
            )
            assert np.array_equal(out, want)
            assert np.array_equal(oc, keep.sum(axis=1))

    def test_compact_edge_masks(self):
        from inverted_index_2_tpu.ops import compaction as C

        vals = np.arange(16, dtype=np.uint32)[None, :].repeat(3, axis=0)
        keep = np.stack([
            np.ones(16, bool), np.zeros(16, bool),
            np.arange(16) == 15,
        ])
        out, oc = jax.jit(C.compact_keep)(jnp.asarray(vals), jnp.asarray(keep))
        out, oc = np.asarray(out), np.asarray(oc)
        assert oc.tolist() == [16, 0, 1]
        assert out[0].tolist() == list(range(16))
        assert np.all(out[1] == 0xFFFFFFFF)
        assert out[2, 0] == 15 and np.all(out[2, 1:] == 0xFFFFFFFF)

    def test_compact_shift_matches_keep(self):
        # the gather-free monotone-shift formulation is exactly
        # compact_keep on every mask shape (incl. the keep=[0,1,0,1]
        # pattern that breaks a high-to-low shift order)
        from inverted_index_2_tpu.ops import compaction as C

        rng = np.random.default_rng(11)
        cases = [(8, 64), (5, 257), (1, 1), (16, 1024), (3, 2)]
        for Q, S_ in cases:
            vals = rng.integers(0, 2**32, size=(Q, S_), dtype=np.uint32)
            keep = rng.random((Q, S_)) < rng.uniform(0.0, 1.0, (Q, 1))
            want, woc = jax.jit(C.compact_keep)(
                jnp.asarray(vals), jnp.asarray(keep))
            out, oc = jax.jit(C.compact_shift)(
                jnp.asarray(vals), jnp.asarray(keep))
            assert np.array_equal(np.asarray(out), np.asarray(want)), (Q, S_)
            assert np.array_equal(np.asarray(oc), np.asarray(woc))
        out, oc = jax.jit(C.compact_shift)(
            jnp.asarray(np.array([[9, 7, 9, 5]], np.uint32)),
            jnp.asarray(np.array([[False, True, False, True]])),
        )
        assert np.asarray(out)[0].tolist() == [7, 5, 0xFFFFFFFF, 0xFFFFFFFF]
        assert int(oc[0]) == 2

    def test_compact_preserves_stable_order_unsorted(self):
        # stability is the contract — unsorted inputs keep relative order
        from inverted_index_2_tpu.ops import compaction as C

        vals = np.array([[5, 3, 9, 3, 1, 7]], dtype=np.uint32)
        keep = np.array([[True, False, True, True, False, True]])
        out, oc = jax.jit(C.compact_keep)(jnp.asarray(vals), jnp.asarray(keep))
        assert np.asarray(out)[0, :4].tolist() == [5, 9, 3, 7]
        assert int(oc[0]) == 4
