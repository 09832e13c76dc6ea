"""InvertedIndex integration tests — mirror of inverted_index_test.go."""
import os
import threading

import numpy as np
import pytest

from inverted_index_2_tpu import InvertedIndex, to_slice
from inverted_index_2_tpu.shard import shard_key


def dump(ii, lo=None, hi=None):
    return {tv.term: tv.values.tolist() for tv in to_slice(ii.read(lo, hi))}


def test_put_remove_merge_read(tmp_path):
    """Mirror of inverted_index_test.go:59-82 (end-to-end tombstone purge)."""
    ii = InvertedIndex(str(tmp_path))
    ii.put([b"term1", b"term2"], 1)
    ii.put([b"term1", b"term2"], 2)
    ii.put_removed([1])
    while ii.merge(1, 100, 2) > 0:
        pass
    assert dump(ii) == {b"term1": [2], b"term2": [2]}


def test_shard_routing():
    assert shard_key(b"") == "0000"
    assert shard_key(b"a") == "0000"  # <2 bytes: keyed as 0x0000 (shard.go:363-365)
    assert shard_key(b"\x00\x00") == "0000"
    assert shard_key(b"\xff\xff") == "1023"
    assert shard_key(b"ab") == f"{((ord('a') << 8) | ord('b')) >> 6:04d}"


def test_multi_shard_put_reopen(tmp_path):
    """Mirror of inverted_index_test.go:140-194: terms spread over shards,
    state survives reopen."""
    d = str(tmp_path)
    ii = InvertedIndex(d)
    terms = [b"aa", b"ab", b"ba", b"bb", b"za", b"zz", b"a", b""]
    ii.put(terms, 7)
    ii.put([b"aa", b"zz"], 9)

    shard_dirs = [e for e in os.listdir(d) if os.path.isdir(os.path.join(d, e))]
    assert len(shard_dirs) == len({shard_key(t) for t in terms})

    expected = {t: [7] for t in terms}
    expected[b"aa"] = [7, 9]
    expected[b"zz"] = [7, 9]
    assert dump(ii) == expected

    ii2 = InvertedIndex(d)
    assert dump(ii2) == expected


def test_global_sorted_order(tmp_path):
    """Shard-ordered concatenation yields a globally sorted stream
    (inverted_index.go:303-339 invariant)."""
    ii = InvertedIndex(str(tmp_path))
    terms = [b"aa", b"ab", b"ba", b"ca", b"cz", b"zz", b"a"]
    ii.put(terms, 1)
    got = [tv.term for tv in to_slice(ii.read(None, None))]
    assert got == sorted(terms)


def test_range_scoped_reads(tmp_path):
    """Mirror of inverted_index_test.go:222-281: all/left/right/both bounds."""
    ii = InvertedIndex(str(tmp_path))
    ii.put([b"aa", b"bb", b"cc", b"dd"], 1)
    assert list(dump(ii).keys()) == [b"aa", b"bb", b"cc", b"dd"]
    assert list(dump(ii, b"bb", None).keys()) == [b"bb", b"cc", b"dd"]
    assert list(dump(ii, None, b"cc").keys()) == [b"aa", b"bb", b"cc"]
    assert list(dump(ii, b"bb", b"cc").keys()) == [b"bb", b"cc"]
    assert list(dump(ii, b"bc", b"bd").keys()) == []


def test_prefix_search(tmp_path):
    """Mirror of inverted_index_test.go:196-221 incl. unmatched-prefix miss."""
    ii = InvertedIndex(str(tmp_path))
    ii.put([b"apple", b"apricot", b"banana"], 5)
    ii.put([b"applesauce"], 7)
    res = ii.prefix_search([b"ap", b"ban", b"zzz"])
    assert set(res.keys()) == {b"ap", b"ban"}
    assert res[b"ap"].tolist() == [5, 7]
    assert res[b"ban"].tolist() == [5]


def test_prefix_search_overlapping_prefixes(tmp_path):
    """Pin the DELIBERATE deviation (PARITY.md deviation 2): the reference's
    early stop at the lexicographically greatest prefix
    (inverted_index.go:266-271) would drop "banjo" for prefix "ban" when
    "band" is also queried; our monotone-correct stop keeps it."""
    ii = InvertedIndex(str(tmp_path))
    ii.put([b"banana", b"band", b"bandana"], 1)
    ii.put([b"banjo"], 9)  # sorts after every "band"-prefixed term
    res = ii.prefix_search([b"ban", b"band"])
    assert res[b"ban"].tolist() == [1, 9]  # 9 is what the reference drops
    assert res[b"band"].tolist() == [1]
    # single-prefix form agrees (no overlap interference either way)
    assert ii.prefix_search([b"ban"])[b"ban"].tolist() == [1, 9]


def test_prefix_search_dedupe(tmp_path):
    ii = InvertedIndex(str(tmp_path))
    ii.put([b"aaa", b"aab"], 3)  # both match prefix "aa" with same value
    res = ii.prefix_search([b"aa"])
    assert res[b"aa"].tolist() == [3]


def test_concurrent_writers_readers_then_merge(tmp_path):
    """Mirror of inverted_index_test.go:84-138: writer+reader storm, then
    merge-until-zero, then full verification."""
    ii = InvertedIndex(str(tmp_path))
    n_writers, n_readers, docs_per_writer = 8, 8, 5
    begin = threading.Event()
    errors = []

    def writer(w):
        begin.wait()
        try:
            for i in range(docs_per_writer):
                val = w * 100 + i
                ii.put([b"shared", f"w{w}doc{i}".encode()], val)
        except BaseException as e:
            errors.append(e)

    def reader():
        begin.wait()
        try:
            for _ in range(10):
                list(to_slice(ii.read(None, None)))
        except BaseException as e:
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    threads += [threading.Thread(target=reader) for _ in range(n_readers)]
    for t in threads:
        t.start()
    begin.set()
    for t in threads:
        t.join()
    assert not errors, errors[0]

    # merge until converged (inverted_index_test.go:126-136)
    while ii.merge(2, 10, 4) > 0:
        pass

    got = dump(ii)
    expected_shared = sorted(w * 100 + i for w in range(n_writers) for i in range(docs_per_writer))
    assert got[b"shared"] == expected_shared
    for w in range(n_writers):
        for i in range(docs_per_writer):
            assert got[f"w{w}doc{i}".encode()] == [w * 100 + i]


def test_empty_index(tmp_path):
    ii = InvertedIndex(str(tmp_path))
    assert dump(ii) == {}
    assert ii.prefix_search([b"x"]) == {}
    ii.put_removed([1, 2])
    assert ii.merge(1, 10, 2) == 0


def test_enable_logging_merge(tmp_path, caplog):
    """Parity with the reference's only log line: per-shard merge duration
    (inverted_index.go:97-99), gated by enable_logging."""
    import logging

    ii = InvertedIndex(str(tmp_path), enable_logging=True)
    ii.put([b"aa"], 1)
    ii.put([b"aa"], 2)
    with caplog.at_level(logging.INFO, logger="inverted_index_2_tpu"):
        assert ii.merge(2, 10, 1) == 2
    assert any("merged 2 segments" in r.message for r in caplog.records)


def test_read_bulk_matches_streaming(tmp_path):
    """read_bulk's columnar arrays agree with the streaming read() on the
    same range (union semantics, tombstones unapplied)."""
    import numpy as np

    from inverted_index_2_tpu import to_slice

    ii = InvertedIndex(str(tmp_path))
    ii.put([b"alpha", b"beta", b"gamma", b"delta"], 1)
    ii.put([b"beta", b"epsilon"], 2)
    ii.put_removed([1])  # must NOT affect reads
    for rng_args in ((None, None), (b"beta", b"epsilon"), (b"a", b"b"), (b"zz", None)):
        want = [(tv.term, tv.values.tolist()) for tv in to_slice(ii.read(*rng_args))]
        got = ii.read_bulk(*rng_args)
        if got is None:
            assert want == []
            continue
        blob, offs, vals, voffs = got
        rows = [
            (blob[offs[i] : offs[i + 1]].tobytes(), vals[voffs[i] : voffs[i + 1]].tolist())
            for i in range(len(offs) - 1)
        ]
        assert rows == want, rng_args


def test_put_many_equivalence(tmp_path):
    """put_many writes ONE segment per touched shard per call and is
    read-identical to per-document put()."""
    import numpy as np

    from inverted_index_2_tpu import InvertedIndex

    rng = np.random.default_rng(21)
    docs = []
    for v in range(1, 41):
        terms = [bytes(rng.integers(97, 123, size=6, dtype=np.uint8)) for _ in range(8)]
        if v % 3 == 0:
            terms.append(b"shared-term")  # repeated term across docs
        docs.append((terms, v))

    a = InvertedIndex(str(tmp_path / "a"))
    for terms, v in docs:
        a.put(terms, v)
    b = InvertedIndex(str(tmp_path / "b"))
    b.put_many(docs)

    dump_a = {tv.term: tv.values.tolist() for tv in a.read(None, None)}
    dump_b = {tv.term: tv.values.tolist() for tv in b.read(None, None)}
    assert dump_a == dump_b
    assert sorted(v for vs in dump_b.values() for v in vs)  # non-empty
    # exactly one segment per touched shard for the whole batch
    for sh in b._snapshot():
        assert len(sh.segments) == 1, sh.get_key()
    # short (<2 byte) terms route to shard 0000; values union across docs
    c = InvertedIndex(str(tmp_path / "c"))
    c.put_many([([b"a", b"xy"], 5), ([b"a"], 9)])
    dump_c = {tv.term: tv.values.tolist() for tv in c.read(None, None)}
    assert dump_c[b"a"] == [5, 9]
    assert dump_c[b"xy"] == [5]
    # reopen-equivalence (normal-mode batch segments recover from disk)
    c2 = InvertedIndex(str(tmp_path / "c"))
    assert {tv.term: tv.values.tolist() for tv in c2.read(None, None)} == dump_c
