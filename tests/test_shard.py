"""Shard (LSM engine) component tests — mirror of shard_test.go."""
import os
import threading

import numpy as np
import pytest

from inverted_index_2_tpu import Shard, to_slice
from machine import Check, Compare, CountSegments, IngestBulk, Machine, Merge, Remove


def make_shard(tmp_path):
    return Shard(os.path.join(str(tmp_path), "s"))


def test_min_max_terms(tmp_path):
    """Mirror of shard_test.go:16-38."""
    sh = make_shard(tmp_path)
    sh.put([b"term1"], 1)
    assert sh.min_max() == [b"term1", b"term1"]
    sh.put([b"term2"], 2)
    assert sh.min_max() == [b"term1", b"term2"]
    sh.put([b"term1", b"term2", b"term3"], 3)
    assert sh.min_max() == [b"term1", b"term3"]


def test_init_from_existing_files(tmp_path):
    """Mirror of shard_test.go:40-63: reopen-from-disk recovery."""
    d = os.path.join(str(tmp_path), "s")
    sh = Shard(d)
    sh.put([b"term1", b"term2"], 1)
    sh.put([b"term2", b"term3"], 2)
    sh.close()

    sh = Shard(d)
    got = [(tv.term, tv.values.tolist()) for tv in to_slice(sh.read(None, None))]
    assert got == [(b"term1", [1]), (b"term2", [1, 2]), (b"term3", [2])]


def test_ingestion(tmp_path):
    """Mirror of shard_test.go TestIngestion (idempotency via read-time union)."""
    m = Machine(tmp_path)
    m.run(
        [
            IngestBulk({1: [b"term1"]}),
            Compare({b"term1": [1]}),
            IngestBulk({1: [b"term1"], 2: [b"term1", b"term2"], 3: [b"term3"]}),
            Compare({b"term1": [1, 2], b"term2": [2], b"term3": [3]}),
        ]
    )
    m.close()


@pytest.mark.parametrize("should_merge", [True, False])
def test_read_partial(tmp_path, should_merge):
    """Mirror of shard_test.go TestReadPartial: range reads on merged AND
    unmerged states."""
    sh = make_shard(tmp_path)
    for val, terms in [(1, [b"AA"]), (2, [b"BB"]), (3, [b"CC"])]:
        sh.put(terms, val)
    if should_merge:
        sh.merge(2, 200)

    got = [(tv.term, tv.values.tolist()) for tv in to_slice(sh.read(b"AA", b"BB"))]
    assert got == [(b"AA", [1]), (b"BB", [2])]
    got = [(tv.term, tv.values.tolist()) for tv in to_slice(sh.read(b"BB", b"CC"))]
    assert got == [(b"BB", [2]), (b"CC", [3])]


def test_merging_cascade(tmp_path):
    """Mirror of shard_test.go TestMerging: exact merged counts."""
    m = Machine(tmp_path)
    m.run(
        [
            IngestBulk({1: [b"term1"], 2: [b"term1", b"term2"], 3: [b"term3"]}),
            CountSegments(3),
            Merge(3, 2, 2),
            CountSegments(2),
            Merge(2, 2, 2),
            CountSegments(1),
            Merge(2, 2, 0),  # idempotency
            CountSegments(1),
            Compare({b"term1": [1, 2], b"term2": [2], b"term3": [3]}),
        ]
    )
    m.close()


def test_merge_with_removal(tmp_path):
    """Mirror of shard_test.go TestMergeWithRemoval incl. removed-list GC."""
    m = Machine(tmp_path)
    m.run(
        [
            IngestBulk({1: [b"term1", b"term3"], 2: [b"term2"], 3: [b"term3"]}),
            CountSegments(3),
            Merge(2, 2, 2),
            CountSegments(2),
            Remove([2]),
            Merge(2, 2, 2),
            CountSegments(1),
            Compare({b"term1": [1], b"term3": [1, 3]}),
            Remove([10]),  # triggers sync: the merged-away batch is GC'd
            Check(lambda sh: np.testing.assert_array_equal(sh.removed_list.values(), [10])),
        ]
    )
    m.close()


def test_merge_empty_segment(tmp_path):
    """Mirror of shard_test.go TestMergeEmptySegment: when every value is
    purged, no output segment is written at all."""
    m = Machine(tmp_path)
    m.run(
        [
            IngestBulk({1: [b"term1"]}),
            IngestBulk({1: [b"term1"]}),
            Remove([1]),
            Merge(2, 2, 2),
            CountSegments(0),
            Compare({}),
            Remove([2]),
        ]
    )
    m.close()


def test_concurrent_access(tmp_path):
    """Mirror of shard_test.go TestConcurrentAccess: 100 threads re-running
    ingest+merge+compare against one shard."""
    m = Machine(tmp_path)
    seq_ingest = IngestBulk({1: [b"term1"], 2: [b"term1", b"term2"], 3: [b"term3"]})
    expected = {b"term1": [1, 2], b"term2": [2], b"term3": [3]}

    begin = threading.Event()
    errors = []

    def run():
        begin.wait()
        try:
            m.run_one(seq_ingest)
            m.run_one(Merge(2, 2, -1))
            m.run_one(Compare(expected))
        except BaseException as e:
            errors.append(e)

    threads = [threading.Thread(target=run) for _ in range(32)]
    for t in threads:
        t.start()
    begin.set()
    for t in threads:
        t.join()
    assert not errors, errors[0]
    m.close()


def test_duplicate_and_unsorted_terms_in_put(tmp_path):
    sh = make_shard(tmp_path)
    sh.put([b"b", b"a", b"b", b"a"], 1)
    got = [(tv.term, tv.values.tolist()) for tv in to_slice(sh.read(None, None))]
    assert got == [(b"a", [1]), (b"b", [1])]


def test_large_posting_lists_merge(tmp_path, rng):
    """Many segments with overlapping large value sets union correctly."""
    sh = make_shard(tmp_path)
    expected = set()
    for val in range(1, 40):
        sh.put([b"common", bytes([97 + val % 20])], val)
        expected.add(val)
    while sh.merge(2, 100) > 0:
        pass
    got = {tv.term: tv.values.tolist() for tv in to_slice(sh.read(b"common", b"common"))}
    assert got[b"common"] == sorted(expected)


def test_remove_gc_with_zero_live_segments(tmp_path):
    """Sync seeds with live timestamps PLUS now (shard.go:84-98): after a
    merge that drops every segment, a later remove() must still GC the stale
    tombstone batches, so a re-inserted value is NOT purged by an old batch."""
    sh = make_shard(tmp_path)
    sh.put([b"a"], 5)
    sh.put([b"b"], 5)
    sh.remove([5])
    assert sh.merge(2, 100) == 2  # everything tombstoned -> zero live segments
    assert len(to_slice(sh.read(None, None))) == 0

    # zero live segments: this remove must drop the old [5] batch
    sh.remove([6])
    sh.put([b"a"], 5)
    sh.put([b"b"], 5)
    assert sh.merge(2, 100) == 2
    got = [(tv.term, tv.values.tolist()) for tv in to_slice(sh.read(None, None))]
    assert got == [(b"a", [5]), (b"b", [5])]
