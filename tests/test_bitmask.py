"""Bitmask codec tests (mirror of file/bitmask_test.go)."""
import numpy as np

from inverted_index_2_tpu.codec import packing
from inverted_index_2_tpu.codec.bitmask import Bitmask


def test_round_trip_and_dictionary_growth(rng):
    bm = Bitmask()
    batches = [
        np.unique(rng.integers(0, 10_000, size=int(s), dtype=np.uint32))
        for s in rng.integers(1, 200, size=20)
    ]
    encoded = [bm.put(b) for b in batches]
    for enc, want in zip(encoded, batches):
        got, consumed = bm.get(enc)
        assert consumed == len(enc)
        assert sorted(got.tolist()) == sorted(want.tolist())


def test_stream_decode(rng):
    """Mirror of bitmask_test.go:34-53: self-delimiting stream decoding."""
    bm = Bitmask()
    batches = [np.array([1, 2, 3], dtype=np.uint32),
               np.array([2, 3, 4, 99], dtype=np.uint32),
               np.array([], dtype=np.uint32)]
    stream = b"".join(bm.put(b) for b in batches)
    off = 0
    for want in batches:
        got, consumed = bm.get(stream, off)
        off += consumed
        assert sorted(got.tolist()) == sorted(want.tolist())
    assert off == len(stream)


def test_shared_values_amortize(rng):
    """Mirror of bitmask_test.go:14-32 size-comparison intent: when many terms
    share the same value set, the bitmap encoding amortizes storage vs.
    per-term compressed ints."""
    shared = np.unique(rng.integers(0, 2**32, size=500, dtype=np.uint32))
    bm = Bitmask()
    n_terms = 50
    bitmask_bytes = sum(len(bm.put(shared)) for _ in range(n_terms))
    bitmask_bytes += 4 * len(bm.all_values())  # the dictionary itself
    intcomp_bytes = n_terms * len(packing.encode_postings(shared)) * 4
    assert bitmask_bytes < intcomp_bytes


def test_all_values_insertion_order():
    bm = Bitmask()
    bm.put(np.array([7, 3], dtype=np.uint32))
    bm.put(np.array([3, 9], dtype=np.uint32))
    assert bm.all_values().tolist() == [7, 3, 9]
