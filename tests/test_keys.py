"""Term key packing: exact bytes.Compare order (the vellum-FST replacement)."""
import bisect
import itertools

import numpy as np
import pytest

from inverted_index_2_tpu.codec import keys as K

EDGE_TERMS = [
    b"",
    b"\x00",
    b"\x00\x00",
    b"a",
    b"ab",
    b"ab\x00",
    b"ab\x00c",
    b"abc",
    b"abcd",
    b"abcde" * 5,
    bytes([255]),
    bytes([255] * 9),
    b"abc\xff",
]


def _py_cmp(a, b):
    return (a > b) - (a < b)


def test_pairwise_exact_order():
    keys = K.pack_terms(EDGE_TERMS)
    for (i, a), (j, b) in itertools.product(enumerate(EDGE_TERMS), repeat=2):
        got = K._cmp_rows(keys[i][None], keys[j][None])[0]
        assert got == _py_cmp(a, b), (a, b)


def test_fuzz_order_matches_bytes_compare(rng):
    terms = [
        bytes(rng.integers(0, 256, size=int(l), dtype=np.uint8))
        for l in rng.integers(0, 20, size=500)
    ]
    keys = K.pack_terms(terms)
    order = K.lexsort_rows(keys)
    assert [terms[i] for i in order] == sorted(terms)


def test_searchsorted_rows_matches_bisect(rng):
    terms = sorted(
        {bytes(rng.integers(97, 110, size=int(l), dtype=np.uint8)) for l in rng.integers(0, 8, size=300)}
    )
    keys = K.pack_terms(terms)
    W = keys.shape[1] - 1
    queries = terms + [
        bytes(rng.integers(97, 110, size=int(l), dtype=np.uint8)) for l in rng.integers(0, 8, size=200)
    ]
    qk = K.pack_terms(queries, width=W)
    left = K.searchsorted_rows(keys, qk)
    right = K.searchsorted_rows(keys, qk, side="right")
    for i, q in enumerate(queries):
        assert left[i] == bisect.bisect_left(terms, q)
        assert right[i] == bisect.bisect_right(terms, q)


def test_widen_preserves_order(rng):
    terms = sorted({bytes(rng.integers(0, 256, size=int(l), dtype=np.uint8)) for l in rng.integers(1, 6, size=100)})
    k1 = K.pack_terms(terms)
    k2 = K.widen(k1, 8)
    assert np.array_equal(K.lexsort_rows(k2), np.arange(len(terms)))


def test_empty():
    keys = K.pack_terms([])
    assert keys.shape[0] == 0
    assert K.searchsorted_rows(keys, K.pack_terms([b"a"], width=keys.shape[1] - 1)).tolist() == [0]
