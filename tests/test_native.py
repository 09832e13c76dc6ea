"""Native C++ codec vs numpy reference: bit-identical outputs."""
import numpy as np
import pytest

from inverted_index_2_tpu.codec import native, packing


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec not built (no compiler?)"
)


def _corpus(rng, n_lists=300, max_len=3000, universe=2**32 - 1):
    lists = [
        np.unique(rng.integers(0, universe, size=int(s), dtype=np.uint32))
        for s in rng.integers(0, max_len, size=n_lists)
    ]
    lists[3] = np.zeros(0, dtype=np.uint32)
    voffs = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lists], out=voffs[1:])
    values = np.concatenate(lists)
    return values, voffs, lists


def test_encode_identical_to_numpy(rng):
    values, voffs, _ = _corpus(rng)
    w_native, o_native = native.encode_bulk(values, voffs)
    w_np, o_np = packing._encode_bulk_np(values, voffs)
    assert np.array_equal(o_native, o_np)
    assert np.array_equal(w_native, w_np)


def test_decode_identical_to_numpy(rng):
    values, voffs, lists = _corpus(rng)
    words, outs = native.encode_bulk(values, voffs)
    vn, cn, on = native.decode_bulk(words, outs)
    vp, cp, op = packing._decode_bulk_np(words, outs)
    assert np.array_equal(vn, vp) and np.array_equal(cn, cp) and np.array_equal(on, op)
    for i, l in enumerate(lists):
        assert np.array_equal(vn[on[i] : on[i + 1]], l)


def test_scan_blocks_matches(rng):
    values, voffs, _ = _corpus(rng, n_lists=80)
    words, outs = native.encode_bulk(values, voffs)
    counts, nblocks, block_off, _ = packing.scan_term_blocks(words, outs)
    nb1 = np.maximum(nblocks, 1)
    tbs = np.zeros(len(outs) + 1, dtype=np.int64)
    np.cumsum(nb1, out=tbs[1:])
    flat = native.scan_blocks(words, outs, tbs)
    for i in range(len(outs)):
        nbi = int(nb1[i])
        assert np.array_equal(
            flat[tbs[i] : tbs[i] + nbi],
            block_off[i, :nbi].astype(np.int32),
        ), i


def test_decode_rejects_garbage():
    bad = np.array([5, 0xFFFF, 0, 0], dtype=np.uint32)  # n=5, absurd header
    with pytest.raises(ValueError):
        native.decode_bulk(bad, np.array([0], dtype=np.int64))
