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


def test_decode_rejects_overwide_bitwidth():
    # header with b=40 (invalid; > 32) must be rejected, not decoded as garbage
    bad = np.array([3, 40 | (3 << 8), 100, 0, 0], dtype=np.uint32)
    with pytest.raises(ValueError):
        native.decode_bulk(bad, np.array([0], dtype=np.int64))


def test_decode_rejects_truncated_buffer():
    # count says 200 values but the buffer ends after one block
    good = packing.encode_postings(np.arange(100, dtype=np.uint32))
    bad = good.copy()
    bad[0] = 200  # promises more blocks than exist
    with pytest.raises(ValueError):
        native.decode_bulk(bad, np.array([0], dtype=np.int64))


def test_decode_rejects_blocks_overrunning_count():
    """A corrupt stream whose blocks claim MORE values than the count word
    must be rejected BEFORE anything is written past the count-sized output
    buffer (regression: the overrun check ran after the block decode, so
    fuzzed segments scribbled up to 127 values past the allocation — heap
    corruption that surfaced as an abort in a later XLA compile)."""
    good = packing.encode_postings(np.arange(128, dtype=np.uint32))
    bad = good.copy()
    bad[0] = 3  # count says 3; the single block still claims n_blk=128
    with pytest.raises(ValueError):
        native.decode_bulk(bad, np.array([0], dtype=np.int64))
    # same stream through the fused serve path
    with pytest.raises(ValueError):
        native.boolean_serve(
            bad, np.array([0], dtype=np.int64), None, None,
            np.array([0, 1], dtype=np.int64), None, True,
        )


def test_scan_rejects_zero_nblk():
    # n=256 with an n_blk=0 header would loop forever without validation
    bad = np.array([256, 0 | (0 << 8), 5, 0, 0], dtype=np.uint32)
    tbs = np.array([0, 2], dtype=np.int64)
    with pytest.raises(ValueError):
        native.scan_blocks(bad, np.array([0], dtype=np.int64), tbs)


def test_pack_keys_native_matches_numpy(rng):
    from inverted_index_2_tpu.codec import keys as K
    from inverted_index_2_tpu.codec import native

    if not native.available():
        import pytest

        pytest.skip("native lib absent")
    terms = [
        bytes(rng.integers(0, 256, size=int(l), dtype=np.uint8))
        for l in rng.integers(0, 23, size=1500)
    ]
    blob = b"".join(terms)
    offsets = np.zeros(len(terms) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in terms], out=offsets[1:])
    arr = np.frombuffer(blob, dtype=np.uint8)
    for W in (1, 3, 6, 8):
        a = native.pack_keys(arr, offsets, W)
        # numpy path (force by slicing below the dispatch threshold)
        b = np.concatenate(
            [K.pack_blob(arr[offsets[i] : offsets[i + 1]].tobytes(),
                         np.array([0, offsets[i + 1] - offsets[i]]), W)
             for i in range(len(terms))]
        )
        assert np.array_equal(a, b), W
