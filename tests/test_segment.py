"""Segment writer/reader round trips (mirror of file/writer_test.go)."""
import os

import numpy as np
import pytest

from inverted_index_2_tpu.codec import packing
from inverted_index_2_tpu.segment import formats, writer
from inverted_index_2_tpu.segment.reader import SegmentView


def test_normal_mode_round_trip(tmp_path, rng):
    """Mirror of writer_test.go:11-46 (normal mode, incl. empty values list)."""
    d = str(tmp_path)
    terms = [b"alpha", b"beta", b"empty", b"gamma"]
    lists = [
        np.array([1, 5, 9], dtype=np.uint32),
        np.array([2], dtype=np.uint32),
        np.zeros(0, dtype=np.uint32),
        np.unique(rng.integers(0, 2**32, size=500, dtype=np.uint32)),
    ]
    blob, offsets = writer.terms_to_blob(terms)
    voffs = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lists], out=voffs[1:])
    key = writer.write_normal_segment(d, blob, offsets, np.concatenate(lists), voffs)

    v = SegmentView(d, key)
    assert v.mode == formats.MODE_NORMAL
    assert v.n_terms == 4
    assert v.min_term == b"alpha" and v.max_term == b"gamma"
    for i, (t, l) in enumerate(zip(terms, lists)):
        assert v.term(i) == t
        assert np.array_equal(v.values(i), l)


def test_direct_mode_round_trip(tmp_path):
    """Mirror of writer_test.go:48-84 (direct mode: value stored inline)."""
    d = str(tmp_path)
    terms = [b"aa", b"bb", b"cc"]
    blob, offsets = writer.terms_to_blob(terms)
    key = writer.write_direct_segment(d, blob, offsets, np.uint32(42))
    v = SegmentView(d, key)
    assert v.mode == formats.MODE_DIRECT
    assert not os.path.exists(formats.vals_path(d, key))  # no _vals file
    for i, t in enumerate(terms):
        assert v.term(i) == t
        assert v.values(i).tolist() == [42]
        assert v.value_count(i) == 1


def test_atomic_publish_no_tmp_left(tmp_path):
    d = str(tmp_path)
    blob, offsets = writer.terms_to_blob([b"x"])
    writer.write_direct_segment(d, blob, offsets, np.uint32(1))
    names = os.listdir(d)
    assert all(not n.endswith(formats.TMP_SUFFIX) for n in names)


def test_range_iteration(tmp_path):
    d = str(tmp_path)
    terms = [b"AA", b"BB", b"CC", b"DD"]
    blob, offsets = writer.terms_to_blob(terms)
    key = writer.write_direct_segment(d, blob, offsets, np.uint32(7))
    v = SegmentView(d, key)
    got = [t for t, _ in v.iterate(b"BB", b"CC")]
    assert got == [b"BB", b"CC"]
    assert [t for t, _ in v.iterate(None, b"AA")] == [b"AA"]
    assert [t for t, _ in v.iterate(b"CC", None)] == [b"CC", b"DD"]
    assert [t for t, _ in v.iterate(b"E", None)] == []
    assert not v.overlaps(b"E", None)
    assert v.overlaps(b"B", b"B\xff")


def test_find_and_bounds(tmp_path):
    d = str(tmp_path)
    terms = [b"b", b"d", b"f"]
    blob, offsets = writer.terms_to_blob(terms)
    key = writer.write_direct_segment(d, blob, offsets, np.uint32(1))
    v = SegmentView(d, key)
    assert v.find(b"d") == 1
    assert v.find(b"c") == -1
    assert v.lower_bound(b"c") == 1
    assert v.upper_bound(b"d") == 2


def test_remove_segment_tolerates_missing(tmp_path):
    formats.remove_segment(str(tmp_path), "12345")  # no error


def test_streaming_writer_round_trip(tmp_path):
    """Parity with file.Writer's Append/Close streaming protocol."""
    from inverted_index_2_tpu.segment.writer import SegmentWriter

    d = str(tmp_path)
    w = SegmentWriter(d)
    w.append(b"aa", [3, 9])
    w.append(b"bb", [1])
    w.append(b"cc", [])
    key = w.close()
    assert w.get_key() == key
    v = SegmentView(d, key)
    assert [(v.term(i), v.values(i).tolist()) for i in range(3)] == [
        (b"aa", [3, 9]), (b"bb", [1]), (b"cc", []),
    ]

    with pytest.raises(ValueError):
        w2 = SegmentWriter(d)
        w2.append(b"bb")
        w2.append(b"aa")

    wd = SegmentWriter(d, direct=True, value=7)
    wd.append(b"x")
    wd.append(b"y")
    vd = SegmentView(d, wd.close())
    assert vd.values(0).tolist() == [7] and vd.values(1).tolist() == [7]


def test_compact_flags_round_trip(tmp_path):
    """FLAG_OUTS_CONST + FLAG_FIXED_WIDTH (direct ingest fast path) read back
    identically through the mmap'd lazy reader; variable widths / plain
    arrays fall back to the full layout."""
    import numpy as np

    from inverted_index_2_tpu.segment import formats, writer
    from inverted_index_2_tpu.segment.reader import SegmentView

    d = str(tmp_path)
    # fixed-width terms, one shared value -> both compact flags
    terms = [b"aaa1", b"aaa2", b"bbb3"]
    blob = b"".join(terms)
    offs = np.array([0, 4, 8, 12], dtype=np.int64)
    key = writer.write_direct_segment(d, blob, offs, np.uint32(7))
    with open(formats.dict_path(d, key), "rb") as f:
        hdr = formats.read_header(f.read(formats.HEADER_SIZE))
    assert hdr.flags & formats.FLAG_OUTS_CONST
    assert hdr.flags & formats.FLAG_FIXED_WIDTH
    v = SegmentView(d, key)
    assert [v.term(i) for i in range(3)] == terms
    assert v.outs.tolist() == [7, 7, 7]
    assert v.offsets.tolist() == [0, 4, 8, 12]
    assert v.min_term == b"aaa1" and v.max_term == b"bbb3"

    # variable-width terms: fixed-width must NOT engage
    terms = [b"a", b"bb", b"ccc"]
    blob = b"".join(terms)
    offs = np.array([0, 1, 3, 6], dtype=np.int64)
    key = writer.write_direct_segment(d, blob, offs, np.uint32(3))
    with open(formats.dict_path(d, key), "rb") as f:
        hdr = formats.read_header(f.read(formats.HEADER_SIZE))
    assert hdr.flags & formats.FLAG_OUTS_CONST
    assert not (hdr.flags & formats.FLAG_FIXED_WIDTH)
    v = SegmentView(d, key)
    assert [v.term(i) for i in range(3)] == terms
    assert v.values(1).tolist() == [3]
