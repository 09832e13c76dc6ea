"""Crash-consistency behaviors (SURVEY §5 failure-detection parity):
segments publish atomically; loaders ignore litter; a crash mid-merge leaves
inputs intact and a duplicate merged segment is harmless (read-time union)."""
import os
import shutil

import numpy as np
import pytest

from inverted_index_2_tpu import InvertedIndex, Shard, to_slice
from inverted_index_2_tpu.removed_list import unserialize_removed_list
from inverted_index_2_tpu.segment import formats


def dump(x):
    return {tv.term: tv.values.tolist() for tv in to_slice(x.read(None, None))}


def test_tmp_litter_ignored(tmp_path):
    d = os.path.join(str(tmp_path), "s")
    sh = Shard(d)
    sh.put([b"alpha"], 1)
    # simulate a crash mid-write: dangling tmp files
    for name in ("999_dict_tmp", "999_vals_tmp"):
        with open(os.path.join(d, name), "wb") as f:
            f.write(b"partial garbage")
    sh2 = Shard(d)
    assert dump(sh2) == {b"alpha": [1]}


def test_crash_after_merge_publish_before_input_delete(tmp_path):
    """Worst-case crash window in merge: output published, inputs not yet
    deleted (reference deletes inputs last, shard.go:233-242). On reopen both
    the merged segment and its inputs are visible; union semantics make the
    duplicates harmless."""
    d1 = os.path.join(str(tmp_path), "a")
    sh = Shard(d1)
    sh.put([b"t1", b"t2"], 1)
    sh.put([b"t2", b"t3"], 2)
    before = dump(sh)

    # snapshot the pre-merge files (the "inputs")
    d2 = os.path.join(str(tmp_path), "b")
    shutil.copytree(d1, d2)
    # merge in the copy, then RESTORE the input files next to the output,
    # simulating a crash before deletion
    sh2 = Shard(d2)
    assert sh2.merge(2, 10) == 2
    for name in os.listdir(d1):
        src = os.path.join(d1, name)
        dst = os.path.join(d2, name)
        if not os.path.exists(dst):
            shutil.copy(src, dst)

    sh3 = Shard(d2)
    n_segments = len([f for f in os.listdir(d2) if f.endswith("_dict")])
    assert n_segments == 3  # merged output + 2 resurrected inputs
    assert dump(sh3) == before  # duplicates union away
    # and compaction converges afterwards
    while sh3.merge(2, 10) > 0:
        pass
    assert dump(sh3) == before


def test_corrupt_removed_list_rejected(tmp_path):
    with pytest.raises(ValueError):
        unserialize_removed_list(b"not a removed list at all")


def test_partially_written_dict_raises_on_load(tmp_path):
    d = os.path.join(str(tmp_path), "s")
    os.makedirs(d)
    with open(os.path.join(d, "123_dict"), "wb") as f:
        f.write(b"\x00" * 8)  # bad magic, truncated
    with pytest.raises(Exception):
        Shard(d)


def test_reopen_equivalence_after_everything(tmp_path, rng):
    """Checkpoint/resume: the index IS its files (SURVEY §5). Random workload,
    then byte-level reopen must reproduce identical logical state."""
    d = str(tmp_path)
    ii = InvertedIndex(d)
    vocab = [f"w{i:03d}".encode() for i in range(50)]
    for doc in range(1, 40):
        terms = [vocab[i] for i in rng.choice(len(vocab), size=4, replace=False)]
        ii.put(terms, doc)
    ii.put_removed([3, 7, 11])
    ii.merge(2, 5, 2)  # partial compaction only
    want = dump(ii)
    ii2 = InvertedIndex(d)
    assert dump(ii2) == want
    # tombstones also survive
    s1 = {s.get_key(): s.removed_list.values().tolist() for s in ii._snapshot()}
    s2 = {s.get_key(): s.removed_list.values().tolist() for s in ii2._snapshot()}
    assert s1 == s2


def test_corruption_fuzz_never_crashes(tmp_path, rng):
    """Random byte flips in segment files must raise cleanly (ValueError /
    struct errors) or be survivable — never segfault or return garbage that
    escapes as Python-level corruption (the native decoder bounds-checks
    untrusted disk bytes). Flips that happen to keep files well-formed are
    fine; the invariant is NO crash."""
    import numpy as np

    from inverted_index_2_tpu import InvertedIndex, to_slice

    d = str(tmp_path)
    ii = InvertedIndex(d)
    for v in range(1, 30):
        ii.put([f"term{v:02d}".encode(), b"shared"], v)
    while ii.merge(2, 100, 2) > 0:
        pass
    del ii
    files = []
    for root, _dirs, names in os.walk(d):
        for nm in names:
            files.append(os.path.join(root, nm))
    assert files
    for trial in range(40):
        target = files[int(rng.integers(0, len(files)))]
        orig = open(target, "rb").read()
        if not len(orig):
            continue
        data = bytearray(orig)
        for _ in range(int(rng.integers(1, 4))):
            data[int(rng.integers(0, len(data)))] ^= int(rng.integers(1, 256))
        with open(target, "wb") as f:
            f.write(bytes(data))
        try:
            ii2 = InvertedIndex(d)
            for tv in to_slice(ii2.read(None, None)):
                assert isinstance(tv.term, bytes)
                np.asarray(tv.values)
        except (ValueError, KeyError, OverflowError, MemoryError, OSError):
            pass  # clean rejection is acceptable
        finally:
            with open(target, "wb") as f:
                f.write(orig)
