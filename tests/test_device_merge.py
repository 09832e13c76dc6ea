"""Device compaction vs the host merge oracle: bit-identical output."""
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from inverted_index_2_tpu import Shard
from inverted_index_2_tpu.ops.merge import merge_views_device
from inverted_index_2_tpu.shard import merge_views


def _views(tmp_path, rng, n_docs=25):
    sh = Shard(os.path.join(str(tmp_path), "s"))
    vocab = [f"t{i:02d}".encode() for i in range(30)] + [b"", b"a", b"\xff\xffx"]
    for doc in range(1, n_docs + 1):
        k = int(rng.integers(1, 7))
        sh.put([vocab[i] for i in rng.choice(len(vocab), size=k, replace=False)], doc)
    return [s.view for s in sh.segments.snapshot()]


def _norm(res):
    if res is None:
        return None
    blob, offsets, values, voffs = res
    return (
        bytes(blob),
        np.asarray(offsets).tolist(),
        np.asarray(values).tolist(),
        np.asarray(voffs).tolist(),
    )


def test_device_merge_matches_host(tmp_path, rng):
    views = _views(tmp_path, rng)
    host = merge_views(views, None)
    dev = merge_views_device(views, None)
    assert _norm(dev) == _norm(host)


def test_device_merge_with_tombstones(tmp_path, rng):
    views = _views(tmp_path, rng)
    removed = np.array([1, 5, 9, 13, 200], dtype=np.uint32)
    host = merge_views(views, removed)
    dev = merge_views_device(views, removed)
    assert _norm(dev) == _norm(host)


def test_device_merge_everything_purged(tmp_path, rng):
    views = _views(tmp_path, rng, n_docs=5)
    removed = np.arange(1, 6, dtype=np.uint32)
    assert merge_views(views, removed) is None
    assert merge_views_device(views, removed) is None


def test_shard_merge_device_dispatch(tmp_path, monkeypatch, rng):
    """Force the device-merge threshold to 0 and verify Shard.merge produces
    the same on-disk result through ops/merge.py as the host path."""
    import inverted_index_2_tpu.shard as shard_mod
    from inverted_index_2_tpu import Shard, to_slice

    def build(where):
        sh = Shard(os.path.join(str(tmp_path), where))
        r = np.random.default_rng(3)
        for doc in range(1, 30):
            terms = [bytes(r.integers(97, 105, size=4, dtype=np.uint8)) for _ in range(4)]
            sh.put(terms, doc)
        sh.remove(np.array([5, 6], dtype=np.uint32))
        return sh

    host_sh = build("host")
    while host_sh.merge(2, 100) > 0:
        pass

    monkeypatch.setattr(shard_mod, "DEVICE_MERGE_MIN_VALUES", 0)
    dev_sh = build("dev")
    while dev_sh.merge(2, 100) > 0:
        pass

    h = [(tv.term, tv.values.tolist()) for tv in to_slice(host_sh.read(None, None))]
    d = [(tv.term, tv.values.tolist()) for tv in to_slice(dev_sh.read(None, None))]
    assert h == d
