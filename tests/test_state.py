"""Registry / removed-list / pool unit tests (mirrors of segments_test.go,
removed_list_test.go, evictable_pool_test.go)."""
import time

import numpy as np
import pytest

from inverted_index_2_tpu.evictable_pool import Pool
from inverted_index_2_tpu.removed_list import RemovedLists, unserialize_removed_list
from inverted_index_2_tpu.segment.registry import Segment, Segments


def _seg(key, terms):
    return Segment(key, terms, b"a", b"z", None)


class TestRegistry:
    def test_sorted_by_terms_count(self):
        """Mirror of segments_test.go:8-17: registry ordered by size."""
        s = Segments()
        s.add(_seg("1", 50))
        s.add(_seg("2", 10))
        s.add(_seg("3", 30))
        assert [x.terms for x in s.snapshot()] == [10, 30, 50]

    def test_detach(self):
        """Mirror of segments_test.go:19-34."""
        s = Segments()
        a, b, c = _seg("1", 1), _seg("2", 2), _seg("3", 3)
        for x in (a, b, c):
            s.add(x)
        s.detach([b])
        assert [x.key for x in s.snapshot()] == ["1", "3"]
        assert len(s) == 2

    def test_claim_smallest_first(self):
        s = Segments()
        for k, t in [("big", 100), ("small", 1), ("mid", 10)]:
            s.add(_seg(k, t))
        claimed = s.claim_for_merge(2)
        assert [x.key for x in claimed] == ["small", "mid"]
        # claimed segments are skipped by subsequent claims
        assert [x.key for x in s.claim_for_merge(5)] == ["big"]

    def test_pin_release_and_wait(self):
        import threading

        s = Segments()
        a = _seg("1", 1)
        s.add(a)
        pinned = s.pin_all()
        done = []

        def waiter():
            a.wait_unpinned()
            done.append(True)

        t = threading.Thread(target=waiter)
        t.start()
        time.sleep(0.05)
        assert not done
        Segments.release(pinned)
        t.join(timeout=2)
        assert done


class TestRemovedLists:
    def test_put_values_sync(self):
        """Mirror of removed_list_test.go:9-24."""
        rl = RemovedLists()
        rl.put(100, [5, 1])
        rl.put(200, [3])
        assert rl.values().tolist() == [1, 3, 5]
        rl.sync([150])  # batch@100 is older than the oldest live segment
        assert rl.values().tolist() == [3]
        rl.sync([])  # no live segments: no-op
        assert rl.values().tolist() == [3]

    def test_serialize_round_trip(self):
        """Mirror of removed_list_test.go:26-37."""
        rl = RemovedLists()
        rl.put(123456789, np.array([9, 2, 4], dtype=np.uint32))
        rl.put(987654321, np.array([], dtype=np.uint32))
        rl2 = unserialize_removed_list(rl.serialize())
        assert set(rl2.lists.keys()) == {123456789, 987654321}
        assert rl2.lists[123456789].tolist() == [9, 2, 4]
        assert rl2.values().tolist() == [2, 4, 9]


class TestPool:
    def test_reuse(self):
        """Mirror of evictable_pool_test.go:30-47."""
        made = []
        p = Pool(10.0, lambda: made.append(1) or object())
        a = p.get()
        p.put(a)
        b = p.get()
        assert a is b
        assert len(made) == 1
        p.close()

    def test_ttl_eviction(self):
        """Mirror of evictable_pool_test.go:9-28."""
        p = Pool(0.05, lambda: object())
        p.put(object())
        assert p.size() == 1
        time.sleep(0.25)
        assert p.size() == 0
        p.close()

    def test_close_stops(self):
        p = Pool(0.01, lambda: object())
        p.close()
        p.put(object())
        assert p.size() == 0


def test_merge_uses_scratch_pool(tmp_path):
    """The evictable pool serves the compaction hot path (reference parity:
    the FST-builder pool serves Put/Merge, inverted_index.go:344-352):
    merging draws a scratch from the shared pool and returns it."""
    import inverted_index_2_tpu.shard as shard_mod
    from inverted_index_2_tpu import Shard
    from inverted_index_2_tpu.codec import native

    if not native.available():
        import pytest

        pytest.skip("pool wiring is on the native merge path")
    sh = Shard(str(tmp_path / "s"))
    sh.put([b"t1", b"t2"], 1)
    sh.put([b"t2", b"t3"], 2)
    assert sh.merge(2, 10) == 2
    pool = shard_mod._scratch_pool()
    with pool._m:
        idle = len(pool._list)
    assert idle >= 1  # scratch was rented and returned
    scratch = pool.get()
    assert len(scratch.vals) > 0  # it was grown by the merge
    pool.put(scratch)
