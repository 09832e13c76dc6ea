"""RSS growth probe — the analogue of the reference's disabled
`_TestMemoryLeaks` (inverted_index_test.go:21-57, which polls procfs RSS
around repeated put/merge cycles and is kept disabled in-tree). Marked skip
by default for the same reason: RSS is noisy under CI; enable manually via
TPI_MEM_PROBE=1 when hunting leaks."""
import os
import resource
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("TPI_MEM_PROBE"), reason="manual probe (TPI_MEM_PROBE=1)"
)


def test_rss_stable_under_put_merge_cycles():
    from inverted_index_2_tpu import InvertedIndex

    ii = InvertedIndex(tempfile.mkdtemp())
    rng = np.random.default_rng(0)

    def rss_mb():
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    for _ in range(3):  # warmup allocators
        for v in range(1, 20):
            ii.put([bytes(rng.integers(97, 123, size=8, dtype=np.uint8)) for _ in range(50)], v)
        while ii.merge(2, 100, 2) > 0:
            pass
    base = rss_mb()
    for cycle in range(10):
        for v in range(1, 20):
            ii.put([bytes(rng.integers(97, 123, size=8, dtype=np.uint8)) for _ in range(50)], v)
        while ii.merge(2, 100, 2) > 0:
            pass
    growth = rss_mb() - base
    assert growth < 200, f"RSS grew {growth:.0f} MiB over 10 cycles"
