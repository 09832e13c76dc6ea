"""Top-level index API: shard router over up to 1024 prefix shards.

Replaces /root/reference/inverted_index.go. Public operations (the complete
capability contract, SURVEY §2.4):

 * InvertedIndex(basedir, enable_logging)   — open/create (recovery path)
 * put(terms, value)                        — ingest one document
 * read(min, max) -> iterator               — globally sorted range scan
 * prefix_search(prefixes) -> dict          — union of values per prefix
 * put_removed(values)                      — logical delete across all shards
 * merge(req_count, m_count, concurrency)   — compaction over all shards

Concurrency mirrors the reference: bounded thread fan-out for put_removed and
prefix_search (errgroup w/ NumCPU, inverted_index.go:46,239), a worker pool
over a queue for merge (:71-103), copy-on-read shard snapshots under an
RWMutex-equivalent lock, and double-checked locking for shard creation
(:160-188). Heavy array work inside each shard releases the GIL (numpy/JAX),
so threads parallelize like goroutines here.
"""
from __future__ import annotations

import logging
import os
import queue
import threading
import time
from bisect import bisect_left
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

from .iterators import ClosingIterator, SequentialDynamicIterator, TermValues, group_by
from .shard import Shard, shard_key

logger = logging.getLogger("inverted_index_2_tpu")

_NCPU = os.cpu_count() or 4


class InvertedIndex:
    def __init__(self, basedir: str, enable_logging: bool = False):
        """Open or create an index at basedir; loads every subdirectory as a
        shard concurrently (parity: /root/reference/inverted_index.go:342-403)."""
        self.basedir = basedir
        self.enable_logging = enable_logging
        self._shards: List[Shard] = []
        self._shards_m = threading.Lock()
        os.makedirs(basedir, exist_ok=True)

        dirs = sorted(
            e.name for e in os.scandir(basedir) if e.is_dir()
        )
        if dirs:
            with ThreadPoolExecutor(max_workers=_NCPU) as pool:
                shards = list(
                    pool.map(lambda d: Shard(os.path.join(basedir, d)), dirs)
                )
            shards.sort(key=lambda s: s.get_key())
            self._shards = shards

    # ---- helpers ---------------------------------------------------------

    def _snapshot(self) -> List[Shard]:
        with self._shards_m:
            return list(self._shards)

    def _find_shard(self, key: str) -> Optional[Shard]:
        with self._shards_m:
            keys = [s.get_key() for s in self._shards]
            i = bisect_left(keys, key)
            if i < len(keys) and keys[i] == key:
                return self._shards[i]
        return None

    def _new_shard(self, key: str) -> Shard:
        """Create (or find, double-checked) the shard directory
        (parity: inverted_index.go:160-188)."""
        with self._shards_m:
            keys = [s.get_key() for s in self._shards]
            i = bisect_left(keys, key)
            if i < len(keys) and keys[i] == key:
                return self._shards[i]
            shard = Shard(os.path.join(self.basedir, key))
            self._shards.insert(i, shard)
            return shard

    # ---- ingest -----------------------------------------------------------

    def put(self, terms: List[bytes], value: int) -> None:
        """One document: all terms share one uint32 value. Terms are grouped
        by shard key; each touched shard gets ONE new direct segment
        (parity: inverted_index.go:113-145)."""
        if not terms:
            return
        terms = sorted(terms, key=shard_key)
        for group in group_by(terms, shard_key):
            key = shard_key(group[0])
            shard = self._find_shard(key) or self._new_shard(key)
            shard.put(group, value)

    # ---- delete ------------------------------------------------------------

    def put_removed(self, values) -> None:
        """Append tombstones in every shard, parallel with bounded fan-out
        (parity: inverted_index.go:41-55)."""
        shards = self._snapshot()
        values = np.asarray(values, dtype=np.uint32)
        if not shards:
            return
        with ThreadPoolExecutor(max_workers=_NCPU) as pool:
            list(pool.map(lambda s: s.remove(values), shards))

    # ---- compaction ----------------------------------------------------------

    def merge(self, req_count: int, m_count: int, concurrency: int) -> int:
        """Per-shard compaction spread over `concurrency` workers; returns the
        total number of input segments consumed across shards (parity:
        inverted_index.go:62-109). Callers loop until it returns 0."""
        shards = self._snapshot()
        work: "queue.Queue[Shard]" = queue.Queue()
        for s in shards:
            work.put(s)
        total = 0
        total_lock = threading.Lock()
        errs: List[BaseException] = []

        def worker():
            nonlocal total
            while True:
                try:
                    s = work.get_nowait()
                except queue.Empty:
                    return
                t0 = time.monotonic()
                try:
                    merged = s.merge(req_count, m_count)
                except BaseException as e:  # propagate after drain
                    errs.append(e)
                    return
                if merged > 0 and self.enable_logging:
                    logger.info(
                        "Shard %s merged %d segments in %.3fs",
                        s.get_key(), merged, time.monotonic() - t0,
                    )
                with total_lock:
                    total += merged

        threads = [threading.Thread(target=worker) for _ in range(max(1, concurrency))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errs:
            raise errs[0]
        return total

    # ---- read -----------------------------------------------------------------

    def read(
        self, min_term: Optional[bytes] = None, max_term: Optional[bytes] = None
    ) -> SequentialDynamicIterator:
        """Globally sorted TermValues stream over all shards, [min,max]
        inclusive, nil = unbounded. Lazy: opens one shard at a time; shards
        wholly outside the range are pruned by their min/max terms (parity:
        inverted_index.go:300-340). Tombstones are NOT applied (they act only
        at merge). Close() releases segment pins."""
        shards = []
        for s in self._snapshot():
            mm = s.min_max()
            if mm is None:
                continue
            if min_term is not None and min_term > mm[1]:
                continue
            if max_term is not None and max_term < mm[0]:
                continue
            shards.append(s)

        shards_iter = iter(shards)

        def pick_next():
            s = next(shards_iter, None)
            if s is None:
                return None
            return s.read(min_term, max_term)

        return SequentialDynamicIterator(pick_next)

    # ---- prefix search -----------------------------------------------------------

    def prefix_search(self, prefixes: List[bytes]) -> Dict[bytes, np.ndarray]:
        """For each prefix: sorted unique union of the values of all terms
        starting with it; unmatched prefixes are absent from the result
        (parity: inverted_index.go:192-295). Shards are pruned by comparing
        each prefix against the shard's min/max terms truncated to the prefix
        length, then scanned concurrently."""
        found: Dict[bytes, list] = {}
        found_m = threading.Lock()
        prefixes = sorted(prefixes)

        shard_prefixes: Dict[int, List[bytes]] = {}
        shards = []
        for s in self._snapshot():
            mm = s.min_max()
            if mm is None:
                continue
            mine = []
            for p in prefixes:
                l0 = min(len(p), len(mm[0]))
                if p[:l0] < mm[0][:l0]:
                    continue
                l1 = min(len(p), len(mm[1]))
                if p[:l1] > mm[1][:l1]:
                    continue
                mine.append(p)
            if mine:
                shard_prefixes[id(s)] = mine
                shards.append(s)

        def scan(s: Shard):
            mine = shard_prefixes[id(s)]
            it = s.read(mine[0], None)
            try:
                for tv in it:
                    # Early stop once the term is past EVERY prefix's range.
                    # (The reference stops when past the lexicographically
                    # greatest prefix, inverted_index.go:266-271 — which
                    # wrongly drops matches of a shorter prefix that contains
                    # the greatest one, e.g. prefixes [ban, band] lose
                    # "banjo" for "ban". Monotone-correct version here.)
                    if all(tv.term[: len(p)] > p for p in mine):
                        break
                    for p in mine:
                        if tv.term.startswith(p):
                            with found_m:
                                found.setdefault(p, []).append(tv.values)
            finally:
                it.close()

        if shards:
            with ThreadPoolExecutor(max_workers=_NCPU) as pool:
                list(pool.map(scan, shards))

        out: Dict[bytes, np.ndarray] = {}
        for p, chunks in found.items():
            vals = np.unique(np.concatenate(chunks)).astype(np.uint32)
            out[p] = vals
        return out
