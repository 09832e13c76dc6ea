"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: batched term-lookup QPS on the device query engine (BASELINE.json
target: >= 100k batched boolean term queries/sec on one v5e chip;
vs_baseline = QPS / 100_000). Also measures and reports (in "details"):
  * ingest terms/sec through the real Put path (target 10M/s)
  * boolean AND QPS (2-8 terms/query)
  * posting decode+intersect bandwidth (GB/s)
  * compression ratio vs analytic delta+bitpack baseline

Env knobs: BENCH_TERMS (default 1_000_000), BENCH_MEAN_POSTLEN (10),
BENCH_Q (10_000), BENCH_ITERS (20).
"""
from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np


def gen_corpus(n_terms: int, mean_len: int, seed: int = 0):
    """Synthetic sorted dictionary + posting lists (host arrays)."""
    rng = np.random.default_rng(seed)
    # 12-byte terms, random 2-byte prefix so shards spread
    raw = rng.integers(97, 123, size=(n_terms, 12), dtype=np.uint8)
    terms_mat = np.unique(raw, axis=0)
    n = len(terms_mat)
    blob = terms_mat.tobytes()
    offsets = np.arange(n + 1, dtype=np.int64) * 12
    # posting lengths ~ geometric with the requested mean, min 1
    lens = np.maximum(1, rng.geometric(1.0 / mean_len, size=n)).astype(np.int64)
    total = int(lens.sum())
    # sorted unique per list: cumulative gaps
    gaps = rng.integers(1, 2 * 1000, size=total, dtype=np.int64)
    voffs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=voffs[1:])
    csum = np.cumsum(gaps)
    base = csum[np.maximum(voffs[:-1] - 1, 0)]
    base[0] = 0
    values = (csum - np.repeat(base, lens)) % (2**32)
    values = values.astype(np.uint32)
    return blob, offsets, values, voffs


def bench_query(blob, offsets, values, voffs, Q, iters, L=128):
    import jax
    import jax.numpy as jnp

    from inverted_index_2_tpu.codec import keys as keys_mod
    from inverted_index_2_tpu.models.query_engine import (
        boolean_step,
        build_snapshot_arrays,
        lookup_step,
    )

    t0 = time.monotonic()
    snap = build_snapshot_arrays(blob, offsets, values, voffs)
    jax.block_until_ready(snap.keys)
    build_s = time.monotonic() - t0
    n = snap.n_terms

    rng = np.random.default_rng(1)
    lookup = jax.jit(lookup_step, static_argnames=("L",))
    # pre-pack query batches (packing is not the measured kernel)
    host_keys = np.asarray(snap.keys)
    batches = []
    for _ in range(iters):
        idx = rng.integers(0, n, size=Q)
        batches.append(jnp.asarray(host_keys[idx]))

    # warmup
    f, v, c = lookup(snap.keys, snap.words, snap.block_woff, snap.term_block_start, snap.counts, batches[0], L)
    jax.block_until_ready(c)
    t0 = time.monotonic()
    for b in batches:
        f, v, c = lookup(snap.keys, snap.words, snap.block_woff, snap.term_block_start, snap.counts, b, L)
    jax.block_until_ready(c)
    dt = time.monotonic() - t0
    lookup_qps = Q * iters / dt

    # boolean AND, K in 2..8 (use K=4 batch)
    K = 4
    booland = jax.jit(boolean_step, static_argnames=("L", "op"))
    bbatches = []
    for _ in range(max(4, iters // 2)):
        idx = rng.integers(0, n, size=(Q, K))
        bbatches.append(jnp.asarray(host_keys[idx]))
    kv = jnp.full((Q,), K, dtype=jnp.int32)
    o, oc = booland(snap.keys, snap.words, snap.block_woff, snap.term_block_start, snap.counts, bbatches[0], kv, L, "and", None)
    jax.block_until_ready(oc)
    t0 = time.monotonic()
    for b in bbatches:
        o, oc = booland(snap.keys, snap.words, snap.block_woff, snap.term_block_start, snap.counts, b, kv, L, "and", None)
    jax.block_until_ready(oc)
    dt = time.monotonic() - t0
    and_qps = Q * len(bbatches) / dt
    # decoded posting bytes touched per AND query batch
    mean_cnt = float(np.minimum(np.diff(voffs), L).mean())
    and_gbps = (Q * len(bbatches) * K * mean_cnt * 4) / dt / 1e9

    return {
        "snapshot_build_s": round(build_s, 3),
        "lookup_qps": round(lookup_qps),
        "and_qps": round(and_qps),
        "intersect_gbps": round(and_gbps, 2),
        "n_terms": n,
        "n_postings": int(voffs[-1]),
    }


def bench_ingest(n_terms=200_000, batch=20_000):
    """Real Put path: terms/sec through shard routing + segment writes."""
    from inverted_index_2_tpu import InvertedIndex

    rng = np.random.default_rng(2)
    raw = rng.integers(97, 123, size=(n_terms, 12), dtype=np.uint8)
    docs = [
        [raw[i].tobytes() for i in range(s, min(s + batch, n_terms))]
        for s in range(0, n_terms, batch)
    ]
    d = tempfile.mkdtemp(prefix="bench_idx_")
    ii = InvertedIndex(d)
    t0 = time.monotonic()
    for val, doc in enumerate(docs, 1):
        ii.put(doc, val)
    dt = time.monotonic() - t0
    return {"ingest_terms_per_s": round(n_terms / dt), "ingest_s": round(dt, 3)}


def bench_compression(values, voffs):
    from inverted_index_2_tpu.codec import packing

    words, _ = packing.encode_bulk(values, voffs)
    ours = len(words) * 4
    raw = len(values) * 4
    return {"compressed_bytes": ours, "raw_bytes": raw, "ratio": round(raw / ours, 2)}


def main():
    n_terms = int(os.environ.get("BENCH_TERMS", 1_000_000))
    mean_len = int(os.environ.get("BENCH_MEAN_POSTLEN", 10))
    Q = int(os.environ.get("BENCH_Q", 10_000))
    iters = int(os.environ.get("BENCH_ITERS", 20))

    blob, offsets, values, voffs = gen_corpus(n_terms, mean_len)
    details = {}
    details.update(bench_query(blob, offsets, values, voffs, Q, iters))
    details.update(bench_ingest())
    details.update(bench_compression(values, voffs))

    out = {
        "metric": "batched term-lookup QPS (device snapshot, Q=%d batches)" % Q,
        "value": details["lookup_qps"],
        "unit": "queries/sec",
        "vs_baseline": round(details["lookup_qps"] / 100_000, 3),
        "details": details,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
