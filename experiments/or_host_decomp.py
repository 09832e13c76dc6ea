"""Decompose the host full-result OR serve (tpi_boolean_serve) at the
config-3 shape (VERDICT r4 #1): where do the ~18 us/query go?

Variants (same tables, same referenced lists, in-process):
  or_full : production OR (decode + pairwise SIMD merges + dedupe output)
  or_k1   : the SAME posting volume as single-term queries — decode +
            dedupe-output only, no merge levels. merge cost = full - k1.
  copyout : out_offs-sized memcpy of the same output volume — the pure
            write floor.
  and_full: reference point (block-skip streaming intersection).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import gen_corpus, _reps, _qps_stat, _SPREADS
from inverted_index_2_tpu.codec import native
from inverted_index_2_tpu.models.query_engine import build_host_tables

def log(*a):
    print("[exp]", *a, file=sys.stderr, flush=True)

assert native.available()
Q = int(os.environ.get("Q", 8192))
NB = int(os.environ.get("NB", 2))
t0 = time.monotonic()
corpus = gen_corpus(int(os.environ.get("TERMS", 32_000)), 1000, seed=11)
tables = build_host_tables(*corpus)
log(f"tables: {time.monotonic()-t0:.1f}s n={tables.n_terms}")

rng = np.random.default_rng(23)
n = tables.n_terms
tbs = tables.tbs[:-1].astype(np.int64)
words = tables.words

batches = []
for _ in range(NB):
    ks = rng.integers(2, 9, size=Q)
    koffs = np.zeros(Q + 1, dtype=np.int64)
    np.cumsum(ks, out=koffs[1:])
    idx = rng.integers(0, n, size=int(koffs[-1]))
    starts = tables.flat[tbs[idx]].astype(np.int64) - 1
    batches.append((koffs, starts))

def run(is_or, k1=False):
    total_out = 0
    for koffs, starts in batches:
        if k1:
            koffs = np.arange(len(starts) + 1, dtype=np.int64)
        v, o = native.boolean_serve(words, starts, None, None, koffs,
                                    None, is_or)
        total_out += len(v)
    return total_out

# warm + volume accounting
out_or = run(True)
out_k1 = run(True, k1=True)
out_and = run(False)
nflat = sum(len(s) for _, s in batches)
vol = int(sum(words[np.maximum(s, 0)][s >= 0].astype(np.int64).sum()
              for _, s in batches))
log(f"queries {NB*Q}, flat terms {nflat}, input postings {vol/1e6:.1f}M, "
    f"OR out {out_or/1e6:.1f}M AND out {out_and/1e6:.1f}M")

for name, fn, work in (
    ("or_full", lambda: run(True), NB * Q),
    ("or_k1", lambda: run(True, True), NB * Q),
    ("and_full", lambda: run(False), NB * Q),
):
    os.sync()
    q = _qps_stat(name, work, _reps(fn, reps=5))
    log(f"{name}: {q} qps  spread {_SPREADS[name]}  "
        f"ns/input-value {1e9/(q * vol / (NB*Q)):.2f}")

# pure output write floor at the same volume
buf_src = np.ones(out_or // NB + 1, dtype=np.uint32)
buf_dst = np.empty_like(buf_src)
os.sync()
ts = _reps(lambda: [np.copyto(buf_dst, buf_src) for _ in range(NB)], reps=5)
q = _qps_stat("copyout", NB * Q, ts)
log(f"copyout (r+w of OR output volume): {q} qps-equivalent")
print("[exp] done")
