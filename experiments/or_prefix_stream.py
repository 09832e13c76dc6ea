"""End-to-end staged OR pagination rate after the windowed compaction."""
import os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
os.environ.setdefault("BENCH_POSTLEN1K_TERMS", "32000")
from bench import gen_corpus, _fence, _reps, _qps_stat, _SPREADS, build_snapshot, _sample_terms, _boolean_stream
from inverted_index_2_tpu.models.query_engine import QueryEngine

def log(*a): print("[exp]", *a, file=sys.stderr, flush=True)
t0 = time.monotonic()
corpus = gen_corpus(32_000, 1000, seed=11)
snap, _, tables = build_snapshot(corpus)
log(f"snapshot {time.monotonic()-t0:.1f}s")
Q, nb = 8192, 12
eng = QueryEngine(snap, L=2048, q_bucket=Q, tables=tables)
stream = _boolean_stream(_sample_terms(snap), nb, Q, seed=13)
# warm
t0 = time.monotonic(); eng.boolean_staged(stream, "or", columnar=True, prefix_p=32, depth=3)
log(f"warm {time.monotonic()-t0:.1f}s")
q = _qps_stat("or_prefix", nb*Q, _reps(lambda: eng.boolean_staged(stream, "or", columnar=True, prefix_p=32, depth=3)))
log("staged_or_prefix:", q, _SPREADS["or_prefix"])
# filter_removed (full-compaction fallback) for contrast
import jax.numpy as jnp
# also depth=4 variant
q4 = _qps_stat("or_prefix_d4", nb*Q, _reps(lambda: eng.boolean_staged(stream, "or", columnar=True, prefix_p=32, depth=4), reps=3))
log("staged_or_prefix depth4:", q4, _SPREADS["or_prefix_d4"])
print({"or_prefix": q, "d4": q4})
