"""AND dev-route min-rep: warm with the timed 2x stream (follow-up shapes)."""
import os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from bench import gen_corpus, _reps, _qps_stat, _SPREADS, build_snapshot, _sample_terms, _boolean_stream
from inverted_index_2_tpu.models.query_engine import QueryEngine

def log(*a): print("[exp]", *a, file=sys.stderr, flush=True)
corpus = gen_corpus(32_000, 1000, seed=11)
snap, _, tables = build_snapshot(corpus)
Q, nb = 8192, 12
eng = QueryEngine(snap, L=2048, q_bucket=Q, tables=tables)
stream = _boolean_stream(_sample_terms(snap), nb, Q, seed=13)
dev_stream = stream + stream
os.environ["TPI_HOST_BOOL"] = "0"
t0 = time.monotonic()
eng.boolean_staged(dev_stream, "and", columnar=True, depth=4)
log(f"warm(2x) {time.monotonic()-t0:.1f}s")
q = _qps_stat("and_dev", len(dev_stream)*Q, _reps(lambda: eng.boolean_staged(
    dev_stream, "and", columnar=True, depth=4), reps=5))
log(f"and_dev: {q} {_SPREADS['and_dev']}")
