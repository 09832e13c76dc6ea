import os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from bench import gen_corpus, _fence, _reps, _qps_stat, _SPREADS, build_snapshot, _sample_terms, _boolean_stream
from inverted_index_2_tpu.models.query_engine import QueryEngine

def log(*a): print("[exp]", *a, file=sys.stderr, flush=True)
corpus = gen_corpus(32_000, 1000, seed=11)
snap, _, tables = build_snapshot(corpus)
Q, nb = 8192, 12
eng = QueryEngine(snap, L=2048, q_bucket=Q, tables=tables)
stream = _boolean_stream(_sample_terms(snap), nb, Q, seed=13)
def to_cols(qs):
    terms = [t for q in qs for t in q]
    blob = b"".join(terms)
    offs = np.zeros(len(terms) + 1, np.int64)
    np.cumsum([len(t) for t in terms], out=offs[1:])
    qoffs = np.zeros(len(qs) + 1, np.int64)
    np.cumsum([len(q) for q in qs], out=qoffs[1:])
    return (blob, offs, qoffs)
cols = [to_cols(b) for b in stream]
t0=time.monotonic(); eng.boolean_staged(cols, "or", columnar=True, prefix_p=32, depth=4)
log(f"warm {time.monotonic()-t0:.1f}s")
qw = _qps_stat("wire", nb*Q, _reps(lambda: eng.boolean_staged(cols, "or", columnar=True, prefix_p=32, depth=4)))
log("wire-form prefix:", qw, _SPREADS["wire"])
# sanity: same results list vs wire first batch
a = eng.boolean_staged([stream[0]], "or", columnar=True, prefix_p=32)[0]
b = eng.boolean_staged([cols[0]], "or", columnar=True, prefix_p=32)[0]
assert all(np.array_equal(x, y) for x, y in zip(a, b)), "wire/list mismatch"
log("bit-identity ok")
print({"wire_prefix": qw})
