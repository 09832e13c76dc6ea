import cProfile, pstats, io, os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from bench import gen_corpus, _reps, _qps_stat, _SPREADS, build_snapshot, _sample_terms, _boolean_stream
from inverted_index_2_tpu.models.query_engine import QueryEngine

def log(*a): print("[exp]", *a, file=sys.stderr, flush=True)
os.environ["TPI_HOST_BOOL"] = "0"
corpus = gen_corpus(32_000, 1000, seed=11)
snap, _, tables = build_snapshot(corpus)
Q, nb = 8192, 12
eng = QueryEngine(snap, L=2048, q_bucket=Q, tables=tables)
stream = _boolean_stream(_sample_terms(snap), nb, Q, seed=13)
eng.boolean_staged(stream, "or", columnar=True, prefix_p=32, depth=4)  # warm
t0 = time.monotonic()
eng.boolean_staged(stream, "or", columnar=True, prefix_p=32, depth=4)
base = time.monotonic() - t0
log(f"unprofiled rep: {base:.3f}s ({nb*Q/base:.0f} qps)")
pr = cProfile.Profile()
pr.enable()
eng.boolean_staged(stream, "or", columnar=True, prefix_p=32, depth=4)
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(24)
print(s.getvalue()[:4200])
