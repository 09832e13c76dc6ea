"""Same-process A/B: u16 delta plane vs raw u32 buffer fetch + profile."""
import cProfile, pstats, io, os, sys, time
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
run = lambda: eng.boolean_staged(stream, "or", columnar=True, prefix_p=32, depth=3)
for wire in ("1", "0", "1"):
    os.environ["TPI_WIRE"] = wire
    run()  # warm
    q = _qps_stat(f"w{wire}", nb*Q, _reps(run, reps=4))
    log(f"TPI_WIRE={wire}: {q} {_SPREADS[f'w{wire}']}")
os.environ["TPI_WIRE"] = "1"
pr = cProfile.Profile(); pr.enable(); run(); pr.disable()
s = io.StringIO(); pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(16)
print(s.getvalue()[:2800])
