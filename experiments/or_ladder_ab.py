"""Same-process A/B: SB class ladder density for the pagination stream."""
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
run = lambda: eng.boolean_staged(stream, "or", columnar=True, prefix_p=32, depth=3)
BASE = QueryEngine._SB_CLASSES
ref = None
for name, ladder in (
    ("base", BASE),
    ("dense", (8, 16, 24, 32, 48, 64, 96, 128, 192, 512, 2048, 8192, 32768)),
    ("base2", BASE),
):
    QueryEngine._SB_CLASSES = ladder
    t0 = time.monotonic(); out = run(); log(f"{name}: warm {time.monotonic()-t0:.1f}s")
    if ref is None: ref = out
    else:
        for (va, oa, ca), (vb, ob, cb) in zip(ref, out):
            assert np.array_equal(va, vb) and np.array_equal(oa, ob) and np.array_equal(ca, cb)
        log(f"{name}: bit-identical")
    q = _qps_stat(name, nb*Q, _reps(run, reps=4))
    log(f"{name}: {q} {_SPREADS[name]}")
QueryEngine._SB_CLASSES = BASE
