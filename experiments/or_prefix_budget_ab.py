"""Same-process A/B: pagination-stream chunk budget 1x vs 4x."""
import os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
from bench import gen_corpus, _reps, _qps_stat, _SPREADS, build_snapshot, _sample_terms, _boolean_stream
from inverted_index_2_tpu.models.query_engine import QueryEngine
from inverted_index_2_tpu.models import staged as staged_mod

def log(*a): print("[exp]", *a, file=sys.stderr, flush=True)
t0 = time.monotonic()
corpus = gen_corpus(32_000, 1000, seed=11)
snap, _, tables = build_snapshot(corpus)
log(f"snapshot {time.monotonic()-t0:.1f}s")
Q, nb = 8192, 12
eng = QueryEngine(snap, L=2048, q_bucket=Q, tables=tables)
stream = _boolean_stream(_sample_terms(snap), nb, Q, seed=13)
BASE = staged_mod._RESERVE_BUDGET

res = {}
ref = None
for mult in (1, 4, 2):
    staged_mod._RESERVE_BUDGET = BASE * mult // 4  # budget = this * 4 when P
    t0 = time.monotonic()
    out = eng.boolean_staged(stream, "or", columnar=True, prefix_p=32, depth=3)
    log(f"x{mult}: warm {time.monotonic()-t0:.1f}s")
    if ref is None:
        ref = out
    else:
        for (va, oa, ca), (vb, ob, cb) in zip(ref, out):
            assert np.array_equal(va, vb) and np.array_equal(oa, ob) and np.array_equal(ca, cb)
        log(f"x{mult}: bit-identical to x1")
    res[mult] = _qps_stat(f"x{mult}", nb*Q, _reps(lambda: eng.boolean_staged(
        stream, "or", columnar=True, prefix_p=32, depth=3)))
    log(f"x{mult}: {res[mult]} {_SPREADS[f'x{mult}']}")
staged_mod._RESERVE_BUDGET = BASE
print(res)
