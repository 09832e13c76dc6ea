"""Probe r5d: cross-query dedup on the HOST full-result OR route.

Measures the config-3 staged host OR serve on a rank-Zipf(s=1) query mix
(bench methodology: 4096-distinct pool, 8192-query batches, ~2.2k unique
per batch) with dedup on vs off, plus the grouping + fan-out costs in
isolation. CPU-only (the host route never touches the device); pin
TPI_HOST_BOOL=all because on the CPU backend the link probe reads fast
and would device-route OR.

Run:  python experiments/probe_r5d.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from bench import gen_corpus, build_snapshot, _sample_terms
from inverted_index_2_tpu.models.query_engine import QueryEngine

os.environ["TPI_HOST_BOOL"] = "all"

t0 = time.perf_counter()
corpus = gen_corpus(32_000, 1000, seed=11)
snap, build_s, tables = build_snapshot(corpus)
print(f"corpus+snap: {time.perf_counter() - t0:.1f}s", flush=True)

SQ = 8192
eng = QueryEngine(snap, L=2048, q_bucket=SQ, tables=tables)
terms = _sample_terms(snap)

zrng = np.random.default_rng(31)
pool = [
    [terms[i] for i in zrng.choice(len(terms), size=int(zrng.integers(2, 9)),
                                   replace=False)]
    for _ in range(4096)
]
zw = 1.0 / np.arange(1, len(pool) + 1, dtype=np.float64)
zw /= zw.sum()
zor = [[pool[i] for i in zrng.choice(len(pool), size=SQ, p=zw)]
       for _ in range(2)]
uniq = [len({tuple(q) for q in b}) for b in zor]
print(f"unique per batch: {uniq}")


def timeit(label, fn, reps=7):
    fn()  # warm
    os.sync()  # writeback discipline: the corpus build dirtied ~130 MB
    raw = []
    for _ in range(reps):
        t = time.perf_counter()
        fn()
        raw.append(time.perf_counter() - t)
    ts = sorted(raw)
    n = 2 * SQ
    print(f"{label}: median {n / ts[len(ts) // 2]:,.0f} QPS "
          f"[{n / ts[-1]:,.0f}-{n / ts[0]:,.0f}]  "
          f"(chrono {[round(x * 1e3, 1) for x in raw]} ms)", flush=True)


timeit("staged host OR zipf DEDUP", lambda: eng.boolean_staged(
    zor, "or", columnar=True))
os.environ["TPI_HOST_DEDUP"] = "0"
timeit("staged host OR zipf NODEDUP", lambda: eng.boolean_staged(
    zor, "or", columnar=True))
del os.environ["TPI_HOST_DEDUP"]

# isolation: grouping cost + fan-out cost on one batch
st = eng._state
from inverted_index_2_tpu.codec import keys as keys_mod

b = zor[0]
qk = keys_mod.pack_terms([t for q in b for t in q], width=st.host_q_width())
koffs = np.zeros(len(b) + 1, np.int64)
np.cumsum([len(q) for q in b], out=koffs[1:])
t = time.perf_counter()
for _ in range(5):
    dd = eng._host_dedup_group(qk, koffs, "or")
print(f"grouping: {(time.perf_counter() - t) / 5 * 1e3:.2f} ms/batch "
      f"(nu={len(dd[1]) - 1})", flush=True)
qk_u, koffs_u, gid = dd
uvals, uvoffs = eng._host_serve_columnar(qk_u, koffs_u, "or", False, st)
from inverted_index_2_tpu.models.host_serve import _fanout_columnar

t = time.perf_counter()
for _ in range(5):
    _fanout_columnar(uvals, uvoffs, gid)
dt = (time.perf_counter() - t) / 5
vals, voffs = _fanout_columnar(uvals, uvoffs, gid)
print(f"fan-out: {dt * 1e3:.2f} ms/batch = {dt / SQ * 1e6:.2f} us/query "
      f"({voffs[-1] * 4 / 1e6:.0f} MB out)", flush=True)

# uniform-mix regression guard: unique queries must not pay more than the
# hash check
uni = [[[terms[i] for i in zrng.choice(len(terms), size=int(
    zrng.integers(2, 9)), replace=False)] for _ in range(SQ)]
    for _ in range(2)]
timeit("staged host OR uniform (dedup auto)", lambda: eng.boolean_staged(
    uni, "or", columnar=True))
os.environ["TPI_HOST_DEDUP"] = "0"
timeit("staged host OR uniform (dedup off)", lambda: eng.boolean_staged(
    uni, "or", columnar=True))
del os.environ["TPI_HOST_DEDUP"]

# wire-form input twin (the pack skips ~7 of 9 ms of Python-object work)
def to_wire(b):
    blob = b"".join(t for q in b for t in q)
    toffs = np.zeros(sum(len(q) for q in b) + 1, np.int64)
    np.cumsum([len(t) for q in b for t in q], out=toffs[1:])
    qoffs = np.zeros(len(b) + 1, np.int64)
    np.cumsum([len(q) for q in b], out=qoffs[1:])
    return (np.frombuffer(blob, np.uint8), toffs, qoffs)

zor_w = [to_wire(b) for b in zor]
timeit("staged host OR zipf WIRE dedup", lambda: eng.boolean_staged(
    zor_w, "or", columnar=True))
os.environ["TPI_HOST_DEDUP"] = "0"
timeit("staged host OR zipf WIRE nodedup", lambda: eng.boolean_staged(
    zor_w, "or", columnar=True))
del os.environ["TPI_HOST_DEDUP"]
