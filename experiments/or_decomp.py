"""On-chip decomposition of the concat-OR pipeline cost (VERDICT r3 #3).

Variants (same data, same classes, one program each, in-process A/B):
  decode    : concat layout + decode + lane mask only
  sort      : + jnp.sort
  keep      : + dedup/first marking + count (full OR minus compaction)
  full      : + compact_rows (production: second sort network)
  shift     : + compact_shift (cumsum + monotone shifts) instead
  prefwin   : + windowed compaction of the first P*K lanes only (the
              pagination route needs first-P values + exact count; the
              first P distinct union values live in the first P*K sorted
              lanes since each value repeats <= K times)
"""
import functools as ft
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import gen_corpus, _fence, _reps, _qps_stat, _SPREADS
from inverted_index_2_tpu.models.query_engine import build_snapshot_arrays
from inverted_index_2_tpu.ops import concat_bool as cb
from inverted_index_2_tpu.ops.compaction import compact_rows, compact_shift

Q = int(os.environ.get("Q", 2048))
ITERS = int(os.environ.get("ITERS", 12))
P, KMAX = 32, 8

def log(*a):
    print("[exp]", *a, file=sys.stderr, flush=True)

t0 = time.monotonic()
corpus = gen_corpus(int(os.environ.get("TERMS", 32_000)), 1000, seed=11)
snap = build_snapshot_arrays(*corpus)
_fence(snap.counts[-1:])
log(f"snapshot: {time.monotonic()-t0:.1f}s n={snap.n_terms}")

rng = np.random.default_rng(12)
n = snap.n_terms
hk = np.asarray(snap.keys)
K = 8
kvs = rng.integers(2, K + 1, size=(ITERS, Q)).astype(np.int32)
bidx = rng.integers(0, n, size=(ITERS, Q, K))
hc64 = snap.host_counts.astype(np.int64)

flat_idx = bidx.reshape(-1, K).astype(np.int32)
kv_flat = kvs.reshape(-1)
kmask_f = np.arange(K)[None, :] < kv_flat[:, None]
sbq = np.minimum(-(-np.where(kmask_f, hc64[flat_idx], 0) // 128), 1 << 30).sum(axis=1)
found_f = np.ones_like(flat_idx, dtype=bool)
order_q = np.argsort(sbq, kind="stable")
classes, pos = [32, 64, 128, 512, 1024], 0
work, sbs = [], []
stride = max(128, int(snap.blocks.shape[1]))
for SB in classes:
    hi_i = int(np.searchsorted(sbq[order_q], SB, side="right"))
    members = order_q[pos:hi_i]; pos = hi_i
    B = max(128, min(2048, ((1 << 24) // (SB * stride)) // 8 * 8))
    B = min(B, (len(members) // 128) * 128)
    if B == 0:
        continue
    nt = len(members) // B
    m = members[: nt * B].reshape(nt, B)
    work.append((nt * B, (jnp.asarray(flat_idx[m]), jnp.asarray(found_f[m]), jnp.asarray(kv_flat[m]))))
    sbs.append(SB)
covered = sum(w[0] for w in work)
log(f"covered {covered}/{ITERS*Q} queries; classes {sbs}")
class_ops = tuple(w[1] for w in work)
sbs_t = tuple(sbs)
tables = (snap.blocks, snap.term_block_start, snap.counts)

def or_core(blocks, tbs, counts, idx, found, k_valid, SB, variant):
    Qb, Kb = idx.shape
    S = SB * cb.BLOCK
    kmask = jnp.arange(Kb, dtype=jnp.int32)[None, :] < k_valid[:, None]
    live = found & kmask
    cnt = jnp.where(live, counts[idx], 0)
    rows, in_use, bit, cnt_j, cum = cb.concat_layout(tbs[idx], cnt, SB)
    flat, vals, mask = cb.decode_masked(blocks, rows, in_use, bit, cnt_j)
    if variant == "decode":
        return flat[:, ::128], jnp.sum(mask.reshape(Qb, S), axis=1).astype(jnp.int32)
    svals = jnp.sort(flat, axis=1)
    if variant == "sort":
        return svals[:, ::128], jnp.sum(mask.reshape(Qb, S), axis=1).astype(jnp.int32)
    first = jnp.concatenate([jnp.ones((Qb, 1), dtype=bool), svals[:, 1:] != svals[:, :-1]], axis=1)
    n_valid = jnp.sum(mask.reshape(Qb, S), axis=1).astype(jnp.int32)
    in_region = jnp.arange(S, dtype=jnp.int32)[None, :] < n_valid[:, None]
    keep = first & in_region
    oc = jnp.sum(keep, axis=1).astype(jnp.int32)
    if variant == "keep":
        return svals[:, ::128], oc
    if variant == "full":
        return compact_rows(svals, keep), oc
    if variant == "shift":
        return compact_shift(svals, keep)[0], oc
    if variant == "prefwin":
        W = min(S, P * KMAX)
        out_w = compact_rows(svals[:, :W], keep[:, :W])[:, :P]
        return out_w, oc
    raise ValueError(variant)

@ft.partial(jax.jit, static_argnames=("sbs", "variant"))
def scan_all(blocks, tbs, counts, class_ops, sbs, variant):
    chks = []
    for (bi, bf, bkv), SB in zip(class_ops, sbs):
        def body(carry, xs, SB=SB):
            i2, f2, k2 = xs
            o, oc = or_core(blocks, tbs, counts, i2, f2, k2, SB, variant)
            return carry ^ jnp.uint32(jnp.sum(oc)) ^ jnp.bitwise_xor.reduce(o[:, 0].astype(jnp.uint32)), None
        chks.append(jax.lax.scan(body, jnp.uint32(0), (bi, bf, bkv))[0])
    return chks

res = {}
for variant in ("decode", "sort", "keep", "full", "shift", "prefwin"):
    t0 = time.monotonic()
    def rep(variant=variant):
        _fence(scan_all(*tables, class_ops, sbs_t, variant))
    rep()
    log(f"{variant}: compile+1st {time.monotonic()-t0:.1f}s")
    res[variant] = _qps_stat(variant, covered, _reps(rep))
    log(f"{variant}: {res[variant]} qps  {_SPREADS[variant]}")
import json
print(json.dumps({"qps": res, "spreads": {k: _SPREADS[k] for k in res}}))
