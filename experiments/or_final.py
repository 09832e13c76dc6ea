"""Production OR kernel (wire_dedup) vs old compacted, same process."""
import functools as ft
import os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bench import gen_corpus, _fence, _reps, _qps_stat, _SPREADS
from inverted_index_2_tpu.models.query_engine import build_snapshot_arrays
from inverted_index_2_tpu.ops import concat_bool as cb

def log(*a): print("[exp]", *a, file=sys.stderr, flush=True)
t0=time.monotonic()
corpus = gen_corpus(32_000, 1000, seed=11)
snap = build_snapshot_arrays(*corpus)
_fence(snap.counts[-1:])
log(f"snapshot {time.monotonic()-t0:.1f}s")
rng = np.random.default_rng(12)
n, K, Q, ITERS = snap.n_terms, 8, 2048, 12
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
    if B == 0: continue
    nt = len(members) // B
    m = members[: nt * B].reshape(nt, B)
    work.append((nt * B, (jnp.asarray(flat_idx[m]), jnp.asarray(found_f[m]), jnp.asarray(kv_flat[m]))))
    sbs.append(SB)
covered = sum(w[0] for w in work)
class_ops, sbs_t = tuple(w[1] for w in work), tuple(sbs)
tables = (snap.blocks, snap.term_block_start, snap.counts)

@ft.partial(jax.jit, static_argnames=("sbs", "wire_dedup"))
def scan_or_all(blocks, tbs, counts, class_ops, sbs, wire_dedup=False):
    chks = []
    for (bi, bf, bkv), SB in zip(class_ops, sbs):
        def body(carry, xs, SB=SB):
            i2, f2, k2 = xs
            o, oc = cb.boolean_concat_step(blocks, tbs, counts, i2, f2, k2, SB, "or", wire_dedup=wire_dedup)
            return carry ^ jnp.uint32(jnp.sum(oc)) ^ jnp.bitwise_xor.reduce(o[:, 0]), None
        chks.append(jax.lax.scan(body, jnp.uint32(0), (bi, bf, bkv))[0])
    return chks

res = {}
for wd in (True, False):
    name = "or_wire_dedup" if wd else "or_devcompact"
    def rep(wd=wd):
        _fence(scan_or_all(*tables, class_ops, sbs_t, wire_dedup=wd))
    t0=time.monotonic(); rep(); log(f"{name}: compile {time.monotonic()-t0:.1f}s")
    res[name] = _qps_stat(name, covered, _reps(rep))
    log(name, res[name], _SPREADS[name])
print(res)
