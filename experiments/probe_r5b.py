"""Round-5 probe B2: decompose the one-shot device boolean() latency floor.

r5 probe B measured one-shot boolean() == boolean_staged single batch
(11.5k vs 11.6k at Q=1024, config-3) — the delegation landed, but a lone
1024-row staged call costs ~88 ms. Where? Candidates: pack, dispatch
(arg transfer + execute RPCs), the sync device_get fetch, assembly.
Also: the one-shot number at Q=8192 (one delegated batch), and whether
splitting a one-shot call into pipelined sub-batches helps.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

import bench  # noqa: E402
from inverted_index_2_tpu.models.query_engine import QueryEngine  # noqa: E402


def main():
    b2 = bench.gen_corpus(32_000, 1000, seed=11)
    snap, _, tables = bench.build_snapshot(b2)
    eng = QueryEngine(snap, L=2048, q_bucket=1024, tables=tables)
    terms = bench._sample_terms(snap)
    rng = np.random.default_rng(13)

    def mk(n):
        qs = []
        for _ in range(n):
            k = int(rng.integers(2, 9))
            qs.append([terms[i]
                       for i in rng.choice(len(terms), size=k,
                                           replace=False)])
        return qs

    os.environ["TPI_HOST_BOOL"] = "0"
    q1024, q8192 = mk(1024), mk(8192)

    # -- instrumented single 1024-row staged call --
    acc = {}

    def wrap(obj, name, key):
        orig = getattr(obj, name)

        def timed(*a, **kw):
            t0 = time.monotonic()
            r = orig(*a, **kw)
            acc[key] = acc.get(key, 0.0) + (time.monotonic() - t0)
            return r

        setattr(obj, name, timed)
        return orig

    eng.boolean_staged([q1024], "and")  # warm
    o1 = wrap(QueryEngine, "_batch_pack", "pack")
    o2 = wrap(QueryEngine, "_fused_run_staged", "dispatch")
    o3 = wrap(jax, "device_get", "device_get")
    t0 = time.monotonic()
    eng.boolean_staged([q1024], "and")
    total = time.monotonic() - t0
    QueryEngine._batch_pack = o1
    QueryEngine._fused_run_staged = o2
    jax.device_get = o3
    rest = total - sum(acc.values())
    print(f"single 1024 staged: total={total*1e3:.1f}ms  "
          + "  ".join(f"{k}={v*1e3:.1f}ms" for k, v in acc.items())
          + f"  other={rest*1e3:.1f}ms", flush=True)

    # -- one-shot at Q=8192 (single delegated batch) --
    eng2 = QueryEngine(snap, L=2048, q_bucket=8192, tables=tables)
    eng2.boolean(q8192, op="and")  # warm (delegates)
    ts = []
    for _ in range(5):
        t0 = time.monotonic()
        eng2.boolean(q8192, op="and")
        ts.append(time.monotonic() - t0)
    med = sorted(ts)[2]
    print(f"one-shot 8192 (delegated single batch): {8192/med:8.0f} QPS "
          f"({med*1e3:.1f} ms) [{8192/max(ts):.0f}..{8192/min(ts):.0f}]",
          flush=True)

    # -- split one-shot into pipelined sub-batches --
    for nsub, sub in [(4, 2048), (8, 1024)]:
        bs = [q8192[i * sub:(i + 1) * sub] for i in range(nsub)]
        eng2.boolean_staged(bs, "and", depth=3)  # warm
        ts = []
        for _ in range(5):
            t0 = time.monotonic()
            eng2.boolean_staged(bs, "and", depth=3)
            ts.append(time.monotonic() - t0)
        med = sorted(ts)[2]
        print(f"one-shot 8192 split {nsub}x{sub} depth=3: "
              f"{8192/med:8.0f} QPS ({med*1e3:.1f} ms) "
              f"[{8192/max(ts):.0f}..{8192/min(ts):.0f}]", flush=True)


if __name__ == "__main__":
    main()
