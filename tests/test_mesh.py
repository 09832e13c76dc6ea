"""Sharded (multi-device) query fan-out on the 8-virtual-CPU-device mesh —
the analogue of BASELINE config 4/5 (64 shards hash-routed, fan-out query
with result merge over collectives)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from inverted_index_2_tpu import InvertedIndex
from inverted_index_2_tpu.codec import keys as K
from inverted_index_2_tpu.parallel import mesh as pm


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pm.default_mesh(8)


@pytest.fixture(scope="module")
def built(tmp_path_factory, mesh8):
    rng = np.random.default_rng(7)
    tmp = tmp_path_factory.mktemp("idx")
    ii = InvertedIndex(str(tmp))
    # spread terms across many shards (vary the 2-byte prefix)
    vocab = [bytes([a, b]) + f"t{i}".encode() for i, (a, b) in enumerate(
        (int(x), int(y)) for x, y in rng.integers(32, 127, size=(120, 2))
    )]
    truth = {}
    for doc in range(1, 50):
        k = int(rng.integers(1, 6))
        terms = [vocab[i] for i in rng.choice(len(vocab), size=k, replace=False)]
        ii.put(terms, doc)
        for t in terms:
            truth.setdefault(t, set()).add(doc)
    snap = pm.build_sharded_snapshot(ii, mesh8)
    return ii, truth, snap


def test_sharded_lookup_exact(built, mesh8):
    ii, truth, snap = built
    L = 128
    lookup = pm.make_sharded_lookup(snap, L)
    terms = sorted(truth.keys())[:40] + [b"@@missing", b"zz-none"]
    qk = K.pack_terms(terms, width=snap.width)
    import jax.numpy as jnp2

    found, vals, n, raw = lookup(
        snap.keys, snap.blocks, snap.term_block_start, snap.counts,
        jnp2.asarray(qk),
    )
    found, vals, n, raw = (
        np.asarray(found), np.asarray(vals), np.asarray(n), np.asarray(raw)
    )
    for i, t in enumerate(terms):
        if t in truth:
            assert found[i], t
            assert raw[i] == len(truth[t]), t  # true count survives the psum
            assert vals[i, : n[i]].tolist() == sorted(truth[t]), t
        else:
            assert not found[i], t
            assert raw[i] == 0


def test_sharded_boolean_and(built, mesh8):
    ii, truth, snap = built
    import jax.numpy as jnp2

    L = 128
    booland = pm.make_sharded_boolean(snap, L, "and")
    vocab = sorted(truth.keys())
    rng = np.random.default_rng(3)
    queries = [
        [vocab[i] for i in rng.choice(len(vocab), size=3, replace=False)]
        for _ in range(12)
    ]
    Kk = 3
    qk = np.zeros((len(queries), Kk, snap.width + 1), dtype=np.uint32)
    kv = np.full(len(queries), Kk, dtype=np.int32)
    for i, q in enumerate(queries):
        qk[i] = K.pack_terms(q, width=snap.width)
    out, oc, need = booland(
        snap.keys, snap.blocks, snap.term_block_start, snap.counts,
        jnp2.asarray(qk), jnp2.asarray(kv),
    )
    out, oc, need = np.asarray(out), np.asarray(oc), np.asarray(need)
    for i, q in enumerate(queries):
        want = sorted(set.intersection(*[truth[t] for t in q]))
        assert need[i] == max(len(truth[t]) for t in q), q  # trunc signal
        assert out[i, : oc[i]].tolist() == want, q


def test_shard_ranges_cover_keyspace():
    for d in (1, 2, 8, 64):
        rs = pm.shard_ranges(d)
        seen = sorted(x for r in rs for x in r)
        assert seen == list(range(1024))


def test_sharded_boolean_or(built, mesh8):
    ii, truth, snap = built
    import jax.numpy as jnp2

    L = 128
    boolor = pm.make_sharded_boolean(snap, L, "or")
    vocab = sorted(truth.keys())
    rng = np.random.default_rng(9)
    queries = [
        [vocab[i] for i in rng.choice(len(vocab), size=2, replace=False)]
        for _ in range(8)
    ]
    qk = np.zeros((len(queries), 2, snap.width + 1), dtype=np.uint32)
    for i, q in enumerate(queries):
        qk[i] = K.pack_terms(q, width=snap.width)
    out, oc, _need = boolor(
        snap.keys, snap.blocks, snap.term_block_start, snap.counts,
        jnp2.asarray(qk), jnp2.asarray(np.full(len(queries), 2, dtype=np.int32)),
    )
    out, oc = np.asarray(out), np.asarray(oc)
    for i, q in enumerate(queries):
        want = sorted(set.union(*[truth[t] for t in q]))
        assert out[i, : oc[i]].tolist() == want, q
