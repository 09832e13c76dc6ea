"""Hash-table exact lookup: host build + device probe vs oracle."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from inverted_index_2_tpu.codec import hashing, keys as K, native
from inverted_index_2_tpu.ops import dict_search as ds


def _dict_and_queries(rng, n=2000):
    terms = sorted(
        {bytes(rng.integers(97, 123, size=int(l), dtype=np.uint8)) for l in rng.integers(1, 12, size=n)}
    )
    keys = K.pack_terms(terms)
    misses = [bytes(rng.integers(65, 91, size=8, dtype=np.uint8)) for _ in range(300)]
    queries = terms[:: max(len(terms) // 500, 1)] + misses
    qk = K.pack_terms(queries, width=keys.shape[1] - 1)
    return terms, keys, queries, qk


def test_hash_rows_np_jnp_agree(rng):
    keys = K.pack_terms([bytes(rng.integers(0, 256, size=7, dtype=np.uint8)) for _ in range(100)])
    hn = hashing.hash_rows_np(keys)
    hj = np.asarray(hashing.hash_rows_jnp(jnp.asarray(keys)))
    assert np.array_equal(hn, hj)


def test_table_build_and_probe(rng):
    terms, keys, queries, qk = _dict_and_queries(rng)
    slots = hashing.build_table(keys)
    assert len(slots) >= 2 * len(terms)
    probes = hashing.max_probe_len(slots, hashing.hash_rows_np(keys))
    idx, found = ds.hash_lookup_rows(
        jnp.asarray(keys), jnp.asarray(slots), jnp.asarray(qk), probes
    )
    idx, found = np.asarray(idx), np.asarray(found)
    tset = set(terms)
    for i, q in enumerate(queries):
        if q in tset:
            assert found[i] and terms[idx[i]] == q, q
        else:
            assert not found[i], q


def test_np_and_native_builds_both_valid(rng):
    terms, keys, _, _ = _dict_and_queries(rng, n=500)
    h = hashing.hash_rows_np(keys)
    slots_np = hashing.build_table_np(h)
    # every term index present exactly once, chains resolvable
    present = sorted(int(s) for s in slots_np if s >= 0)
    assert present == list(range(len(terms)))
    def probe_finds_all(slots):
        # validity: walking each key's chain from its home slot reaches it
        # before any empty slot (collision order may differ between builders)
        S = len(slots)
        for i, hv in enumerate(h):
            pos = int(hv) & (S - 1)
            while True:
                s = slots[pos]
                assert s >= 0, f"empty slot before finding key {i}"
                if s == i:
                    break
                pos = (pos + 1) & (S - 1)

    probe_finds_all(slots_np)
    if native.available():
        slots_cc = native.hash_build(h)
        present2 = sorted(int(s) for s in slots_cc if s >= 0)
        assert present2 == present
        probe_finds_all(slots_cc)


def test_empty_table():
    keys = jnp.zeros((0, 3), dtype=jnp.uint32)
    slots = jnp.full((8,), -1, dtype=jnp.int32)
    q = jnp.zeros((4, 3), dtype=jnp.uint32)
    idx, found = ds.hash_lookup_rows(keys, slots, q, 1)
    assert not np.asarray(found).any()


def test_unrolled_probe_matches_loop(rng):
    terms, keys, queries, qk = _dict_and_queries(rng)
    slots = hashing.build_table(keys)
    probes = hashing.max_probe_len(slots, hashing.hash_rows_np(keys))
    i1, f1 = ds.hash_lookup_rows(jnp.asarray(keys), jnp.asarray(slots), jnp.asarray(qk), probes)
    i2, f2 = ds.hash_lookup_rows_unrolled(jnp.asarray(keys), jnp.asarray(slots), jnp.asarray(qk), probes)
    assert np.array_equal(np.asarray(f1), np.asarray(f2))
    assert np.array_equal(np.asarray(i1)[np.asarray(f1)], np.asarray(i2)[np.asarray(f2)])


def test_native_probe_matches_numpy_walk(rng):
    """tpi_hash_probe (native batched probe) must agree with the pure-numpy
    probe walk on hits, misses, and empty-slot chain termination — it is the
    resolve half of every host-serving and host-resolve path."""
    if not native.available():
        pytest.skip("native codec unavailable")
    terms, keys, queries, qk = _dict_and_queries(rng)
    slots = hashing.build_table(keys)
    probes = hashing.max_probe_len(slots, hashing.hash_rows_np(keys))
    got = native.hash_probe(keys, slots, probes, qk)
    # numpy walk, forced (bypass the native fast path inside probe_rows_np)
    mask = np.uint32(len(slots) - 1)
    h = hashing.hash_rows_np(qk)
    want = np.full(qk.shape[0], -1, dtype=np.int64)
    for i in range(qk.shape[0]):
        for p in range(probes):
            pos = int((h[i] + np.uint32(p)) & mask)
            cand = int(slots[pos])
            if cand < 0:
                break
            if (keys[cand] == qk[i]).all():
                want[i] = cand
                break
    assert np.array_equal(got.astype(np.int64), want)
    tset = {t: j for j, t in enumerate(terms)}
    for i, q in enumerate(queries):
        assert got[i] == tset.get(q, -1), q
