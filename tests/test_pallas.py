"""Pallas decode kernel vs jnp decoder (interpret mode on CPU)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from inverted_index_2_tpu.codec import packing as P
from inverted_index_2_tpu.ops import decode as D
from inverted_index_2_tpu.ops.pallas_decode import TQ, decode_postings_pallas


def _tables(lists):
    voffs = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lists], out=voffs[1:])
    words, outs = P.encode_bulk(np.concatenate(lists), voffs)
    counts, nblocks, block_off, _ = P.scan_term_blocks(words, outs)
    nb1 = np.maximum(nblocks, 1)
    tbs = np.zeros(len(lists) + 1, dtype=np.int32)
    np.cumsum(nb1, out=tbs[1:])
    flat = np.zeros(tbs[-1], dtype=np.int32)
    for i in range(len(lists)):
        flat[tbs[i] : tbs[i] + nb1[i]] = block_off[i, : nb1[i]]
    wpad = np.concatenate([words, np.zeros(D.WIN, np.uint32)])
    return (
        jnp.asarray(wpad),
        jnp.asarray(flat),
        jnp.asarray(tbs),
        jnp.asarray(counts.astype(np.int32)),
    )


def test_pallas_decode_matches_jnp(rng):
    lists = [
        np.unique(rng.integers(0, 5_000_000, size=int(s), dtype=np.uint32))
        for s in rng.integers(1, 700, size=48)
    ]
    words, flat, tbs, counts = _tables(lists)
    Q = 4 * TQ
    term_idx = jnp.asarray(rng.integers(0, len(lists), size=Q).astype(np.int32))
    L = 768
    pv, pc = decode_postings_pallas(words, flat, tbs, counts, term_idx, L, interpret=True)
    jv, jc = D.gather_postings(words, flat, tbs, counts, term_idx, L)
    pv, pc, jv, jc = map(np.asarray, (pv, pc, jv, jc))
    assert np.array_equal(pc, jc)
    for q in range(Q):
        assert np.array_equal(pv[q, : pc[q]], jv[q, : jc[q]]), q
