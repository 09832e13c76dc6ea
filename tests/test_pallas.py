"""Pallas decode kernel vs jnp decoder (interpret mode on CPU)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from inverted_index_2_tpu.codec import packing as P
from inverted_index_2_tpu.ops import decode as D
from inverted_index_2_tpu.ops.pallas_decode import TQ, decode_postings_pallas


def _arena(lists):
    """Build the (B, stride) byte-aligned block arena like the snapshot builder."""
    voffs = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lists], out=voffs[1:])
    words, outs = P.encode_bulk(np.concatenate(lists), voffs, byte_align=True)
    counts, nblocks, block_off, block_b = P.scan_term_blocks(words, outs)
    nb1 = np.maximum(nblocks, 1)
    tbs = np.zeros(len(lists) + 1, dtype=np.int32)
    np.cumsum(nb1, out=tbs[1:])
    flat = np.zeros(tbs[-1], dtype=np.int32)
    for i in range(len(lists)):
        flat[tbs[i] : tbs[i] + nb1[i]] = block_off[i, : nb1[i]]
    col = np.arange(block_off.shape[1])
    mask = col[None, :] < nb1[:, None]
    blk_counts = np.minimum(counts[:, None] - col[None, :] * 128, 128)
    blk_words = 2 + P._packed_words(np.maximum(blk_counts, 0), block_b)
    stride = max(4, int(blk_words[mask].max()) + 1)
    wpad = np.concatenate([words, np.zeros(stride, np.uint32)])
    arena = wpad[flat[:, None] + np.arange(stride)]
    return (
        jnp.asarray(arena),
        jnp.asarray(tbs),
        jnp.asarray(counts.astype(np.int32)),
    )


def test_pallas_decode_matches_jnp(rng):
    lists = [
        np.unique(rng.integers(0, 5_000_000, size=int(s), dtype=np.uint32))
        for s in rng.integers(1, 700, size=48)
    ]
    arena, tbs, counts = _arena(lists)
    Q = 4 * TQ
    term_idx = jnp.asarray(rng.integers(0, len(lists), size=Q).astype(np.int32))
    L = 768
    pv, pc = decode_postings_pallas(arena, tbs, counts, term_idx, L, interpret=True)
    jv, jc = D.gather_postings_arena(arena, tbs, counts, term_idx, L)
    pv, pc, jv, jc = map(np.asarray, (pv, pc, jv, jc))
    assert np.array_equal(pc, jc)
    for q in range(Q):
        assert np.array_equal(pv[q, : pc[q]], jv[q, : jc[q]]), q
    for q, t in enumerate(np.asarray(term_idx)):
        want = lists[t][:L]
        assert np.array_equal(pv[q, : len(want)], want), q
