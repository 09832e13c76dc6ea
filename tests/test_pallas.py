"""Pallas decode kernel vs jnp decoder (interpret mode on CPU).

The kernel itself compiles and runs on the real TPU (verified on-chip, see
PERFORMANCE.md A/B); CI runs it in interpret mode on the CPU platform.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from inverted_index_2_tpu.models.query_engine import build_snapshot_arrays
from inverted_index_2_tpu.ops import decode as D
from inverted_index_2_tpu.ops.pallas_decode import TQ, decode_postings_pallas


def _snap(lists, rng):
    """Pallas-ready snapshot: pow2 arena, 128-aligned stride, slack rows."""
    voffs = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lists], out=voffs[1:])
    blob = b"".join(f"t{i:05d}".encode() for i in range(len(lists)))
    offs = np.arange(len(lists) + 1, dtype=np.int64) * 6
    return build_snapshot_arrays(
        blob, offs, np.concatenate(lists), voffs, stride_align=128
    )


def test_pallas_decode_matches_jnp(rng):
    lists = [
        np.unique(rng.integers(0, 5_000_000, size=int(s), dtype=np.uint32))
        for s in rng.integers(1, 700, size=48)
    ]
    snap = _snap(lists, rng)
    assert snap.blocks.shape[1] % 128 == 0
    Q = 4 * TQ
    term_idx = jnp.asarray(rng.integers(0, len(lists), size=Q).astype(np.int32))
    L = 768
    pv, pc = decode_postings_pallas(
        snap.blocks, snap.term_block_start, snap.counts, term_idx, L, interpret=True
    )
    jv, jc = D.gather_postings_arena(
        snap.blocks, snap.term_block_start, snap.counts, term_idx, L
    )
    pv, pc, jv, jc = map(np.asarray, (pv, pc, jv, jc))
    assert np.array_equal(pc, jc)  # both RAW counts
    for q in range(Q):
        c = min(int(pc[q]), L)
        assert np.array_equal(pv[q, :c], jv[q, :c]), q
    for q, t in enumerate(np.asarray(term_idx)):
        want = lists[t][:L]
        assert np.array_equal(pv[q, : len(want)], want), q


def test_decode_pow2_mxu_matches_repeat(rng):
    """The MXU permutation-matmul interleave (Pallas path) is bit-identical
    to the jnp.repeat interleave across all width classes {0,8,16,32}."""
    from inverted_index_2_tpu.codec import packing as P

    lists = []
    for scale in (1, 120, 60_000, 2**24, 2**30):
        for s in (1, 5, 127, 128, 129, 400):
            g = rng.integers(1, 2 * scale + 1, size=s, dtype=np.int64)
            lists.append(np.unique((np.cumsum(g) % 2**32).astype(np.uint32)))
    voffs = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum([len(l) for l in lists], out=voffs[1:])
    words, outs = P.encode_bulk(np.concatenate(lists), voffs, byte_align=2)
    stride = 256
    win = np.zeros((len(lists), stride), np.uint32)
    for i, o in enumerate(outs):
        blk = words[o + 1 : o + 1 + stride]
        win[i, : len(blk)] = blk
    v_rep, _ = D.decode_blocks_pow2(jnp.asarray(win), use_mxu=False)
    v_mxu, _ = D.decode_blocks_pow2(jnp.asarray(win), use_mxu=True)
    assert np.array_equal(np.asarray(v_rep), np.asarray(v_mxu))
    for i, l in enumerate(lists):
        c = min(128, len(l))
        assert np.array_equal(np.asarray(v_rep)[i, :c], l[:c]), i


def test_pallas_intersect_matches_setops(rng):
    """ops/pallas_bool.intersect_pallas vs setops.intersect_many (bit-exact),
    over overlapping draws incl. empty lists, single-term queries, garbage
    padding, and a genuine 0xFFFFFFFF member."""
    from inverted_index_2_tpu.ops import setops
    from inverted_index_2_tpu.ops.pallas_bool import intersect_pallas

    Q, K, L = 16, 4, 256
    lists = np.zeros((Q, K, L), dtype=np.uint32)
    counts = np.zeros((Q, K), dtype=np.int32)
    kv = rng.integers(1, K + 1, size=Q).astype(np.int32)
    for q in range(Q):
        pool = rng.choice(600, size=400, replace=False).astype(np.uint32)
        for j in range(K):
            n = int(rng.integers(0, L + 1))
            v = np.sort(rng.choice(pool, size=min(n, len(pool)), replace=False))
            counts[q, j] = len(v)
            lists[q, j, : len(v)] = v
            lists[q, j, len(v):] = rng.integers(
                0, 2**32, size=L - len(v), dtype=np.uint32
            )
    # query 0: a genuine 0xFFFFFFFF member of every list (counts, not
    # sentinels, define validity)
    for j in range(K):
        c = counts[0, j]
        lists[0, j, c] = 0xFFFFFFFF
        counts[0, j] = c + 1

    rv, rc = setops.intersect_many(
        jnp.asarray(lists), jnp.asarray(counts), jnp.asarray(kv)
    )
    gv, gc = intersect_pallas(
        jnp.asarray(lists), jnp.asarray(counts), jnp.asarray(kv), interpret=True
    )
    rv, rc, gv, gc = map(np.asarray, (rv, rc, gv, gc))
    assert np.array_equal(rc, gc)
    for q in range(Q):
        assert np.array_equal(rv[q, : rc[q]], gv[q, : gc[q]]), q
