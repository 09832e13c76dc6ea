"""Posting-list compression codec: delta + per-block bit-plane packing.

TPU-native replacement for the reference's `intcomp.CompressUint32` /
`UncompressUint32` (used at /root/reference/file/writer.go:49 and
/root/reference/file/reader.go:100). The reference delegates to a FastPFoR-family
Go library (delta + binary packing in blocks of 128); we define our own layout
designed so that DECODE is a fixed-shape vector program (shift/and/sum over
128-lane bit-planes) that runs identically in numpy (host), jax.numpy (XLA) and
Pallas (TPU VMEM), instead of a sequential horizontal bit-stream walk.

Layout (all little-endian uint32 words):

    [ n ]                                 total number of values
    then ceil(n/128) blocks, each:
    [ header ]  = bitwidth b (bits 0..7) | block count n_blk (bits 8..15)
    [ anchor ]  = first value of the block, raw
    [ b * 4 plane words ]                 bit-planes of (delta - 1) values

Within a block the values v[0..n_blk-1] are strictly increasing (the index
stores sorted unique uint32 postings — see /root/reference/file/types.go:14-22);
we store d[j] = v[j+1] - v[j] - 1 for j in 0..n_blk-2 (each >= 0).
b = max bit-length of the stored deltas (0 when all deltas are 0 or n_blk == 1).
Plane word layout: word[w*4 + g] packs bit w of deltas d[g*32 .. g*32+31],
delta j's bit at position (j % 32). Unused lanes (j >= n_blk-1) are zero.

Unlike the reference (which does NOT store run lengths and derives them by
peeking the next term's offset, reader.go:36-69) our layout is self-delimiting:
`n` is stored, and every block's size is derivable from its header. This is
deliberate: the device decoder needs explicit offsets, and it removes the
reference Reader's buffer-doubling retry loop (reader.go:79-98).

An empty value list encodes to the single word [0]
(round-trip parity with file/writer_test.go:11-46's empty-values case).
"""
from __future__ import annotations

import numpy as np

BLOCK = 128
LANES = BLOCK // 32  # 4 uint32 words per bit-plane
# Worst-case words per block: header + anchor + 32 planes * 4 words.
MAX_BLOCK_WORDS = 2 + 32 * LANES


def _bit_length(x: np.ndarray) -> np.ndarray:
    """Element-wise bit length of uint32/uint64 values (0 -> 0)."""
    x = x.astype(np.uint64)
    out = np.zeros(x.shape, dtype=np.int64)
    cur = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur >= (np.uint64(1) << np.uint64(shift))
        out[mask] += shift
        cur[mask] >>= np.uint64(shift)
    out[x > 0] += 1
    return out


def encode_postings(values: np.ndarray) -> np.ndarray:
    """Encode a sorted, unique uint32 array into codec words (uint32).

    Vectorized host reference implementation (numpy). The C++ native codec
    (native/codec.cpp) and the jax decoder (ops/decode.py) implement the
    identical layout.
    """
    values = np.ascontiguousarray(values, dtype=np.uint32)
    n = values.shape[0]
    if n == 0:
        return np.zeros(1, dtype=np.uint32)

    nb = -(-n // BLOCK)
    pad = nb * BLOCK - n
    v = np.concatenate([values, np.zeros(pad, dtype=np.uint32)]).reshape(nb, BLOCK)

    cnt = np.full(nb, BLOCK, dtype=np.int64)
    cnt[-1] = BLOCK - pad
    anchors = v[:, 0].astype(np.uint32)

    # deltas within each block: d[j] = v[j+1]-v[j]-1 (valid for j < cnt-1)
    d = v[:, 1:].astype(np.int64) - v[:, :-1].astype(np.int64) - 1
    jidx = np.arange(BLOCK - 1, dtype=np.int64)
    valid = jidx[None, :] < (cnt[:, None] - 1)
    if not np.all(d[valid] >= 0):
        raise ValueError("encode_postings requires strictly increasing values")
    d = np.where(valid, d, 0).astype(np.uint64)

    maxd = d.max(axis=1) if d.shape[1] else np.zeros(nb, dtype=np.uint64)
    b = _bit_length(maxd)  # (nb,) in [0, 32]

    bmax = int(b.max()) if nb else 0
    # Pack bit-planes: planes[blk, w, g]
    d128 = np.zeros((nb, BLOCK), dtype=np.uint64)
    d128[:, : BLOCK - 1] = d
    dg = d128.reshape(nb, LANES, 32)
    lane_shift = np.arange(32, dtype=np.uint64)
    planes = np.zeros((nb, max(bmax, 1), LANES), dtype=np.uint32)
    for w in range(bmax):
        bits = (dg >> np.uint64(w)) & np.uint64(1)
        words = (bits << lane_shift).sum(axis=2).astype(np.uint64)
        planes[:, w, :] = (words & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    blk_words = 2 + LANES * b
    offs = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(blk_words, out=offs[1:])
    out = np.zeros(1 + offs[-1], dtype=np.uint32)
    out[0] = n
    base = 1 + offs[:-1]
    out[base] = (b | (cnt << 8)).astype(np.uint32)
    out[base + 1] = anchors

    if bmax > 0:
        ncols = bmax * LANES
        col = np.arange(ncols, dtype=np.int64)
        src_mask = col[None, :] < (LANES * b)[:, None]
        flat_src = planes.reshape(nb, -1)[:, :ncols][src_mask]
        dst = (base[:, None] + 2 + col[None, :])[src_mask]
        out[dst] = flat_src
    return out


def decode_postings(words: np.ndarray, offset: int = 0) -> np.ndarray:
    """Decode one posting list starting at word `offset`. Returns uint32 array."""
    words = np.asarray(words, dtype=np.uint32)
    n = int(words[offset])
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    nb = -(-n // BLOCK)
    out = np.zeros(nb * BLOCK, dtype=np.uint32)
    pos = offset + 1
    lane_shift = np.arange(32, dtype=np.uint32)
    for k in range(nb):
        header = int(words[pos])
        b = header & 0xFF
        n_blk = (header >> 8) & 0xFF
        anchor = np.uint64(words[pos + 1])
        d = np.zeros(BLOCK, dtype=np.uint64)
        if b > 0:
            planes = words[pos + 2 : pos + 2 + b * LANES].reshape(b, LANES)
            # bits[w, g, i] for lane i
            bits = (planes[:, :, None] >> lane_shift[None, None, :]) & np.uint32(1)
            weights = (np.uint64(1) << np.arange(b, dtype=np.uint64))
            d = (bits.astype(np.uint64) * weights[:, None, None]).sum(axis=0).reshape(BLOCK)
        # reconstruct: v[0]=anchor; v[j+1]=v[j]+d[j]+1
        vals = anchor + np.concatenate(
            [np.zeros(1, dtype=np.uint64), np.cumsum(d[: BLOCK - 1] + np.uint64(1))]
        )
        out[k * BLOCK : (k + 1) * BLOCK] = _place(vals, n_blk)
        pos += 2 + b * LANES
    return out[:n]


def _place(vals: np.ndarray, n_blk: int) -> np.ndarray:
    res = np.zeros(BLOCK, dtype=np.uint32)
    res[:n_blk] = (vals[:n_blk] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return res


def encoded_length(words: np.ndarray, offset: int = 0) -> int:
    """Number of words occupied by the posting list at `offset` (incl. count word)."""
    words = np.asarray(words, dtype=np.uint32)
    n = int(words[offset])
    nb = -(-n // BLOCK)
    pos = offset + 1
    for _ in range(nb):
        b = int(words[pos]) & 0xFF
        pos += 2 + b * LANES
    return pos - offset


def scan_term_blocks(words: np.ndarray, outs: np.ndarray):
    """Vectorized scan of block offsets/widths for many terms at once.

    `outs` are word offsets of each term's [n] count word. Returns
    (counts (T,), nblocks (T,), block_off (T, maxnb), block_b (T, maxnb)).
    Used by the bulk decoder (merge path) and by device-side loaders.
    """
    words = np.asarray(words, dtype=np.uint32)
    outs = np.asarray(outs, dtype=np.int64)
    counts = words[outs].astype(np.int64)
    nblocks = -(-counts // BLOCK)
    maxnb = int(nblocks.max()) if len(nblocks) else 0
    T = len(outs)
    block_off = np.zeros((T, max(maxnb, 1)), dtype=np.int64)
    block_b = np.zeros((T, max(maxnb, 1)), dtype=np.int64)
    cur = outs + 1
    for k in range(maxnb):
        act = nblocks > k
        h = words[cur[act]].astype(np.int64)
        b = h & 0xFF
        block_off[act, k] = cur[act]
        block_b[act, k] = b
        cur[act] += 2 + LANES * b
    return counts, nblocks, block_off, block_b


def decode_bulk(words: np.ndarray, outs: np.ndarray, chunk: int = 65536):
    """Decode many posting lists; returns (values concat, counts, value_offsets).

    Vectorized over terms in chunks; used by the merge/compaction path to
    materialize all postings of the input segments at once (replaces the
    reference's per-term streaming loop at /root/reference/shard.go:168-212).
    """
    words = np.asarray(words, dtype=np.uint32)
    outs = np.asarray(outs, dtype=np.int64)
    counts, nblocks, block_off, block_b = scan_term_blocks(words, outs)
    total = int(counts.sum())
    voffs = np.zeros(len(outs) + 1, dtype=np.int64)
    np.cumsum(counts, out=voffs[1:])
    out = np.zeros(total, dtype=np.uint32)
    if total == 0:
        return out, counts, voffs

    maxnb = block_off.shape[1]
    wpad = np.concatenate([words, np.zeros(MAX_BLOCK_WORDS, dtype=np.uint32)])
    lane_shift = np.arange(32, dtype=np.uint32)

    T = len(outs)
    for lo in range(0, T, chunk):
        hi = min(lo + chunk, T)
        c_counts = counts[lo:hi]
        c_nb = nblocks[lo:hi]
        c_off = block_off[lo:hi]
        c_b = block_b[lo:hi]
        c_voff = voffs[lo:hi]
        Tc = hi - lo
        for k in range(maxnb):
            act = np.nonzero(c_nb > k)[0]
            if len(act) == 0:
                continue
            offs_k = c_off[act, k]
            b_k = c_b[act, k]
            bmax = int(b_k.max())
            headers = wpad[offs_k].astype(np.int64)
            n_blk = (headers >> 8) & 0xFF
            anchors = wpad[offs_k + 1].astype(np.uint64)
            d = np.zeros((len(act), BLOCK), dtype=np.uint64)
            if bmax > 0:
                win = wpad[offs_k[:, None] + 2 + np.arange(bmax * LANES)[None, :]]
                win = win.reshape(len(act), bmax, LANES)
                wmask = (np.arange(bmax)[None, :] < b_k[:, None])
                weights = (np.uint64(1) << np.arange(bmax, dtype=np.uint64))
                # bits: (A, bmax, LANES, 32)
                bits = (win[:, :, :, None] >> lane_shift[None, None, None, :]) & np.uint32(1)
                contrib = bits.astype(np.uint64) * weights[None, :, None, None]
                contrib *= wmask[:, :, None, None].astype(np.uint64)
                d = contrib.sum(axis=1).reshape(len(act), BLOCK)
            steps = d[:, : BLOCK - 1] + np.uint64(1)
            vals = anchors[:, None] + np.concatenate(
                [np.zeros((len(act), 1), dtype=np.uint64), np.cumsum(steps, axis=1)], axis=1
            )
            vals32 = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            # scatter valid values to output
            jmask = np.arange(BLOCK)[None, :] < n_blk[:, None]
            dst = (c_voff[act][:, None] + k * BLOCK + np.arange(BLOCK)[None, :])[jmask]
            out[dst] = vals32[jmask]
    return out, counts, voffs


def encode_bulk(values: np.ndarray, value_offsets: np.ndarray):
    """Encode many posting lists at once (vectorized over all blocks).

    values[value_offsets[i]:value_offsets[i+1]] is term i's sorted unique list.
    Returns (words uint32, outs int64) with outs[i] = word offset of list i.
    Layout is bit-identical to per-term encode_postings concatenation.
    """
    values = np.ascontiguousarray(values, dtype=np.uint32)
    value_offsets = np.asarray(value_offsets, dtype=np.int64)
    T = len(value_offsets) - 1
    counts = np.diff(value_offsets)
    nb = -(-counts // BLOCK)  # blocks per term (0 for empty lists)
    B = int(nb.sum())
    if B == 0:
        outs = np.arange(T, dtype=np.int64)
        return np.zeros(T, dtype=np.uint32), outs

    bstart = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(nb, out=bstart[1:])
    block_term = np.repeat(np.arange(T, dtype=np.int64), nb)
    block_in_term = np.arange(B, dtype=np.int64) - bstart[block_term]
    s = value_offsets[block_term] + BLOCK * block_in_term
    blen = np.minimum(BLOCK, value_offsets[block_term + 1] - s)
    anchors = values[s]

    # global adjacent deltas (valid only within a term's list)
    if len(values) > 1:
        dg = values[1:].astype(np.int64) - values[:-1].astype(np.int64) - 1
    else:
        dg = np.zeros(0, dtype=np.int64)
    dg = np.concatenate([dg, np.zeros(BLOCK, dtype=np.int64)])
    jidx = np.arange(BLOCK - 1, dtype=np.int64)
    gidx = s[:, None] + jidx[None, :]
    dvalid = jidx[None, :] < (blen[:, None] - 1)
    d = np.where(dvalid, dg[gidx], 0)
    if d.size and d.min() < 0:
        raise ValueError("encode_bulk requires strictly increasing values per list")
    d = d.astype(np.uint64)

    maxd = d.max(axis=1)
    b = _bit_length(maxd)  # (B,)
    bmax = int(b.max())

    d128 = np.zeros((B, BLOCK), dtype=np.uint64)
    d128[:, : BLOCK - 1] = d
    dgrp = d128.reshape(B, LANES, 32)
    lane_shift = np.arange(32, dtype=np.uint64)
    planes = np.zeros((B, max(bmax, 1), LANES), dtype=np.uint32)
    for w in range(bmax):
        bits = (dgrp >> np.uint64(w)) & np.uint64(1)
        words = (bits << lane_shift).sum(axis=2).astype(np.uint64)
        planes[:, w, :] = (words & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    block_words = 2 + LANES * b  # (B,)
    # per-term output size = 1 (count word) + sum of its block words
    cw = np.zeros(B + 1, dtype=np.int64)
    np.cumsum(block_words, out=cw[1:])
    term_block_words = cw[bstart[1:]] - cw[bstart[:-1]]
    term_words = 1 + term_block_words
    outs = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(term_words, out=outs[1:])
    out = np.zeros(outs[-1], dtype=np.uint32)
    out[outs[:-1]] = counts.astype(np.uint32)

    within = cw[:-1] - cw[bstart[block_term]]
    block_base = outs[:-1][block_term] + 1 + within
    out[block_base] = (b | (blen << 8)).astype(np.uint32)
    out[block_base + 1] = anchors

    if bmax > 0:
        ncols = bmax * LANES
        col = np.arange(ncols, dtype=np.int64)
        src_mask = col[None, :] < (LANES * b)[:, None]
        flat_src = planes.reshape(B, -1)[:, :ncols][src_mask]
        dst = (block_base[:, None] + 2 + col[None, :])[src_mask]
        out[dst] = flat_src
    return out, outs[:-1]


def compressed_size_words(values: np.ndarray) -> int:
    """Size in words of encode_postings(values) without materializing it."""
    n = len(values)
    if n == 0:
        return 1
    return len(encode_postings(np.asarray(values, dtype=np.uint32)))
