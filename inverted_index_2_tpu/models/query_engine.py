"""Device-resident query engine — the flagship "model" of this framework.

The reference serves queries by opening files and walking iterators per call
(/root/reference/inverted_index.go:300, shard.go:72). A TPU serves queries as
batched array programs over an immutable DEVICE SNAPSHOT of the index:

    IndexSnapshot ("parameters"):
        keys              (N, W+1)     uint32  global sorted term dictionary
        blocks            (B, stride)  uint32  posting-block row arena
                                               (byte-aligned codec blocks,
                                               one row per block: whole-row
                                               gathers beat elementwise
                                               window gathers ~4x on v5e)
        term_block_start  (N+1,)       int32   first block row of each term
        counts            (N,)         int32   postings per term
        hash_slots        (S,)         int32   linear-probe exact-lookup table
        removed           (R,)         uint32  sorted tombstones (optional)

    QueryEngine ("forward passes"), all jit-compiled, static shapes:
        lookup:   Q terms -> (found, postings (Q, L), counts, raw counts)
        AND/OR:   Q x K terms -> combined posting sets (+ per-query `need`)
        prefix:   device range search + device decode + vectorized union

    Long posting lists are EXACT: rows whose true count exceeds the fast-path
    L are re-served at the smallest ladder level (L, 4L, 16L, ... capped at
    the corpus' longest list) that fits — everything decodes on device; the
    snapshot keeps NO host mirror of terms or postings.

Snapshot semantics match a reference Read(nil, nil) over the whole index
(union across segments, NO tombstone filtering — tombstones act at merge,
see inverted_index_test.go:59-82 flow); pass apply_removed=True to purge at
build, or filter_removed=True per query batch for the vectorized-tombstone
query path (north star: "removed_list.go's tombstones applied as vectorized
bitmask filters").
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import math
import os
import threading

import numpy as np

import jax
import jax.numpy as jnp

from ..codec import hashing
from ..codec import keys as keys_mod
from ..codec import native as _native
from ..codec import packing
from ..ops import decode as dec
from ..ops import dict_search as ds
from ..ops import setops
from ..shard import merge_views


@dataclass
class IndexSnapshot:
    """Immutable device-resident image of one index (or one shard group).

    Fully self-contained on device: keys losslessly hold the term bytes
    (codec/keys.py), the arena holds every posting block, so NO host mirror
    of terms/postings exists (long posting lists are served exactly by
    re-decoding at a larger static L — see QueryEngine). `host_counts` is
    the one host-side array (N int32) used to pick re-serve L levels and
    size prefix unions.
    """

    keys: jnp.ndarray               # (N, W+1) uint32
    blocks: jnp.ndarray             # (B, stride) uint32 block row arena
    term_block_start: jnp.ndarray   # (N+1,) int32
    counts: jnp.ndarray             # (N,) int32
    removed: jnp.ndarray            # (R,) uint32 sorted
    width: int                      # W (words per packed term, excl. len)
    hash_slots: jnp.ndarray = None  # (S,) int32 linear-probe table (-1 empty)
    max_probes: int = 1             # static probe bound (longest chain)
    max_count: int = 0              # longest posting list (host int)
    host_counts: np.ndarray = field(repr=False, default=None)  # (N,) int32
    arena_aligned: bool = False     # 128-lane stride + slack rows: the
                                    # Pallas in-kernel DMA paths are usable

    @property
    def n_terms(self) -> int:
        return int(self.keys.shape[0])

    def device_bytes(self) -> int:
        """Resident HBM footprint of the snapshot tables."""
        arrs = (self.keys, self.blocks, self.term_block_start, self.counts,
                self.removed, self.hash_slots)
        return int(sum(a.size * a.dtype.itemsize for a in arrs if a is not None))


def _empty_snapshot(width: int = 1) -> IndexSnapshot:
    return IndexSnapshot(
        keys=jnp.zeros((0, width + 1), dtype=jnp.uint32),
        blocks=jnp.zeros((1, 4), dtype=jnp.uint32),
        term_block_start=jnp.zeros((1,), dtype=jnp.int32),
        counts=jnp.zeros((0,), dtype=jnp.int32),
        removed=jnp.zeros((0,), dtype=jnp.uint32),
        width=width,
        hash_slots=jnp.full((8,), -1, dtype=jnp.int32),
        max_probes=1,
        max_count=0,
        host_counts=np.zeros(0, dtype=np.int32),
    )


@jax.jit
def _expand_arena_step(wpad, flat, col):
    return wpad[flat[:, None] + col[None, :]]


def _expand_arena(wpad, flat, stride: int):
    col = jnp.arange(stride, dtype=jnp.int32)
    return _expand_arena_step(wpad, flat, col)


@dataclass
class HostTables:
    """Compact host-side image of one snapshot build: everything needed to
    (re)materialize an IndexSnapshot on device WITHOUT touching segment
    files — the checkpoint payload (models/checkpoint.py). `words` is the
    block-compressed postings stream; `flat` the per-block word offsets
    WITHOUT the device slack rows (upload_tables appends those when it
    picks an aligned arena layout). The expanded arena never lives here:
    it is up to ~10x the compressed words and is rebuilt by one device
    gather at upload."""

    keys: np.ndarray      # (N, W+1) uint32 packed term keys
    words: np.ndarray     # (T,) uint32 compressed postings stream
    flat: np.ndarray      # (B,) int32 per-block word offsets
    tbs: np.ndarray       # (N+1,) int32 term -> first block row
    counts: np.ndarray    # (N,) int32 posting-list lengths
    removed: np.ndarray   # (R,) uint32 sorted tombstones
    slots: np.ndarray     # (S,) int32 linear-probe hash table (-1 empty)
    max_probes: int       # static probe bound of `slots`
    max_count: int        # longest posting list
    width: int            # W (words per packed term, excl. length word)
    max_bw: int           # widest block in words (pre-alignment stride - 1)

    @property
    def n_terms(self) -> int:
        return int(self.keys.shape[0])


def _empty_tables(width: int, removed: Optional[np.ndarray] = None) -> HostTables:
    return HostTables(
        keys=np.zeros((0, width + 1), dtype=np.uint32),
        words=np.zeros(0, dtype=np.uint32),
        flat=np.zeros(0, dtype=np.int32),
        tbs=np.zeros(1, dtype=np.int32),
        counts=np.zeros(0, dtype=np.int32),
        removed=(
            np.sort(np.asarray(removed, dtype=np.uint32))
            if removed is not None else np.zeros(0, np.uint32)
        ),
        slots=np.full(8, -1, dtype=np.int32),
        max_probes=1,
        max_count=0,
        width=width,
        max_bw=3,
    )


def build_host_tables(
    blob, offsets, values, voffs, removed=None, width=None, build_hash: bool = True,
) -> HostTables:
    """Lower merged (blob, offsets, values, voffs) arrays to compact host
    tables (the pure-host half of build_snapshot_arrays).

    build_hash=False skips hash-table construction (the mesh stacker builds
    per-device tables at a common size itself — building here too would be
    duplicated O(N) work)."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if n == 0:
        return _empty_tables(width or 1, removed)
    blob_arr = np.frombuffer(blob, dtype=np.uint8) if isinstance(blob, bytes) else blob
    keys = keys_mod.pack_blob(blob_arr, offsets, width)
    W = keys.shape[1] - 1

    # device arena: power-of-two byte widths {0,8,16,32} (static-extraction
    # decode in BOTH the XLA and Pallas backends; the on-disk segment codec
    # keeps exact widths for the compression contract)
    words, outs = packing.encode_bulk(np.asarray(values, dtype=np.uint32), voffs, byte_align=2)
    if len(words) >= 2**31:
        # block offsets travel as int32 (device-friendly); one snapshot
        # partition beyond 8 GiB of packed words must be sharded instead
        raise ValueError("snapshot partition exceeds int32 word addressing; shard it")
    from ..codec import native as native_mod

    counts = words[np.asarray(outs, dtype=np.int64)].astype(np.int64)
    nb1 = np.maximum(-(-counts // 128), 1)
    tbs = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(nb1, out=tbs[1:])
    if native_mod.available():
        flat = native_mod.scan_blocks(words, outs, tbs.astype(np.int64))
    else:
        _, nblocks, block_off, _ = packing.scan_term_blocks(words, outs)
        flat = np.zeros(tbs[-1], dtype=np.int32)
        maxnb = block_off.shape[1]
        colm = np.arange(maxnb, dtype=np.int64)
        maskm = colm[None, :] < nb1[:, None]
        flat[(tbs[:-1].astype(np.int64)[:, None] + colm[None, :])[maskm]] = block_off[maskm]
    # block row arena: stride = largest block + 1 slack word, derived from
    # the block headers directly. Built ON DEVICE from the compressed words
    # (the padded arena is up to ~10x the compressed size — shipping words +
    # offsets and expanding with one device gather beats transferring the
    # expansion).
    headers = words[flat.astype(np.int64)]
    h_b = (headers & 0xFF).astype(np.int64)
    h_nblk = ((headers >> 8) & 0xFF).astype(np.int64)
    blk_words = 2 + packing._packed_words(h_nblk, h_b)
    max_bw = int(blk_words.max()) if len(blk_words) else 3

    rem = np.sort(np.asarray(removed, dtype=np.uint32)) if removed is not None else np.zeros(0, np.uint32)
    if build_hash:
        slots, max_probes = hashing.build_table_with_probes(keys)
    else:
        slots = np.full(8, -1, dtype=np.int32)
        max_probes = 1
    return HostTables(
        keys=keys,
        words=words,
        flat=flat,
        tbs=tbs,
        counts=counts.astype(np.int32),
        removed=rem,
        slots=np.asarray(slots, dtype=np.int32),
        max_probes=max_probes,
        max_count=int(counts.max()) if len(counts) else 0,
        width=W,
        max_bw=max_bw,
    )


def upload_tables(
    t: HostTables, stride_align: Optional[int] = None
) -> IndexSnapshot:
    """Materialize compact host tables on the default device (the upload
    half of build_snapshot_arrays): ship words + offsets, expand the block
    arena with one device gather.

    stride_align: None = AUTO — on a TPU backend, align the arena stride to
    128 lanes (enabling the fused Pallas AND kernel's in-kernel DMA) when
    that costs at most 2x the compact stride; corpora with tiny blocks
    (short posting lists, where alignment would inflate the arena up to
    ~25x and the padded XLA paths are already fast) stay compact. Explicit
    1 forces compact, 128 forces aligned. TPI_PALLAS_AND=0 disables auto."""
    if t.n_terms == 0:
        snap = _empty_snapshot(t.width or 1)
        snap.removed = jnp.asarray(t.removed)
        return snap
    words, flat = t.words, t.flat
    stride = max(4, t.max_bw + 1)
    if stride_align is None:
        aligned = -(-stride // 128) * 128
        auto_ok = (
            os.environ.get("TPI_PALLAS_AND", "1") != "0"
            and jax.default_backend() == "tpu"
            and aligned <= 2 * stride
        )
        stride_align = 128 if auto_ok else 1
    # Mosaic DMA slices must be 128-lane aligned: the Pallas kernels need
    # stride_align=128 (arena rows grow up to ~2x; XLA row gathers are
    # stride-insensitive, so the compact fallback stays 1)
    stride = -(-stride // stride_align) * stride_align
    if stride_align > 1:
        # trailing slack rows (all zeros) so the Pallas kernel's (K, stride)
        # consecutive-row windows stay in bounds for terms near the arena end
        from ..ops.pallas_decode import SLACK_ROWS

        flat = np.concatenate(
            [flat, np.full(SLACK_ROWS, len(words), dtype=np.int32)]
        )
    wpad_dev = jnp.asarray(np.concatenate([words, np.zeros(stride, dtype=np.uint32)]))
    flat_dev = jnp.asarray(flat)
    arena = _expand_arena(wpad_dev, flat_dev, stride)

    return IndexSnapshot(
        keys=jnp.asarray(t.keys),
        blocks=jnp.asarray(arena),
        term_block_start=jnp.asarray(t.tbs),
        counts=jnp.asarray(t.counts),
        removed=jnp.asarray(t.removed),
        width=t.width,
        hash_slots=jnp.asarray(t.slots),
        max_probes=t.max_probes,
        max_count=t.max_count,
        host_counts=t.counts,
        arena_aligned=stride_align > 1,
    )


def build_snapshot_arrays(
    blob, offsets, values, voffs, removed=None, width=None, build_hash: bool = True,
    stride_align: Optional[int] = None,
):
    """Lower merged (blob, offsets, values, voffs) arrays to device tables
    (build_host_tables + upload_tables; see those for the knobs)."""
    return upload_tables(
        build_host_tables(blob, offsets, values, voffs, removed, width, build_hash),
        stride_align,
    )


def _collect_removed(index) -> np.ndarray:
    parts = [sh.removed_list.values() for sh in index._snapshot()]
    return np.sort(np.concatenate(parts)) if parts else np.zeros(0, np.uint32)


def _purge_merged(merged, removed: np.ndarray):
    """Apply tombstones to merged (blob, offsets, values, voffs) arrays,
    dropping emptied terms; returns the purged tuple or None if everything
    was removed (the apply_removed=True build semantics)."""
    blob, offsets, values, voffs = merged
    keep = ~np.isin(values, removed, assume_unique=False)
    # recompute per-term counts after the purge; drop empty terms
    term_of = np.repeat(np.arange(len(voffs) - 1), np.diff(voffs))
    values = values[keep]
    term_of = term_of[keep]
    new_counts = np.bincount(term_of, minlength=len(voffs) - 1)
    nz = new_counts > 0
    if not nz.any():
        return None
    lens = np.diff(offsets)[nz]
    starts = offsets[:-1][nz]
    from ..utils.ragged import ragged_gather

    blob_arr = np.frombuffer(blob, dtype=np.uint8) if isinstance(blob, bytes) else blob
    nb, _ = ragged_gather(blob_arr, starts, lens)
    offsets = np.zeros(int(nz.sum()) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    voffs = np.zeros(int(nz.sum()) + 1, dtype=np.int64)
    np.cumsum(new_counts[nz], out=voffs[1:])
    return nb.tobytes(), offsets, values, voffs


def snapshot_new_segments(
    index, base_segments: Dict[str, frozenset], width: Optional[int] = None,
    removed: Optional[np.ndarray] = None, with_tables: bool = False,
):
    """Freeze ONLY the segments not in `base_segments` (shard key ->
    segment-key set): the O(delta) piece of an incremental refresh. Returns
    None when nothing is new. Pass `removed` (sorted tombstones) to purge
    the delta at build — REQUIRED under apply_removed, where the main tier
    was purged and an unpurged delta would resurrect removed values.
    with_tables=True returns (snapshot, HostTables) instead — the engine's
    table-retention mode keeps the compact host half for host-side
    serving (lookup_host) and checkpointing."""
    from ..segment.registry import Segments

    views, pinned_all = [], []
    for sh in index._snapshot():
        pinned = sh.segments.pin_all()
        pinned_all.append(pinned)
        base = base_segments.get(sh.get_key(), frozenset())
        views.extend(
            s.view for s in pinned if s.view is not None and s.key not in base
        )
    try:
        merged = merge_views(views, None)
    finally:
        for pinned in pinned_all:
            Segments.release(pinned)
    if merged is None:
        return None
    if removed is not None and len(removed):
        merged = _purge_merged(merged, removed)
        if merged is None:
            return None
    blob, offsets, values, voffs = merged
    t = build_host_tables(blob, offsets, values, voffs, None, width)
    snap = upload_tables(t)
    return (snap, t) if with_tables else snap


class _SnapshotTier:
    """merge_views-compatible adapter over a DEVICE snapshot: term bytes
    reconstructed from the key matrix, postings device-decoded in
    ladder-grouped batches. Lets two snapshot tiers (main + delta) merge
    into one WITHOUT re-reading any segment file — the promotion path."""

    def __init__(self, snap: IndexSnapshot, engine: "QueryEngine"):
        kb, ko = keys_mod.unpack_keys(np.asarray(snap.keys))
        self.blob = kb
        self.offsets = np.asarray(ko, dtype=np.int64)
        self.n_terms = snap.n_terms
        self.max_term_len = (
            int(np.diff(self.offsets).max()) if snap.n_terms else 0
        )
        self._vals, self._voffs = engine._decode_indices(
            np.arange(snap.n_terms), snap
        )

    def keys(self, W: int) -> np.ndarray:
        return keys_mod.pack_blob(self.blob, self.offsets, W)

    def decode_all(self):
        return self._vals, np.diff(self._voffs), self._voffs


def snapshot_tables(index, apply_removed: bool = False, width: Optional[int] = None) -> HostTables:
    """Freeze an InvertedIndex into compact HOST tables (the pure-host half
    of snapshot_index — also the checkpoint payload, models/checkpoint.py).

    Pins all segments of all shards and merges them logically (global
    sorted terms + unioned values — the same array program as compaction),
    then encodes postings with the block codec. Equivalent read semantics
    to Read(nil, nil)."""
    from ..segment.registry import Segments

    views, pinned_all, removed_parts = [], [], []
    for sh in index._snapshot():
        pinned = sh.segments.pin_all()
        pinned_all.append(pinned)
        views.extend(s.view for s in pinned if s.view is not None)
        removed_parts.append(sh.removed_list.values())
    try:
        merged = merge_views(views, None)
    finally:
        for pinned in pinned_all:
            Segments.release(pinned)
    removed = (
        np.sort(np.concatenate(removed_parts)) if removed_parts else np.zeros(0, np.uint32)
    )
    if merged is None:
        return _empty_tables(width or 1, removed)
    if apply_removed and len(removed):
        merged = _purge_merged(merged, removed)
        if merged is None:
            return _empty_tables(width or 1)
        removed = np.zeros(0, np.uint32)
    blob, offsets, values, voffs = merged
    return build_host_tables(blob, offsets, values, voffs, removed, width)


def snapshot_index(index, apply_removed: bool = False, width: Optional[int] = None) -> IndexSnapshot:
    """Freeze an InvertedIndex into a device snapshot (snapshot_tables +
    upload_tables)."""
    return upload_tables(snapshot_tables(index, apply_removed=apply_removed, width=width))


# ---------------------------------------------------------------------------
# jitted forward steps (pure functions of snapshot arrays)
# ---------------------------------------------------------------------------


def _resolve(keys, qkeys, slots=None, max_probes: int = 0):
    """Exact term -> index resolution: hash probe when a table is provided
    (2-4 gathers), else multiword binary search (log2 N gathers)."""
    if slots is not None:
        return ds.hash_lookup_rows(keys, slots, qkeys, max_probes)
    return ds.lookup_rows(keys, qkeys)


def lookup_step(
    keys, blocks, term_block_start, counts, qkeys, L: int,
    slots=None, max_probes: int = 0, removed=None,
):
    """Batched exact-term lookup:
    (found (Q,), postings (Q, L), counts (Q,), raw_counts (Q,)).

    One fused program: hash probe (or binary search) -> block row gather ->
    static byte-unpack decode. Misses return count 0. Pass `removed` (sorted)
    to apply the vectorized tombstone filter to each result row.

    raw_counts is the term's TRUE posting count: raw > L means the row holds
    only the first L postings and the caller must re-serve that query at a
    larger L for exactness (QueryEngine does this automatically; the
    reference streams runs of any length, reader.go:79-98 — here exactness
    costs one extra pass at the next static size instead).
    """
    idx, found = _resolve(keys, qkeys, slots, max_probes)
    vals, raw = dec.gather_postings_arena(blocks, term_block_start, counts, idx, L)
    raw = jnp.where(found, raw, 0)
    n = jnp.minimum(raw, L)
    if removed is not None and removed.shape[0] > 0:
        vals, n = setops.filter_removed(vals, n, removed)
    return found, vals, n, raw


def boolean_step(
    keys, blocks, term_block_start, counts,
    qkeys, k_valid, L: int, op: str, removed=None,
    slots=None, max_probes: int = 0,
):
    """Batched boolean query: qkeys (Q, K, W+1), k_valid (Q,).

    AND: missing/absent term => empty result. OR: misses contribute nothing.
    Optional vectorized tombstone filtering of the combined result.
    """
    Q, K, Wp1 = qkeys.shape
    flat = qkeys.reshape(Q * K, Wp1)
    idx, found = _resolve(keys, flat, slots, max_probes)
    vals, raw = dec.gather_postings_arena(blocks, term_block_start, counts, idx, L)
    # need: the largest TRUE posting count among a query's present terms.
    # need > L means some list was clipped at decode, so the combined result
    # may be incomplete — callers re-serve those (rare) queries at the next
    # ladder L (device-exact; no host fallback).
    raw = jnp.where(found, raw, 0)
    n = jnp.minimum(raw, L)
    lists = vals.reshape(Q, K, L)
    ncnt = n.reshape(Q, K)
    kmask = jnp.arange(K, dtype=jnp.int32)[None, :] < k_valid[:, None]
    need = jnp.max(
        jnp.where(kmask, raw.reshape(Q, K), 0), axis=1
    ).astype(jnp.int32)
    if op == "and":
        out, oc = setops.intersect_many(lists, ncnt, k_valid)
    elif op == "or":
        out, oc = setops.union_many(lists, ncnt, k_valid)
    else:
        raise ValueError(op)
    if removed is not None and removed.shape[0] > 0:
        out, oc = setops.filter_removed(out, oc, removed)
    return out, oc, need


def boolean_step_dual(
    keys1, blocks1, tbs1, counts1, slots1,
    keys2, blocks2, tbs2, counts2, slots2,
    qkeys1, qkeys2, k_valid, L: int, op: str, removed=None,
    max_probes1: int = 0, max_probes2: int = 0,
):
    """boolean_step over a MAIN + DELTA snapshot pair (incremental refresh):
    each term's postings are the union of its rows in both snapshots (a term
    may live in both — same union semantics as the reference's k-way read
    across segments, types.go:14-22), then the set op runs on the combined
    (Q, K, 2L) lists. Returns (out (Q, 2L), oc, need) — need sums both
    snapshots' raw counts, so callers re-serve at a ladder level covering
    the union."""
    Q, K, Wp1 = qkeys1.shape
    flat1 = qkeys1.reshape(Q * K, Wp1)
    flat2 = qkeys2.reshape(Q * K, qkeys2.shape[-1])
    idx1, f1 = _resolve(keys1, flat1, slots1, max_probes1)
    v1, r1 = dec.gather_postings_arena(blocks1, tbs1, counts1, idx1, L)
    r1 = jnp.where(f1, r1, 0)
    idx2, f2 = _resolve(keys2, flat2, slots2, max_probes2)
    v2, r2 = dec.gather_postings_arena(blocks2, tbs2, counts2, idx2, L)
    r2 = jnp.where(f2, r2, 0)
    pair = jnp.stack([v1, v2], axis=1)                        # (QK, 2, L)
    pcnt = jnp.stack([jnp.minimum(r1, L), jnp.minimum(r2, L)], axis=1)
    u, uc = setops.union_many(pair, pcnt, jnp.full((Q * K,), 2, jnp.int32))
    lists = u.reshape(Q, K, 2 * L)
    ncnt = uc.reshape(Q, K)
    kmask = jnp.arange(K, dtype=jnp.int32)[None, :] < k_valid[:, None]
    need = jnp.max(
        jnp.where(kmask, (r1 + r2).reshape(Q, K), 0), axis=1
    ).astype(jnp.int32)
    if op == "and":
        out, oc = setops.intersect_many(lists, ncnt, k_valid)
    elif op == "or":
        out, oc = setops.union_many(lists, ncnt, k_valid)
    else:
        raise ValueError(op)
    if removed is not None and removed.shape[0] > 0:
        out, oc = setops.filter_removed(out, oc, removed)
    return out, oc, need


def _compact_small(flat, P: int):
    """First P ascending kept values of each row -> (Q, P).

    Rows hold an ascending unique value set with gaps masked to 0xFFFFFFFF
    (the fused kernel's compact=False output). P iterative masked mins are
    pure elementwise+reduce passes (P reads of (Q, L)) — far cheaper than
    the (Q, L) compaction sort for the tiny result sets an AND of
    independent lists produces, and small enough to download WITH the
    counts in one fetch (lax.top_k lowers to a full sort on TPU — measured
    dead end, PERFORMANCE.md). A genuine 0xFFFFFFFF member is bit-identical
    to the mask and lands in the last counted slot, same as the sort path."""
    SENT = jnp.uint32(0xFFFFFFFF)
    cols = []
    last = None
    for _ in range(P):
        m = (
            jnp.min(flat, axis=1)
            if last is None
            else jnp.min(jnp.where(flat > last[:, None], flat, SENT), axis=1)
        )
        cols.append(m)
        last = m
    return jnp.stack(cols, axis=1)


def boolean_fused_step(
    keys, blocks, term_block_start, counts,
    qkeys, k_valid, L: int, removed=None,
    slots=None, max_probes: int = 0, interpret: bool = False,
    small_p: int = 0,
):
    """Batched AND through the FUSED Pallas kernel (ops/pallas_fused.py):
    resolve terms, swap each query's smallest list into the base slot, then
    decode + membership-compare directly over the block arena in VMEM.
    Probe lists are walked to their FULL length — `need` is the BASE
    (smallest) count only, so the ladder re-serve fraction is
    P(min list > L) instead of P(any list > L) (measured 0.003 vs 0.49 at
    the config-3 shape, L=2048). Requires an arena built with
    stride_align=128 (IndexSnapshot.arena_aligned).

    Returns (out (Q, L) compacted ascending, oc (Q,), need (Q,))."""
    from ..ops.pallas_fused import fused_and_pallas, reorder_smallest_base

    Q, K, Wp1 = qkeys.shape
    flat = qkeys.reshape(Q * K, Wp1)
    idx, found = _resolve(keys, flat, slots, max_probes)
    idx = idx.reshape(Q, K)
    found = found.reshape(Q, K)
    kmask = jnp.arange(K, dtype=jnp.int32)[None, :] < k_valid[:, None]
    live = found & kmask
    # a missing REQUIRED term carries count 0, wins the argmin, and empties
    # the AND via an empty base — exactly the required semantics
    cnt = jnp.where(live, counts[idx], 0).astype(jnp.int32)
    rows = jnp.where(live, term_block_start[idx], 0).astype(jnp.int32)
    rows2, cnt2, need = reorder_smallest_base(rows, cnt, k_valid)
    out, oc = fused_and_pallas(
        blocks, rows2, cnt2, k_valid, L,
        compact=small_p == 0, interpret=interpret,
    )
    if small_p:
        # single-fetch serving shape: compact the first small_p results and
        # ship them WITH the counts; oc_pre (pre-filter raw count) lets the
        # caller detect the rare rows whose result exceeds small_p and
        # re-run just those through the sort path
        small = _compact_small(out, small_p)
        oc_pre = oc
        oc = jnp.minimum(oc, small_p)
        if removed is not None and removed.shape[0] > 0:
            small, oc = setops.filter_removed(small, oc, removed)
        return small, oc, need, oc_pre
    if removed is not None and removed.shape[0] > 0:
        out, oc = setops.filter_removed(out, oc, removed)
    return out, oc, need


def boolean_fused_staged_step(
    keys, blocks, term_block_start, counts,
    qkeys, k_valid, L: int, levels, removed=None,
    slots=None, max_probes: int = 0, interpret: bool = False,
    small_p: int = 8,
):
    """boolean_fused_step with transfer-minimized outputs for stream
    serving. The staged loop is TUNNEL-byte-bound (measured ~33 MB/s +
    ~58 ms fixed per RPC, transfers overlapping compute), so the per-batch
    fetch shrinks to small (Q, small_p) u32 + oc u8 + ONE u8 class code in
    place of the two i32 count vectors — measured 95.5k -> 113.8k QPS at
    8192-query batches (small_p 32 -> 8 is most of it; AND results of
    independent lists almost never exceed 8, and overflows re-run through
    the sort path like any other wide row).

    levels: ascending i32 ladder levels (<= the arena slack). Returns
    (small, oc u8, code u8) with code: 0 = normal (exact result in
    small[:oc]); 1 = small_p overflow (sort-path re-run); 2+li = ladder
    re-serve at levels[li]; 255 = beyond the ladder (concat path). The
    host classifies follow-ups from the code alone — level identity is
    all _reserve_ladder needs, the raw `need` never ships."""
    small, oc, need, oc_pre = boolean_fused_step(
        keys, blocks, term_block_start, counts, qkeys, k_valid, L,
        removed, slots, max_probes, interpret, small_p)
    ocu8 = jnp.minimum(oc, 255).astype(jnp.uint8)
    li = jnp.searchsorted(levels, need).astype(jnp.int32)
    code = jnp.where(
        need <= L,
        jnp.where(oc_pre <= small_p, 0, 1),
        jnp.where(li < levels.shape[0], 2 + li, 255),
    ).astype(jnp.uint8)
    return small, ocu8, code


def prefix_range_step(keys, lo_keys, hi_keys):
    """Device prefix -> dictionary range [lo, hi) (PrefixSearch kernel).

    hi_keys must be the 0xff-saturated prefix key with length word 0xFFFFFFFF
    (strictly greater than every term sharing the prefix)."""
    lo = ds.searchsorted_rows(keys, lo_keys)
    hi = ds.searchsorted_rows(keys, hi_keys)
    return lo, hi


# ---------------------------------------------------------------------------
# host-facing engine
# ---------------------------------------------------------------------------

_JIT_LOOKUP = jax.jit(lookup_step, static_argnames=("L", "max_probes"))
_JIT_BOOLEAN = jax.jit(boolean_step, static_argnames=("L", "op", "max_probes"))
_JIT_BOOLEAN_DUAL = jax.jit(
    boolean_step_dual, static_argnames=("L", "op", "max_probes1", "max_probes2")
)
_JIT_BOOLEAN_FUSED = jax.jit(
    boolean_fused_step,
    static_argnames=("L", "max_probes", "interpret", "small_p"),
)
_JIT_BOOLEAN_FUSED_STAGED = jax.jit(
    boolean_fused_staged_step,
    static_argnames=("L", "max_probes", "interpret", "small_p"),
)
_JIT_PREFIX = jax.jit(prefix_range_step)
_JIT_DECODE = jax.jit(dec.gather_postings_arena, static_argnames=("L",))

from ..ops import concat_bool as _cb

_JIT_RESOLVE = jax.jit(_cb.resolve_step, static_argnames=("max_probes",))
_JIT_CONCAT_BOOL = jax.jit(
    _cb.boolean_concat_step, static_argnames=("SB", "op", "compactor")
)
_JIT_FILTER = jax.jit(setops.filter_removed)


# -- result wire codec (full-result fetch compression) -----------------------
#
# Full-result set ops ship O(sum of posting lengths) back to the host; on a
# bandwidth-bound link the fetch IS the serving floor. Result rows are
# sorted, so their deltas are small: shipping (first value u32, deltas u8 or
# u16) halves/quarters the wire volume, and the host reconstructs with one
# vectorized cumsum. The dtype is chosen PER DISPATCH from the masked max
# delta (computed on device at dispatch time, fetched with the counts — no
# extra round trip vs the trim path it replaces); a dispatch whose max delta
# exceeds 16 bits falls back to the raw u32 trim. Exact for any corpus.


def _wire_meta_step(o, oc):
    """Masked max result delta of a dispatch (deltas past a row's count are
    pad garbage and must not inflate the width choice)."""
    d = o[:, 1:] - o[:, :-1]
    col = jnp.arange(o.shape[1] - 1, dtype=jnp.int32)
    mask = col[None, :] < (oc[:, None] - 1)
    return jnp.max(jnp.where(mask, d, 0), initial=jnp.uint32(0))


def _wire_pack_step(o, bits: int):
    """(first column u32, delta plane u8/u16). Deltas past a row's count may
    wrap — the host trims to the row count before they are ever read."""
    dt = jnp.uint8 if bits == 8 else jnp.uint16
    return o[:, :1], (o[:, 1:] - o[:, :-1]).astype(dt)


_JIT_WIRE_META = jax.jit(_wire_meta_step)
_JIT_WIRE_PACK = jax.jit(_wire_pack_step, static_argnames=("bits",))


def _wire_unpack(first: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    """Host half: reconstruct the (B, maxc) u32 result matrix."""
    out = np.empty((first.shape[0], 1 + deltas.shape[1]), dtype=np.uint32)
    out[:, :1] = first
    out[:, 1:] = deltas
    return np.cumsum(out, axis=1, dtype=np.uint32)


_LINK_MBPS: Optional[float] = None


def _link_mbps() -> float:
    """Measured host<->device link bandwidth (MB/s, round-trip corrected),
    probed once per process: device_put + device_get of a FRESH 4 MB and a
    FRESH 4 KB array per rep (pure transfers — deliberately NO jit
    programs: remote compiles on tunneled devices are erratically slow),
    latency-corrected by the small probe, best-of-2 to ride out RPC
    bursts. The array MUST be fresh each rep: once an array has been
    device_get once, its host copy is cached and later gets return in ~0
    (measured 211 ms then 0.1 ms on the axon tunnel — a reused-array probe
    reads ~90 GB/s on a ~20 MB/s link). Drives transport-aware serving
    routes (_host_boolean_route); TPI_LINK_MBPS pins it for tests/ops."""
    global _LINK_MBPS
    if _LINK_MBPS is None:
        pinned = os.environ.get("TPI_LINK_MBPS")
        if pinned is not None:
            _LINK_MBPS = float(pinned)
            return _LINK_MBPS
        import time as _time

        def best(nwords):
            t = math.inf
            for _ in range(2):
                arr = np.zeros(nwords, dtype=np.uint32)
                t0 = _time.monotonic()
                jax.device_get(jax.device_put(arr))
                t = min(t, _time.monotonic() - t0)
            return t

        nbytes = (1 << 22) - (1 << 12)
        dt = max(best(1 << 20) - best(1 << 10), 1e-6)
        # bytes cross the link twice (up on the put, down on the get)
        _LINK_MBPS = 2 * nbytes / dt / 2**20
    return _LINK_MBPS


def _index_fingerprint(index, apply_removed: bool):
    """Cheap identity of the index's visible state (segment keys + tombstone
    batch counts per shard) for refresh no-op detection. Tombstone counts are
    ALWAYS part of the identity: even without apply_removed they feed the
    engine's filter_removed array, so a tombstone-only change must refresh."""
    parts = []
    for sh in index._snapshot():
        segs = tuple(s.key for s in sh.segments.snapshot())
        parts.append((sh.get_key(), segs, len(sh.removed_list)))
    return (apply_removed, tuple(parts))


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


def _batch_as_lists(b):
    """Normalize one stream batch to a list of term lists (identity for
    list input; expands a columnar (blob, offsets, qoffs) triple — the
    slow-path inverse of QueryEngine._pack_boolean_cols, used only by the
    per-batch fallbacks)."""
    if not (isinstance(b, tuple) and len(b) == 3):
        return b
    blob, offsets, qoffs = b
    blob8 = (
        np.frombuffer(blob, dtype=np.uint8)
        if isinstance(blob, (bytes, bytearray))
        else np.asarray(blob, dtype=np.uint8)
    )
    offsets = np.asarray(offsets, dtype=np.int64)
    terms = [
        blob8[offsets[i] : offsets[i + 1]].tobytes()
        for i in range(len(offsets) - 1)
    ]
    return [
        terms[int(qoffs[i]) : int(qoffs[i + 1])]
        for i in range(len(qoffs) - 1)
    ]


def _rows_to_columnar(rows):
    """List-of-arrays -> (values, voffs[n+1]) columnar pair."""
    counts = np.array(
        [0 if r is None else len(r) for r in rows], dtype=np.int64
    )
    voffs = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(counts, out=voffs[1:])
    vals = (
        np.concatenate([r for r in rows if r is not None and len(r)])
        if voffs[-1] else np.zeros(0, np.uint32)
    ).astype(np.uint32)
    return vals, voffs


def _narrow_keys(qk: np.ndarray, to_width: int) -> np.ndarray:
    """Drop trailing key words down to `to_width` (keeping the length word).

    Always safe toward a snapshot whose corpus fits `to_width`: a term
    longer than to_width*4 bytes cannot exist there, and the preserved
    length word keeps equality exact for everything else. (The inverse —
    widening a key that was packed too narrow — would zero-fill bytes the
    other tier has, producing false negatives; queries must be PACKED at
    the maximum width across tiers and narrowed per tier.)"""
    W = qk.shape[-1] - 1
    if W == to_width:
        return qk
    assert W > to_width
    return np.concatenate([qk[..., :to_width], qk[..., -1:]], axis=-1)


# device-memory budget for one re-serve batch (uint32 elements): bounds the
# (Q, L') result matrices when re-serving long-posting queries exactly
_RESERVE_BUDGET = 1 << 24  # 64 MiB of uint32


def _ladder(L: int, max_count: int, step: int = 4) -> List[int]:
    """Static L sizes for exact re-serves: L, 4L, 16L, ... capped at the
    corpus' longest posting list (rounded up to a block multiple). A handful
    of levels => a handful of compiled programs, each reused (levels compile
    lazily — only sizes a workload actually hits). Step 4 balances re-serve
    cost (a clipped query pays ~step/2 x the base pass) against program
    count; heavy-tailed corpora hit 2-3 levels in practice."""
    levels = []
    cur = L
    top = _round_up(max_count, 128)
    while cur < top:
        cur = min(cur * step, top)
        levels.append(cur)
    return levels


class ServingState:
    """One immutable bundle of everything a serve path reads: the snapshot
    tier pair, the tombstone arrays, the retained host tables, and the
    freeze fingerprints. refresh() publishes a complete new bundle with a
    SINGLE reference assignment (atomic under the GIL), and every serve
    entry point captures one local reference up front — a concurrent
    reader therefore sees either the whole old state or the whole new one,
    never a new main paired with a stale delta or stale tombstones (the
    reference's copy-on-read snapshot protocol, segments.go:25-53 +
    inverted_index.go's shard-list copies)."""

    __slots__ = ("snap", "delta", "removed", "tables", "delta_tables",
                 "fingerprint", "main_fp", "_removed_host")

    def __init__(self, snap: IndexSnapshot,
                 delta: Optional[IndexSnapshot] = None,
                 removed=None,
                 tables: Optional[HostTables] = None,
                 delta_tables: Optional[HostTables] = None,
                 fingerprint=None, main_fp=None,
                 removed_host: Optional[np.ndarray] = None):
        self.snap = snap
        self.delta = delta
        self.removed = removed
        self.tables = tables
        self.delta_tables = delta_tables
        self.fingerprint = fingerprint
        self.main_fp = main_fp
        self._removed_host = removed_host

    def replace(self, **kw) -> "ServingState":
        """A copy with the given fields replaced (the rest shared)."""
        args = {
            "delta": self.delta, "removed": self.removed,
            "tables": self.tables, "delta_tables": self.delta_tables,
            "fingerprint": self.fingerprint, "main_fp": self.main_fp,
            "removed_host": self._removed_host,
        }
        snap = kw.pop("snap", self.snap)
        args.update(kw)
        return ServingState(snap, **args)

    def removed_host(self) -> Optional[np.ndarray]:
        """Host mirror of the serving tombstone array (lazy; idempotent —
        racing computations produce the same value)."""
        rh = self._removed_host
        if rh is None and self.removed is not None:
            rh = np.asarray(self.removed)
            self._removed_host = rh
        return rh

    def host_ready(self) -> bool:
        """Host-side serving covers this state's tier pair."""
        return self.tables is not None and (
            self.delta is None or self.delta_tables is not None
        )

    def max_count(self) -> int:
        m = self.snap.max_count
        if self.delta is not None:
            m += self.delta.max_count  # a term's tier union can reach the sum
        return m

    def width(self) -> int:
        """Query key width across the live tier pair (device snapshots)."""
        w = self.snap.width
        if self.delta is not None:
            w = max(w, self.delta.width)
        return w

    def host_q_width(self) -> int:
        w = self.tables.width
        if self.delta_tables is not None:
            w = max(w, self.delta_tables.width)
        return w


class QueryEngine:
    """Batched query serving over a frozen IndexSnapshot.

    Q is padded to buckets so jit caches stay small. L (posting pad length)
    is the FAST-PATH pad: queries whose posting lists exceed L are re-served
    exactly on device at the smallest ladder level that fits (L, 4L, 16L, ...
    up to the corpus' longest list) — results are always exact, with no host
    mirror of the postings (the reference streams any-length runs,
    reader.go:79-98; here exactness costs a second pass for the rare long
    queries instead of memory for all of them).
    """

    # delta promotion threshold: a delta larger than this fraction of main
    # triggers a full rebuild (the LSM analogue of compaction)
    DELTA_FRACTION = 0.25

    def __init__(self, snapshot: IndexSnapshot, L: int = 1024, q_bucket: int = 256,
                 checkpoint_path: Optional[str] = None, checkpoint_async: bool = True,
                 tables: Optional[HostTables] = None):
        # ALL serving state lives in one immutable bundle; see ServingState.
        # Table retention: with the compact host tables kept (`tables`,
        # auto via from_index/from_checkpoint keep_tables=True), full-result
        # lookups serve ENTIRELY host-side (lookup_host — hash probe +
        # native block decode from the compressed stream, zero device round
        # trips), the reference's mmap-read architecture (reader.go:33-103).
        # Costs host RAM ~= the compressed index; refresh keeps them current.
        self._state = ServingState(
            snapshot, removed=snapshot.removed, tables=tables,
            removed_host=tables.removed if tables is not None else None,
        )
        # writers (refresh/promotion) serialize here; serve paths never
        # take it — they read self._state once and run on that bundle
        self._refresh_lock = threading.Lock()
        # L is only the fast-path pad (lists over it re-serve exactly), and
        # every decode path works in 128-value blocks — normalize rather
        # than crash deep in the first dual-tier dispatch
        self.L = max(128, _round_up(L, 128))
        self.q_bucket = q_bucket
        # auto-checkpointing: with a path set, every MAIN-tier rebuild
        # (from_index, full refresh, delta promotion) re-persists the warm-
        # start tables there — serving restarts are always warm with zero
        # operator action. Delta-only refreshes deliberately do NOT rewrite
        # it: the stale file reconciles at load via the refresh lifecycle.
        self.checkpoint_path = checkpoint_path
        self.checkpoint_async = checkpoint_async
        self._ckpt_lock = threading.Lock()
        self._ckpt_thread: Optional[threading.Thread] = None
        # module-level jit caches: shared across engine instances so fresh
        # snapshots of same-shaped indexes reuse compiled programs
        self._lookup = _JIT_LOOKUP
        self._boolean = _JIT_BOOLEAN
        self._prefix = _JIT_PREFIX

    # -- serving-state access -------------------------------------------------
    #
    # Read-only views of the current ServingState for introspection and
    # tests. Serve paths do NOT use these: each entry point captures
    # `st = self._state` ONCE and threads it through, so one call always
    # runs against one consistent bundle.

    @property
    def snap(self) -> IndexSnapshot:
        return self._state.snap

    @property
    def delta(self) -> Optional[IndexSnapshot]:
        return self._state.delta

    @property
    def tables(self) -> Optional[HostTables]:
        return self._state.tables

    @property
    def delta_tables(self) -> Optional[HostTables]:
        return self._state.delta_tables

    @property
    def _removed(self):
        return self._state.removed

    @property
    def _fingerprint(self):
        return self._state.fingerprint

    @property
    def _main_fp(self):
        return self._state.main_fp

    def _publish(self, st: ServingState) -> None:
        """Swap the serving state: ONE reference assignment — atomic under
        the GIL, so mid-flight readers see whole-old or whole-new."""
        self._state = st

    def _save_ckpt(self, tables: HostTables, fp) -> None:
        """Persist `tables` at checkpoint_path (async by default — the npz
        write is host IO the serving path need not wait on; saves serialize
        on a lock, and the atomic tmp+rename publish means a reader never
        sees a torn file)."""
        if self.checkpoint_path is None:
            return
        from .checkpoint import save_tables

        apply_removed = bool(fp[0]) if fp is not None else False

        def run():
            with self._ckpt_lock:
                save_tables(tables, self.checkpoint_path, fingerprint=fp,
                            apply_removed=apply_removed)

        if self.checkpoint_async:
            t = threading.Thread(target=run, daemon=True, name="tpi-ckpt-save")
            t.start()
            self._ckpt_thread = t
        else:
            run()

    def checkpoint_wait(self) -> None:
        """Block until any in-flight async checkpoint save has published."""
        t = self._ckpt_thread
        if t is not None:
            t.join()

    def _levels(self, st: Optional[ServingState] = None) -> List[int]:
        # serve paths ALWAYS pass their captured st; the default is for
        # introspection (stats/tests) only
        st = st if st is not None else self._state
        return _ladder(self.L, st.max_count())

    def _level_for(self, need: int, st: Optional[ServingState] = None) -> int:
        for lv in self._levels(st):
            if lv >= need:
                return lv
        return _round_up(need, 128)

    def warmup(self, k_max: int = 8, ops: Sequence[str] = ("and", "or")) -> int:
        """Precompile the serving programs before traffic arrives (first
        compiles cost seconds; tens of seconds over a remote-compile
        tunnel). Compiles the lookup step, the resolve step, and every
        boolean size class a corpus of this shape can hit, at one query
        bucket each. Returns the number of programs compiled."""
        st = self._state
        s = st.snap
        if s.n_terms == 0:
            return 0
        n = 0
        qk = jnp.zeros((self.q_bucket, s.width + 1), dtype=jnp.uint32)
        jax.block_until_ready(self._lookup_on(s, qk, None)[0])
        n += 1
        bqk = jnp.zeros((8, k_max, s.width + 1), dtype=jnp.uint32)
        kv = jnp.zeros((8,), dtype=jnp.int32)
        jax.block_until_ready(
            _JIT_RESOLVE(s.keys, s.counts, bqk, s.hash_slots, s.max_probes)[0]
        )
        n += 1
        max_blocks = k_max * (-(-max(1, s.max_count) // 128))
        bi = jnp.zeros((8, k_max), dtype=jnp.int32)
        bf = jnp.zeros((8, k_max), dtype=bool)
        for SB in self._SB_CLASSES:
            for op in ops:
                jax.block_until_ready(
                    _JIT_CONCAT_BOOL(
                        s.blocks, s.term_block_start, s.counts, bi, bf, kv, SB, op
                    )[0]
                )
                n += 1
            if SB >= max_blocks:
                break
        if "and" in ops and self._use_fused(st):
            # the fused Pallas program's cold compile over a remote-compile
            # tunnel has measured MINUTES at its worst — precompile the
            # base-L program at the EXACT serve-time shape: K padded to
            # _FUSED_K_BUCKET (what _boolean_fused dispatches for the
            # common k<=8 traffic) and Q to the 8-aligned bucket
            kf = max(k_max, self._FUSED_K_BUCKET)
            Qf = _round_up(self.q_bucket, 8)
            bqk_full = jnp.zeros((Qf, kf, s.width + 1), dtype=jnp.uint32)
            kv_full = jnp.zeros((Qf,), dtype=jnp.int32)
            interp = (
                os.environ.get("TPI_FUSED_AND") == "interp"
                and jax.default_backend() != "tpu"
            )
            # warm BOTH tombstone variants when tombstones exist: the
            # filter_removed=True program is structurally different and
            # would otherwise pay its cold compile at serve time
            rem_variants = [None]
            if st.removed is not None and st.removed.shape[0] > 0:
                rem_variants.append(st.removed)
            for rem in rem_variants:
                # small_p is the serve-time MAIN-pass shape (_boolean_fused
                # dispatches small_p=_FUSED_SMALL_P; the small_p=0 sort
                # variant serves only the rare wide/re-serve follow-ups and
                # compiles lazily)
                jax.block_until_ready(
                    _JIT_BOOLEAN_FUSED(
                        s.keys, s.blocks, s.term_block_start, s.counts,
                        bqk_full, kv_full, self.L,
                        rem, s.hash_slots, s.max_probes, interp,
                        self._FUSED_SMALL_P,
                    )[1]
                )
                n += 1
                # the stream-serving program (boolean_staged) is a distinct
                # trace (u8 outputs + level coding) — warm it too
                jax.block_until_ready(
                    _JIT_BOOLEAN_FUSED_STAGED(
                        s.keys, s.blocks, s.term_block_start, s.counts,
                        bqk_full, kv_full, self.L, self._staged_levels(st),
                        rem, s.hash_slots, s.max_probes, interp,
                        self._STAGED_SMALL_P,
                    )[1]
                )
                n += 1
        return n

    @staticmethod
    def _tables_bytes(t: Optional[HostTables]) -> int:
        if t is None:
            return 0
        return int(sum(
            a.nbytes for a in (t.keys, t.words, t.flat, t.tbs, t.counts,
                               t.removed, t.slots)
        ))

    def stats(self) -> Dict[str, int]:
        """Memory/meta counters for the frozen snapshot. host_bytes counts
        the per-term count vector (always resident); tables_bytes the
        OPTIONAL retained compact tables (keep_tables — ~compressed-index
        size, what host-side serving reads from; 0 when dropped)."""
        st = self._state
        s, d = st.snap, st.delta
        return {
            "n_terms": s.n_terms,
            "n_postings": int(s.host_counts.sum()) if s.host_counts is not None else 0,
            "max_posting_len": s.max_count,
            "device_bytes": s.device_bytes(),
            "host_bytes": int(s.host_counts.nbytes) if s.host_counts is not None else 0,
            "tables_bytes": (
                self._tables_bytes(st.tables)
                + self._tables_bytes(st.delta_tables)
            ),
            "delta_terms": 0 if d is None else d.n_terms,
            "delta_device_bytes": 0 if d is None else d.device_bytes(),
            "ladder": self._levels(st),
            "fused_and": self._use_fused(st),
            "host_serving": st.host_ready(),
        }

    @classmethod
    def from_index(cls, index, L: int = 1024, apply_removed: bool = False,
                   keep_tables: bool = True, stride_align: Optional[int] = None,
                   **kw):
        """Freeze `index` and serve it. keep_tables=True (default) retains
        the compact host tables already built by the freeze — enabling
        host-side full-result lookups (lookup_host) for the cost of holding
        the compressed postings in host RAM; pass False to drop them.
        stride_align passes through to upload_tables (None = auto: 128 on
        a TPU backend for the fused-kernel arena)."""
        fp = _index_fingerprint(index, apply_removed)
        t = snapshot_tables(index, apply_removed=apply_removed)
        eng = cls(upload_tables(t, stride_align=stride_align), L=L,
                  tables=t if keep_tables else None, **kw)
        eng._publish(eng._state.replace(fingerprint=fp, main_fp=fp))
        eng._save_ckpt(t, fp)
        return eng

    @classmethod
    def from_checkpoint(cls, path: str, index=None, L: int = 1024,
                        keep_tables: bool = True, **kw):
        """Warm-start a serving engine from a checkpoint written by
        models.checkpoint.save_checkpoint: load the compact host tables,
        upload (one gather expands the arena on device) — skipping the
        segment scan / merge / re-encode / hash build of from_index.

        With `index` given, the checkpoint is reconciled against the LIVE
        index through the normal refresh lifecycle: unchanged fingerprint =
        no extra work, additive drift = O(delta) incremental tier, merged-
        away segments or tombstone drift (under apply_removed) = full
        rebuild. Without `index`, the engine serves the checkpointed state
        as-is.

        Pass checkpoint_path=<same path> to also ADOPT the file for
        auto-resave: every subsequent main-tier rebuild re-persists it
        (opt-in — the load path may be a read-only location)."""
        from .checkpoint import load_checkpoint, load_fingerprint

        t, meta = load_checkpoint(path)
        eng = cls(upload_tables(t), L=L, tables=t if keep_tables else None, **kw)
        fp = load_fingerprint(meta)
        eng._publish(eng._state.replace(fingerprint=fp, main_fp=fp))
        if index is not None:
            eng.refresh(index, apply_removed=bool(meta["apply_removed"]))
        return eng

    def save_checkpoint(self, index, path: str, apply_removed: bool = False) -> dict:
        """Persist this index's CURRENT state as a warm-start checkpoint
        (see models/checkpoint.py). Convenience wrapper: the freeze runs
        from the live index (host tables are not retained on the engine —
        they are the compressed-postings-sized half of a rebuild). Key
        width is re-derived from the corpus, not pinned to this engine's:
        terms grown past snap.width*4 bytes must widen, or they'd alias."""
        from .checkpoint import save_checkpoint as _save

        return _save(index, path, apply_removed=apply_removed)

    def refresh(self, index, apply_removed: bool = False) -> bool:
        """Re-freeze from the live index (serve/refresh lifecycle: queries
        keep running against the old snapshot pair until the swap —
        snapshots are immutable, so this is safe mid-flight). No-op
        (returns False) when the index is unchanged since the last freeze.

        INCREMENTAL (O(delta)): when the change is purely ADDITIVE — every
        segment of the main freeze still lives, tombstones untouched when
        apply_removed — only the new segments are merged and uploaded as a
        small DELTA snapshot; the main tables are untouched. A delta beyond
        DELTA_FRACTION of main, a compaction (segments vanished), or a
        tombstone change under apply_removed promotes to a full rebuild
        (the serve-side analogue of LSM compaction). The key width is
        re-derived from the new corpus on full rebuilds: forcing the old
        width would truncate terms that grew longer (aliasing distinct
        terms)."""
        with self._refresh_lock:
            base = self._state
            fp = _index_fingerprint(index, apply_removed)
            if fp == base.fingerprint:
                return False
            if base.fingerprint is not None and self._try_delta_refresh(
                index, fp, apply_removed
            ):
                return True
            t = snapshot_tables(index, apply_removed=apply_removed)
            snap = upload_tables(t)
            keep = base.tables is not None
            self._publish(ServingState(
                snap, removed=snap.removed,
                tables=t if keep else None,
                removed_host=t.removed if keep else None,
                fingerprint=fp, main_fp=fp,
            ))
            self._save_ckpt(t, fp)
            return True

    def _try_delta_refresh(self, index, fp, apply_removed: bool) -> bool:
        """Attempt the O(delta) incremental tier; publishes the new state
        (fingerprint included) and returns True on success. Runs under
        _refresh_lock (refresh is the only caller)."""
        base = self._state
        main_fp = base.main_fp
        if main_fp is None or main_fp[0] != apply_removed:
            return False
        main_shards = {k: (segs, rl) for k, segs, rl in main_fp[1]}
        for key, segs, rl in fp[1]:
            base_segs, base_rl = main_shards.get(key, ((), 0))
            if not set(base_segs).issubset(segs):
                return False  # a main segment was merged away: full rebuild
            if apply_removed and rl != base_rl:
                return False  # purge baseline changed: full rebuild
        base_map = {k: frozenset(segs) for k, segs, rl in main_fp[1]}
        # under apply_removed the main tier was purged at build: purge the
        # delta against the SAME (unchanged — checked above) tombstone set,
        # so the pair is bit-identical to a full purged rebuild
        rem = _collect_removed(index) if apply_removed else None
        keep = base.tables is not None
        built = snapshot_new_segments(index, base_map, removed=rem,
                                      with_tables=keep)
        if built is None:
            # nothing new on disk (e.g. only tombstones, not applied) —
            # still refresh the tombstone array below
            delta, dt = base.delta, base.delta_tables
        else:
            delta, dt = built if keep else (built, None)
            main_terms = max(1, base.snap.n_terms)
            if delta.n_terms > self.DELTA_FRACTION * main_terms:
                # promote: fold the delta into main by merging the two
                # SNAPSHOT tiers directly (no segment re-read)
                return self._promote_delta(index, fp, apply_removed, delta)
        removed, removed_host = base.removed, base._removed_host
        if not apply_removed:
            rem_h = _collect_removed(index)
            removed, removed_host = jnp.asarray(rem_h), rem_h
        self._publish(base.replace(
            delta=delta, delta_tables=dt if keep else None,
            removed=removed, removed_host=removed_host, fingerprint=fp,
        ))
        return True

    def _promote_delta(self, index, fp, apply_removed: bool, delta) -> bool:
        """Fold an oversized delta into the main tier by merging the two
        snapshots' OWN arrays (decode on device, one two-way key merge,
        re-encode) — O(main + delta tables) instead of the from-disk
        rebuild's O(re-read + re-merge every segment). Bit-identical to
        snapshot_index(index, apply_removed) under this path's
        preconditions (every main segment still live; tombstones unchanged
        when apply_removed — both checked by _try_delta_refresh)."""
        base = self._state
        tiers = [_SnapshotTier(base.snap, self), _SnapshotTier(delta, self)]
        merged = merge_views(tiers, None)
        if merged is None:  # pragma: no cover - both tiers empty
            return False
        blob, offsets, values, voffs = merged
        rem = None if apply_removed else _collect_removed(index)
        t = build_host_tables(blob, offsets, values, voffs, rem)
        snap = upload_tables(t)
        keep = base.tables is not None
        self._publish(ServingState(
            snap, removed=snap.removed,
            tables=t if keep else None,
            removed_host=t.removed if keep else None,
            fingerprint=fp, main_fp=fp,
        ))
        self._save_ckpt(t, fp)
        return True

    # -- exact lookup --------------------------------------------------------

    def lookup_device(self, qkeys: jnp.ndarray, filter_removed: bool = False, L: Optional[int] = None):
        """Raw device step over the MAIN snapshot (bench/power users; the
        delta tier is a host-level concern — use lookup() for union
        semantics across both tiers)."""
        st = self._state
        return self._lookup_on(
            st.snap, qkeys, st.removed if filter_removed else None, L
        )

    def _lookup_on(self, s: IndexSnapshot, qkeys, removed, L: Optional[int] = None):
        return self._lookup(
            s.keys, s.blocks, s.term_block_start, s.counts, qkeys,
            L or self.L, s.hash_slots, s.max_probes, removed,
        )

    def lookup(
        self, terms: Sequence[bytes], filter_removed: bool = False
    ) -> List[Optional[np.ndarray]]:
        """Host convenience: exact postings per term (None for misses).
        filter_removed applies the vectorized tombstone mask per row.
        Terms whose lists exceed L are re-served at a larger ladder L —
        results are always exact and fully device-decoded. With a delta
        snapshot live (incremental refresh), a term's result is the union
        of its rows in both tiers."""
        if not terms:
            return []
        st = self._state
        main = self._exact_rows(st, st.snap, terms, filter_removed)
        if st.delta is None:
            return main
        dl = self._exact_rows(st, st.delta, terms, filter_removed)
        out: List[Optional[np.ndarray]] = []
        for a, b in zip(main, dl):
            if a is None:
                out.append(b)
            elif b is None:
                out.append(a)
            else:
                out.append(np.union1d(a, b))
        return out

    def lookup_staged(
        self, batches, filter_removed: bool = False, depth: int = 3,
        columnar: bool = False, prefix_p: int = 0,
    ):
        """Pipelined stream lookup: `batches` is an iterable of term lists.
        Each term serves as a single-term OR query through the staged
        concat-class stream (exact at any posting length — classes size by
        TRUE counts, no ladder, no truncation), so packing, dispatch, and
        the fetch round trips pipeline across batches exactly like
        boolean_staged. Returns per batch what boolean_staged returns
        (rows / columnar pair / pagination triple with prefix_p).

        Misses surface as count-0 results rather than lookup()'s None —
        without filter_removed a PRESENT term always has >= 1 posting, so
        zero is unambiguous there.

        With retained host tables covering the live tier pair (host_ready),
        batches serve entirely HOST-side — native decode from the
        compressed stream, zero device round trips: full-result lookup is
        fetch-volume bound on any link, so not crossing the link at all is
        the speed of light for this op."""
        st = self._state
        if st.host_ready():
            return self._host_lookup_stream(
                st, batches, filter_removed, columnar, prefix_p
            )
        return self.boolean_staged(
            [[[t] for t in b] for b in batches], "or",
            filter_removed, depth, columnar, prefix_p, _st=st,
        )

    def _exact_rows(
        self, st: ServingState, s: IndexSnapshot, terms: Sequence[bytes],
        filter_removed: bool,
    ) -> List[Optional[np.ndarray]]:
        if s.n_terms == 0:
            return [None] * len(terms)
        removed = st.removed if filter_removed else None
        Q = _round_up(len(terms), self.q_bucket)
        qk = keys_mod.pack_terms(list(terms), width=s.width)
        pad = np.repeat(qk[-1:], Q - len(terms), axis=0)
        qk_p = np.concatenate([qk, pad], axis=0)
        found, vals, n, raw = self._lookup_on(s, jnp.asarray(qk_p), removed)
        found, vals, n, raw = jax.device_get((found, vals, n, raw))
        out: List[Optional[np.ndarray]] = [None] * len(terms)
        long_idx = []
        for i in range(len(terms)):
            if not found[i]:
                continue
            if raw[i] > self.L:
                long_idx.append(i)  # exact re-serve below
            else:
                out[i] = vals[i, : n[i]].copy()
        # largest need first: each batch then re-serves at ITS level instead
        # of every batch paying the global max level
        long_idx.sort(key=lambda i: -raw[i])
        # exact re-serve of long lists, grouped by ladder level
        while long_idx:
            need = int(max(raw[i] for i in long_idx))
            lv = self._level_for(need, st)
            qb = max(1, _RESERVE_BUDGET // lv)
            batch, long_idx = long_idx[:qb], long_idx[qb:]
            B = len(batch)
            bq = np.repeat(qk[batch[-1] : batch[-1] + 1], _round_up(B, 8), axis=0)
            bq[:B] = qk[batch]
            f2, v2, n2, _ = self._lookup_on(s, jnp.asarray(bq), removed, L=lv)
            n2 = np.asarray(n2)
            v2 = np.asarray(v2[:, : max(1, int(n2.max(initial=0)))])
            for j, i in enumerate(batch):
                out[i] = v2[j, : n2[j]].copy()
        return out

    # -- host-side full-result serving -------------------------------------------
    #
    # Full-result lookups are fetch-volume bound on ANY host<->device link
    # (results are O(sum of posting lengths); the device adds no compute
    # value to a raw decode). With the compact host tables retained
    # (keep_tables), lookups serve entirely host-side: hash probe
    # (codec/hashing.probe_rows_np) + native block decode from the SAME
    # compressed stream the device arena expands from — the reference's
    # mmap-read architecture (reader.go:33-103) with a columnar contract.
    # Booleans stay on device: set algebra is where the TPU earns its keep.

    def host_ready(self) -> bool:
        """True when host-side serving covers the CURRENT tier pair (tables
        retained, and the delta tier — if live — retained too)."""
        return self._state.host_ready()

    @staticmethod
    def _host_decode(t: HostTables, idx: np.ndarray):
        """Decode posting lists for term indexes `idx` (all >= 0) from the
        retained compressed stream. List i's count word sits one word before
        its first block (layout: [n][blocks...], codec/packing.py:11-33;
        flat[tbs[i]] is the first block's offset)."""
        starts = t.flat[t.tbs[:-1].astype(np.int64)[idx]].astype(np.int64) - 1
        values, _, voffs = packing.decode_bulk(t.words, starts)
        return values, voffs

    @staticmethod
    def _filter_sorted_columnar(values, voffs, rem):
        """Drop tombstoned values from a columnar (values, voffs) pair —
        one vectorized searchsorted membership test over the concatenation
        (rem is sorted; removed_list.go:44-54 semantics)."""
        if rem is None or len(rem) == 0 or len(values) == 0:
            return values, voffs
        pos = np.searchsorted(rem, values)
        hit = rem[np.minimum(pos, len(rem) - 1)] == values
        kept = np.zeros(len(values) + 1, dtype=np.int64)
        np.cumsum(~hit, out=kept[1:])
        return values[~hit], kept[voffs]

    def _host_tier_columnar(self, t: HostTables, qk: np.ndarray, rem):
        """One tier's lookup results as (found, values, voffs) — fully
        vectorized: probe, bulk-decode hits (concatenation is already in
        query order), tombstone-filter, re-offset misses to count 0."""
        nq = qk.shape[0]
        if t.n_terms == 0:
            return (np.zeros(nq, bool), np.zeros(0, np.uint32),
                    np.zeros(nq + 1, np.int64))
        idx = hashing.probe_rows_np(
            t.slots, t.max_probes, t.keys, _narrow_keys(qk, t.width)
        )
        found = idx >= 0
        values, hvoffs = self._host_decode(t, idx[found])
        counts = np.zeros(nq, dtype=np.int64)
        counts[found] = np.diff(hvoffs)
        voffs = np.zeros(nq + 1, dtype=np.int64)
        np.cumsum(counts, out=voffs[1:])
        values, voffs = self._filter_sorted_columnar(values, voffs, rem)
        return found, values, voffs

    def _host_tier_starts(self, t: HostTables, qk: np.ndarray) -> np.ndarray:
        """Per-flat-term count-word offsets into t.words (-1 = miss) — the
        resolve half of _host_decode, kept columnar for the fused native
        serve (tpi_boolean_serve decodes from these directly)."""
        nq = qk.shape[0]
        if t.n_terms == 0:
            return np.full(nq, -1, np.int64)
        idx = hashing.probe_rows_np(
            t.slots, t.max_probes, t.keys, _narrow_keys(qk, t.width)
        )
        starts = (
            t.flat[t.tbs[:-1].astype(np.int64)[np.maximum(idx, 0)]]
            .astype(np.int64) - 1
        )
        starts[idx < 0] = -1
        return starts

    def lookup_host(
        self, terms: Sequence[bytes], filter_removed: bool = False
    ) -> List[Optional[np.ndarray]]:
        """lookup() served entirely on host from the retained tables (zero
        device round trips; exact at any posting length — no ladder). Same
        contract: None for misses, per-term sorted postings, delta-tier
        union when an incremental refresh window is live. Requires
        host_ready() (engine built with keep_tables)."""
        if not terms:
            return []
        st = self._state
        if not st.host_ready():
            raise RuntimeError(
                "host serving needs retained tables (keep_tables=True)"
            )
        rem = st.removed_host() if filter_removed else None
        qk = keys_mod.pack_terms(list(terms), width=st.host_q_width())
        found, values, voffs = self._host_tier_columnar(st.tables, qk, rem)
        rows: List[Optional[np.ndarray]] = [
            values[voffs[i] : voffs[i + 1]].copy() if found[i] else None
            for i in range(len(terms))
        ]
        if st.delta is not None:
            f2, v2, o2 = self._host_tier_columnar(st.delta_tables, qk, rem)
            for i in range(len(terms)):
                if not f2[i]:
                    continue
                d = v2[o2[i] : o2[i + 1]]
                rows[i] = d if rows[i] is None else np.union1d(rows[i], d)
        return rows

    def _host_lookup_stream(self, st: ServingState, batches,
                            filter_removed: bool, columnar: bool,
                            prefix_p: int):
        """lookup_staged's host route: per-batch columnar assembly with no
        round trips to pipeline (see lookup_staged for the contract —
        misses surface as count-0 rows here, matching the device stream)."""
        rem = st.removed_host() if filter_removed else None
        P = int(prefix_p)
        W = st.host_q_width()
        out = []
        for b in batches:
            terms = list(b)
            if not terms:
                if columnar:
                    empty = (np.zeros(0, np.uint32), np.zeros(1, np.int64))
                    out.append(empty + (np.zeros(0, np.int64),) if P else empty)
                else:
                    out.append([])
                continue
            qk = keys_mod.pack_terms(terms, width=W)
            _, values, voffs = self._host_tier_columnar(st.tables, qk, rem)
            if st.delta is not None:
                f2, v2, o2 = self._host_tier_columnar(
                    st.delta_tables, qk, rem
                )
                if f2.any():
                    rows = [values[voffs[i] : voffs[i + 1]]
                            for i in range(len(terms))]
                    for i in np.nonzero(f2)[0]:
                        rows[i] = np.union1d(rows[i], v2[o2[i] : o2[i + 1]])
                    values, voffs = _rows_to_columnar(rows)
            counts = np.diff(voffs)
            if P:
                rid = np.searchsorted(
                    voffs, np.arange(len(values)), side="right"
                ) - 1
                keep = (np.arange(len(values)) - voffs[rid]) < P
                pvoffs = np.zeros(len(counts) + 1, dtype=np.int64)
                np.cumsum(np.minimum(counts, P), out=pvoffs[1:])
                out.append((values[keep], pvoffs, counts))
            elif columnar:
                out.append((values, voffs))
            else:
                out.append([
                    values[voffs[i] : voffs[i + 1]].copy()
                    for i in range(len(terms))
                ])
        return out

    def boolean_host(
        self, queries: Sequence[Sequence[bytes]], op: str,
        filter_removed: bool = False, _st: Optional[ServingState] = None,
    ) -> List[np.ndarray]:
        """boolean() served entirely on host from the retained tables —
        zero device round trips, exact at any posting length (no ladder).
        Same contract as boolean(): sorted-unique arrays; a missing term
        empties an AND and contributes nothing to an OR; delta-tier rows
        union per term before the set op (boolean_step_dual semantics).

        This is the right route when the op is OUTPUT-bound (a full-result
        OR ships O(sum of posting lengths) no matter who computes it, so on
        a bandwidth-bound host<->device link not crossing it wins) and for
        one-shot dispatch-latency-bound calls on a slow link (non-staged
        AND). The staged AND stream stays device-routed by default — see
        _host_boolean_route for the measured policy."""
        if op not in ("and", "or"):
            raise ValueError(f"op must be 'and' or 'or', got {op!r}")
        st = _st if _st is not None else self._state
        if not st.host_ready():
            raise RuntimeError(
                "host serving needs retained tables (keep_tables=True)"
            )
        if not queries:
            return []
        values, voffs = self._boolean_host_columnar(
            queries, op, filter_removed, st=st
        )
        return [
            values[voffs[i] : voffs[i + 1]].copy()
            for i in range(len(queries))
        ]

    def _boolean_host_columnar(self, queries, op: str, filter_removed: bool,
                               st: Optional[ServingState] = None):
        """boolean_host's columnar core: (values, voffs) over one batch.
        The set-op sweep runs in the native codec (tpi_boolean_host: linear
        merge unions / galloping intersections over the batch-decoded runs —
        the reference's streaming-iterator composition, types.go:14-22, as
        one C++ pass) with the numpy loop kept as the bit-identical fallback
        oracle (tests force it via TPI_DISABLE_NATIVE)."""
        st = st if st is not None else self._state
        rem = st.removed_host() if filter_removed else None
        if isinstance(queries, tuple) and len(queries) == 3:
            # columnar (blob, offsets, qoffs) batch: pack straight off the
            # wire form — no per-query Python lists (same fast path as
            # _pack_boolean_cols on the device side)
            blob, offsets, qoffs = queries
            blob8 = (
                np.frombuffer(blob, dtype=np.uint8)
                if isinstance(blob, (bytes, bytearray))
                else np.asarray(blob, dtype=np.uint8)
            )
            offsets = np.asarray(offsets, dtype=np.int64)
            koffs = np.asarray(qoffs, dtype=np.int64)
            if len(offsets) <= 1:
                return np.zeros(0, np.uint32), koffs.astype(np.int64) * 0
            qk = keys_mod.pack_blob(blob8, offsets, st.host_q_width())
        else:
            flat_terms = [t for q in queries for t in q]
            koffs = np.zeros(len(queries) + 1, dtype=np.int64)
            np.cumsum([len(q) for q in queries], out=koffs[1:])
            if not flat_terms:
                return np.zeros(0, np.uint32), koffs * 0
            qk = keys_mod.pack_terms(flat_terms, width=st.host_q_width())
        dual = st.delta is not None
        if _native.available():
            # fused native serve: decode + set op + tombstone filter run in
            # one pass per query DIRECTLY on the compressed streams — no
            # batch-wide decode ever materializes, AND walks lists smallest-
            # first with block-skip streaming intersection + early exit
            s1 = self._host_tier_starts(st.tables, qk)
            if dual:
                s2 = self._host_tier_starts(st.delta_tables, qk)
                return _native.boolean_serve(
                    st.tables.words, s1, st.delta_tables.words, s2,
                    koffs, rem, op == "or",
                )
            return _native.boolean_serve(
                st.tables.words, s1, None, None, koffs, rem, op == "or"
            )
        # numpy fallback: resolve+decode each tier ONCE for the whole batch
        # (columnar); tombstones filter the per-query RESULT, not the
        # inputs — same outcome, less volume (matches the device
        # filter-after-set-op)
        found, values, voffs = self._host_tier_columnar(
            st.tables, qk, None
        )
        if dual:
            f2, v2, o2 = self._host_tier_columnar(st.delta_tables, qk, None)
        out: List[np.ndarray] = []
        empty = np.zeros(0, np.uint32)
        for qi in range(len(koffs) - 1):
            rows = []
            miss = koffs[qi] == koffs[qi + 1]
            for j in range(koffs[qi], koffs[qi + 1]):
                a = values[voffs[j] : voffs[j + 1]] if found[j] else None
                if dual and f2[j]:
                    d = v2[o2[j] : o2[j + 1]]
                    a = d if a is None else np.union1d(a, d)
                if a is None:
                    miss = True
                    if op == "and":
                        break
                else:
                    rows.append(a)
            if op == "and":
                if miss or not rows:
                    res = empty
                else:
                    rows.sort(key=len)  # smallest-first: early exit on empty
                    res = rows[0]
                    for r in rows[1:]:
                        if len(res) == 0:
                            break
                        res = np.intersect1d(res, r, assume_unique=True)
            else:
                if not rows:
                    res = empty
                elif len(rows) == 1:
                    res = rows[0]
                else:
                    res = np.unique(np.concatenate(rows))
            if rem is not None and len(rem) and len(res):
                pos = np.searchsorted(rem, res)
                hit = rem[np.minimum(pos, len(rem) - 1)] == res
                res = res[~hit]
            out.append(res)
        return _rows_to_columnar(out)

    # measured breakevens at config-3. Full-result OR: the device route is
    # min(kernel 70.7k, link_bytes_per_s / ~20 KB per query of output) and
    # the SIMD host serve measured 61.3k QPS with ZERO link bytes -> the
    # device only wins once the link moves ~61k * 20 KB ≈ 1.2 GB/s
    # (PCIe-local chips clear it; network-attached/tunneled ones do not).
    # Non-staged AND: host serve ~280k vs a dispatch-latency-bound device
    # round trip — kept at a conservative 256 MB/s (a proxy for "remote
    # link"), since a fast local link makes the one-shot device path
    # competitive and keeps the host core free.
    _HOST_ROUTE_LINK_MBPS = 256.0
    _HOST_ROUTE_OR_LINK_MBPS = 1024.0

    @staticmethod
    def _host_busy() -> bool:
        """Load-aware routing signal (VERDICT r3 #7): 1-minute loadavg per
        core above TPI_HOST_BUSY_LOAD (default 1.5) means the host cores
        are already saturated by other work (ingest/merge). The host
        route's whole advantage is zero link bytes at the cost of host
        CPU; with the CPU gone, the staged DEVICE pipeline (host does only
        pack+fetch) degrades far less — so staged AND falls back to it.
        OR stays host-routed even busy: the full-result device OR is
        fetch-volume-bound on a slow link (~1.3k QPS on this tunnel), and
        a contended host still beats that by an order of magnitude.
        TPI_HOST_BUSY_LOAD=0 disables the fallback (always-host links);
        measured contended-vs-idle numbers: bench_host_contended."""
        thresh = float(os.environ.get("TPI_HOST_BUSY_LOAD", "1.5"))
        if thresh <= 0:
            return False
        try:
            load = os.getloadavg()[0]
        except OSError:  # pragma: no cover - platform-dependent
            return False
        return load / max(1, os.cpu_count() or 1) > thresh

    def _host_boolean_route(
        self, op: str, prefix_p: int = 0, staged: bool = False,
        st: Optional[ServingState] = None,
    ) -> bool:
        """Transport-aware serving route (requires retained tables), per-op
        thresholds against one measured link probe per process (_link_mbps):

        * full-result OR routes host-side below ~1.2 GB/s: the union IS the
          output (O(sum of posting lengths) ships no matter who computes
          it) and the SIMD host serve (61.3k QPS at config-3, zero link
          bytes) beats the fetch-bound device route on anything slower
          than PCIe-class links — on this ~33 MB/s tunnel it is 47x
          (61.3k vs 1.3k).
        * AND (one-shot AND staged) routes host-side below 256 MB/s: the
          fused native serve (count-ordered block-skip streaming
          intersection, tpi_boolean_serve) measured 271k QPS on wire-form
          8192-query staged batches with a TIGHT spread — vs the device's
          ~10k one-shot (dispatch-latency bound) and 97-145k staged
          (pipelined, but any tunnel RPC burst strands its in-flight
          fetches). TPI_HYBRID=1 opts the staged stream into the hybrid
          host+device work-stealing mode instead (see _hybrid_staged).

        Pagination (prefix_p) stays on the device: its fetch is already
        bounded. TPI_HOST_BOOL=or|and|all|0|auto overrides the policy."""
        st = st if st is not None else self._state
        if prefix_p or not st.host_ready():
            return False
        mode = os.environ.get("TPI_HOST_BOOL", "auto")
        if mode == "auto":
            if op == "or":
                return _link_mbps() < self._HOST_ROUTE_OR_LINK_MBPS
            if staged and os.environ.get("TPI_HYBRID") == "1":
                return False  # explicit hybrid opt-in: see _hybrid_staged
            if staged and self._host_busy():
                return False  # load-aware fallback: see _host_busy
            return _link_mbps() < self._HOST_ROUTE_LINK_MBPS
        return mode == "all" or mode == op

    def _hybrid_staged(self, op: str,
                       st: Optional[ServingState] = None) -> bool:
        """EXPLICIT opt-in (TPI_HYBRID=1) hybrid host+device staged stream:
        the device pipeline claims batches from the head while a host
        thread serves from the tail through the fused native serve (GIL
        released in C), stealing back unharvested device batches when its
        tail runs dry — the two throughputs add WHEN THE LINK IS HEALTHY
        (measured 153k vs 97k device-only in one window at config-3).

        Not the default because a tunnel RPC burst strands the device's
        in-flight fetches — device_get cannot be abandoned, so the stream's
        wall time inherits the burst no matter what the host finished
        (measured collapse to ~12k during burst weather, while host-only
        served a steady 271k). The auto policy therefore routes staged AND
        host-only on slow links; hybrid is for deployments whose link is
        reliable but whose host core is the scarcer resource."""
        st = st if st is not None else self._state
        if op != "and" or not st.host_ready() or st.delta is not None:
            return False
        if os.environ.get("TPI_HYBRID") != "1":
            return False
        if os.environ.get("TPI_HOST_BOOL", "auto") != "auto":
            return False
        return _link_mbps() < self._HOST_ROUTE_LINK_MBPS

    # -- boolean queries ---------------------------------------------------------

    def _pack_boolean(self, st: ServingState, queries):
        """Pack a query batch -> (qk (Q, K, W+1) uint32, kv (Q,) int32),
        Q padded to the engine's q_bucket. ONE pack over the flattened
        terms (a per-query pack_terms loop was Python-bound on this 1-vCPU
        host at 10k-query batches); packed at the max width across tiers
        and narrowed per tier at dispatch."""
        K = max(len(q) for q in queries)
        Q = _round_up(len(queries), self.q_bucket)
        W = st.width()
        qk = np.zeros((Q, K, W + 1), dtype=np.uint32)
        kv = np.array(
            [len(q) for q in queries] + [0] * (Q - len(queries)),
            dtype=np.int32,
        )
        flat_terms = [t for q in queries for t in q]
        packed = keys_mod.pack_terms(flat_terms, width=W)
        kvq = kv[: len(queries)].astype(np.int64)
        rows = np.repeat(np.arange(len(queries)), kvq)
        # slot-within-query, vectorized (a per-query np.arange concat was
        # 25 ms/8k queries on this 1-vCPU host — the pack's dominant term)
        qoffs = np.zeros(len(queries) + 1, dtype=np.int64)
        np.cumsum(kvq, out=qoffs[1:])
        cols = np.arange(qoffs[-1], dtype=np.int64) - np.repeat(qoffs[:-1], kvq)
        qk[rows, cols] = packed
        return qk, kv

    def _pack_boolean_cols(self, st: ServingState, blob, offsets, qoffs):
        """Columnar query batch -> (qk, kv): `blob` all query terms'
        bytes concatenated, `offsets[T+1]` term bounds in it, `qoffs[Q+1]`
        each query's term range. Skips every Python-object cost of the
        list-of-lists pack (flatten + join + per-term len: measured ~7 of
        its 9 ms per 8192-query batch on this 1-vCPU host) — callers that
        already hold queries in wire/columnar form should prefer it."""
        W = st.width()
        offsets = np.asarray(offsets, dtype=np.int64)
        qoffs = np.asarray(qoffs, dtype=np.int64)
        nq = len(qoffs) - 1
        kvq = np.diff(qoffs)
        K = max(1, int(kvq.max(initial=1)))
        Q = _round_up(nq, self.q_bucket)
        qk = np.zeros((Q, K, W + 1), dtype=np.uint32)
        kv = np.zeros(Q, dtype=np.int32)
        kv[:nq] = kvq
        blob8 = (
            np.frombuffer(blob, dtype=np.uint8)
            if isinstance(blob, (bytes, bytearray))
            else np.asarray(blob, dtype=np.uint8)
        )
        packed = keys_mod.pack_blob(blob8, offsets, W)
        rows = np.repeat(np.arange(nq), kvq)
        cols = np.arange(qoffs[-1], dtype=np.int64) - np.repeat(qoffs[:-1], kvq)
        qk[rows, cols] = packed
        return qk, kv

    def _batch_pack(self, st: ServingState, queries):
        """One stream batch -> (nq, qk, kv). Accepts a sequence of term
        lists OR a columnar (blob, offsets, qoffs) triple (see
        _pack_boolean_cols)."""
        if isinstance(queries, tuple) and len(queries) == 3:
            _, _, qoffs = queries
            nq = len(qoffs) - 1
            if nq <= 0:
                return 0, None, None
            qk, kv = self._pack_boolean_cols(st, *queries)
            return nq, qk, kv
        if not queries:
            return 0, None, None
        qk, kv = self._pack_boolean(st, queries)
        return len(queries), qk, kv

    def boolean(self, queries: Sequence[Sequence[bytes]], op: str, filter_removed: bool = False):
        """Batch of AND/OR queries; each query is 1..K terms.

        Returns list of np arrays (sorted unique values). A missing term makes
        an AND query empty; contributes nothing to an OR query. Queries whose
        posting lists exceed L are re-served exactly at a larger ladder L —
        fully on device, no host set algebra.
        """
        if not queries:
            return []
        st = self._state
        if self._host_boolean_route(op, st=st):
            # output-bound op with tables retained: serve host-side, zero
            # round trips (see boolean_host)
            return self.boolean_host(queries, op, filter_removed, _st=st)
        s = st.snap
        qk, kv = self._pack_boolean(st, queries)
        if s.n_terms == 0 and st.delta is None:
            return [np.zeros(0, np.uint32) for _ in queries]
        removed = st.removed if filter_removed else None
        if st.delta is None:
            if op == "and" and self._use_fused(st):
                # fused Pallas AND: decode + membership directly over the
                # arena; probes never truncate, re-serve only when the
                # SMALLEST list exceeds L
                return self._boolean_fused(st, queries, qk, kv, removed)
            # steady state: concat-decode path — work proportional to each
            # query's TOTAL posting count, no truncation/re-serve at all
            return self._boolean_concat(st, queries, qk, kv, op, removed)

        def run(lv, qk_sub, kv_sub):
            """One device pass at pad lv over the main+delta pair."""
            d = st.delta
            return _JIT_BOOLEAN_DUAL(
                s.keys, s.blocks, s.term_block_start, s.counts, s.hash_slots,
                d.keys, d.blocks, d.term_block_start, d.counts, d.hash_slots,
                jnp.asarray(_narrow_keys(qk_sub, s.width)),
                jnp.asarray(_narrow_keys(qk_sub, d.width)),
                jnp.asarray(kv_sub),
                lv, op, removed, s.max_probes, d.max_probes,
            )

        out, oc, need = run(self.L, qk, kv)
        # ONE device_get per round trip: separate np.asarray calls each pay
        # the tunnel RPC latency (~30ms); the base-pass matrix is small
        # enough to ship untrimmed in the same fetch
        out, oc, need = jax.device_get((out, oc, need))
        results: List[Optional[np.ndarray]] = [None] * len(queries)
        long_idx = sorted(
            (i for i in range(len(queries)) if need[i] > self.L),
            key=lambda i: -need[i],
        )
        for i in range(len(queries)):
            if need[i] <= self.L:
                results[i] = out[i, : oc[i]].copy()
        # exact re-serve at the smallest ladder level that fits, small batches
        self._reserve_ladder(st, results, long_idx, need, qk, kv, run)
        return results

    def _reserve_ladder(self, st, results, long_idx, need, qk, kv, run):
        """Exact ladder re-serves shared by the padded and fused boolean
        paths: batches of clipped queries (largest need first — each batch
        re-serves at ITS level, not the global max) re-run through `run`
        at the smallest ladder level that fits, and the padded result
        matrix is trimmed to the populated prefix before download (it can
        be tens of MB; results are narrow)."""
        K, Wp1 = qk.shape[1], qk.shape[2]
        while long_idx:
            lv = self._level_for(int(max(need[i] for i in long_idx)), st)
            qb = max(1, _RESERVE_BUDGET // (K * lv))
            batch, long_idx = long_idx[:qb], long_idx[qb:]
            B = _round_up(len(batch), 8)
            bq = np.zeros((B, K, Wp1), dtype=np.uint32)
            bkv = np.zeros(B, dtype=np.int32)
            bq[: len(batch)] = qk[batch]
            bkv[: len(batch)] = kv[batch]
            o2, c2, _ = run(lv, bq, bkv)
            c2 = np.asarray(c2)
            o2 = np.asarray(o2[:, : max(1, int(c2.max(initial=0)))])
            for j, i in enumerate(batch):
                results[i] = o2[j, : c2[j]].copy()

    # size classes for the concat path: total-block budgets per query.
    # Geometric x4 keeps compiled programs few; each class pays only its
    # own real volume (SB*128 values sorted per query). A finer x2 ladder
    # was A/B'd on-chip and measured ~15% SLOWER on config-3 OR despite
    # halving the sort volume for the modal 33-64-block queries — the
    # per-class dispatch and per-query fixed costs (layout selects,
    # run-length marking) outweigh the padding waste below 64. One x2
    # step IS kept: config-3's modal queries are 33-64 blocks, and moving
    # them from the 128 class's ~35k QPS rate to a 64 class's ~76k rate
    # measured 43.8k -> 70.7k config-3 OR overall (one-dispatch on-chip
    # A/B; dispatches here are async with one pipelined fetch, so the
    # extra class costs a compile, not a fence).
    _SB_CLASSES = (8, 32, 64, 128, 512, 2048, 8192, 32768)

    def _use_fused(self, st: Optional[ServingState] = None) -> bool:
        """Fused Pallas AND is available: 128-aligned arena + TPU backend +
        block-aligned L (TPI_FUSED_AND=0 disables; =interp routes through
        the kernel interpreter off-TPU, for tests)."""
        st = st if st is not None else self._state
        mode = os.environ.get("TPI_FUSED_AND", "1")
        if mode == "0" or not st.snap.arena_aligned or self.L % 128 != 0:
            return False
        return mode == "interp" or jax.default_backend() == "tpu"

    # serve-time K is padded to this bucket so the warmup-compiled fused
    # program shape is hit by real traffic (and K=1 batches avoid the
    # kernel's zero-sized probe scratch); wider queries use their real K
    _FUSED_K_BUCKET = 8

    # single-fetch result prefix: the fused main pass ships the first
    # _FUSED_SMALL_P results of every query WITH the counts in one round
    # trip (AND results are tiny — intersections of independent lists);
    # the rare wider rows re-run through the sort path
    _FUSED_SMALL_P = 32

    # the STREAM-serving prefix is narrower still: the staged loop is
    # tunnel-byte-bound, and P=8 cut the fetch 1.06 MB -> 0.27 MB per
    # 8192-query batch for the same overflow count (measured 95.5k ->
    # 113.8k QPS; overflow rows re-run through the sort path either way)
    _STAGED_SMALL_P = 8

    # SMEM scalar-prefetch bound on one fused dispatch: rows/counts are
    # (Q*K) i32 prefetched operands — Q=16384 x K=8 measured an SMEM
    # overflow on v5e (512 KiB operand), Q=8192 fits. Larger batches chunk
    # transparently inside _fused_run/_fused_run_staged.
    _FUSED_MAX_Q = 8192

    def _fused_chunked(self, run, qk_sub, kv_sub):
        M = self._FUSED_MAX_Q
        if qk_sub.shape[0] <= M:
            return run(qk_sub, kv_sub)
        outs = [
            run(qk_sub[c : c + M], kv_sub[c : c + M])
            for c in range(0, qk_sub.shape[0], M)
        ]
        return tuple(jnp.concatenate(parts) for parts in zip(*outs))

    def _fused_run(self, st, lv, qk_sub, kv_sub, removed, small_p: int = 0):
        s = st.snap
        interp = (
            os.environ.get("TPI_FUSED_AND") == "interp"
            and jax.default_backend() != "tpu"
        )
        return self._fused_chunked(
            lambda q, k: _JIT_BOOLEAN_FUSED(
                s.keys, s.blocks, s.term_block_start, s.counts,
                jnp.asarray(_narrow_keys(q, s.width)),
                jnp.asarray(k), lv,
                removed, s.hash_slots, s.max_probes, interp, small_p,
            ),
            qk_sub, kv_sub,
        )

    def _staged_levels(self, st: ServingState):
        """Device ladder for the staged step's level coding: ascending
        levels the kernel can serve (<= the arena slack). Cached per
        ladder identity (max_count changes on refresh)."""
        from ..ops.pallas_decode import SLACK_ROWS

        lvls = tuple(lv for lv in self._levels(st) if lv <= SLACK_ROWS * 128)
        cached = getattr(self, "_staged_levels_cache", None)
        if cached is None or cached[0] != lvls:
            arr = jnp.asarray(np.asarray(lvls or (self.L,), dtype=np.int32))
            cached = (lvls, arr)
            self._staged_levels_cache = cached
        return cached[1]

    def _fused_run_staged(self, st, qk_sub, kv_sub, removed):
        s = st.snap
        interp = (
            os.environ.get("TPI_FUSED_AND") == "interp"
            and jax.default_backend() != "tpu"
        )
        return self._fused_chunked(
            lambda q, k: _JIT_BOOLEAN_FUSED_STAGED(
                s.keys, s.blocks, s.term_block_start, s.counts,
                jnp.asarray(_narrow_keys(q, s.width)),
                jnp.asarray(k), self.L, self._staged_levels(st),
                removed, s.hash_slots, s.max_probes, interp,
                self._STAGED_SMALL_P,
            ),
            qk_sub, kv_sub,
        )

    def _fused_pad(self, qk, kv):
        """Pad K to the warmup bucket and Q to the kernel's TQ=8 tile (the
        XLA paths accept any q_bucket; the fused path must too)."""
        if qk.shape[1] < self._FUSED_K_BUCKET:
            pad = np.zeros(
                (qk.shape[0], self._FUSED_K_BUCKET - qk.shape[1], qk.shape[2]),
                dtype=qk.dtype,
            )
            qk = np.concatenate([qk, pad], axis=1)
        Q8 = _round_up(qk.shape[0], 8)
        if Q8 != qk.shape[0]:
            qk = np.concatenate(
                [qk, np.zeros((Q8 - qk.shape[0], *qk.shape[1:]), dtype=qk.dtype)]
            )
            kv = np.concatenate([kv, np.zeros(Q8 - len(kv), dtype=kv.dtype)])
        return qk, kv

    def _classify_fused(self, st, fetched, positions, qk, kv, setter,
                        wide, longs, overs):
        """Assign direct results from a small-P fetch; defer the three rare
        follow-up classes (small-P overflow -> sort path; base count over L
        -> ladder re-serve; ladder LEVEL over the arena slack -> concat)."""
        from ..ops.pallas_decode import SLACK_ROWS

        P = self._FUSED_SMALL_P
        small, oc, need, oc_pre = fetched
        max_lv = SLACK_ROWS * 128
        for j, pos in enumerate(positions):
            if need[j] <= self.L and oc_pre[j] <= P:
                setter(pos, small[j, : oc[j]].copy())
            elif need[j] <= self.L:
                wide.append((pos, qk[j], int(kv[j])))
            elif self._level_for(int(need[j]), st) <= max_lv:
                # the LEVEL (not just the need) must fit the slack: the
                # kernel DMAs lv/128 consecutive base rows per query
                longs.append((pos, qk[j], int(kv[j]), int(need[j])))
            else:
                overs.append((pos, qk[j], int(kv[j])))

    def _drain_levels(self, items, run, setter):
        """Two-wave exact re-serve drain. items: (pos, qk_row (K_i, W+1),
        kv, lv) — lv the pad level to serve at (callers precompute; a
        batch serves at the level of its LARGEST member, which is exact
        for every smaller member in it). All dispatches are issued
        back-to-back with async count copies, then counts fetch in one
        wave and trimmed results in a second; in-flight HBM is capped at
        4x the reserve budget (a cap hit drains early and continues)."""
        dispatches = []  # (members, out_dev, cnt_dev)
        pend_bytes = 0

        def drain():
            nonlocal pend_bytes
            counts = jax.device_get([d[2] for d in dispatches])
            trimmed = [
                d[1][:, : max(1, int(c[: len(d[0])].max(initial=0)))]
                for d, c in zip(dispatches, counts)
            ]
            outs = jax.device_get(trimmed)
            for (members, _, _), c, o in zip(dispatches, counts, outs):
                for j, t in enumerate(members):
                    setter(t[0], o[j, : c[j]].copy())
            dispatches.clear()
            pend_bytes = 0

        items.sort(key=lambda t: -t[3])
        idx = 0
        while idx < len(items):
            lv = int(items[idx][3])
            K = max(t[1].shape[0] for t in items)
            qb = max(1, _RESERVE_BUDGET // (K * lv))
            batch = items[idx : idx + qb]
            idx += len(batch)
            B = _round_up(len(batch), 8)
            bq = self._stack_rows([t[1] for t in batch], B)
            bkv = np.zeros(B, dtype=np.int32)
            bkv[: len(batch)] = [t[2] for t in batch]
            o2, c2, _ = run(lv, bq, bkv)
            c2.copy_to_host_async()
            dispatches.append((batch, o2, c2))
            pend_bytes += B * lv * 4
            if pend_bytes > 4 * _RESERVE_BUDGET:
                drain()
        if dispatches:
            drain()

    @staticmethod
    def _stack_rows(rows, B):
        """Stack per-query (K_b, W+1) key rows (possibly different K across
        batches) into a (B, Kmax, W+1) matrix."""
        Kmax = max(r.shape[0] for r in rows)
        Wp1 = rows[0].shape[1]
        bq = np.zeros((B, Kmax, Wp1), dtype=np.uint32)
        for j, r in enumerate(rows):
            bq[j, : r.shape[0]] = r
        return bq

    def _fused_followups(self, st, setter, wide, longs, overs, removed):
        """Process the deferred classes ONCE (shared by boolean() and the
        staged stream — cross-batch grouping keeps the round-trip count
        independent of how many batches deferred into them).

        All re-serve dispatches are issued back-to-back BEFORE any result
        fetch (the device queue runs them without idling between round
        trips), then counts fetch in ONE wave and trimmed results in a
        second — 2 round trips for the whole drain instead of 2 per ladder
        level. Measured: the drain was the staged stream's residual gap
        (pack and uploads pipeline-hide behind harvest waits; the serial
        post-stream follow-up chain did not)."""
        items = [(t[0], t[1], t[2], self.L) for t in wide]
        items += [
            (t[0], t[1], t[2], self._level_for(int(t[3]), st)) for t in longs
        ]
        self._drain_levels(
            items, lambda lv, q, k2: self._fused_run(st, lv, q, k2, removed),
            setter,
        )
        if overs:
            B = _round_up(len(overs), 8)
            bq = self._stack_rows([t[1] for t in overs], B)
            bkv = np.zeros(B, dtype=np.int32)
            bkv[: len(overs)] = [t[2] for t in overs]
            sub_res = self._boolean_concat(
                st, [None] * len(overs), bq, bkv, "and", removed
            )
            for t, v in zip(overs, sub_res):
                setter(t[0], v)

    def _boolean_fused(self, st, queries, qk, kv, removed):
        """AND via the fused arena kernel: ONE dispatch + ONE fetch for the
        common case (small-P compacted results ship with the counts);
        ladder re-serve keyed on the BASE (smallest-list) count."""
        qk, kv = self._fused_pad(qk, kv)
        devs = self._fused_run(
            st, self.L, qk, kv, removed, small_p=self._FUSED_SMALL_P
        )
        results: List[Optional[np.ndarray]] = [None] * len(queries)
        wide, longs, overs = [], [], []

        def setter(i, v):
            results[i] = v

        self._classify_fused(
            st, jax.device_get(devs), range(len(queries)), qk, kv, setter,
            wide, longs, overs,
        )
        self._fused_followups(st, setter, wide, longs, overs, removed)
        return results

    def boolean_staged(
        self, batches, op: str = "and", filter_removed: bool = False,
        depth: int = 3, columnar: bool = False, prefix_p: int = 0,
        _st: Optional[ServingState] = None,
    ):
        """Pipelined stream serving: pack + dispatch batch i+`depth` BEFORE
        downloading batch i's results, so host packing and the fetch round
        trip overlap device compute instead of serializing with it —
        steady-state throughput approaches max(device, host) rather than
        their sum. Rare follow-ups (small-P overflow, ladder re-serves,
        concat overflow) are classified with vectorized masks, deferred,
        and processed once across the whole stream. Per-batch semantics
        are identical to boolean().

        AND on TPU streams through the fused kernel; OR (and AND off-TPU,
        and any prefix_p run) streams through the concat-decode classes;
        with a delta tier live, batches stream through the padded DUAL
        formulation (_staged_dual_stream) — every route pipelines at the
        same depth and drains ladder re-serves once, cross-stream.

        batches: iterable of query batches — each a sequence of term
        lists, OR a columnar (blob, offsets[T+1], qoffs[Q+1]) triple
        (terms concatenated in one bytes/uint8 buffer; queries as term
        ranges). Columnar input skips the list-of-lists pack's
        Python-object costs (~7 of 9 ms per 8192-query batch on a 1-vCPU
        host) — prefer it when queries arrive in wire form.
        columnar=False: one result list (np array per query) per batch.
        columnar=True: one (values, voffs[n+1]) pair per batch — zero
        per-query host work (bulk consumers; values[voffs[i]:voffs[i+1]]
        is query i's sorted result).
        prefix_p > 0 (requires columnar): pagination serving — each batch
        returns (values, voffs, counts) where values holds only the FIRST
        min(count, prefix_p) results per query and counts the true result
        sizes. Bounds the fetch volume for large-result ops (OR unions are
        O(sum of list lengths); full-result fetches are bandwidth-bound on
        any link). Exact full results for chosen rows come from boolean().
        """
        from collections import deque

        batches = list(batches)
        if prefix_p and not columnar:
            raise ValueError("prefix_p requires columnar=True")
        st = _st if _st is not None else self._state
        if self._host_boolean_route(op, prefix_p, staged=True, st=st):
            # output-bound op with tables retained: the host route has no
            # round trips to pipeline — serve each batch directly
            out = []
            for b in batches:
                if columnar:  # columnar core directly: no per-row copies,
                    out.append(  # and wire-form batches pack vectorized
                        self._boolean_host_columnar(
                            b, op, filter_removed, st=st
                        )
                    )
                else:
                    out.append(self.boolean_host(
                        _batch_as_lists(b), op, filter_removed, _st=st
                    ))
            return out
        removed = st.removed if filter_removed else None
        if st.delta is not None:
            # delta window: the padded DUAL formulation, still pipelined
            return self._staged_dual_stream(
                st, batches, op, removed, depth, columnar, prefix_p
            )
        if st.snap.n_terms == 0:
            # empty index: per-batch fallback (nothing to pipeline)
            out = []
            for b in batches:
                rows = self.boolean(_batch_as_lists(b), op, filter_removed)
                if not columnar:
                    out.append(rows)
                    continue
                vals, voffs = _rows_to_columnar(
                    [None if r is None else r[:prefix_p] for r in rows]
                    if prefix_p else rows
                )
                if prefix_p:
                    counts = np.array(
                        [0 if r is None else len(r) for r in rows],
                        dtype=np.int64,
                    )
                    out.append((vals, voffs, counts))
                else:
                    out.append((vals, voffs))
            return out
        if op != "and" or not self._use_fused(st) or prefix_p:
            # exact stream through the pipelined concat classes (also the
            # pagination route: prefix_p slices on device there)
            return self._staged_concat_stream(
                st, batches, op, removed, depth, columnar, prefix_p
            )
        P = self._STAGED_SMALL_P
        levels_h = [lv for lv in self._levels(st)]
        fetched: List = [None] * len(batches)
        wide, longs, overs = [], [], []

        def harvest(item):
            bi, nq, qk, kv, devs = item
            f = jax.device_get(devs)
            fetched[bi] = (nq, f)
            small, oc, code = f
            # vectorized classification: only the RARE follow-up rows loop
            # (the u8 code carries the whole decision — see
            # boolean_fused_staged_step)
            follow = np.nonzero(code[:nq] != 0)[0]
            for i in follow:
                c = int(code[i])
                if c == 1:
                    wide.append(((bi, int(i)), qk[i], int(kv[i])))
                elif c != 255:
                    # ladder level identity is all the re-serve batcher
                    # uses of `need` (it serves each batch at the level of
                    # its largest member) — the level stands in exactly
                    longs.append(
                        ((bi, int(i)), qk[i], int(kv[i]), levels_h[c - 2])
                    )
                else:
                    overs.append(((bi, int(i)), qk[i], int(kv[i])))

        # hybrid work-stealing (see _hybrid_staged): the device pipeline
        # claims batches from the HEAD, a host thread serves batches from
        # the TAIL via the fused native serve — both claim as fast as they
        # finish, so the split self-balances to their relative rates
        host_res: Dict[int, tuple] = {}
        cursor = {"head": 0, "tail": len(batches) - 1}
        clock = threading.Lock()

        def claim(dev_side: bool):
            with clock:
                if cursor["head"] > cursor["tail"]:
                    return None
                if dev_side:
                    bi = cursor["head"]
                    cursor["head"] += 1
                else:
                    bi = cursor["tail"]
                    cursor["tail"] -= 1
                return bi

        worker = None
        host_err: List[BaseException] = []
        if len(batches) > 1 and self._hybrid_staged(op, st=st):
            if filter_removed:
                st.removed_host()  # materialize the tombstone array on
                # THIS thread (one jax.device_get) before the worker starts

            def host_worker():
                try:
                    while True:
                        hbi = claim(False)
                        if hbi is None:
                            break
                        host_res[hbi] = self._boolean_host_columnar(
                            batches[hbi], op, filter_removed, st=st
                        )
                    # steal-back: an RPC burst strands the device's
                    # in-flight batches (the main thread is blocked in
                    # device_get) — with the tail exhausted, re-serve any
                    # batch the device claimed but has not harvested yet,
                    # most recent dispatch first. Assembly prefers the host
                    # copy; results are bit-identical either way, so a
                    # racing harvest is only duplicated work.
                    for hbi in range(len(batches) - 1, -1, -1):
                        if fetched[hbi] is None and hbi not in host_res:
                            host_res[hbi] = self._boolean_host_columnar(
                                batches[hbi], op, filter_removed, st=st
                            )
                except BaseException as e:  # surfaced after join() — a
                    host_err.append(e)      # swallowed thread death would
                    # otherwise strand its claimed batches as a confusing
                    # None-unpack in the assembly loop

            worker = threading.Thread(target=host_worker, daemon=True)
            worker.start()

        pend = deque()
        while True:
            bi = claim(True)
            if bi is None:
                break
            nq, qk, kv = self._batch_pack(st, batches[bi])
            if nq == 0:
                fetched[bi] = (0, None)
                continue
            qk, kv = self._fused_pad(qk, kv)
            devs = self._fused_run_staged(st, qk, kv, removed)
            # start the device->host copies NOW (they queue behind the
            # compute): by harvest time the data is already local, so the
            # host never blocks a full tunnel round trip per batch
            for a in devs:
                a.copy_to_host_async()
            pend.append((bi, nq, qk, kv, devs))
            if len(pend) > depth:
                harvest(pend.popleft())
        while pend:
            harvest(pend.popleft())
        if worker is not None:
            worker.join()
            if host_err:
                raise host_err[0]

        overrides: Dict[int, Dict[int, np.ndarray]] = {}

        def setter(pos, v):
            overrides.setdefault(pos[0], {})[pos[1]] = v

        self._fused_followups(st, setter, wide, longs, overs, removed)

        out = []
        for bi in range(len(batches)):
            if bi in host_res:  # hybrid: host-served, already final
                vals, voffs = host_res[bi]
                out.append((vals, voffs) if columnar else [
                    vals[voffs[i] : voffs[i + 1]].copy()
                    for i in range(len(voffs) - 1)
                ])
                continue
            nq, f = fetched[bi]
            ovr = overrides.get(bi, {})
            if nq == 0:
                out.append((np.zeros(0, np.uint32), np.zeros(1, np.int64))
                           if columnar else [])
                continue
            small, oc8, code = f
            oc = oc8.astype(np.int32)
            normal = code[:nq] == 0
            if columnar:
                counts = np.where(normal, oc[:nq], 0).astype(np.int64)
                for i, arr in ovr.items():
                    counts[i] = len(arr)
                voffs = np.zeros(nq + 1, dtype=np.int64)
                np.cumsum(counts, out=voffs[1:])
                vals = np.empty(int(voffs[-1]), dtype=np.uint32)
                m2 = (np.arange(P)[None, :]
                      < np.where(normal, oc[:nq], 0)[:, None])
                dst = (voffs[:-1, None] + np.arange(P)[None, :])[m2]
                vals[dst] = small[:nq][m2]
                for i, arr in ovr.items():
                    vals[voffs[i]: voffs[i + 1]] = arr
                out.append((vals, voffs))
            else:
                rows: List[Optional[np.ndarray]] = [None] * nq
                for i in range(nq):
                    if normal[i]:
                        rows[i] = small[i, : oc[i]].copy()
                for i, arr in ovr.items():
                    rows[i] = arr
                out.append(rows)
        return out

    def _staged_dual_stream(
        self, st, batches, op: str, removed, depth: int, columnar: bool,
        prefix_p: int,
    ):
        """Depth-pipelined stream over the MAIN+DELTA snapshot pair (the
        padded dual formulation, boolean_step_dual): dispatches pipeline
        across batches and ladder re-serves drain once cross-stream
        (two-wave), so serving throughput holds through delta windows
        instead of dropping to serial per-batch calls. prefix_p slices
        each result row on device at dispatch time (true counts + first-P
        values, one bounded fetch — the pagination contract)."""
        from collections import deque

        s, d = st.snap, st.delta
        P = int(prefix_p)
        fetched: List = [None] * len(batches)
        longs = []
        pend = deque()

        def run(lv, qk_sub, kv_sub):
            return _JIT_BOOLEAN_DUAL(
                s.keys, s.blocks, s.term_block_start, s.counts, s.hash_slots,
                d.keys, d.blocks, d.term_block_start, d.counts, d.hash_slots,
                jnp.asarray(_narrow_keys(qk_sub, s.width)),
                jnp.asarray(_narrow_keys(qk_sub, d.width)),
                jnp.asarray(kv_sub), lv, op, removed,
                s.max_probes, d.max_probes,
            )

        def harvest(item):
            bi, nq, qk, kv, out, oc, need = item
            oc_h, need_h = jax.device_get((oc, need))
            if P:
                out_h = np.asarray(out)  # the (Q, P) device slice
            else:
                out_h = np.asarray(
                    out[:, : max(1, int(oc_h[:nq].max(initial=0)))]
                )
            fetched[bi] = (nq, out_h, oc_h)
            for i in np.nonzero(need_h[:nq] > self.L)[0]:
                longs.append((
                    (bi, int(i)), qk[i], int(kv[i]),
                    self._level_for(int(need_h[i]), st),
                ))

        for bi, queries in enumerate(batches):
            nq, qk, kv = self._batch_pack(st, queries)
            if nq == 0:
                fetched[bi] = (0, None, None)
                continue
            out, oc, need = run(self.L, qk, kv)
            if P:
                out = out[:, : min(P, out.shape[1])]
                out.copy_to_host_async()
            oc.copy_to_host_async()
            need.copy_to_host_async()
            pend.append((bi, nq, qk, kv, out, oc, need))
            if len(pend) > depth:
                harvest(pend.popleft())
        while pend:
            harvest(pend.popleft())

        overrides: Dict[int, Dict[int, np.ndarray]] = {}

        def setter(pos, v):
            overrides.setdefault(pos[0], {})[pos[1]] = v

        self._drain_levels(longs, run, setter)

        results = []
        for bi in range(len(batches)):
            nq, out_h, oc_h = fetched[bi]
            if nq == 0:
                if columnar:
                    empty = (np.zeros(0, np.uint32), np.zeros(1, np.int64))
                    results.append(
                        empty + (np.zeros(0, np.int64),) if P else empty
                    )
                else:
                    results.append([])
                continue
            ovr = overrides.get(bi, {})
            if P:
                counts = oc_h[:nq].astype(np.int64)
                rows = []
                for i in range(nq):
                    if i in ovr:
                        counts[i] = len(ovr[i])
                        rows.append(ovr[i][:P])
                    else:
                        rows.append(out_h[i, : min(int(oc_h[i]), P)])
                vals, voffs = _rows_to_columnar(rows)
                results.append((vals, voffs, counts))
            else:
                rows = [
                    ovr[i] if i in ovr else out_h[i, : oc_h[i]].copy()
                    for i in range(nq)
                ]
                results.append(_rows_to_columnar(rows) if columnar else rows)
        return results

    def _staged_concat_stream(
        self, st, batches, op: str, removed, depth: int, columnar: bool,
        prefix_p: int,
    ):
        """Depth-pipelined stream serving over the concat-decode classes —
        the OR twin of the fused-AND staged loop. Three stages per batch,
        each overlapping the others' device time across the stream:

          resolve:  pack + dispatch the cheap term-resolution pass
          classes:  read the counts, group queries into total-block classes,
                    dispatch every class chunk (async) + start the result
                    copies
          harvest:  fetch counts (+ trimmed results, or the prefix_p slice),
                    assemble per-batch output

        prefix_p=0 fetches exact full results (two round trips per batch —
        counts gate the trim; OR unions are O(total postings), so the fetch
        itself is the floor on any link). prefix_p>0 slices each result row
        to prefix_p ON DEVICE at dispatch time, so the harvest is ONE
        bounded fetch regardless of union sizes and the batch returns
        (values, voffs, true_counts) — the pagination contract documented
        on boolean_staged."""
        from collections import deque

        s = st.snap
        stride = int(s.blocks.shape[1])
        P = int(prefix_p)
        out_all: List = [None] * len(batches)
        resq: deque = deque()
        clsq: deque = deque()

        def stage_resolve(bi):
            nq, qk, kv = self._batch_pack(st, batches[bi])
            if nq == 0:
                resq.append((bi, 0, None, None))
                return
            r = _JIT_RESOLVE(
                s.keys, s.counts, jnp.asarray(qk), s.hash_slots, s.max_probes
            )
            for a in r:
                a.copy_to_host_async()
            resq.append((bi, nq, kv, r))

        def stage_classes(item):
            bi, nq, kv, r = item
            if nq == 0:
                clsq.append((bi, 0, [], {}))
                return
            idx_h, found_h, raw_h = jax.device_get(r)
            K = idx_h.shape[1]
            sb_q = np.minimum(
                -(-raw_h[:nq].astype(np.int64) // 128), 1 << 30
            ).sum(axis=1)
            order = np.argsort(sb_q, kind="stable")
            pos = 0
            dispatches = []
            singles: Dict[int, np.ndarray] = {}
            for SB in self._SB_CLASSES:
                hi = int(np.searchsorted(sb_q[order], SB, side="right"))
                members = order[pos:hi]
                pos = hi
                if not len(members):
                    continue
                qb = max(8, (_RESERVE_BUDGET // (SB * max(stride, 128))) // 8 * 8)
                for c0 in range(0, len(members), qb):
                    batch = members[c0 : c0 + qb]
                    B = 8
                    while B < len(batch):
                        B *= 2
                    bi2 = np.zeros((B, K), dtype=np.int32)
                    bf = np.zeros((B, K), dtype=bool)
                    bkv = np.zeros(B, dtype=np.int32)
                    bi2[: len(batch)] = idx_h[batch]
                    bf[: len(batch)] = found_h[batch]
                    bkv[: len(batch)] = kv[batch]
                    o, oc = _JIT_CONCAT_BOOL(
                        s.blocks, s.term_block_start, s.counts,
                        jnp.asarray(bi2), jnp.asarray(bf), jnp.asarray(bkv),
                        SB, op,
                    )
                    if removed is not None and removed.shape[0] > 0:
                        o, oc = _JIT_FILTER(o, oc, removed)
                    md = None
                    if P:
                        o = o[:, : min(P, o.shape[1])]
                        o.copy_to_host_async()
                    else:
                        # full-result route: masked max delta rides the
                        # counts fetch and picks the wire width at harvest
                        md = _JIT_WIRE_META(o, oc)
                        md.copy_to_host_async()
                    oc.copy_to_host_async()
                    dispatches.append((batch, o, oc, md))
                if pos >= nq:
                    break
            # beyond the largest class (pathological): singly, exact budget
            for qi in order[pos:]:
                SB = int(_round_up(int(sb_q[qi]), 8))
                bi3 = np.repeat(idx_h[qi : qi + 1], 8, axis=0).astype(np.int32)
                bf3 = np.repeat(found_h[qi : qi + 1], 8, axis=0)
                bkv3 = np.full(8, kv[qi], dtype=np.int32)
                o, oc = _JIT_CONCAT_BOOL(
                    s.blocks, s.term_block_start, s.counts,
                    jnp.asarray(bi3), jnp.asarray(bf3), jnp.asarray(bkv3),
                    SB, op,
                )
                if removed is not None and removed.shape[0] > 0:
                    o, oc = _JIT_FILTER(o, oc, removed)
                c = int(np.asarray(oc)[0])
                singles[int(qi)] = np.asarray(o[0, :c]).copy()
            clsq.append((bi, nq, dispatches, singles))

        def stage_harvest(item):
            bi, nq, dispatches, singles = item
            if nq == 0:
                if columnar:
                    empty = (np.zeros(0, np.uint32), np.zeros(1, np.int64))
                    out_all[bi] = empty + (np.zeros(0, np.int64),) if P else empty
                else:
                    out_all[bi] = []
                return
            if P:
                ocs = jax.device_get([d[2] for d in dispatches])
                outs = jax.device_get([d[1] for d in dispatches])
            else:
                ocs, mds = (
                    jax.device_get(
                        ([d[2] for d in dispatches],
                         [d[3] for d in dispatches])
                    ) if dispatches else ([], [])
                )
                outs = self._wire_fetch(dispatches, ocs, mds)
            counts = np.zeros(nq, dtype=np.int64)
            rows: List[Optional[np.ndarray]] = [None] * nq
            for (batch, _, _, _), oc, o in zip(dispatches, ocs, outs):
                for j, qi in enumerate(batch):
                    c = int(oc[j])
                    counts[qi] = c
                    rows[qi] = o[j, : (min(c, P) if P else c)]
            for qi, v in singles.items():
                counts[qi] = len(v)
                rows[qi] = v[:P] if P else v
            if columnar:
                vals, voffs = _rows_to_columnar(rows)
                out_all[bi] = (vals, voffs, counts) if P else (vals, voffs)
            else:
                out_all[bi] = [np.array(r, dtype=np.uint32) for r in rows]

        for bi in range(len(batches)):
            stage_resolve(bi)
            if len(resq) > depth:
                stage_classes(resq.popleft())
            if len(clsq) > depth:
                stage_harvest(clsq.popleft())
        while resq:
            stage_classes(resq.popleft())
            if len(clsq) > depth:
                stage_harvest(clsq.popleft())
        while clsq:
            stage_harvest(clsq.popleft())
        return out_all

    @staticmethod
    def _wire_fetch(dispatches, ocs, mds):
        """Trip 2 of a full-result harvest: per dispatch, ship the
        delta-packed plane at the width its masked max delta allows
        (u8/u16 — see the wire codec above _JIT_WIRE_META), or the raw u32
        trim when deltas exceed 16 bits. One device_get covers every
        dispatch. dispatches rows are (query indices, out, oc, maxdelta).
        TPI_WIRE=0 forces the raw trim (operational escape hatch; also the
        A/B lever the codec's win is measured with)."""
        packed = os.environ.get("TPI_WIRE", "1") != "0"
        fetches, wire = [], []
        for (_, o, _, _), oc_h, md_h in zip(dispatches, ocs, mds):
            maxc = int(oc_h.max(initial=0))
            if maxc <= 1:
                fetches.append(o[:, :1])
                wire.append(False)
            elif packed and int(md_h) < (1 << 16):
                f, dd = _JIT_WIRE_PACK(o, bits=8 if int(md_h) < 256 else 16)
                fetches.append((f, dd[:, : maxc - 1]))
                wire.append(True)
            else:
                fetches.append(o[:, :maxc])
                wire.append(False)
        fetched = jax.device_get(fetches)
        return [
            _wire_unpack(*fo) if w else fo for fo, w in zip(fetched, wire)
        ]

    def _boolean_concat(self, st, queries, qk, kv, op: str, removed):
        """Exact AND/OR sized by each query's REAL total postings:
        resolve counts (cheap pass), group queries into total-block classes,
        then one concat-decode + sort + run-length reduction per class
        (ops/concat_bool.py). No padding to the longest list, no re-serve."""
        s = st.snap
        nq = len(queries)
        K = qk.shape[1]
        idx, found, raw = _JIT_RESOLVE(
            s.keys, s.counts, jnp.asarray(qk), s.hash_slots, s.max_probes
        )
        idx_h, found_h, raw_h = jax.device_get((idx, found, raw))
        sb_q = np.minimum(
            -(-raw_h[:nq].astype(np.int64) // 128), 1 << 30
        ).sum(axis=1)
        results: List[Optional[np.ndarray]] = [None] * nq
        order = np.argsort(sb_q, kind="stable")
        stride = int(s.blocks.shape[1])
        pos = 0
        # phase 1: dispatch every class chunk (async); B pads to a power of
        # two so compiled shapes repeat across batches
        dispatches = []  # (query indices, out_dev, oc_dev)
        for SB in self._SB_CLASSES:
            hi = int(np.searchsorted(sb_q[order], SB, side="right"))
            members = order[pos:hi]
            pos = hi
            if not len(members):
                continue
            qb = max(8, (_RESERVE_BUDGET // (SB * max(stride, 128))) // 8 * 8)
            for c0 in range(0, len(members), qb):
                batch = members[c0 : c0 + qb]
                B = 8
                while B < len(batch):
                    B *= 2
                bi = np.zeros((B, K), dtype=np.int32)
                bf = np.zeros((B, K), dtype=bool)
                bkv = np.zeros(B, dtype=np.int32)
                bi[: len(batch)] = idx_h[batch]
                bf[: len(batch)] = found_h[batch]
                bkv[: len(batch)] = kv[batch]
                out, oc = _JIT_CONCAT_BOOL(
                    s.blocks, s.term_block_start, s.counts,
                    jnp.asarray(bi), jnp.asarray(bf), jnp.asarray(bkv),
                    SB, op,
                )
                if removed is not None and removed.shape[0] > 0:
                    out, oc = _JIT_FILTER(out, oc, removed)
                md = _JIT_WIRE_META(out, oc)
                md.copy_to_host_async()
                oc.copy_to_host_async()
                dispatches.append((batch, out, oc, md))
            if pos >= nq:
                break
        # phase 2: ONE pipelined fetch of all counts + max deltas, then one
        # wire-packed fetch of all result prefixes (each device_get issues
        # every async copy before blocking — sequential np.asarray would pay
        # the tunnel RPC per array; the delta packing halves/quarters the
        # second, dominant fetch)
        ocs, mds = (
            jax.device_get(
                ([d[2] for d in dispatches], [d[3] for d in dispatches])
            ) if dispatches else ([], [])
        )
        outs = self._wire_fetch(dispatches, ocs, mds)
        for (batch, _, _, _), oc, out in zip(dispatches, ocs, outs):
            for j, qi in enumerate(batch):
                results[qi] = out[j, : oc[j]].copy()
        # queries beyond the largest class (pathological): process singly at
        # their exact block budget rounded up
        for qi in order[pos:]:
            SB = int(_round_up(int(sb_q[qi]), 8))
            bi = np.repeat(idx_h[qi : qi + 1], 8, axis=0).astype(np.int32)
            bf = np.repeat(found_h[qi : qi + 1], 8, axis=0)
            bkv = np.full(8, kv[qi], dtype=np.int32)
            out, oc = _JIT_CONCAT_BOOL(
                s.blocks, s.term_block_start, s.counts,
                jnp.asarray(bi), jnp.asarray(bf), jnp.asarray(bkv), SB, op,
            )
            if removed is not None and removed.shape[0] > 0:
                out, oc = _JIT_FILTER(out, oc, removed)
            oc = np.asarray(oc)
            results[qi] = np.asarray(out[0, : oc[0]]).copy()
        return results

    # -- exact decode by term index (ladder-grouped) --------------------------------

    def _decode_indices(self, idx: np.ndarray, s: IndexSnapshot,
                        st: Optional[ServingState] = None) -> tuple[np.ndarray, np.ndarray]:
        """Exact postings of dictionary indices `idx` in snapshot `s`:
        (values, voffs[n+1]). `st` supplies the ladder (defaults to a
        single-tier view of `s` — correct for promotion-time decodes that
        act on one explicit tier).

        Rows are decoded on device in batches grouped by the smallest ladder
        L that fits each row's TRUE count — every posting list is served
        exactly regardless of length (no host posting mirror exists)."""
        ladder = (
            self._levels(st) if st is not None
            else _ladder(self.L, s.max_count)
        )
        n = len(idx)
        counts = s.host_counts[idx].astype(np.int64)
        voffs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=voffs[1:])
        flat = np.empty(int(voffs[-1]), dtype=np.uint32)
        if n == 0:
            return flat, voffs
        levels = np.array([self.L] + ladder, dtype=np.int64)
        lvl_idx = np.searchsorted(levels, counts, side="left")
        for li in np.unique(lvl_idx):
            lv = int(levels[li])
            sel = np.nonzero(lvl_idx == li)[0]
            qb = max(1, _RESERVE_BUDGET // lv)
            for c0 in range(0, len(sel), qb):
                ss = sel[c0 : c0 + qb]
                B = _round_up(len(ss), 8)
                bi = np.full(B, idx[ss[-1]], dtype=np.int32)
                bi[: len(ss)] = idx[ss]
                v, _ = _JIT_DECODE(
                    s.blocks, s.term_block_start, s.counts, jnp.asarray(bi), lv
                )
                w = min(max(1, int(counts[ss].max())), lv)
                v = np.asarray(v[: len(ss), :w])
                m = np.arange(w, dtype=np.int64)[None, :] < counts[ss][:, None]
                dst = (voffs[ss][:, None] + np.arange(w, dtype=np.int64)[None, :])[m]
                flat[dst] = v[m]
        return flat, voffs

    # -- range read -----------------------------------------------------------------

    _RANGE_CHUNK = 4096

    def read_range(self, min_term: Optional[bytes] = None, max_term: Optional[bytes] = None):
        """Sorted (term, values) stream over [min,max] inclusive from the
        frozen snapshot pair — range resolution (two key searches), term
        bytes reconstructed from the key matrix, postings decoded in
        chunks. Matches InvertedIndex.read() semantics on the frozen state;
        with a delta live, the two tiers merge-join by term (values union
        on ties — types.go:14-22 semantics).

        Range reads are pure output (no set algebra for a device to add
        value to): with retained tables (host_ready) the stream serves
        entirely HOST-side — native decode, zero round trips; otherwise
        postings device-decode and fetch per chunk."""
        st = self._state
        host = st.host_ready()
        main = (
            self._read_range_on_tables(st.tables, min_term, max_term)
            if host else self._read_range_on(st, st.snap, min_term, max_term)
        )
        if st.delta is None:
            yield from main
            return
        dl = (
            self._read_range_on_tables(st.delta_tables, min_term, max_term)
            if host else self._read_range_on(st, st.delta, min_term, max_term)
        )
        a = next(main, None)
        b = next(dl, None)
        while a is not None or b is not None:
            if b is None or (a is not None and a[0] < b[0]):
                yield a
                a = next(main, None)
            elif a is None or b[0] < a[0]:
                yield b
                b = next(dl, None)
            else:
                yield a[0], np.union1d(a[1], b[1])
                a = next(main, None)
                b = next(dl, None)

    def _read_range_on(self, st, s: IndexSnapshot, min_term, max_term):
        if s.n_terms == 0:
            return
        lo = 0 if min_term is None else int(
            np.asarray(
                ds.searchsorted_rows(
                    s.keys,
                    jnp.asarray(keys_mod.pack_terms([min_term], width=s.width)),
                )
            )[0]
        )
        if max_term is None:
            hi = s.n_terms
        else:
            qk = keys_mod.pack_terms([max_term], width=s.width)
            hi = int(np.asarray(ds.searchsorted_rows(s.keys, jnp.asarray(qk), side="right"))[0])
        for c0 in range(lo, hi, self._RANGE_CHUNK):
            c1 = min(c0 + self._RANGE_CHUNK, hi)
            kr = np.asarray(s.keys[c0:c1])  # fetch only the range's key rows
            blob, offs = keys_mod.unpack_keys(kr)
            vals, voffs = self._decode_indices(np.arange(c0, c1), s, st)
            for j in range(c1 - c0):
                yield (
                    blob[offs[j] : offs[j + 1]].tobytes(),
                    vals[voffs[j] : voffs[j + 1]],
                )

    def _read_range_on_tables(self, t: HostTables, min_term, max_term):
        """read_range served from the retained tables: host key search +
        native block decode, no device involvement."""
        if t.n_terms == 0:
            return
        lo = 0 if min_term is None else int(
            keys_mod.searchsorted_rows(
                t.keys, keys_mod.pack_terms([min_term], width=t.width)
            )[0]
        )
        hi = t.n_terms if max_term is None else int(
            keys_mod.searchsorted_rows(
                t.keys, keys_mod.pack_terms([max_term], width=t.width),
                side="right",
            )[0]
        )
        for c0 in range(lo, hi, self._RANGE_CHUNK):
            c1 = min(c0 + self._RANGE_CHUNK, hi)
            blob, offs = keys_mod.unpack_keys(t.keys[c0:c1])
            vals, voffs = self._host_decode(t, np.arange(c0, c1))
            for j in range(c1 - c0):
                yield (
                    blob[offs[j] : offs[j + 1]].tobytes(),
                    vals[voffs[j] : voffs[j + 1]],
                )

    # -- prefix search --------------------------------------------------------------

    def prefix_search(self, prefixes: Sequence[bytes]) -> Dict[bytes, np.ndarray]:
        """Range resolution + vectorized union of decoded rows.

        Parity with InvertedIndex.prefix_search (inverted_index.go:192-295):
        unmatched prefixes absent; values sorted unique. With a delta live,
        results union across both tiers. Output-bound like read_range, so
        retained tables (host_ready) serve it host-side."""
        st = self._state
        host = st.host_ready()
        if host:
            on = self._prefix_on_tables
        else:
            def on(s, ps):
                return self._prefix_on(st, s, ps)
        out = on(st.tables if host else st.snap, prefixes)
        if st.delta is None:
            return out
        for p, v in on(
            st.delta_tables if host else st.delta, prefixes
        ).items():
            out[p] = np.union1d(out[p], v) if p in out else v
        return out

    def _prefix_on_tables(self, t: HostTables, prefixes) -> Dict[bytes, np.ndarray]:
        if t.n_terms == 0 or not prefixes:
            return {}
        lo_k, hi_k = keys_mod.prefix_bounds(list(prefixes), t.width)
        lo = keys_mod.searchsorted_rows(t.keys, lo_k)
        hi = keys_mod.searchsorted_rows(t.keys, hi_k)
        spans = [
            (p, int(lo[i]), int(hi[i]))
            for i, p in enumerate(prefixes)
            if hi[i] > lo[i]
        ]
        if not spans:
            return {}
        all_idx = np.concatenate([np.arange(a, b) for _, a, b in spans])
        vals, voffs = self._host_decode(t, all_idx)
        out: Dict[bytes, np.ndarray] = {}
        k0 = 0
        for p, a, b in spans:
            k1 = k0 + (b - a)
            out[p] = np.unique(vals[voffs[k0] : voffs[k1]])
            k0 = k1
        return out

    def _prefix_on(self, st, s: IndexSnapshot, prefixes) -> Dict[bytes, np.ndarray]:
        if s.n_terms == 0 or not prefixes:
            return {}
        lo_k, hi_k = keys_mod.prefix_bounds(list(prefixes), s.width)
        lo, hi = self._prefix(s.keys, jnp.asarray(lo_k), jnp.asarray(hi_k))
        lo, hi = np.asarray(lo), np.asarray(hi)
        spans = [
            (p, int(lo[i]), int(hi[i]))
            for i, p in enumerate(prefixes)
            if hi[i] > lo[i]
        ]
        if not spans:
            return {}
        all_idx = np.concatenate([np.arange(a, b) for _, a, b in spans])
        vals, voffs = self._decode_indices(all_idx, s, st)
        out: Dict[bytes, np.ndarray] = {}
        k0 = 0
        for p, a, b in spans:
            k1 = k0 + (b - a)
            out[p] = np.unique(vals[voffs[k0] : voffs[k1]])
            k0 = k1
        return out
