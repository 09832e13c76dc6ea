"""Multi-chip sharding: the index's shard axis mapped onto a device Mesh.

The reference parallelizes across up to 1024 prefix shards with goroutines in
one process (/root/reference/inverted_index.go:46-103). Here the same shard
axis becomes a `jax.sharding.Mesh` axis: the 10-bit shard-key space is split
into contiguous ranges, one per device; each device holds the frozen snapshot
of its shard range (dictionary + postings), padded to a common shape and
stacked. Queries are replicated to all devices (fan-out); each device answers
for terms it owns; results merge with a `psum` over ICI — exactness holds
because a term's postings live on EXACTLY ONE device (disjoint key ranges),
so the sum has a single non-zero contributor per query.

This is the DP-like axis of this workload (SURVEY §2.2): there is no tensor
to split per-op; scaling = partitioning index state + fan-out/merge
collectives.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models import query_engine as qe
from ..shard import merge_views

SHARD_AXIS = "shards"

# padding key row: sorts after every real term (length word 0xFFFFFFFF is
# impossible for a real term) and can never equal a real query key.
_PAD_WORD = 0xFFFFFFFF


@dataclass
class ShardedSnapshot:
    """Per-device snapshot partitions, padded to equal shapes and stacked.

    Leading axis = device along the `shards` mesh axis.
    """

    keys: jnp.ndarray               # (D, Nmax, W+1)
    blocks: jnp.ndarray             # (D, Bmax, stride) block row arenas
    term_block_start: jnp.ndarray   # (D, Nmax+1)
    counts: jnp.ndarray             # (D, Nmax)
    hash_slots: jnp.ndarray         # (D, S) common power-of-two table size
    mesh: Mesh
    width: int
    max_probes: int = 1
    max_count: int = 0              # longest posting list across partitions
                                    # (sizes the exact re-serve ladder)

    @property
    def n_devices(self) -> int:
        return self.keys.shape[0]


def _pad_partition(snap: qe.IndexSnapshot, Nmax: int, Bmax: int, stride: int, W: int):
    """Pad one device partition to the common shape (host numpy)."""
    n = snap.n_terms
    keys = np.full((Nmax, W + 1), _PAD_WORD, dtype=np.uint32)
    if n:
        k = np.asarray(snap.keys)
        keys[:n, : k.shape[1]] = k
        if k.shape[1] < W + 1:  # widen: move length word to last column
            keys[:n, W] = k[:, -1]
            keys[:n, k.shape[1] - 1 : W] = 0
    blocks = np.zeros((Bmax, stride), dtype=np.uint32)
    bl = np.asarray(snap.blocks)
    blocks[: bl.shape[0], : bl.shape[1]] = bl
    tbs = np.zeros(Nmax + 1, dtype=np.int32)
    t = np.asarray(snap.term_block_start)
    tbs[: len(t)] = t
    tbs[len(t) :] = t[-1] if len(t) else 0
    counts = np.zeros(Nmax, dtype=np.int32)
    c = np.asarray(snap.counts)
    counts[: len(c)] = c
    return keys, blocks, tbs, counts


def shard_ranges(n_devices: int, fanout: int = 1024) -> List[range]:
    """Contiguous split of the shard-key space ("0000".."1023") per device."""
    per = -(-fanout // n_devices)
    return [range(d * per, min((d + 1) * per, fanout)) for d in range(n_devices)]


def build_sharded_snapshot(
    index, mesh: Mesh, width: Optional[int] = None
) -> ShardedSnapshot:
    """Freeze an InvertedIndex into per-device partitions along `mesh`'s
    shard axis. Shard dirs are routed to devices by contiguous shard-key
    ranges (global term order = device order for terms >= 2 bytes)."""
    n_dev = mesh.shape[SHARD_AXIS]
    ranges = shard_ranges(n_dev)
    parts: List[qe.IndexSnapshot] = []
    for r in ranges:
        views = []
        for sh in index._snapshot():
            try:
                k = int(sh.get_key())
            except ValueError:
                continue
            if k in r:
                views.extend(
                    s.view for s in sh.segments.snapshot() if s.view is not None
                )
        merged = merge_views(views, None)
        if merged is None:
            parts.append(qe._empty_snapshot(width or 1))
        else:
            blob, offsets, values, voffs = merged
            parts.append(
                qe.build_snapshot_arrays(blob, offsets, values, voffs, None, width, build_hash=False)
            )
    return stack_partitions(parts, mesh)


def stack_partitions(parts: List[qe.IndexSnapshot], mesh: Mesh) -> ShardedSnapshot:
    from ..codec import hashing

    W = max(p.width for p in parts)
    Nmax = max(max(p.n_terms for p in parts), 1)
    Bmax = max(max(int(p.blocks.shape[0]) for p in parts), 1)
    stride = max(int(p.blocks.shape[1]) for p in parts)
    padded = [_pad_partition(p, Nmax, Bmax, stride, W) for p in parts]
    # per-device hash tables at ONE power-of-two size (the probe math uses
    # S-1 as the mask, so every device must share S)
    S = hashing.table_size(Nmax)
    tables, probes = [], 1
    for pp in padded:
        keys_np, _, _, counts_np = pp
        n = int((keys_np[:, -1] != 0xFFFFFFFF).sum())  # real rows (pad has len word max)
        h = hashing.hash_rows_np(keys_np[:n])
        slots = np.full(S, -1, dtype=np.int32)
        mask = np.uint32(S - 1)
        if n:
            from ..codec import native

            if native.available():
                native._load().tpi_hash_build(
                    np.ascontiguousarray(h), n, slots, S
                )
            else:
                full = hashing.build_table_np(h)
                # rebuild at size S if the fallback chose a different size
                if len(full) != S:
                    slots = np.full(S, -1, dtype=np.int32)
                    for i, hv in enumerate(h):
                        pos = np.uint32(hv) & mask
                        while slots[pos] >= 0:
                            pos = (pos + np.uint32(1)) & mask
                        slots[pos] = i
                else:
                    slots = full
            probes = max(probes, hashing.max_probe_len(slots, h))
        tables.append(slots)
    stack = lambda i: np.stack([pp[i] for pp in padded], axis=0)
    shard = NamedSharding(mesh, P(SHARD_AXIS))
    return ShardedSnapshot(
        keys=jax.device_put(stack(0), shard),
        blocks=jax.device_put(stack(1), shard),
        term_block_start=jax.device_put(stack(2), shard),
        counts=jax.device_put(stack(3), shard),
        hash_slots=jax.device_put(np.stack(tables, axis=0), shard),
        mesh=mesh,
        width=W,
        max_probes=probes,
        max_count=max(p.max_count for p in parts),
    )


# ---------------------------------------------------------------------------
# SPMD query steps (shard_map over the mesh)
# ---------------------------------------------------------------------------


def _local_lookup(keys, blocks, tbs, counts, slots, qkeys, L, max_probes):
    """Per-device block: answer for owned terms, zero elsewhere.

    Returns (found, vals, n, raw): n is the served count (clamped to L),
    raw the term's TRUE posting count — raw > L signals the row was clipped
    and the caller must re-serve that query at a larger ladder L (same
    exactness protocol as the single-chip QueryEngine)."""
    found, vals, n, raw = qe.lookup_step(
        keys[0], blocks[0], tbs[0], counts[0], qkeys, L,
        slots[0], max_probes,
    )
    vals = jnp.where((found & (n > 0))[:, None], vals, jnp.uint32(0))
    n = jnp.where(found, n, 0)
    return found, vals, n, raw


def make_sharded_lookup(snap: ShardedSnapshot, L: int):
    """Compile the fan-out lookup: queries replicated in, results psum'd over
    ICI (single owner per term => sum == owner's answer).

    Returns (found, vals, n, raw) per query; raw > L flags truncation (the
    owning device's true count survives the psum since misses contribute 0).
    """
    probes = snap.max_probes

    def step(keys, blocks, tbs, counts, slots, qkeys):
        found, vals, n, raw = _local_lookup(keys, blocks, tbs, counts, slots, qkeys, L, probes)
        found = jax.lax.psum(found.astype(jnp.int32), SHARD_AXIS) > 0
        vals = jax.lax.psum(vals, SHARD_AXIS)
        n = jax.lax.psum(n, SHARD_AXIS)
        raw = jax.lax.psum(raw, SHARD_AXIS)
        return found, vals, n, raw

    mapped = shard_map(
        step,
        mesh=snap.mesh,
        in_specs=(P(SHARD_AXIS),) * 5 + (P(),),
        out_specs=(P(), P(), P(), P()),
    )
    jitted = jax.jit(mapped)

    def call(keys, blocks, tbs, counts, qkeys):
        return jitted(keys, blocks, tbs, counts, snap.hash_slots, qkeys)

    return call


def make_sharded_boolean(snap: ShardedSnapshot, L: int, op: str):
    """Fan-out boolean queries: per-term postings fetched on the owning
    device, merged by psum, then the set op runs replicated (its inputs are
    already global).

    Returns (out, oc, need): need is the largest TRUE posting count among
    each query's present terms — need > L means the result may be incomplete
    and the caller must re-serve that query through a program compiled at a
    larger ladder L (make_sharded_boolean(snap, L2, op)); mirrors the
    single-chip boolean_step contract."""
    from ..ops import setops

    probes = snap.max_probes

    def step(keys, blocks, tbs, counts, slots, qkeys, k_valid):
        Q, K, Wp1 = qkeys.shape
        flat = qkeys.reshape(Q * K, Wp1)
        found, vals, n, raw = _local_lookup(keys, blocks, tbs, counts, slots, flat, L, probes)
        vals = jax.lax.psum(vals, SHARD_AXIS)
        n = jax.lax.psum(n, SHARD_AXIS)
        raw = jax.lax.psum(raw, SHARD_AXIS)
        lists = vals.reshape(Q, K, L)
        ncnt = n.reshape(Q, K)
        kmask = jnp.arange(K, dtype=jnp.int32)[None, :] < k_valid[:, None]
        need = jnp.max(
            jnp.where(kmask, raw.reshape(Q, K), 0), axis=1
        ).astype(jnp.int32)
        if op == "and":
            out, oc = setops.intersect_many(lists, ncnt, k_valid)
        else:
            out, oc = setops.union_many(lists, ncnt, k_valid)
        return out, oc, need

    mapped = shard_map(
        step,
        mesh=snap.mesh,
        in_specs=(P(SHARD_AXIS),) * 5 + (P(), P()),
        out_specs=(P(), P(), P()),
    )
    jitted = jax.jit(mapped)

    def call(keys, blocks, tbs, counts, qkeys, k_valid):
        return jitted(keys, blocks, tbs, counts, snap.hash_slots, qkeys, k_valid)

    return call


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (SHARD_AXIS,))
