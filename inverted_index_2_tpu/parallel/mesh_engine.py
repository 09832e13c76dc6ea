"""MeshQueryEngine — single-chip QueryEngine serving parity over the mesh.

Wraps the raw `make_sharded_*` factories (parallel/mesh.py) in the same
serve/refresh lifecycle the single-chip engine provides
(models/query_engine.py):

 * vectorized TOMBSTONE filtering per query batch (the reference's
   removed_list applied as a bitmask filter, /root/reference/
   removed_list.go:44-54 + shard.go:181-190 semantics) — `removed` is
   replicated and the filter runs on the psum-merged (replicated) results,
   so mesh answers are bit-identical to the single-chip engine's;
 * INCREMENTAL refresh: a fingerprint no-op check, an O(delta) delta tier
   for purely-additive changes (new segments visible to the next query —
   the reference's Read-visibility contract, inverted_index.go:300-340),
   and automatic promotion to a full rebuild past DELTA_FRACTION;
 * automatic exact LADDER re-serve of queries whose posting lists exceed
   the fast-path L (programs per ladder level, compiled lazily and cached);
 * warmup() precompiling the serving programs before traffic.

The delta tier is stacked onto device 0 (with empty partitions elsewhere):
deltas are bounded at DELTA_FRACTION of main by construction, so the
imbalance is transient and vanishes at the next promotion/full rebuild.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..codec import keys as keys_mod
from ..models import query_engine as qe
from . import mesh as pm


class MeshServingState:
    """One immutable bundle of everything a mesh serve path reads —
    the mesh twin of models.query_engine.ServingState. refresh() publishes
    a complete new bundle with a SINGLE reference assignment, so a
    concurrent reader never pairs a new main with a stale delta or stale
    tombstone array (reference protocol: segments.go:25-53)."""

    __slots__ = ("snap", "delta", "removed", "fingerprint", "main_fp",
                 "base_map", "main_n_terms")

    def __init__(self, snap, delta=None, removed=None, fingerprint=None,
                 main_fp=None, base_map=None, main_n_terms=0):
        self.snap = snap
        self.delta: Optional[pm.ShardedSnapshot] = delta
        self.removed = removed
        self.fingerprint = fingerprint
        self.main_fp = main_fp
        self.base_map = base_map if base_map is not None else {}
        self.main_n_terms = main_n_terms

    def replace(self, **kw) -> "MeshServingState":
        args = {
            "delta": self.delta, "removed": self.removed,
            "fingerprint": self.fingerprint, "main_fp": self.main_fp,
            "base_map": self.base_map, "main_n_terms": self.main_n_terms,
        }
        snap = kw.pop("snap", self.snap)
        args.update(kw)
        return MeshServingState(snap, **args)

    def max_count(self) -> int:
        m = self.snap.max_count
        if self.delta is not None:
            m += self.delta.max_count  # a term's tier union can reach the sum
        return m

    def width(self) -> int:
        w = self.snap.width
        if self.delta is not None:
            w = max(w, self.delta.width)
        return w


class MeshQueryEngine:
    """Batched mesh serving over a ShardedSnapshot pair (main + delta)."""

    DELTA_FRACTION = 0.25

    def __init__(self, index, mesh=None, L: int = 1024, q_bucket: int = 256):
        if L % 128 != 0 or L <= 0:
            raise ValueError(f"L must be a positive multiple of 128, got {L}")
        self.mesh = mesh if mesh is not None else pm.default_mesh()
        self.L = L
        self.q_bucket = q_bucket
        self._full_build(index)

    # -- serving-state access ------------------------------------------------
    #
    # Read-only views for introspection/tests; serve paths capture
    # `st = self._state` once and thread it through.

    @property
    def snap(self):
        return self._state.snap

    @property
    def delta(self):
        return self._state.delta

    @property
    def _removed(self):
        return self._state.removed

    @property
    def _fingerprint(self):
        return self._state.fingerprint

    @property
    def _main_fp(self):
        return self._state.main_fp

    @property
    def _main_n_terms(self):
        return self._state.main_n_terms

    # -- build / refresh ---------------------------------------------------

    @staticmethod
    def _count_terms(snap) -> int:
        keys_last = np.asarray(snap.keys[:, :, -1])
        return int((keys_last != pm._PAD_WORD).sum())

    def _full_build(self, index) -> None:
        snap = pm.build_sharded_snapshot(index, self.mesh)
        fp = qe._index_fingerprint(index, False)
        self._state = MeshServingState(
            snap, removed=jnp.asarray(qe._collect_removed(index)),
            fingerprint=fp, main_fp=fp,
            base_map={k: frozenset(segs) for k, segs, _rl in fp[1]},
            main_n_terms=self._count_terms(snap),
        )

    @classmethod
    def from_checkpoint(cls, path: str, index=None, mesh=None,
                        L: int = 1024, q_bucket: int = 256):
        """Warm-start mesh serving from a checkpoint written by
        models.checkpoint.save_checkpoint: the global host tables are cut
        into per-device term ranges balanced by block volume
        (partition_tables) and stacked with one sharded upload — no
        segment scan, merge, or re-encode. With `index` given, drift since
        the save reconciles through the normal refresh lifecycle.

        Only apply_removed=False checkpoints are servable here: the mesh
        engine filters tombstones per query (replicated `removed`), and a
        purged build would change the delta/purge baseline semantics."""
        from ..models.checkpoint import load_checkpoint, load_fingerprint

        t, meta = load_checkpoint(path)
        if meta["apply_removed"]:
            raise ValueError(
                "mesh serving needs an apply_removed=False checkpoint "
                "(tombstones filter per query on the mesh)"
            )
        if L % 128 != 0 or L <= 0:
            raise ValueError(f"L must be a positive multiple of 128, got {L}")
        eng = cls.__new__(cls)
        eng.mesh = mesh if mesh is not None else pm.default_mesh()
        eng.L = L
        eng.q_bucket = q_bucket
        D = eng.mesh.shape[pm.SHARD_AXIS]
        fp = load_fingerprint(meta)
        eng._state = MeshServingState(
            pm.stack_tables(pm.partition_tables(t, D), eng.mesh),
            removed=jnp.asarray(t.removed),
            fingerprint=fp, main_fp=fp,
            base_map=(
                {} if fp is None
                else {k: frozenset(segs) for k, segs, _rl in fp[1]}
            ),
            main_n_terms=t.n_terms,
        )
        if index is not None:
            if fp is None:
                eng._full_build(index)
            else:
                eng.refresh(index)
        return eng

    def refresh(self, index) -> bool:
        """Re-freeze from the live index; no-op (False) when unchanged.
        Purely-additive changes upload only the new segments as a delta
        tier (O(delta)); compactions or oversized deltas trigger a full
        rebuild — the same policy as QueryEngine.refresh."""
        base = self._state
        fp = qe._index_fingerprint(index, False)
        if fp == base.fingerprint:
            return False
        if self._try_delta_refresh(index, fp):
            return True
        self._full_build(index)
        return True

    def _try_delta_refresh(self, index, fp) -> bool:
        """O(delta) incremental tier; publishes the new state (fingerprint
        included, ONE reference swap) and returns True on success."""
        base = self._state
        if base.main_fp is None:  # fingerprint-less warm start
            return False
        main_shards = {k: segs for k, segs, _rl in base.main_fp[1]}
        for key, segs, _rl in fp[1]:
            if not set(main_shards.get(key, ())).issubset(segs):
                return False  # a main segment was merged away: full rebuild
        delta1 = qe.snapshot_new_segments(index, base.base_map)
        if delta1 is None:
            delta = base.delta  # tombstone-only change: refresh removed below
        else:
            if delta1.n_terms > self.DELTA_FRACTION * max(1, base.main_n_terms):
                return False  # promote: full rebuild folds the delta in
            D = self.mesh.shape[pm.SHARD_AXIS]
            delta = pm.stack_partitions(
                [delta1] + [qe._empty_snapshot(delta1.width)] * (D - 1),
                self.mesh,
            )
        self._state = base.replace(
            delta=delta,
            removed=jnp.asarray(qe._collect_removed(index)),
            fingerprint=fp,
        )
        return True

    # -- helpers -----------------------------------------------------------

    def _levels(self, st: Optional[MeshServingState] = None) -> List[int]:
        st = st if st is not None else self._state
        return qe._ladder(self.L, st.max_count())

    def _level_for(self, need: int, st: MeshServingState) -> int:
        for lv in self._levels(st):
            if lv >= need:
                return lv
        return qe._round_up(need, 128)

    @staticmethod
    def _filter(out, oc, removed):
        if removed.shape[0] == 0:
            return out, oc
        return qe._JIT_FILTER(out, oc, removed)

    def warmup(self, k_max: int = 8, ops: Sequence[str] = ("and", "or")) -> int:
        """Precompile the serving programs (lookup, boolean per op, prefix
        ranges, dual variants when a delta is live) at one query bucket."""
        st = self._state
        s = st.snap
        n = 0
        W = st.width()
        qk = jnp.zeros((self.q_bucket, s.width + 1), dtype=jnp.uint32)
        lookup = pm.make_sharded_lookup_scatter(s, self.L)
        jax.block_until_ready(lookup(
            s.keys, s.blocks, s.term_block_start, s.counts, qk,
        )[2])
        n += 1
        bqk = np.zeros((self.q_bucket, k_max, W + 1), dtype=np.uint32)
        kv = jnp.zeros((self.q_bucket,), dtype=jnp.int32)
        for op in ops:
            o, oc, _ = self._boolean_dispatch(st, self.L, bqk, kv, op)
            jax.block_until_ready(oc)
            if st.removed.shape[0] > 0:
                jax.block_until_ready(self._filter(o, oc, st.removed)[1])
            n += 1
        jax.block_until_ready(
            pm.make_sharded_prefix_ranges(s)(
                jnp.zeros((1, s.width + 1), jnp.uint32),
                jnp.full((1, s.width + 1), pm._PAD_WORD, jnp.uint32),
            )[0]
        )
        n += 1
        return n

    def stats(self) -> Dict:
        st = self._state
        d = st.delta
        return {
            "devices": st.snap.n_devices,
            "n_terms": st.main_n_terms,
            "delta_terms": 0 if d is None else int(
                (np.asarray(d.keys[:, :, -1]) != pm._PAD_WORD).sum()
            ),
            "removed": int(st.removed.shape[0]),
            "ladder": self._levels(st),
            "partition": pm.partition_stats(st.snap),
        }

    # -- exact lookup ------------------------------------------------------

    def lookup(
        self, terms: Sequence[bytes], filter_removed: bool = False
    ) -> List[Optional[np.ndarray]]:
        """Exact postings per term (None for misses), unioned across the
        main+delta tiers, ladder re-served past L — the mesh twin of
        QueryEngine.lookup."""
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

    def _exact_rows(self, st: MeshServingState, s: pm.ShardedSnapshot, terms,
                    filter_removed: bool):
        Q = qe._round_up(len(terms), self.q_bucket)
        qk = keys_mod.pack_terms(list(terms), width=s.width)
        pad = np.repeat(qk[-1:], Q - len(terms), axis=0)
        qk_p = jnp.asarray(np.concatenate([qk, pad], axis=0))
        lookup = pm.make_sharded_lookup_scatter(s, self.L)
        found, vals, n, raw = lookup(
            s.keys, s.blocks, s.term_block_start, s.counts, qk_p
        )
        if filter_removed:
            vals, n = self._filter(vals, n, st.removed)
        md = qe._JIT_WIRE_META(vals, n)
        found, n, raw, md = jax.device_get((found, n, raw, md))
        vals = self._fetch_trimmed(vals, n, md)
        out: List[Optional[np.ndarray]] = [None] * len(terms)
        long_idx = []
        for i in range(len(terms)):
            if not found[i]:
                continue
            if raw[i] > self.L:
                long_idx.append(i)
            else:
                out[i] = vals[i, : n[i]].copy()
        long_idx.sort(key=lambda i: -raw[i])
        while long_idx:
            lv = self._level_for(int(max(raw[i] for i in long_idx)), st)
            qb = max(1, qe._RESERVE_BUDGET // lv)
            batch, long_idx = long_idx[:qb], long_idx[qb:]
            B = qe._round_up(len(batch), 8)
            bq = np.repeat(qk[batch[-1]: batch[-1] + 1], B, axis=0)
            bq[: len(batch)] = qk[batch]
            lk2 = pm.make_sharded_lookup_scatter(s, lv)
            f2, v2, n2, _ = lk2(
                s.keys, s.blocks, s.term_block_start, s.counts, jnp.asarray(bq)
            )
            if filter_removed:
                v2, n2 = self._filter(v2, n2, st.removed)
            md2 = qe._JIT_WIRE_META(v2, n2)
            n2, md2 = jax.device_get((n2, md2))
            v2 = self._fetch_trimmed(v2, n2, md2)
            for j, i in enumerate(batch):
                out[i] = v2[j, : n2[j]].copy()
        return out

    # -- boolean -----------------------------------------------------------

    def _fetch_trimmed(self, out, oc_h, md_h) -> np.ndarray:
        """Result-matrix fetch through the wire codec (see the codec notes
        above qe._JIT_WIRE_META): ship (first u32, delta plane u8/u16) when
        the dispatch's masked max delta fits, raw u32 trim otherwise
        (TPI_WIRE=0 forces the trim — same escape hatch as QueryEngine)."""
        maxc = int(oc_h.max(initial=0))
        if maxc <= 1:
            return np.asarray(out[:, :1])
        if os.environ.get("TPI_WIRE", "1") != "0" and int(md_h) < (1 << 16):
            f, dd = qe._JIT_WIRE_PACK(out, bits=8 if int(md_h) < 256 else 16)
            return qe._wire_unpack(*jax.device_get((f, dd[:, : maxc - 1])))
        return np.asarray(out[:, :maxc])

    def _boolean_dispatch(self, st: MeshServingState, lv: int,
                          qk: np.ndarray, kv, op: str):
        """One device pass at pad lv over main (+delta when live). The
        single-tier path reduce-scatters the decode so the set op runs
        query-sharded (1/D per device) instead of replicated."""
        s = st.snap
        if st.delta is None:
            call = pm.make_sharded_boolean_scatter(s, lv, op)
            return call(
                s.keys, s.blocks, s.term_block_start, s.counts,
                jnp.asarray(qe._narrow_keys(qk, s.width)), kv,
            )
        d = st.delta
        call = pm.make_sharded_boolean_dual_scatter(s, d, lv, op)
        return call(
            jnp.asarray(qe._narrow_keys(qk, s.width)),
            jnp.asarray(qe._narrow_keys(qk, d.width)),
            kv,
        )

    def boolean(
        self, queries: Sequence[Sequence[bytes]], op: str,
        filter_removed: bool = False,
    ) -> List[Optional[np.ndarray]]:
        """Batch of AND/OR queries over the mesh; result-identical to the
        single-chip QueryEngine (padded formulation), tombstones included."""
        if not queries:
            return []
        st = self._state
        K = max(len(q) for q in queries)
        Q = qe._round_up(len(queries), self.q_bucket)
        W = st.width()
        qk = np.zeros((Q, K, W + 1), dtype=np.uint32)
        kv = np.array(
            [len(q) for q in queries] + [0] * (Q - len(queries)), dtype=np.int32
        )
        flat_terms = [t for q in queries for t in q]
        packed = keys_mod.pack_terms(flat_terms, width=W)
        rows = np.repeat(np.arange(len(queries)), kv[: len(queries)])
        cols = (
            np.concatenate([np.arange(k) for k in kv[: len(queries)]])
            if flat_terms else np.zeros(0, np.int64)
        )
        qk[rows, cols] = packed
        kv_d = jnp.asarray(kv)

        out, oc, need = self._boolean_dispatch(st, self.L, qk, kv_d, op)
        if filter_removed:
            out, oc = self._filter(out, oc, st.removed)
        md = qe._JIT_WIRE_META(out, oc)
        oc, need, md = jax.device_get((oc, need, md))
        out = self._fetch_trimmed(out, oc, md)
        results: List[Optional[np.ndarray]] = [None] * len(queries)
        long_idx = sorted(
            (i for i in range(len(queries)) if need[i] > self.L),
            key=lambda i: -need[i],
        )
        for i in range(len(queries)):
            if need[i] <= self.L:
                results[i] = out[i, : oc[i]].copy()
        while long_idx:
            lv = self._level_for(int(max(need[i] for i in long_idx)), st)
            qb = max(1, qe._RESERVE_BUDGET // (K * lv))
            batch, long_idx = long_idx[:qb], long_idx[qb:]
            B = qe._round_up(len(batch), 8)
            bq = np.zeros((B, K, W + 1), dtype=np.uint32)
            bkv = np.zeros(B, dtype=np.int32)
            bq[: len(batch)] = qk[batch]
            bkv[: len(batch)] = kv[batch]
            o2, c2, _ = self._boolean_dispatch(st, lv, bq, jnp.asarray(bkv), op)
            if filter_removed:
                o2, c2 = self._filter(o2, c2, st.removed)
            md2 = qe._JIT_WIRE_META(o2, c2)
            c2, md2 = jax.device_get((c2, md2))
            o2 = self._fetch_trimmed(o2, c2, md2)
            for j, i in enumerate(batch):
                results[i] = o2[j, : c2[j]].copy()
        return results

    def lookup_staged(
        self, batches, filter_removed: bool = False, depth: int = 3,
        columnar: bool = False, prefix_p: int = 0,
    ):
        """Pipelined stream lookup over the mesh — the mesh twin of
        QueryEngine.lookup_staged: each term serves as a single-term OR
        query through the staged stream, so misses surface as count-0 rows
        rather than lookup()'s None (without filter_removed a PRESENT term
        always has >= 1 posting, so zero is unambiguous there). Returns per
        batch what boolean_staged returns (rows / columnar pair /
        pagination triple with prefix_p)."""
        return self.boolean_staged(
            [[[t] for t in b] for b in batches], "or",
            filter_removed, depth, columnar, prefix_p,
        )

    def boolean_staged(
        self, batches, op: str, filter_removed: bool = False,
        depth: int = 3, columnar: bool = False, prefix_p: int = 0,
    ):
        """Depth-pipelined mesh stream serving: dispatch batch i+`depth`
        (and start its result copies) BEFORE fetching batch i, so the
        host's fetch round trips overlap the mesh's compute — the mesh
        twin of QueryEngine.boolean_staged. Ladder re-serves (need > L)
        are deferred and processed ONCE across the whole stream, largest
        level first, so the re-serve round-trip count is independent of
        how many batches clipped. Per-batch results are identical to
        boolean().

        prefix_p > 0 (requires columnar): pagination serving with the
        single-chip contract — each batch returns (values, voffs, counts)
        where values holds the FIRST min(count, prefix_p) results per
        query and counts the true result sizes; the harvest fetches one
        bounded (Q, P) slice per batch instead of the wire-trimmed full
        rows. Rows whose true size exceeded the fast-path L still re-serve
        exactly, so counts stay exact at any posting length."""
        from collections import deque

        batches = list(batches)
        P = int(prefix_p)
        if P and not columnar:
            raise ValueError("prefix_p requires columnar=True")
        st = self._state
        if st.delta is not None:
            # dual-tier programs are not stream-shaped; the delta window is
            # transient (promotion folds it into main)
            per = [self.boolean(b, op, filter_removed) for b in batches]
            if P:
                out = []
                for rows in per:
                    counts = np.fromiter(
                        map(len, rows), np.int64, count=len(rows))
                    vals, voffs = qe._rows_to_columnar(
                        [r[:P] for r in rows])
                    out.append((vals, voffs, counts))
                return out
            return (
                [qe._rows_to_columnar(rows) for rows in per]
                if columnar else per
            )
        W = st.width()
        fetched: List = [None] * len(batches)
        longs = []  # (batch, row, qk_row (K, W+1), kv, need)
        pend = deque()

        def harvest(item):
            bi, nq, qk, kv, out, oc, need, md = item
            oc_h, need_h = jax.device_get((oc, need))
            if P:
                out_h = np.asarray(out)  # the bounded (Q, P) device slice
            else:
                out_h = self._fetch_trimmed(out, oc_h[:nq],
                                            jax.device_get(md))
            fetched[bi] = (nq, out_h, oc_h)
            for i in np.nonzero(need_h[:nq] > self.L)[0]:
                longs.append((bi, int(i), qk[i], int(kv[i]), int(need_h[i])))

        for bi, queries in enumerate(batches):
            if not queries:
                fetched[bi] = (0, None, None)
                continue
            K = max(len(q) for q in queries)
            Q = qe._round_up(len(queries), self.q_bucket)
            qk = np.zeros((Q, K, W + 1), dtype=np.uint32)
            kv = np.array(
                [len(q) for q in queries] + [0] * (Q - len(queries)),
                dtype=np.int32,
            )
            flat_terms = [t for q in queries for t in q]
            if flat_terms:
                packed = keys_mod.pack_terms(flat_terms, width=W)
                rows = np.repeat(np.arange(len(queries)), kv[: len(queries)])
                cols = np.concatenate(
                    [np.arange(k) for k in kv[: len(queries)]]
                )
                qk[rows, cols] = packed
            out, oc, need = self._boolean_dispatch(
                st, self.L, qk, jnp.asarray(kv), op
            )
            if filter_removed:
                out, oc = self._filter(out, oc, st.removed)
            if P:
                # pagination: slice the page ON DEVICE, skip the wire meta
                # (the (Q, P) raw slice is already the bounded fetch)
                out = out[:, : min(P, out.shape[1])]
                md = None
                for a in (out, oc, need):
                    a.copy_to_host_async()
            else:
                md = qe._JIT_WIRE_META(out, oc)
                for a in (oc, need, md):
                    a.copy_to_host_async()
            pend.append((bi, len(queries), qk, kv, out, oc, need, md))
            if len(pend) > depth:
                harvest(pend.popleft())
        while pend:
            harvest(pend.popleft())

        # deferred exact re-serves, cross-stream, largest level first
        overrides: Dict[int, Dict[int, np.ndarray]] = {}
        longs.sort(key=lambda t: -t[4])
        while longs:
            lv = self._level_for(longs[0][4], st)
            K = max(t[2].shape[0] for t in longs)
            qb = max(1, qe._RESERVE_BUDGET // (K * lv))
            batch, longs = longs[:qb], longs[qb:]
            B = qe._round_up(len(batch), 8)
            bq = np.zeros((B, K, W + 1), dtype=np.uint32)
            bkv = np.zeros(B, dtype=np.int32)
            for j, t in enumerate(batch):
                bq[j, : t[2].shape[0]] = t[2]
                bkv[j] = t[3]
            o2, c2, _ = self._boolean_dispatch(st, lv, bq, jnp.asarray(bkv), op)
            if filter_removed:
                o2, c2 = self._filter(o2, c2, st.removed)
            md2 = qe._JIT_WIRE_META(o2, c2)
            c2, md2 = jax.device_get((c2, md2))
            o2 = self._fetch_trimmed(o2, c2, md2)
            for j, t in enumerate(batch):
                overrides.setdefault(t[0], {})[t[1]] = o2[j, : c2[j]].copy()

        results = []
        for bi in range(len(batches)):
            nq, out_h, oc_h = fetched[bi]
            if nq == 0:
                if P:
                    results.append((np.zeros(0, np.uint32),
                                    np.zeros(1, np.int64),
                                    np.zeros(0, np.int64)))
                elif columnar:
                    results.append(
                        (np.zeros(0, np.uint32), np.zeros(1, np.int64)))
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
                vals, voffs = qe._rows_to_columnar(rows)
                results.append((vals, voffs, counts))
                continue
            rows = [
                ovr[i] if i in ovr else out_h[i, : oc_h[i]].copy()
                for i in range(nq)
            ]
            results.append(qe._rows_to_columnar(rows) if columnar else rows)
        return results

    # -- prefix search / range read ---------------------------------------

    def prefix_search(self, prefixes: Sequence[bytes]) -> Dict[bytes, np.ndarray]:
        """Mesh PrefixSearch across both tiers (values sorted unique;
        unmatched prefixes absent). Like the single-chip engine and the
        reference, prefix results are NOT tombstone-filtered (reads don't
        filter; only merge purges)."""
        st = self._state
        out = pm.sharded_prefix_search(st.snap, prefixes, L=self.L)
        if st.delta is not None:
            for p, v in pm.sharded_prefix_search(
                st.delta, prefixes, L=self.L
            ).items():
                out[p] = np.union1d(out[p], v) if p in out else v
        return out

    def read_range(self, min_term: Optional[bytes] = None,
                   max_term: Optional[bytes] = None):
        """Globally sorted (term, values) stream over the mesh snapshot
        pair, [min,max] inclusive; two tiers merge-join by term with value
        union on ties (types.go:14-22 semantics)."""
        st = self._state
        main = pm.sharded_read_range(st.snap, min_term, max_term, L=self.L)
        if st.delta is None:
            yield from main
            return
        dl = pm.sharded_read_range(st.delta, min_term, max_term, L=self.L)
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
