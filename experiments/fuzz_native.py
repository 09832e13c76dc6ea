"""ASAN fuzz harness for the native codec (round 5).

Build the sanitized lib and run this under ASAN:

    g++ -O1 -g -march=native -std=c++17 -fPIC -fsanitize=address \
        -fno-omit-frame-pointer -shared -o /tmp/tpi_asan/libtpicodec.so \
        native/codec.cpp
    LD_PRELOAD=$(gcc -print-file-name=libasan.so) \
        ASAN_OPTIONS=detect_leaks=0 TPI_NATIVE_DIR=/tmp/tpi_asan \
        python experiments/fuzz_native.py

Dict-of-sets oracle over tpi_boolean_serve (AND/OR, tombstones, misses,
empty lists) plus a decode round-trip, with adversarial shapes: heavy
cross-list overlap, all-CONSECUTIVE lists (bit-width-0 blocks), and random
sparse lists. This harness caught the r5 encoder bug: a final b==0 block
has zero packed words but the delta loop still read-modify-wrote
`packed[0] |= 0` one word past the allocation (codec.cpp
tpi_encode_bulk_fill) — heap-neighbor lost-update race, page-fault risk on
mmap-backed arrays, and the plausible root cause of one-in-a-full-suite
interpreter segfaults observed before the fix.
"""
import sys

import numpy as np

from inverted_index_2_tpu.codec import native, packing


def main(iters: int = 1200) -> None:
    assert native.available(), "native codec not built"
    rng = np.random.default_rng(0)

    def enc(vals):
        v = np.asarray(sorted(set(vals)), dtype=np.uint32)
        voffs = np.array([0, len(v)], dtype=np.int64)
        words, _ = packing.encode_bulk(v, voffs, byte_align=2)
        return words, v

    def gen_tier(nl, big):
        lists, words_parts, offs = [], [], []
        pos = 0
        for _ in range(nl):
            # `big` rounds stress the 16-lane bitonic merge levels + the
            # fused final merge_dedupe_out (config-3 lists are ~1k-5k;
            # short lists never leave the scalar heads/tails)
            n = int(rng.integers(0, 5000 if big else 300))
            r = rng.random()
            if r < 0.25:
                base = rng.integers(0, max(2 * n, 50), size=n)  # overlap
            elif r < 0.45:
                start = int(rng.integers(0, 1000))
                base = np.arange(start, start + n)        # b=0 blocks
            else:
                base = rng.integers(0, 100000, size=n)
            w, v = enc(base)
            lists.append(set(v.tolist()))
            words_parts.append(w)
            offs.append(pos)
            pos += len(w)
        words = (np.concatenate(words_parts) if words_parts
                 else np.zeros(0, np.uint32))
        return lists, words, offs

    for it in range(iters):
        big = rng.random() < 0.3
        nl = int(rng.integers(1, 9))
        lists, words, offs = gen_tier(nl, big)
        # dual (delta) tier on half the rounds: per-term union BEFORE the
        # set op — the serve path the single-tier fuzz never touched
        dual = rng.random() < 0.5
        if dual:
            lists2, words2, offs2 = gen_tier(nl, big)
        Q = int(rng.integers(1, 12))
        s1, s2, koffs, picks = [], [], [0], []
        for _ in range(Q):
            k = int(rng.integers(0, 9))
            qp = []
            for _ in range(k):
                if rng.random() < 0.15:
                    s1.append(-1)
                    s2.append(-1)
                    qp.append(None)                       # miss
                else:
                    li = int(rng.integers(0, nl))
                    # a term can live in one tier, the other, or both
                    # (delta-only terms are FOUND: miss = both tiers -1)
                    hit2 = dual and rng.random() < 0.7
                    hit1 = (not hit2) or rng.random() < 0.7
                    s1.append(offs[li] if hit1 else -1)
                    s2.append(offs2[li] if hit2 else -1)
                    qp.append((li, hit1, hit2))
            koffs.append(len(s1))
            picks.append(qp)
        removed = None
        if rng.random() < 0.5:
            removed = np.unique(rng.integers(
                0, 100000, size=int(rng.integers(0, 30)))).astype(np.uint32)
        for is_or in (False, True):
            vals, voffs2 = native.boolean_serve(
                words, np.array(s1, dtype=np.int64),
                words2 if dual else None,
                np.array(s2, dtype=np.int64) if dual else None,
                np.array(koffs, dtype=np.int64), removed, is_or)
            for q, qp in enumerate(picks):
                got = vals[voffs2[q]:voffs2[q + 1]].tolist()
                sets = []
                for e in qp:
                    if e is None:
                        sets.append(set())
                        continue
                    li, hit1, hit2 = e
                    sets.append((lists[li] if hit1 else set())
                                | (lists2[li] if hit2 else set()))
                if not sets:
                    want = set()
                elif is_or:
                    want = set().union(*sets)
                else:
                    want = (set.intersection(*sets)
                            if all(e is not None for e in qp) else set())
                if removed is not None:
                    want -= set(removed.tolist())
                assert got == sorted(want), (it, q, is_or)
        outs = np.array(offs, dtype=np.int64)
        dv, _, doffs = native.decode_bulk(words, outs)
        for li, s in enumerate(lists):
            assert dv[doffs[li]:doffs[li + 1]].tolist() == sorted(s), (it, li)
    print(f"fuzz: {iters} iterations bit-exact, no ASAN reports")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1200)
