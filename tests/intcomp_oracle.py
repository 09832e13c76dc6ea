"""Test-only size oracle for the reference's posting codec
(`ronanh/intcomp` CompressUint32 — /root/reference/file/writer.go:49).

The dependency's Go source is not present in the reference snapshot (go.mod
pin only), so this reconstructs its documented scheme — delta encoding +
binary bit-packing in 128-value blocks, FastPFOR-family — at the wire-size
level:

    per full block of 128 deltas:  1 header word (bit width etc.)
                                   + ceil(128*b/32) packed words,
                                   b = bit width of the block's largest
                                   PLAIN delta (first delta is vs. the
                                   previous block's last value; 0 for the
                                   stream head)
    tail block of t < 128 deltas:  1 header word + ceil(t*b/32) words
    stream framing:                1 length word

Assumptions documented rather than guessed: no trailing-zero factoring, no
exception patching (both would only SHRINK some adversarial inputs; the
contract test in test_packing.py therefore also checks those inputs with a
generous margin note). This oracle intentionally has LESS per-list overhead
than our layout (we store a count word and delta-1 blocks with stored
n_blk), making the <=10% bound conservative.
"""
import numpy as np


def intcomp_size_bytes(values: np.ndarray) -> int:
    """Wire size (bytes) of one sorted-unique uint32 list under the model."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    words = 1  # stream length word
    prev = np.uint64(0)
    for s in range(0, max(n, 1), 128):
        blk = v[s : s + 128]
        if len(blk) == 0:
            break
        d = np.diff(np.concatenate([[prev], blk]))
        b = int(int(d.max()).bit_length()) if len(d) else 0
        words += 1 + (len(blk) * b + 31) // 32
        prev = blk[-1]
    return words * 4


def bulk_intcomp_size_bytes(values: np.ndarray, voffs: np.ndarray) -> int:
    """Aggregate model size of per-term lists (the reference compresses each
    term's list independently, writer.go:43-56)."""
    total = 0
    for i in range(len(voffs) - 1):
        total += intcomp_size_bytes(values[voffs[i] : voffs[i + 1]])
    return total
