"""Command-driven testing machine over one Shard.

Reproduction of the reference's declarative test fixture
(/root/reference/helper_test.go:13-103): scenario scripts that assert both the
logical index contents (via a full Read(nil,nil) dump compared against a
dict-of-lists oracle) and the physical on-disk segment count.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Dict, List

import numpy as np

from inverted_index_2_tpu import Shard, to_slice
from inverted_index_2_tpu.segment import formats


@dataclass
class IngestBulk:
    """value -> terms map; one Put per value (helper_test.go IngestBulkCmd)."""

    docs: Dict[int, List[bytes]]


@dataclass
class Compare:
    """Expected full term -> values dump (helper_test.go CompareCmd)."""

    expected: Dict[bytes, List[int]]


@dataclass
class Merge:
    """[req_count, m_count, expected_merged]; expected < 0 skips the assert."""

    req: int
    m: int
    expected: int = -1


@dataclass
class Remove:
    values: List[int]


@dataclass
class CountSegments:
    """Counts `*_dict` files physically on disk (helper_test.go:40-53)."""

    expected: int


@dataclass
class Check:
    fn: Callable[[Shard], None]


class Machine:
    def __init__(self, tmpdir: str):
        self.dir = os.path.join(str(tmpdir), "shard")
        self.shard = Shard(self.dir)

    def run(self, sequence):
        for cmd in sequence:
            self.run_one(cmd)

    def run_one(self, cmd):
        if isinstance(cmd, IngestBulk):
            for value, terms in cmd.docs.items():
                self.shard.put(list(terms), value)
        elif isinstance(cmd, Compare):
            got = {tv.term: tv.values.tolist() for tv in to_slice(self.shard.read(None, None))}
            want = {t: sorted(v) for t, v in cmd.expected.items()}
            assert got == want, f"logical mismatch: got={got} want={want}"
        elif isinstance(cmd, Merge):
            merged = self.shard.merge(cmd.req, cmd.m)
            if cmd.expected >= 0:
                assert merged == cmd.expected, f"merged {merged}, want {cmd.expected}"
        elif isinstance(cmd, Remove):
            self.shard.remove(np.asarray(cmd.values, dtype=np.uint32))
        elif isinstance(cmd, CountSegments):
            c = sum(
                1
                for n in os.listdir(self.dir)
                if formats.is_dict_file(n) and not n.endswith(formats.TMP_SUFFIX)
            )
            assert c == cmd.expected, f"{c} segments on disk, want {cmd.expected}"
        elif isinstance(cmd, Check):
            cmd.fn(self.shard)
        else:
            raise TypeError(f"unknown command {cmd!r}")

    def close(self):
        self.shard.close()
