"""Numpy-backed Bloom filter for the frontier seen-set prefilter.

Built distributed: each partition folds its hashes into a local bit array
(vectorized numpy, double hashing g_i = h1 + i*h2 mod m), partial arrays are
OR-merged on the driver (a Bloom filter is a commutative monoid, so this is
a treeReduce-shaped aggregation — the same shape Spark's Scala
stat.bloomFilter uses; PySpark 4 no longer exposes it, hence this).
Membership is applied executor-side through an Arrow-vectorized pandas UDF.
"""

from __future__ import annotations

import math

import numpy as np


class Bloom:
    def __init__(self, n_items: int, fpp: float = 0.01):
        m = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
        self.m = ((m + 63) // 64) * 64
        self.k = max(1, round(self.m / max(n_items, 1) * math.log(2)))
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes.astype(np.uint64)
        h2 = (h1 >> np.uint64(17)) | np.uint64(1)  # odd => full-period stride
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def add(self, hashes: np.ndarray) -> "Bloom":
        pos = self._positions(np.asarray(hashes, dtype=np.int64)).ravel()
        np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        return self

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(hashes, dtype=np.int64))
        present = (self.bits[pos // 8] & (1 << (pos % 8)).astype(np.uint8)) != 0
        return present.all(axis=0)

    def merge(self, other: "Bloom") -> "Bloom":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self


def build_bloom(seen_df, hash_col: str = "url_hash", fpp: float = 0.01) -> Bloom:
    """Distributed build: per-partition numpy fold, OR-merge of partials."""
    n = seen_df.count()
    m, k = Bloom(max(n, 1000), fpp).m, Bloom(max(n, 1000), fpp).k

    def fold(it):
        b = Bloom(max(n, 1000), fpp)
        assert (b.m, b.k) == (m, k)
        vals = [row[0] for row in it]
        if vals:
            b.add(np.array(vals, dtype=np.int64))
        yield b.bits

    partials = seen_df.select(hash_col).rdd.mapPartitions(fold).collect()
    out = Bloom(max(n, 1000), fpp)
    for bits in partials:
        out.bits |= bits
    return out
