"""Numpy-backed Bloom filters for the frontier seen-set prefilter.

ONE FILTER PER STORAGE BUCKET, never a global one: at the 10^10-URL design
point a single fpp=0.01 filter is a ~12 GB bit array — a driver-side
scale-killer. Instead each `rank_bucket` (the Iceberg bucket(N, url_hash)
partition of the seen table) folds its own hashes into a small filter
executor-side (groupBy(rank_bucket).applyInPandas — vectorized numpy,
double hashing g_i = h1 + i*h2 mod m), the filters live as rows of a
(bucket, m, k, bits) DataFrame, and membership is applied partition-locally
by cogrouping the frontier with the filter table on rank_bucket. No single
allocation anywhere is larger than one bucket's filter (~total/N), and the
driver never materializes any bits. On an Iceberg deployment this entire
layer is the table's write.parquet.bloom-filter-enabled property (SURVEY
§4); this is the in-process equivalent with the same per-bucket layout.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


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

    @classmethod
    def from_state(cls, m: int, k: int, bits: bytes) -> "Bloom":
        b = cls.__new__(cls)
        b.m, b.k = int(m), int(k)
        b.bits = np.frombuffer(bits, dtype=np.uint8).copy()
        return b


BLOOM_TABLE_SCHEMA = "rank_bucket long, n long, m long, k long, bits binary"


def build_bloom_buckets(
    seen_df,
    bucket_col: str = "rank_bucket",
    hash_col: str = "url_hash",
    fpp: float = 0.01,
):
    """One Bloom filter per storage bucket, built entirely executor-side.

    Returns a DataFrame (rank_bucket, n, m, k, bits): each task folds one
    bucket's hashes into a filter sized to THAT bucket's cardinality, so
    memory per task is ~(total bits / n_buckets) regardless of seen-set
    size, and nothing is collected to the driver."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        b = Bloom(max(n, 1000), fpp)
        b.add(pdf[hash_col].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {
                bucket_col: [int(pdf[bucket_col].iloc[0])],
                "n": [n],
                "m": [b.m],
                "k": [b.k],
                "bits": [b.bits.tobytes()],
            }
        )

    schema = f"{bucket_col} long, n long, m long, k long, bits binary"
    return (
        seen_df.select(bucket_col, hash_col)
        .groupBy(bucket_col)
        .applyInPandas(fold, schema)
    )
