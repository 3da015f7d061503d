"""Cuckoo-filter seen-set layer: membership, deletion (the capability the
Bloom layer lacks), false-positive bound, and the per-bucket Spark
build/update path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from crypto_msg_parser_spark.crawl.cuckoo import (
    Cuckoo,
    build_cuckoo_buckets,
    cuckoo_update_buckets,
)


def _hashes(n, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(1, 1 << 60, size=n, dtype=np.int64)


def test_no_false_negatives_and_bounded_fpp():
    keys = _hashes(5000)
    c = Cuckoo(len(keys))
    c.insert(keys)
    assert c.might_contain(keys).all()  # every inserted key answers yes
    probes = _hashes(20000, seed=99)
    fresh = probes[~np.isin(probes, keys)]
    fpp = c.might_contain(fresh).mean()
    # 12-bit fingerprints, 2x4 candidate slots: theoretical fpp ~ 8/2^12
    assert fpp < 0.01, fpp


def test_delete_forgets_only_the_deleted():
    keys = _hashes(2000)
    c = Cuckoo(len(keys))
    c.insert(keys)
    gone, kept = keys[:500], keys[500:]
    assert c.delete(gone) == 500
    assert c.might_contain(kept).all()  # untouched keys still present
    # deleted keys answer no (barring fp collisions with surviving keys)
    assert c.might_contain(gone).mean() < 0.02


def test_state_roundtrip():
    keys = _hashes(300)
    c = Cuckoo(len(keys))
    c.insert(keys)
    c2 = Cuckoo.from_state(*c.to_state())
    assert c2.might_contain(keys).all()
    assert (c2.table == c.table).all()


def test_per_bucket_build_and_update(spark):
    df = spark.range(4000).select(
        (F.col("id") % 8).alias("rank_bucket"),
        (F.xxhash64("id").bitwiseAND(F.lit((1 << 60) - 1))).alias("url_hash"),
    )
    filters = build_cuckoo_buckets(df)
    rows = filters.collect()
    assert len(rows) == 8  # one filter per storage bucket
    per_bucket = {
        r["rank_bucket"]: r["count"]
        for r in df.groupBy("rank_bucket").count().collect()
    }
    for r in rows:
        assert r["n"] == per_bucket[r["rank_bucket"]]

    # retire half of bucket 3's URLs partition-locally
    retired = df.filter((F.col("rank_bucket") == 3) & (F.col("url_hash") % 2 == 0))
    updated = cuckoo_update_buckets(filters, retired)
    u3 = [r for r in updated.collect() if r["rank_bucket"] == 3][0]
    kept = df.filter(
        (F.col("rank_bucket") == 3) & (F.col("url_hash") % 2 == 1)
    ).collect()
    c = Cuckoo.from_state(u3["m"], u3["table"], u3["overflow"])
    assert c.might_contain(
        np.array([r["url_hash"] for r in kept], dtype=np.int64)
    ).all()
    assert u3["n"] == per_bucket[3] - retired.count()
