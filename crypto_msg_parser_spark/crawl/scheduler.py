"""Deterministic per-host politeness scheduler (north_rule; SURVEY §7.3).

Spec (engine-defined, since the reference's sibling crawler is not vendored;
this file is the normative definition and crawl/oracle_sim.py is its
single-threaded executable oracle):

  - work unit: one canonicalized URL with (host, priority, budget)
  - per-host service order: (priority ASC, url_hash ASC, url ASC) — total,
    deterministic, independent of arrival order and parallelism
  - politeness: host h may be visited at most budget(h) times per epoch
    (epoch = one rate window, e.g. a minute)
  - epoch assignment: the r-th URL of a host (1-based) runs in epoch
    (r-1) // budget(h)
  - global visit sequence: sort by (epoch ASC, host ASC, in_host_rank ASC)

Determinism under parallelism comes from scheduling by *logical epoch*, not
wall clock: any cluster size produces the identical (epoch, host, rank)
triple per URL, hence the identical visit sequence.

Physical layout (the scale story): frontier state lives BUCKETED by
`rank_bucket` — the top bits of the canonical-url hash (in Iceberg:
`bucket(N, url_hash)` partition transform). Because the bucket is

  (a) a pure function of url_hash, and
  (b) a subset of every downstream clustering key,

one stored partitioning is reused by ALL steady-state stages with zero
exchanges: the ranking window clusters on (host, priority, rank_bucket) ⊇
{rank_bucket}; the seen-set anti-join adds rank_bucket to its join key so
both sides are co-partitioned (frontier.py). The only shuffled data in the
whole scheduler is a hosts×priorities×buckets count table (KBs). At 10^10
URLs the shuffle that would otherwise dominate simply does not exist; the
bucket count (N_RANK_BUCKETS) only has to keep single-bucket row counts
inside an executor's memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from crypto_msg_parser_spark.crawl.canonicalize import canonical_url
from crypto_msg_parser_spark.functions.scalar import stable_hash64


N_RANK_BUCKETS = 1024  # hash-range buckets (Iceberg bucket(N) stand-in)
_BUCKET_SHIFT = 60 - 10  # stable_hash64 is 60-bit; top 10 bits -> 1024


def prepare_frontier(frontier: DataFrame) -> DataFrame:
    """Attach (canonical, url_hash, rank_bucket) once, at frontier ingest.
    In a real deployment the frontier is materialized state (an Iceberg
    table bucketed by rank_bucket), so canonicalization cost is paid exactly
    once per discovered URL — never re-derived by downstream stages."""
    from crypto_msg_parser_spark.crawl.canonicalize import canonicalize_df

    return (
        canonicalize_df(frontier, "url", "canonical")
        .withColumn("url_hash", stable_hash64(F.col("canonical")))
        .withColumn("rank_bucket", F.shiftright(F.col("url_hash"), _BUCKET_SHIFT))
    )


def bucketize(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Materialization layout: hash-cluster on rank_bucket (the sandbox
    stand-in for writing an Iceberg table with a bucket(N, url_hash)
    partition spec). Downstream ranking windows and seen-set joins then
    plan with ZERO exchanges (their clustering keys contain rank_bucket)."""
    if partitions:
        return df.repartition(partitions, "rank_bucket")
    return df.repartition("rank_bucket")


def schedule(frontier: DataFrame) -> DataFrame:
    """frontier(url, host, priority, rate_budget_per_min, ...) ->
    + (canonical, url_hash, in_host_rank, epoch).

    The returned (epoch, host, in_host_rank) is the total visit order.

    Ranking is two-level so one mega-host (binance) never serializes on a
    single partition: url_hash's range is cut into N_RANK_BUCKETS ordered
    buckets; row_number runs per (host, priority, bucket) — and because the
    frontier is stored bucketed on rank_bucket, this window needs NO
    exchange, only a per-partition sort. The exact per-host rank is
    recovered by adding broadcast cumulative bucket offsets (a tiny
    hosts×priorities×buckets count table — the only shuffle here).
    Identical output to a single per-host window (asserted against the
    oracle simulator)."""
    if "url_hash" not in frontier.columns:
        frontier = prepare_frontier(frontier)
    base = (
        frontier
        if "rank_bucket" in frontier.columns
        else frontier.withColumn(
            "rank_bucket", F.shiftright(F.col("url_hash"), _BUCKET_SHIFT)
        )
    )
    w_local = W.partitionBy("host", "priority", "rank_bucket").orderBy(
        "url_hash", "canonical"
    )
    ranked = base.withColumn("local_rank", F.row_number().over(w_local))
    # tiny side table: cumulative URL counts of all earlier (priority,
    # bucket) groups within the host
    w_off = (
        W.partitionBy("host")
        .orderBy("priority", "rank_bucket")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("host", "priority", "rank_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("offset", F.coalesce(F.sum("n").over(w_off), F.lit(0)))
        .drop("n")
    )
    # broadcast contract (kept deliberately while the unbounded-side hints
    # were purged from dedup/corpus in round 3): offsets has one row per
    # (host, priority, rank_bucket) combination, and the HOST universe here
    # is the exchange API endpoints of SURVEY §1.6 — dozens of hosts, not
    # the open web — so the table is ≤ hosts × 3 × 1024 rows (KBs) at ANY
    # frontier size. A general-web deployment with 10^6+ hosts must drop
    # the hint (AQE) or pre-aggregate per host-shard.
    return (
        ranked.join(F.broadcast(offsets), ["host", "priority", "rank_bucket"])
        .withColumn("in_host_rank", (F.col("offset") + F.col("local_rank")).cast("int"))
        .withColumn(
            "epoch",
            F.floor((F.col("in_host_rank") - 1) / F.col("rate_budget_per_min")).cast(
                "long"
            ),
        )
        .drop("local_rank", "offset")
    )


def visit_sequence(frontier: DataFrame) -> DataFrame:
    """Globally ordered visit sequence (collect-free; ordering is encoded in
    the sort key, materialized only when written)."""
    return schedule(frontier).drop("rank_bucket").orderBy(
        "epoch", "host", "in_host_rank"
    )
