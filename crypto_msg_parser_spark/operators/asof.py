"""As-of and range joins over the `events` stream table.

The reference orders heterogeneous message streams by timestamp for its
consumers (compact Ord impls, crypto-message/src/compact/message.rs:359-514,
SURVEY §2.6); as-of joins between streams are the relational realization.

Spark has no native as-of join; the engine implements it as the
union-and-carry pattern: tag both sides, sort within user partitions by
event time, and carry the last left-side row forward with
last(..., ignorenulls) — ONE shuffle on the partition key, no range
explosion, unbounded-scale friendly (this is also how the streaming variant
works with applyInPandasWithState). The oracle is DuckDB's native ASOF JOIN.

The range join is implemented with time-bucket candidate pruning (equi-join
on (user, bucket) over two adjacent 10-minute buckets, then the exact range
filter) — the inequality-join-as-equi-join trick that keeps it a hash join
at scale. The oracle is the naive inequality join.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from crypto_msg_parser_spark.registry import query
from crypto_msg_parser_spark.sources.testdata import load_table

RANGE_SECONDS = 600


@query(
    "asof_join_purchase_view",
    oracle="""
    WITH views AS (
      SELECT user_id, ts AS view_ts, max(event_id) AS view_event_id
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts,
           v.view_event_id, v.view_ts
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.view_ts
    """,
    doc="as-of join: for each purchase, the latest view at-or-before it per "
    "user. Spark: union-and-carry (single shuffle); oracle: native ASOF.",
)
def asof_join_purchase_view(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # dedup views to one row per (user, ts) so the as-of match is unique
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("view_ts"))
        .agg(F.max("event_id").alias("view_event_id"))
        .select(
            "user_id",
            F.col("view_ts").alias("ts"),
            F.lit(0).alias("is_right"),
            F.lit(None).cast("long").alias("event_id"),
            F.struct(F.col("view_event_id"), F.col("view_ts")).alias("v"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_right"),
        "event_id",
        F.lit(None)
        .cast("struct<view_event_id:bigint,view_ts:timestamp>")
        .alias("v"),
    )
    # views sort before purchases at equal ts (is_right asc) => ts >= view_ts
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_right")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = views.unionByName(purchases).withColumn(
        "last_v", F.last("v", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("is_right") == 1).select(
        "event_id",
        "user_id",
        "ts",
        F.col("last_v.view_event_id").alias("view_event_id"),
        F.col("last_v.view_ts").alias("view_ts"),
    )


@query(
    "range_join_error_follow",
    oracle=f"""
    SELECT e.event_id, count(x.event_id) AS n_follow
    FROM events e
    LEFT JOIN events x
      ON x.user_id = e.user_id
     AND x.ts >  e.ts
     AND x.ts <= e.ts + INTERVAL {RANGE_SECONDS} SECOND
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
    doc="range join: events within 10 min after each error, same user. "
    "Spark: bucketed equi-join candidates + exact filter (hash join at "
    "scale); oracle: naive inequality join.",
)
def range_join_error_follow(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.unix_timestamp(F.col("ts")) / RANGE_SECONDS).cast("long")
    errs = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", bucket.alias("b")
    )
    # candidate buckets: an event within (ts, ts+600s] lies in bucket b or b+1
    errs_x = errs.select(
        "event_id",
        "user_id",
        "ts",
        F.explode(F.array(F.col("b"), F.col("b") + 1)).alias("bucket"),
    )
    all_ev = ev.select(
        F.col("user_id").alias("x_user"),
        F.col("ts").alias("x_ts"),
        F.col("event_id").alias("x_id"),
        bucket.alias("bucket"),
    )
    matches = (
        errs_x.join(
            all_ev,
            (errs_x.bucket == all_ev.bucket) & (errs_x.user_id == all_ev.x_user),
        )
        .filter(
            (F.col("x_ts") > F.col("ts"))
            & (
                F.col("x_ts")
                <= F.col("ts") + F.expr(f"INTERVAL {RANGE_SECONDS} SECONDS")
            )
        )
        # each candidate event lies in exactly one bucket, so no double count
        .groupBy("event_id")
        .agg(F.count("x_id").alias("n_follow"))
    )
    return (
        errs.select("event_id")
        .join(matches, "event_id", "left")
        .select(
            "event_id", F.coalesce(F.col("n_follow"), F.lit(0)).alias("n_follow")
        )
    )
