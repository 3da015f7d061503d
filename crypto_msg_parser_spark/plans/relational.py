"""Relational operator coverage (SURVEY.md §2.4-2.7).

The reference has no relational engine — its three dictionary lookups become
broadcast hash joins (SURVEY §2.4) and its time-ordering contract becomes
window functions (§2.6). This module exercises every relational operator the
engine exposes, over the driver's TPC-H-ish testdata, each with a DuckDB
oracle.

Scale notes (100 TB design points), also asserted by tests/test_plans.py:
- dimension joins (region/nation/part/supplier) are explicitly broadcast;
- fact-fact joins shuffle on their join key only after filters prune;
- aggregates are partial (map-side combine) by construction of groupBy.agg;
- window functions partition on high-cardinality keys (suppkey/user_id) so
  state per partition stays bounded.

Float determinism: money aggregates use exact integer minor-unit arithmetic
(plans/money.py) so the DuckDB oracle hash matches bit-for-bit regardless of
summation order.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from crypto_msg_parser_spark.plans.money import cents, pct
from crypto_msg_parser_spark.registry import query
from crypto_msg_parser_spark.session import finalize_memory_sink
from crypto_msg_parser_spark.sources.testdata import load_table

# exact integer-cents building blocks, shared across queries (lazy: Column
# construction requires an active SparkContext)
def _price_cents():
    return cents(F.col("l_extendedprice"))


def _disc_pct():
    return pct(F.col("l_discount"))


def _tax_pct():
    return pct(F.col("l_tax"))


def _rev_e4():
    # revenue in 1e-4 units: cents * (100 - disc_pct) — exact BIGINT
    return _price_cents() * (F.lit(100) - _disc_pct())
_SQL_PRICE_CENTS = "CAST(round(l_extendedprice * 100) AS BIGINT)"
_SQL_DISC_PCT = "CAST(round(l_discount * 100) AS BIGINT)"
_SQL_TAX_PCT = "CAST(round(l_tax * 100) AS BIGINT)"
_SQL_REV_E4 = f"{_SQL_PRICE_CENTS} * (100 - {_SQL_DISC_PCT})"


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                              AS sum_qty,
           sum({_SQL_PRICE_CENTS}) / 100.0              AS sum_base_price,
           sum({_SQL_REV_E4}) / 10000.0                 AS sum_disc_price,
           sum({_SQL_REV_E4} * (100 + {_SQL_TAX_PCT})) / 1000000.0 AS sum_charge,
           sum(l_quantity) / count(*)                   AS avg_qty,
           (sum({_SQL_PRICE_CENTS}) / 100.0) / count(*) AS avg_price,
           (sum({_SQL_DISC_PCT}) / 100.0) / count(*)    AS avg_disc,
           count(*)                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan -> filter (pushed to parquet) -> partial+final "
    "agg; money sums in exact integer minor units (plans/money.py).",
)
def q1_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(_price_cents()) / 100.0).alias("sum_base_price"),
            (F.sum(_rev_e4()) / 10000.0).alias("sum_disc_price"),
            (F.sum(_rev_e4() * (F.lit(100) + _tax_pct())) / 1000000.0).alias("sum_charge"),
            (F.sum("l_quantity") / n).alias("avg_qty"),
            ((F.sum(_price_cents()) / 100.0) / n).alias("avg_price"),
            ((F.sum(_disc_pct()) / 100.0) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           sum({_SQL_REV_E4}) / 10000.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: filtered 3-way join -> agg -> total-order topN "
    "(tie-broken by key so LIMIT is deterministic across engines).",
)
def q3_shipping_priority(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(_rev_e4()) / 10000.0).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name, sum({_SQL_REV_E4}) / 10000.0 AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: star join; nation/region/supplier broadcast, "
    "customer-orders-lineitem shuffle on keys.",
)
def q5_region_revenue(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(_rev_e4()) / 10000.0).alias("revenue"))
    )


@query(
    "join_broadcast_dim",
    oracle=f"""
    SELECT p_brand, count(*) AS n_items,
           sum({_SQL_PRICE_CENTS}) / 100.0 AS brand_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 20
    GROUP BY p_brand
    """,
    doc="Broadcast hash join of a fact table with a filtered small dim — the "
    "Spark realization of the reference's dictionary lookups (SURVEY §2.4).",
)
def join_broadcast_dim(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(_price_cents()) / 100.0).alias("brand_revenue"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > TIMESTAMP '2000-01-01')
    GROUP BY o_orderstatus
    """,
    doc="left_semi join (EXISTS).",
)
def join_semi(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01").cast("timestamp")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    doc="left_anti join (NOT EXISTS) — the frontier seen-set primitive.",
)
def join_anti(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_outer_coalesce",
    oracle="""
    SELECT n_name, count(o_orderkey) AS n_orders,
           coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0) / 100.0
             AS total_spend
    FROM nation
      LEFT JOIN customer ON c_nationkey = n_nationkey
      LEFT JOIN orders   ON o_custkey = c_custkey
    GROUP BY n_name
    """,
    doc="left outer joins with null-tolerant aggregation.",
)
def join_outer_coalesce(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        F.broadcast(n)
        .join(c, n.n_nationkey == c.c_nationkey, "left")
        .join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (
                F.coalesce(F.sum(cents(F.col("o_totalprice"))), F.lit(0)) / 100.0
            ).alias("total_spend"),
        )
    )


@query(
    "window_running_sum",
    oracle=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           sum({_SQL_REV_E4})
             OVER (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 10000.0
             AS running_revenue
    FROM lineitem
    WHERE l_suppkey <= 10
    """,
    doc="Running aggregate over an event-ordered window (SURVEY §2.6 stream "
    "time-ordering); ORDER BY is made total with the line identity keys.",
)
def window_running_sum(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(_rev_e4()).over(w) / 10000.0).alias("running_revenue"),
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_suppkey
                                ORDER BY l_extendedprice DESC,
                                         l_orderkey, l_linenumber) AS rn
      FROM lineitem)
    WHERE rn <= 3
    """,
    doc="top-k per group via row_number (the L2TopK recomputation shape, "
    "SURVEY §2.6 ranking).",
)
def window_topk_per_group(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_gap",
    oracle="""
    SELECT user_id, count(*) AS n_gaps
    FROM (
      SELECT user_id,
             epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)) AS gap_s
      FROM events)
    WHERE gap_s > 3600
    GROUP BY user_id
    """,
    doc="lag + gap detection — the seq_id/prev_seq_id chaining shape "
    "(SURVEY §2.6; binance pu, deribit change_id).",
)
def window_lag_gap(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        ev.select("user_id", gap.alias("gap_s"))
        .filter(F.col("gap_s") > 3600)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
    )


@query(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           sum(l_quantity) AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="hierarchical rollup aggregation (quantities are integer-valued "
    "doubles, so the sum is exact in both engines).",
)
def rollup_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty")
    )


@query(
    "cube_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="cube aggregation.",
)
def cube_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END) AS qty_o,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END) AS qty_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="pivot (expressed as conditional aggregation for engine parity).",
)
def pivot_status(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(
            F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0)
        ).alias("qty_o"),
        F.sum(
            F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0)
        ).alias("qty_f"),
    )


@query(
    "set_ops",
    oracle="""
    SELECT 'both' AS which, n_nationkey
    FROM (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
          INTERSECT
          SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS which, n_nationkey
    FROM (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
          EXCEPT
          SELECT DISTINCT s_nationkey FROM supplier)
    """,
    doc="intersect / except / union set operators (SURVEY §2.7).",
)
def set_ops(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    ).distinct()
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    ).distinct()
    both = c.intersect(s).select(F.lit("both").alias("which"), "n_nationkey")
    only = c.exceptAll(s).select(
        F.lit("customer_only").alias("which"), "n_nationkey"
    )
    return both.unionByName(only)


@query(
    "distinct_count",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="exact distinct aggregation (frontier-cardinality metrics use "
    "approx_count_distinct at 10^10 scale; exact here for oracle parity).",
)
def distinct_count(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
    doc="global total-order topN (Spark executes as per-partition topN + "
    "merge, no full sort).",
)
def sort_limit(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(15)
    )


@query(
    "events_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="tumbling event-time window aggregation (batch twin of the "
    "Structured Streaming job in streaming/jobs.py).",
)
def events_tumbling_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(cents(F.col("value"))) / 100.0).alias("total_value"),
    )


@query(
    "events_stream_late_drop",
    oracle="""
    WITH b1 AS (SELECT ts FROM events WHERE event_id % 4 = 1),
    b23 AS (SELECT ts FROM events WHERE event_id % 4 IN (2, 3)),
    b3 AS (SELECT ts - INTERVAL 3 HOUR AS ts FROM events
           WHERE event_id % 4 = 0),
    wm1 AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM b1),
    kept3 AS (SELECT ts FROM b3
              WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR
                    > (SELECT w FROM wm1)),
    allr AS (SELECT ts FROM b1 UNION ALL SELECT ts FROM b23
             UNION ALL SELECT ts FROM kept3),
    wmf AS (SELECT greatest((SELECT max(ts) FROM b1),
                            (SELECT max(ts) FROM b23),
                            (SELECT max(ts) FROM b3))
                   - INTERVAL 1 HOUR AS w),
    agg AS (SELECT date_trunc('hour', ts) AS window_start,
                   CAST(count(*) AS BIGINT) AS n
            FROM allr GROUP BY 1)
    SELECT window_start, n FROM agg
    WHERE window_start + INTERVAL 1 HOUR <= (SELECT w FROM wmf)
    """,
    doc="watermark LATE-DATA semantics as a driver row: the real "
    "Structured Streaming tumbling-count job (1h window, 1h watermark) "
    "drained under Trigger.availableNow over three deterministic "
    "micro-batches — batch 3 carries events shifted 3h into the past. "
    "Spark's late filter LAGS the reported watermark by one batch "
    "(measured on this engine: the filter for batch N uses the watermark "
    "from the end of batch N-2, eviction/emission from the end of batch "
    "N-1), so a two-batch design drops nothing; the third batch is what "
    "makes the late rows actually die. The oracle replays the closed "
    "form: batches 1-2 pass unfiltered, batch-3 rows are dropped when "
    "window_end <= max(batch1) - 1h, and the trailing no-data batch "
    "emits exactly the windows with end <= global max(ts) - 1h "
    "(append mode).",
)
def events_stream_late_drop(spark, sf_dir):
    import glob
    import os
    import shutil
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    b1 = ev.filter(F.col("event_id") % 4 == 1).select("ts")
    b2 = ev.filter((F.col("event_id") % 4).isin(2, 3)).select("ts")
    b3 = ev.filter(F.col("event_id") % 4 == 0).select(
        (F.col("ts") - F.expr("INTERVAL 3 HOURS")).alias("ts")
    )
    src = tempfile.mkdtemp(prefix="late_stream_src_")
    ckpt = tempfile.mkdtemp(prefix="late_stream_ckpt_")
    name = f"late_drop_{uuid.uuid4().hex[:12]}"
    try:
        # three source files with forced mtime order = three micro-batches
        for i, part in enumerate((b1, b2, b3)):
            d = tempfile.mkdtemp(prefix="late_stream_part_")
            part.coalesce(1).write.mode("overwrite").parquet(d)
            (pf,) = glob.glob(f"{d}/part-*.parquet")
            dest = os.path.join(src, f"{i}.parquet")
            shutil.move(pf, dest)
            os.utime(dest, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
            shutil.rmtree(d, ignore_errors=True)
        stream = (
            spark.readStream.schema("ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "n")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return finalize_memory_sink(
        spark.table(name).select("window_start", "n"), name
    )


@query(
    "events_sessionize",
    oracle="""
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM (
      SELECT user_id, ts,
             -- CAST: DuckDB types a bare integer SUM as HUGEINT (int128);
             -- Spark emits BIGINT and the driver's value hash sees the
             -- representation, not just the value
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                         ORDER BY ts, event_id))
                         > 1800
                    OR lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events))
    GROUP BY user_id, session_id
    """,
    doc="sessionization via gap detection + cumulative session counter — "
    "batch twin of F.session_window (30 min gap).",
)
def events_sessionize(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > 1800),
        1,
    ).otherwise(0)
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        ev.select("user_id", "ts", "event_id", is_new.alias("is_new"))
        .select("user_id", "ts", F.sum("is_new").over(wcum).alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON path extraction on a string column — the reference's tolerant "
    "extra-field handling (SURVEY §1.3 extra) as get_json_object.",
)
def events_json_extract(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id)
    SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                     WHEN c.user_id IS NOT NULL THEN 2
                     WHEN v.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS reached_stage
    FROM u
    LEFT JOIN v ON v.user_id = u.user_id
    LEFT JOIN c ON c.user_id = u.user_id
    LEFT JOIN p ON p.user_id = u.user_id
    """,
    doc="ordered funnel conversion (view -> click -> purchase, STRICT "
    "time sequence): per user, the first view, the first click AFTER "
    "that view, the first purchase AFTER that click — the min-after-min "
    "chain, not min-per-type (a user whose only clicks precede every "
    "view must NOT convert; the synthetic events exercise this). Each "
    "stage is one groupBy(user_id) + one equi-join back to the event "
    "stream on the SAME user key — co-partitioned all the way, no "
    "window over the full stream, no per-user event-list collect; a "
    "k-step funnel iterates the same stage shape. Timestamps pass "
    "through untouched (microsecond TimestampType both engines).",
)
def events_funnel_conversion(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    out = (
        u.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return out.select(
        "user_id",
        "t_view",
        "t_click",
        "t_purchase",
        stage.cast("int").alias("reached_stage"),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH s AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    a AS (
      SELECT s.cohort_week,
             CAST(date_diff('day', s.cohort_week,
                  date_trunc('week', e.ts)) // 7 AS BIGINT)
               AS week_offset,
             e.user_id
      FROM events e JOIN s ON s.user_id = e.user_id),
    act AS (
      SELECT cohort_week, week_offset,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
      FROM a WHERE week_offset >= 0 GROUP BY cohort_week, week_offset),
    cs AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
      FROM s GROUP BY cohort_week)
    SELECT act.cohort_week, act.week_offset, act.n_active, cs.n_cohort,
           CAST((100 * act.n_active) // cs.n_cohort AS BIGINT)
             AS retention_pct
    FROM act JOIN cs ON cs.cohort_week = act.cohort_week
    """,
    doc="weekly retention-cohort matrix: users cohorted by the ISO week "
    "of their FIRST signup event; each later event marks them active in "
    "week_offset = (activity week - cohort week) in whole weeks, both "
    "sides week-truncated BEFORE the day diff so the division by 7 is "
    "exact (date_trunc('week') is ISO-Monday in Spark and DuckDB "
    "alike); pre-signup activity (negative offset) is excluded. "
    "retention_pct is the exact integer 100*active // cohort_size. "
    "Scale: one groupBy(user) for cohorts, one user-keyed equi-join, "
    "one groupBy(cohort_week, offset) with a distinct-count (Expand, "
    "partial-agg) — the matrix itself is weeks x offsets, metadata-"
    "sized, and the cohort-size join rides it.",
)
def events_retention_cohorts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    a = ev.join(s, "user_id").select(
        "cohort_week",
        F.floor(
            F.datediff(
                F.date_trunc("week", F.col("ts")),
                F.col("cohort_week"),
            )
            / 7
        )
        .cast("long")
        .alias("week_offset"),
        "user_id",
    )
    act = (
        a.filter(F.col("week_offset") >= 0)
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )
    cs = s.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    return act.join(cs, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "n_cohort",
        F.expr("(100 * n_active) DIV n_cohort")
        .cast("long")
        .alias("retention_pct"),
    )


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH conv AS (
      SELECT user_id, min(ts) AS t_conv FROM events
      WHERE event_type = 'purchase' GROUP BY user_id),
    tch AS (
      SELECT e.user_id, e.ts, e.event_id, e.event_type
      FROM events e JOIN conv c ON c.user_id = e.user_id
      WHERE e.event_type IN ('view', 'click') AND e.ts < c.t_conv),
    lt AS (
      SELECT user_id, max(ts) AS t_touch,
             CAST(count(*) AS BIGINT) AS n_touches
      FROM tch GROUP BY user_id),
    win AS (
      SELECT t.user_id, l.t_touch, l.n_touches,
             max(t.event_id) AS touch_event_id
      FROM tch t JOIN lt l
        ON l.user_id = t.user_id AND t.ts = l.t_touch
      GROUP BY t.user_id, l.t_touch, l.n_touches)
    SELECT w.user_id, c.t_conv, w.t_touch, w.n_touches,
           w.touch_event_id, e.event_type AS channel
    FROM win w
    JOIN conv c ON c.user_id = w.user_id
    JOIN events e ON e.event_id = w.touch_event_id
    """,
    doc="last-touch marketing attribution: for each converting user "
    "(first purchase = conversion), credit the latest view/click "
    "STRICTLY before the conversion. The winning touch is resolved in "
    "two exact steps — max(ts) over prior touches, then max(event_id) "
    "among touches AT that ts — so simultaneous touches cannot make "
    "the credited channel engine-dependent (an arg_max on ts alone "
    "would be tie-ambiguous the moment two touches share a timestamp; "
    "event_id is unique by construction, making the key total). "
    "Composition mirror of events_funnel_conversion: every stage is a "
    "groupBy(user_id) or a user-keyed equi-join — co-partitioned end "
    "to end — and the final channel lookup joins back on event_id, a "
    "shrunken one-row-per-converting-user frame. Users whose only "
    "touches follow the purchase (or who never converted) drop out by "
    "the strict inequality, exercised by the synthetic events.",
)
def events_attribution_last_touch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_conv"))
    )
    tch = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .join(conv, "user_id")
        .filter(F.col("ts") < F.col("t_conv"))
        .select("user_id", "ts", "event_id", "event_type")
    )
    lt = tch.groupBy("user_id").agg(
        F.max("ts").alias("t_touch"),
        F.count(F.lit(1)).cast("long").alias("n_touches"),
    )
    win = (
        tch.join(lt, "user_id")
        .filter(F.col("ts") == F.col("t_touch"))
        .groupBy("user_id", "t_touch", "n_touches")
        .agg(F.max("event_id").alias("touch_event_id"))
    )
    channel = ev.select(
        F.col("event_id").alias("touch_event_id"),
        F.col("event_type").alias("channel"),
    )
    return (
        win.join(conv, "user_id")
        .join(channel, "touch_event_id")
        .select(
            "user_id",
            "t_conv",
            "t_touch",
            "n_touches",
            "touch_event_id",
            "channel",
        )
    )


@query(
    "events_stickiness_weekly",
    oracle="""
    WITH d AS (
      SELECT DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
      FROM events),
    dau AS (
      SELECT week, day, CAST(count(*) AS BIGINT) AS dau
      FROM d GROUP BY week, day),
    wk AS (
      SELECT week, CAST(count(*) AS BIGINT) AS n_active_days,
             CAST(sum(dau) AS BIGINT) AS active_user_days
      FROM dau GROUP BY week),
    wau AS (
      SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM d GROUP BY week)
    SELECT wk.week, wk.n_active_days, wk.active_user_days, wau.wau,
           CAST(1000000 * wk.active_user_days
                // (wk.n_active_days * wau.wau) AS BIGINT)
             AS stickiness_ppm
    FROM wk JOIN wau ON wau.week = wk.week
    """,
    doc="DAU/WAU stickiness per ISO week — the engagement ratio product "
    "dashboards track: average daily actives over the week's active "
    "days divided by weekly actives, kept exact as stickiness_ppm = "
    "1e6 * active_user_days DIV (n_active_days * wau) instead of a "
    "float average-of-averages. Week/day keys are both-engine "
    "date_trunc (ISO-Monday weeks), cast to TIMESTAMP like the "
    "retention-cohort row. Scale shape: one DISTINCT shuffle to "
    "(week, day, user) — the partial-agg dedup any DAU computation "
    "pays — then two metadata-sized week rollups (the WAU distinct "
    "rides the same deduped frame, so no second pass over raw "
    "events) and one equi-join on week.",
)
def events_stickiness_weekly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        F.date_trunc("week", F.col("ts")).alias("week"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        "user_id",
    ).distinct()
    dau = d.groupBy("week", "day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    wk = dau.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_days"),
        F.sum("dau").cast("long").alias("active_user_days"),
    )
    wau = d.groupBy("week").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return wk.join(wau, "week").select(
        "week",
        "n_active_days",
        "active_user_days",
        "wau",
        F.expr(
            "(1000000 * active_user_days) DIV (n_active_days * wau)"
        )
        .cast("long")
        .alias("stickiness_ppm"),
    )


@query(
    "events_power_users_decile",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id),
    t AS (
      SELECT user_id, n_events,
             ntile(10) OVER (ORDER BY n_events DESC, user_id) AS decile
      FROM u),
    g AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(n_events) AS BIGINT) AS total_events,
             CAST(min(n_events) AS BIGINT) AS min_events,
             CAST(max(n_events) AS BIGINT) AS max_events
      FROM t GROUP BY decile)
    SELECT CAST(decile AS BIGINT) AS decile, n_users, total_events,
           min_events, max_events,
           CAST(1000000 * total_events // (sum(total_events) OVER ())
                AS BIGINT) AS share_ppm
    FROM g
    """,
    doc="power-user concentration: users ranked by event count into "
    "NTILE(10) deciles under the total (n_events DESC, user_id) order, "
    "reported as per-decile user/event counts and exact integer event "
    "share — the activity-concentration curve growth teams read next "
    "to retention. The Spark side does NOT run a global ntile window "
    "(a single-partition sort over every user): it reproduces ntile's "
    "exact assignment rule from a two-level rank — row_number "
    "partitioned WITHIN each distinct count value (parallel), plus a "
    "cumulative offset over the VALUE-level histogram (the only "
    "SinglePartition step, over distinct count values — metadata-"
    "sized, the corpus_pack_sequences discipline) — then the closed-"
    "form ntile bucket formula on that global rank with N a plan "
    "literal. The DuckDB oracle uses the plain ntile window, pinning "
    "that the decomposition IS ntile. Scale shape: one groupBy(user), "
    "one groupBy(count value), per-value ranking windows, one "
    "metadata rollup to 10 rows.",
)
def events_power_users_decile(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    # value-level histogram + cumulative users above each count value
    vc = u.groupBy("n_events").agg(F.count(F.lit(1)).alias("m"))
    w_cum = (
        W.orderBy(F.col("n_events").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    vcc = vc.select(
        "n_events",
        F.coalesce(F.sum("m").over(w_cum), F.lit(0)).alias("cum_before"),
    )
    w_in = W.partitionBy("n_events").orderBy("user_id")
    ranked = (
        u.withColumn("rn", F.row_number().over(w_in))
        .join(vcc, "n_events")
        .select(
            "user_id",
            "n_events",
            (F.col("cum_before") + F.col("rn")).alias("grank"),
        )
    )
    # ntile(10) closed form: first (N % 10) buckets hold (N DIV 10) + 1
    # rows, the rest (N DIV 10); N as a plan literal (tfidf precedent).
    # With N < 10 (base = 0) every rank sits under the threshold, so the
    # max(base, 1) in the dead else-branch only guards the division.
    n = u.count()
    base, extra = n // 10, n % 10
    threshold = extra * (base + 1)
    decile = F.expr(
        f"CASE WHEN grank <= {threshold} THEN (grank - 1) DIV {base + 1} + 1 "
        f"ELSE {extra} + (grank - {threshold} - 1) DIV {max(base, 1)} + 1 END"
    )
    g = ranked.select(decile.alias("decile"), "n_events").groupBy(
        "decile"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_events").cast("long").alias("total_events"),
        F.min("n_events").cast("long").alias("min_events"),
        F.max("n_events").cast("long").alias("max_events"),
    )
    w_all = W.partitionBy()
    return g.select(
        F.col("decile").cast("long").alias("decile"),
        "n_users",
        "total_events",
        "min_events",
        "max_events",
        F.expr("1000000 * total_events").alias("_num"),
        F.sum("total_events").over(w_all).alias("_den"),
    ).select(
        "decile",
        "n_users",
        "total_events",
        "min_events",
        "max_events",
        F.expr("_num DIV _den").cast("long").alias("share_ppm"),
    )
