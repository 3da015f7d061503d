"""Scalar-function coverage (SURVEY.md §2.2, §2.8).

Each query exercises the Spark built-ins the parse stage relies on —
timestamp-unit normalization, the reference's round9 convention, string
surgery (split/upper/translate/regexp), and array ops — with a DuckDB
oracle. All per-row expressions: zero shuffles except the final small aggs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_msg_parser_spark.functions.scalar import normalize_ts_ms, round9
from crypto_msg_parser_spark.registry import query
from crypto_msg_parser_spark.sources.testdata import load_table


@query(
    "ts_unit_normalize",
    oracle="""
    SELECT event_id,
           CASE WHEN raw_ts <= 9999999999 THEN raw_ts * 1000
                WHEN raw_ts <= 9999999999999 THEN raw_ts
                ELSE CAST(floor(raw_ts / 1000) AS BIGINT) END AS ts_ms
    FROM (
      SELECT event_id,
             CASE WHEN event_id % 3 = 0 THEN (epoch_ms(ts) // 1000)
                  WHEN event_id % 3 = 1 THEN (epoch_ms(ts) // 1000) * 1000
                  ELSE (epoch_ms(ts) // 1000) * 1000000 END AS raw_ts
      FROM events)
    """,
    doc="s/ms/us -> ms magnitude-threshold normalization "
    "(crypto-msg-parser/src/exchanges/utils.rs:60-86).",
)
def ts_unit_normalize(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts").cast("long")
    raw = (
        F.when(F.col("event_id") % 3 == 0, epoch)
        .when(F.col("event_id") % 3 == 1, epoch * 1000)
        .otherwise(epoch * 1000000)
    )
    return ev.select(
        "event_id", normalize_ts_ms(raw).alias("ts_ms")
    )


@query(
    "round9_convention",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / l_quantity * 1000000000) / 1000000000
             AS unit_price_r9,
           round((l_quantity / 3.0) * 1000000000) / 1000000000 AS qty_third_r9
    FROM lineitem
    WHERE l_orderkey <= 100
    """,
    doc="the reference's 9-decimal rounding: (x*1e9).round()/1e9 "
    "(crypto-msg-parser/src/exchanges/utils.rs:26-30) — multiply/round/"
    "divide form, not decimal HALF_UP.",
)
def round9_convention(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round9(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_price_r9"
        ),
        round9(F.col("l_quantity") / F.lit(3.0)).alias("qty_third_r9"),
    )


@query(
    "string_surgery",
    oracle="""
    SELECT p_partkey,
           upper(p_type) AS type_upper,
           string_split(p_name, ' ')[1] AS first_word,
           replace(p_brand, '_', '/') AS brand_pair,
           CASE WHEN p_type LIKE '%ECONOMY%' THEN 'eco' ELSE 'std' END AS class,
           regexp_extract(p_name, '[0-9]+') AS first_number,
           substr(p_brand, 1, 5) AS brand_prefix,
           length(p_name) AS name_len
    FROM part
    """,
    doc="string ops the per-exchange routers use: split/nth, upper, "
    "replace('_','/'), contains-ladder, regexp extraction, slicing "
    "(SURVEY §2.8; e.g. binance '@'-split, pair '_'->'/' mapping).",
)
def string_surgery(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.translate("p_brand", "_", "/").alias("brand_pair"),
        F.when(F.col("p_type").contains("ECONOMY"), "eco")
        .otherwise("std")
        .alias("class"),
        F.regexp_extract("p_name", "[0-9]+", 0).alias("first_number"),
        F.substring("p_brand", 1, 5).alias("brand_prefix"),
        F.length("p_name").alias("name_len"),
    )


@query(
    "rfc3339_to_ms",
    oracle="""
    SELECT event_id,
           epoch_ms(strptime(iso, '%Y-%m-%dT%H:%M:%S.%fZ')) AS ts_ms
    FROM (SELECT event_id,
                 strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS iso
          FROM events)
    """,
    doc="RFC3339 string timestamp -> Unix ms (bitmex.rs:673, "
    "dydx_swap.rs:79-81): round-trip through the string form.",
)
def rfc3339_to_ms(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # format to RFC3339 text, then parse back (the parse direction is what
    # the engine needs; the format step synthesizes the fixture)
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    parsed = F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    return ev.select(
        "event_id",
        (F.unix_timestamp(parsed) * 1000 + F.floor(F.date_format(parsed, "SSSSSS").cast("long") / 1000)).cast("long").alias("ts_ms"),
    )


@query(
    "array_ops_levels",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_aggregate(list_transform(embedding::DOUBLE[], x -> abs(x)),
                 'max') * 1000000) / 1000000.0 AS max_abs,
           len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_pos,
           round(embedding[1]::DOUBLE * 1000000) / 1000000.0 AS first_val
    FROM embeddings
    """,
    doc="array transform/filter/max — the orderbook-level array ops family "
    "(SURVEY §2.8 array: F.transform, F.filter, F.array_max).",
)
def array_ops_levels(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    r6 = lambda c: F.round(c * 1000000) / 1000000.0  # noqa: E731
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        r6(F.array_max(F.transform(dv, F.abs))).alias("max_abs"),
        F.size(F.filter(dv, lambda x: x > 0)).alias("n_pos"),
        r6(F.element_at(dv, 1)).alias("first_val"),
    )
