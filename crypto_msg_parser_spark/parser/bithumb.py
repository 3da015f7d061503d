"""Bithumb normalization (spot only).

Behavioral reference (reimplemented Spark-first, not translated):
  crypto-msg-parser/src/exchanges/bithumb.rs;
  pair rule crypto-pair/src/lib.rs:46 ('-' -> '/').

Envelope: {code, data, timestamp, topic}; code 00006 = snapshot (data is
an array for trades), 00007 = update (single object). Orderbook sides are
`s` (asks) and `b` (bids); seq_id from the `ver` string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_msg_parser_spark import schemas
from crypto_msg_parser_spark.parser.common import finalize, parsed_once

EXCHANGE = "bithumb"


def normalize_pair(symbol: Column) -> Column:
    return F.when(symbol.contains("-"), F.translate(symbol, "-", "/"))


def extract_symbol(msg: Column) -> Column:
    """bithumb.rs:46-66: data.symbol or first array element's symbol."""
    return F.coalesce(
        F.get_json_object(msg, "$.data.symbol"),
        F.get_json_object(msg, "$.data[0].symbol"),
    )


def extract_timestamp(msg: Column) -> Column:
    """bithumb.rs:68-76: envelope timestamp (ms)."""
    return F.get_json_object(msg, "$.timestamp").cast("long")


_TRADE = "struct<p:string, s:string, symbol:string, t:string, v:string, ver:string>"


def parse_trade(df: DataFrame) -> DataFrame:
    """bithumb.rs:78-131: 00006 snapshot fan-out / 00007 single;
    ts = t seconds * 1000; trade_id = ver."""
    code = F.get_json_object("msg", "$.code")
    arr = F.from_json(F.get_json_object("msg", "$.data"), f"array<{_TRADE}>")
    single = F.from_json(F.get_json_object("msg", "$.data"), _TRADE)
    base = (
        df.filter(code.isin("00006", "00007"))
        .withColumn(
            "items",
            F.when(code == "00007", F.array(single)).otherwise(arr),
        )
        .filter(F.col("items").isNotNull() & (F.size("items") > 0))
        .filter(F.col("items")[0]["p"].isNotNull())
        .withColumn("n_items", F.size("items"))
        .select("*", F.explode("items").alias("d"))
    )
    price = F.col("d.p").cast("double")
    qty = F.col("d.v").cast("double")
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        F.col("d.symbol").alias("symbol"),
        normalize_pair(F.col("d.symbol")).alias("pair"),
        F.lit("trade").alias("msg_type"),
        (F.col("d.t").cast("long") * 1000).alias("timestamp"),
        F.when(F.col("n_items") == 1, F.col("msg"))
        .otherwise(F.to_json("d"))
        .alias("json"),
        F.when(F.col("d.s") == "sell", "sell").otherwise("buy").alias("side"),
        price.alias("price"),
        qty.alias("quantity_base"),
        (price * qty).alias("quantity_quote"),
        F.lit(None).cast("double").alias("quantity_contract"),
        F.col("d.ver").alias("trade_id"),
    )
    return finalize(out, schemas.TRADE_SCHEMA)


_BOOK = (
    "struct<b:array<array<string>>, s:array<array<string>>,"
    " symbol:string, ver:string>"
)


def parse_l2(df: DataFrame) -> DataFrame:
    """bithumb.rs:133-190: asks from `s`, bids from `b`; snapshot iff
    code 00006; ts = envelope timestamp."""
    code = F.get_json_object("msg", "$.code")
    base = (
        df.filter(code.isin("00006", "00007"))
        .transform(parsed_once(F.from_json(F.get_json_object("msg", "$.data"), _BOOK)))
        .filter(F.col("d.symbol").isNotNull())
        .withColumn("snapshot", code == "00006")
    )

    def order(lv):
        price = lv.getItem(0).cast("double")
        qty = lv.getItem(1).cast("double")
        return F.struct(
            price.alias("price"),
            qty.alias("quantity_base"),
            (price * qty).alias("quantity_quote"),
            F.lit(None).cast("double").alias("quantity_contract"),
        )

    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        F.col("d.symbol").alias("symbol"),
        normalize_pair(F.col("d.symbol")).alias("pair"),
        F.lit("l2_event").alias("msg_type"),
        F.get_json_object("msg", "$.timestamp").cast("long").alias("timestamp"),
        F.col("msg").alias("json"),
        "snapshot",
        F.transform(F.coalesce("d.s", F.array()), order).alias("asks"),
        F.transform(F.coalesce("d.b", F.array()), order).alias("bids"),
        F.col("d.ver").try_cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("prev_seq_id"),
    )
    # NOTE: the reference does NOT re-sort snapshot sides here (its central
    # post-pass does); keep parity with the library-level parse_l2 by
    # leaving order as-received — the engine's sort_book_sides runs in the
    # central pipeline (api-level), mirroring lib.rs:148-161
    from crypto_msg_parser_spark.parser.common import sort_book_sides

    return finalize(sort_book_sides(out), schemas.ORDERBOOK_SCHEMA)
