"""Coinbase Pro normalization (spot only).

Behavioral reference (reimplemented Spark-first, not translated):
  crypto-msg-parser/src/exchanges/coinbase_pro.rs;
  pair rule crypto-pair/src/lib.rs:51 ('-' -> '/').

Messages are flat objects keyed by `type`: match/last_match trades,
snapshot/l2update books. RFC3339 timestamps; level2 snapshots carry none
(crawl receive time is used, lib.rs:130).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_msg_parser_spark import schemas
from crypto_msg_parser_spark.parser.common import finalize, sort_book_sides

EXCHANGE = "coinbase_pro"


def normalize_pair(symbol: Column) -> Column:
    return F.when(symbol.contains("-"), F.translate(symbol, "-", "/"))


def _rfc3339_ms(col: Column) -> Column:
    return (F.to_timestamp(col).cast("double") * 1000).cast("long")


def _type(msg: Column) -> Column:
    return F.get_json_object(msg, "$.type")


def get_msg_type(msg: Column) -> Column:
    """Engine-side sniffer (coinbase_pro absent from lib.rs get_msg_type)."""
    t = _type(msg)
    return (
        F.when(t.isin("match", "last_match"), "trade")
        .when(t.isin("snapshot", "l2update"), "l2_event")
        .when(t.isin("received", "open", "done", "change"), "l3_event")
        .when(t == "ticker", "ticker")
        .otherwise("other")
    )


def extract_symbol(msg: Column) -> Column:
    """coinbase_pro.rs:56-66."""
    pid = F.get_json_object(msg, "$.product_id")
    has_book = (
        F.get_json_object(msg, "$.asks").isNotNull()
        & F.get_json_object(msg, "$.bids").isNotNull()
    )
    return F.when(pid.isNotNull(), pid).when(has_book, "NONE")


def extract_timestamp(msg: Column) -> Column:
    """coinbase_pro.rs:68-94: RFC3339 `time` (zero-date sentinel -> NULL);
    snapshots carry none."""
    t = _type(msg)
    time = F.get_json_object(msg, "$.time")
    return F.when(
        t.isNotNull(),
        F.when(t == "snapshot", F.lit(None).cast("long")).when(
            time.isNotNull() & ~time.startswith("0001-01-01T00:00:00"),
            _rfc3339_ms(time),
        ),
    ).otherwise(F.lit(None).cast("long"))


def parse_trade(df: DataFrame) -> DataFrame:
    """coinbase_pro.rs:96-130."""
    base = df.filter(_type(F.col("msg")).isin("match", "last_match")).withColumn(
        "symbol", F.get_json_object("msg", "$.product_id")
    )
    price = F.get_json_object("msg", "$.price").cast("double")
    qty = F.get_json_object("msg", "$.size").cast("double")
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        normalize_pair(F.col("symbol")).alias("pair"),
        F.lit("trade").alias("msg_type"),
        _rfc3339_ms(F.get_json_object("msg", "$.time")).alias("timestamp"),
        F.col("msg").alias("json"),
        F.when(F.get_json_object("msg", "$.side") == "sell", "sell")
        .otherwise("buy")
        .alias("side"),
        price.alias("price"),
        qty.alias("quantity_base"),
        (price * qty).alias("quantity_quote"),
        F.lit(None).cast("double").alias("quantity_contract"),
        F.get_json_object("msg", "$.trade_id").alias("trade_id"),
    )
    return finalize(out, schemas.TRADE_SCHEMA)


def parse_l2(df: DataFrame) -> DataFrame:
    """coinbase_pro.rs:146-216: snapshot ([p,q] + crawl receive time) and
    l2update (changes [side, p, q] + RFC3339 time)."""
    t = _type(F.col("msg"))
    snap_book = F.from_json(
        F.get_json_object("msg", "$.asks"), "array<array<string>>"
    )
    snap_bids = F.from_json(
        F.get_json_object("msg", "$.bids"), "array<array<string>>"
    )
    changes = F.from_json(
        F.get_json_object("msg", "$.changes"), "array<array<string>>"
    )

    def order2(lv):
        price = lv.getItem(0).cast("double")
        qty = lv.getItem(1).cast("double")
        return F.struct(
            price.alias("price"),
            qty.alias("quantity_base"),
            (price * qty).alias("quantity_quote"),
            F.lit(None).cast("double").alias("quantity_contract"),
        )

    def order3(lv):
        price = lv.getItem(1).cast("double")
        qty = lv.getItem(2).cast("double")
        return F.struct(
            price.alias("price"),
            qty.alias("quantity_base"),
            (price * qty).alias("quantity_quote"),
            F.lit(None).cast("double").alias("quantity_contract"),
        )

    base = df.filter(t.isin("snapshot", "l2update")).withColumn(
        "symbol", F.get_json_object("msg", "$.product_id")
    ).withColumn("snapshot", t == "snapshot")
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        normalize_pair(F.col("symbol")).alias("pair"),
        F.lit("l2_event").alias("msg_type"),
        F.when(F.col("snapshot"), F.col("received_at"))
        .otherwise(_rfc3339_ms(F.get_json_object("msg", "$.time")))
        .alias("timestamp"),
        F.col("msg").alias("json"),
        "snapshot",
        F.when(F.col("snapshot"), F.transform(F.coalesce(snap_book, F.array()), order2))
        .otherwise(
            F.transform(
                F.filter(changes, lambda x: x.getItem(0) == "sell"), order3
            )
        )
        .alias("asks"),
        F.when(F.col("snapshot"), F.transform(F.coalesce(snap_bids, F.array()), order2))
        .otherwise(
            F.transform(
                F.filter(changes, lambda x: x.getItem(0) == "buy"), order3
            )
        )
        .alias("bids"),
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("prev_seq_id"),
    )
    return finalize(sort_book_sides(out), schemas.ORDERBOOK_SCHEMA)
