"""Bitstamp normalization (spot only, WebSocket v2).

Behavioral reference (reimplemented Spark-first, not translated):
  crypto-msg-parser/src/exchanges/bitstamp.rs;
  pair rule crypto-pair/src/exchanges/bitstamp.rs (4-char usdc/usdt
  quote else 3-char suffix, uppercased).

Symbols ride in the channel suffix (live_trades_btcusd). Timestamps are
microseconds (/1000 -> ms). Channels: live_trades_* (trade),
diff_order_book_* (L2Event), order_book_* (L2TopK snapshot),
detail_order_book_* (L3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_msg_parser_spark import schemas
from crypto_msg_parser_spark.parser.common import finalize, sort_book_sides, parsed_once

EXCHANGE = "bitstamp"


def normalize_pair(symbol: Column) -> Column:
    four = symbol.endswith("usdc") | symbol.endswith("usdt")
    base = F.when(
        four, symbol.substr(F.lit(1), F.length(symbol) - 4)
    ).otherwise(symbol.substr(F.lit(1), F.length(symbol) - 3))
    quote = F.when(
        four, symbol.substr(F.length(symbol) - 3, F.lit(4))
    ).otherwise(symbol.substr(F.length(symbol) - 2, F.lit(3)))
    return F.upper(F.concat(base, F.lit("/"), quote))


def _channel(msg: Column) -> Column:
    return F.get_json_object(msg, "$.channel")


def _channel_symbol(msg: Column) -> Column:
    return F.substring_index(_channel(msg), "_", -1)


def get_msg_type(msg: Column) -> Column:
    ch = _channel(msg)
    return (
        F.when(ch.startswith("live_trades_"), "trade")
        .when(ch.startswith("diff_order_book_"), "l2_event")
        .when(ch.startswith("detail_order_book_"), "l3_event")
        .when(ch.startswith("live_orders_"), "l3_event")
        .when(ch.startswith("order_book_"), "l2_topk")
        .otherwise("other")
    )


def extract_symbol(msg: Column) -> Column:
    """bitstamp.rs:49-61: channel suffix; bare book snapshots -> NONE."""
    has_book = (
        F.get_json_object(msg, "$.asks").isNotNull()
        & F.get_json_object(msg, "$.bids").isNotNull()
    )
    return F.when(_channel(msg).isNotNull(), _channel_symbol(msg)).when(
        has_book, "NONE"
    )


def extract_timestamp(msg: Column) -> Column:
    """bitstamp.rs:63-77: microtimestamp / 1000."""
    micro = F.coalesce(
        F.get_json_object(msg, "$.data.microtimestamp"),
        F.get_json_object(msg, "$.microtimestamp"),
    ).try_cast("long")
    return F.floor(micro / 1000).cast("long")


def parse_trade(df: DataFrame) -> DataFrame:
    """bitstamp.rs:79-109: type 1 = sell; ts = µs/1000."""
    base = df.filter(_channel(F.col("msg")).startswith("live_trades_")).withColumn(
        "symbol", _channel_symbol(F.col("msg"))
    )
    price = F.get_json_object("msg", "$.data.price").cast("double")
    qty = F.get_json_object("msg", "$.data.amount").cast("double")
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        normalize_pair(F.col("symbol")).alias("pair"),
        F.lit("trade").alias("msg_type"),
        F.floor(
            F.get_json_object("msg", "$.data.microtimestamp").cast("long") / 1000
        ).cast("long").alias("timestamp"),
        F.col("msg").alias("json"),
        F.when(F.get_json_object("msg", "$.data.type") == "1", "sell")
        .otherwise("buy")
        .alias("side"),
        price.alias("price"),
        qty.alias("quantity_base"),
        (price * qty).alias("quantity_quote"),
        F.lit(None).cast("double").alias("quantity_contract"),
        F.get_json_object("msg", "$.data.id").alias("trade_id"),
    )
    return finalize(out, schemas.TRADE_SCHEMA)


def _parse_book(df: DataFrame) -> DataFrame:
    ch = _channel(F.col("msg"))
    book = F.from_json(
        F.get_json_object("msg", "$.data"),
        "struct<microtimestamp:string, asks:array<array<string>>,"
        " bids:array<array<string>>>",
    )
    base = (
        df.filter(
            ch.startswith("diff_order_book_") | ch.startswith("order_book_")
        )
        .withColumn("symbol", _channel_symbol(F.col("msg")))
        .transform(parsed_once(book))
        .withColumn("is_diff", ch.startswith("diff_order_book_"))
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
        "symbol",
        normalize_pair(F.col("symbol")).alias("pair"),
        F.when(F.col("is_diff"), "l2_event").otherwise("l2_topk").alias("msg_type"),
        F.floor(F.col("d.microtimestamp").cast("long") / 1000)
        .cast("long")
        .alias("timestamp"),
        F.col("msg").alias("json"),
        (~F.col("is_diff")).alias("snapshot"),
        F.transform(F.coalesce("d.asks", F.array()), order).alias("asks"),
        F.transform(F.coalesce("d.bids", F.array()), order).alias("bids"),
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("prev_seq_id"),
    )
    return finalize(sort_book_sides(out), schemas.ORDERBOOK_SCHEMA)


def parse_l2(df: DataFrame) -> DataFrame:
    """bitstamp.rs:111-161."""
    return _parse_book(df)


def parse_l2_topk(df: DataFrame) -> DataFrame:
    """bitstamp.rs:163-168: delegates to parse_l2."""
    return _parse_book(df)
