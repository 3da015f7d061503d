"""FTX normalization (spot, linear futures/swaps, MOVE, BVOL).

Behavioral reference (reimplemented Spark-first, not translated):
  crypto-msg-parser/src/exchanges/ftx.rs;
  pair rules crypto-pair/src/exchanges/ftx.rs:3-22;
  contract value always 1.0 (crypto-contract-value/src/lib.rs:18).

Envelope: {channel, market, type, data}. Trade timestamps are RFC3339
strings with fractional seconds; orderbook/ticker times are float seconds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_msg_parser_spark import schemas
from crypto_msg_parser_spark.parser.common import (
    explode_with_count,
    parsed_once,
    finalize,
    quantity_triple,
    sort_book_sides,
)

EXCHANGE = "ftx"


def normalize_pair(symbol: Column) -> Column:
    return (
        F.when(
            symbol.endswith("-PERP"),
            F.concat(F.regexp_replace(symbol, "-PERP$", ""), F.lit("/USD")),
        )
        .when(
            symbol.contains("-MOVE-"),
            F.concat(F.split(symbol, "-")[0], F.lit("/USD")),
        )
        .when(symbol.contains("/"), symbol)
        .when(
            symbol.contains("-"),
            F.concat(F.regexp_replace(symbol, "-[^-]*$", ""), F.lit("/USD")),
        )
        .otherwise(F.concat(symbol, F.lit("/USD")))
    )


def _rfc3339_ms(col: Column) -> Column:
    return (F.to_timestamp(col).cast("double") * 1000).cast("long")


# ---------------------------------------------------------------- router

def _channel(msg: Column) -> Column:
    return F.get_json_object(msg, "$.channel")


def get_msg_type(msg: Column) -> Column:
    """ftx.rs:140-155."""
    ch = _channel(msg)
    return (
        F.when(ch == "trades", "trade")
        .when(ch == "orderbook", "l2_event")
        .when(ch == "ticker", "ticker")
        .otherwise("other")
    )


def extract_symbol(msg: Column) -> Column:
    """ftx.rs:67-95."""
    market = F.get_json_object(msg, "$.market")
    success = F.get_json_object(msg, "$.success")
    arr = F.from_json(
        F.get_json_object(msg, "$.result"), "array<struct<name:string>>"
    )
    is_arr = msg.rlike('"result"\\s*:\\s*\\[')
    has_book = (
        F.get_json_object(msg, "$.result.asks").isNotNull()
        & F.get_json_object(msg, "$.result.bids").isNotNull()
    )
    return F.when(market.isNotNull(), market).when(
        success == "true",
        F.when(is_arr & (F.size(arr) > 1), "ALL")
        .when(is_arr & (F.size(arr) == 1), arr[0]["name"])
        .when(is_arr, "NONE")
        .when(has_book, "NONE"),
    )


def extract_timestamp(msg: Column) -> Column:
    """ftx.rs:97-136: trades max RFC3339; orderbook/ticker float secs."""
    ch = _channel(msg)
    trades = F.from_json(
        F.get_json_object(msg, "$.data"), "array<struct<time:string>>"
    )
    return (
        F.when(
            ch == "trades",
            F.array_max(F.transform(trades, lambda x: _rfc3339_ms(x["time"]))),
        )
        .when(
            ch.isin("orderbook", "ticker"),
            (F.get_json_object(msg, "$.data.time").cast("double") * 1000).cast(
                "long"
            ),
        )
        .otherwise(F.lit(None).cast("long"))
    )


# ---------------------------------------------------------------- trades

_TRADE = (
    "array<struct<id:bigint, price:double, size:double, side:string,"
    " liquidation:boolean, time:string>>"
)


def parse_trade(df: DataFrame) -> DataFrame:
    """ftx.rs:157-208."""
    arr = F.from_json(F.get_json_object("msg", "$.data"), _TRADE)
    base = (
        df.filter(_channel(F.col("msg")) == "trades")
        .withColumn("symbol", F.get_json_object("msg", "$.market"))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .transform(explode_with_count(arr))
    )
    q = quantity_triple(
        F.col("market_type"), F.col("d.price"), F.col("d.size"), F.lit(1.0)
    )
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("trade").alias("msg_type"),
        _rfc3339_ms(F.col("d.time")).alias("timestamp"),
        F.when(F.col("n_items") == 1, F.col("msg"))
        .otherwise(F.to_json("d"))
        .alias("json"),
        F.when(F.col("d.side") == "sell", "sell").otherwise("buy").alias("side"),
        F.col("d.price").alias("price"),
        q["quantity_base"].alias("quantity_base"),
        q["quantity_quote"].alias("quantity_quote"),
        q["quantity_contract"].alias("quantity_contract"),
        F.col("d.id").cast("string").alias("trade_id"),
    )
    return finalize(out, schemas.TRADE_SCHEMA)


# ---------------------------------------------------------------- orderbooks

_BOOK = (
    "struct<action:string, time:double,"
    " asks:array<array<double>>, bids:array<array<double>>>"
)


def parse_l2(df: DataFrame) -> DataFrame:
    """ftx.rs:210-252: action 'partial' = snapshot; [price, qty] f64."""
    base = (
        df.filter(_channel(F.col("msg")) == "orderbook")
        .withColumn("symbol", F.get_json_object("msg", "$.market"))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .transform(parsed_once(F.from_json(F.get_json_object("msg", "$.data"), _BOOK)))
        .withColumn("snapshot", F.col("d.action") == "partial")
    )

    def order(lv):
        price = lv.getItem(0)
        qty = lv.getItem(1)
        q = quantity_triple(F.col("market_type"), price, qty, F.lit(1.0))
        return F.struct(
            price.alias("price"),
            q["quantity_base"].alias("quantity_base"),
            q["quantity_quote"].alias("quantity_quote"),
            q["quantity_contract"].alias("quantity_contract"),
        )

    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("l2_event").alias("msg_type"),
        (F.col("d.time") * 1000).cast("long").alias("timestamp"),
        F.col("msg").alias("json"),
        "snapshot",
        F.transform(F.coalesce("d.asks", F.array()), order).alias("asks"),
        F.transform(F.coalesce("d.bids", F.array()), order).alias("bids"),
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("prev_seq_id"),
    )
    return finalize(sort_book_sides(out), schemas.ORDERBOOK_SCHEMA)


# ---------------------------------------------------------------- bbo

def parse_bbo(df: DataFrame) -> DataFrame:
    """ftx.rs:254-300: ticker channel."""
    base = (
        df.filter(_channel(F.col("msg")) == "ticker")
        .withColumn("symbol", F.get_json_object("msg", "$.market"))
        .withColumn("pair", normalize_pair(F.col("symbol")))
    )
    ask_p = F.get_json_object("msg", "$.data.ask").cast("double")
    ask_q = F.get_json_object("msg", "$.data.askSize").cast("double")
    bid_p = F.get_json_object("msg", "$.data.bid").cast("double")
    bid_q = F.get_json_object("msg", "$.data.bidSize").cast("double")
    aq = quantity_triple(F.col("market_type"), ask_p, ask_q, F.lit(1.0))
    bq = quantity_triple(F.col("market_type"), bid_p, bid_q, F.lit(1.0))
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("bbo").alias("msg_type"),
        (F.get_json_object("msg", "$.data.time").cast("double") * 1000)
        .cast("long")
        .alias("timestamp"),
        F.col("msg").alias("json"),
        bid_p.alias("bid_price"),
        bq["quantity_base"].alias("bid_quantity_base"),
        bq["quantity_quote"].alias("bid_quantity_quote"),
        bq["quantity_contract"].alias("bid_quantity_contract"),
        ask_p.alias("ask_price"),
        aq["quantity_base"].alias("ask_quantity_base"),
        aq["quantity_quote"].alias("ask_quantity_quote"),
        aq["quantity_contract"].alias("ask_quantity_contract"),
        F.lit(None).cast("long").alias("id"),
    )
    return finalize(out, schemas.BBO_SCHEMA)
