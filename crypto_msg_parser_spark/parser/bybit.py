"""Bybit normalization as Catalyst column pipelines.

Behavioral reference (reimplemented, not translated):
  crypto-msg-parser/src/exchanges/bybit.rs (router :122-220, trade :222-305,
  l2 :307-412, candlestick :414-490); pair rules
  crypto-pair/src/exchanges/bybit.rs:3-18; every contract is 1 USD (inverse)
  or 1 coin (linear) — crypto-contract-value/src/exchanges/bybit.rs:3-14.

Numeric fields that Bybit serializes as EITHER number or string
(trade_time_ms, price, timestamp_e6) are read as strings in the from_json
schema (Jackson yields the token text either way) and cast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_msg_parser_spark import schemas
from crypto_msg_parser_spark.parser.common import (
    explode_with_count,
    INVERSE,
    finalize,
    quantity_triple,
    sort_book_sides,
)

EXCHANGE = "bybit"


def normalize_pair(symbol: Column) -> Column:
    return (
        F.when(
            symbol.endswith("USDT"),
            F.concat(
                symbol.substr(F.lit(1), F.length(symbol) - 4), F.lit("/USDT")
            ),
        )
        .when(
            symbol.endswith("USD"),
            F.concat(symbol.substr(F.lit(1), F.length(symbol) - 3), F.lit("/USD")),
        )
        .when(
            symbol.substr(F.length(symbol) - 1, F.lit(2)).rlike("^[0-9]{2}$"),
            F.concat(symbol.substr(F.lit(1), F.length(symbol) - 6), F.lit("/USD")),
        )
    )


def contract_value(market_type: Column, pair: Column) -> Column:
    return F.lit(1.0)


# ---------------------------------------------------------------- router


def _topic(msg: Column) -> Column:
    return F.get_json_object(msg, "$.topic")


def get_msg_type(msg: Column) -> Column:
    t = _topic(msg)
    ch = F.split(t, "\\.").getItem(0)
    return (
        F.when(t.isNull(), "other")
        .when(ch == "trade", "trade")
        .when(ch == "orderBookL2_25", "l2_event")
        .when(t == "instrument_info", "ticker")
        .when((t == "klineV2") | (t == "candle") | ch.isin("klineV2", "candle"), "candlestick")
        .otherwise("other")
    )


def extract_symbol(msg: Column) -> Column:
    t = _topic(msg)
    parts = F.split(t, "\\.")
    rest = F.from_json(
        F.get_json_object(msg, "$.result"), "array<struct<symbol:string>>"
    )
    return F.when(t.isNotNull(), F.element_at(parts, -1)).when(
        (F.get_json_object(msg, "$.ret_code") == "0") & rest.isNotNull(),
        rest.getItem(0)["symbol"],
    )


def extract_timestamp(msg: Column) -> Column:
    t = _topic(msg)
    is_trade = F.split(t, "\\.").getItem(0) == "trade"
    trades = F.from_json(
        F.get_json_object(msg, "$.data"), "array<struct<trade_time_ms:string>>"
    )
    trade_ts = F.array_max(
        F.transform(trades, lambda x: x["trade_time_ms"].cast("long"))
    )
    e6 = (F.get_json_object(msg, "$.timestamp_e6").cast("long") / 1000).cast("long")
    rest_ts = (F.get_json_object(msg, "$.time_now").cast("double") * 1000).cast(
        "long"
    )
    return (
        F.when(t.isNotNull() & is_trade, trade_ts)
        .when(t.isNotNull(), e6)
        .otherwise(rest_ts)
    )


# ---------------------------------------------------------------- parsers

_TRADE_ELEM = (
    "struct<trade_time_ms:string, timestamp:string, symbol:string, "
    "side:string, size:double, price:string, trade_id:string>"
)


def parse_trade(df: DataFrame) -> DataFrame:
    """trade.* topics -> TradeMsg (bybit.rs:222-305).
    Inverse: qb = size/price, qq = size (1-USD contracts).
    Linear:  qb = size, qq = price*size (1-coin contracts)."""
    arr = F.from_json(F.get_json_object("msg", "$.data"), f"array<{_TRADE_ELEM}>")
    base = (
        df.filter(F.split(_topic(F.col("msg")), "\\.").getItem(0) == "trade")
        .transform(explode_with_count(arr))
        .withColumn("pair", normalize_pair(F.col("d.symbol")))
    )
    price = F.col("d.price").cast("double")
    size = F.col("d.size")
    is_inverse = F.col("market_type").isin(*INVERSE)
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        F.col("d.symbol").alias("symbol"),
        "pair",
        F.lit("trade").alias("msg_type"),
        F.col("d.trade_time_ms").cast("long").alias("timestamp"),
        F.when(F.col("n_items") == 1, F.col("msg"))
        .otherwise(F.to_json("d"))
        .alias("json"),
        F.when(F.col("d.side") == "Sell", "sell").otherwise("buy").alias("side"),
        price.alias("price"),
        F.when(is_inverse, size / price).otherwise(size).alias("quantity_base"),
        F.when(is_inverse, size).otherwise(price * size).alias("quantity_quote"),
        size.alias("quantity_contract"),
        F.col("d.trade_id").alias("trade_id"),
    )
    return finalize(out, schemas.TRADE_SCHEMA)


_ORDER = "struct<price:string, symbol:string, side:string, size:double>"


def parse_l2(df: DataFrame) -> DataFrame:
    """orderBookL2_25 -> OrderBookMsg (bybit.rs:307-412): snapshot payload
    is an order array (inverse) or {order_book} (linear); deltas merge
    delete+update+insert; levels route to bids/asks by their side field;
    deleted levels carry size 0."""
    data = F.get_json_object("msg", "$.data")
    snap_arr = F.from_json(data, f"array<{_ORDER}>")
    snap_lin = F.from_json(data, f"struct<order_book:array<{_ORDER}>>")
    delta = F.from_json(
        data,
        f"struct<delete:array<{_ORDER}>, update:array<{_ORDER}>, "
        f"insert:array<{_ORDER}>>",
    )
    base = (
        df.withColumn("topic", _topic(F.col("msg")))
        .filter(F.col("topic").startswith("orderBookL2_25."))
        .withColumn("symbol", F.element_at(F.split("topic", "\\."), -1))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .withColumn(
            "snapshot", F.get_json_object("msg", "$.type") == "snapshot"
        )
        .withColumn(
            "levels",
            F.when(
                F.col("snapshot"),
                # struct form first: from_json with an array schema on an
                # OBJECT yields [all-null row], not NULL, so it must lose
                F.coalesce(snap_lin["order_book"], snap_arr, F.array()),
            ).otherwise(
                F.concat(
                    F.coalesce(delta["delete"], F.array()),
                    F.coalesce(delta["update"], F.array()),
                    F.coalesce(delta["insert"], F.array()),
                )
            ),
        )
        .withColumn(
            "ts",
            (F.get_json_object("msg", "$.timestamp_e6").cast("long") / 1000).cast(
                "long"
            ),
        )
    )

    def to_order(lv):
        price = lv["price"].cast("double")
        qty = F.coalesce(lv["size"], F.lit(0.0))
        t = quantity_triple(F.col("market_type"), price, qty, F.lit(1.0))
        return F.struct(
            price.alias("price"),
            t["quantity_base"].alias("quantity_base"),
            t["quantity_quote"].alias("quantity_quote"),
            t["quantity_contract"].alias("quantity_contract"),
        )

    asks = F.transform(
        F.filter(F.col("levels"), lambda x: x["side"] != "Buy"), to_order
    )
    bids = F.transform(
        F.filter(F.col("levels"), lambda x: x["side"] == "Buy"), to_order
    )
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("l2_event").alias("msg_type"),
        F.col("ts").alias("timestamp"),
        F.col("msg").alias("json"),
        "snapshot",
        asks.alias("asks"),
        bids.alias("bids"),
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("prev_seq_id"),
    )
    return finalize(sort_book_sides(out), schemas.ORDERBOOK_SCHEMA)


_CANDLE_ELEM = (
    "struct<start:bigint, end:bigint, period:string, open:double, "
    "close:double, high:double, low:double, volume:string, turnover:string, "
    "timestamp:bigint>"
)


def parse_candlestick(df: DataFrame) -> DataFrame:
    """klineV2 (inverse) / candle (linear) topics (bybit.rs:414-490):
    inverse swaps volume<->turnover; period from the topic for inverse,
    from the element for linear; timestamp is e6 -> /1000."""
    arr = F.from_json(F.get_json_object("msg", "$.data"), f"array<{_CANDLE_ELEM}>")
    base = (
        df.withColumn("topic", _topic(F.col("msg")))
        .filter(
            F.split("topic", "\\.").getItem(0).isin("klineV2", "candle")
        )
        .withColumn("symbol", F.element_at(F.split("topic", "\\."), -1))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .transform(explode_with_count(arr))
    )
    is_inverse = F.col("market_type").isin(*INVERSE)
    topic_period = F.split("topic", "\\.").getItem(1)
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("candlestick").alias("msg_type"),
        (F.col("d.timestamp") / 1000).cast("long").alias("timestamp"),
        F.when(F.col("n_items") == 1, F.col("msg"))
        .otherwise(F.to_json("d"))
        .alias("json"),
        F.col("d.start").alias("begin_time"),
        F.col("d.open").alias("open"),
        F.col("d.high").alias("high"),
        F.col("d.low").alias("low"),
        F.col("d.close").alias("close"),
        F.when(is_inverse, F.col("d.turnover").cast("double"))
        .otherwise(F.col("d.volume").cast("double"))
        .alias("volume"),
        F.when(is_inverse, topic_period).otherwise(F.col("d.period")).alias("period"),
        F.when(is_inverse, F.col("d.volume").cast("double"))
        .otherwise(F.col("d.turnover").cast("double"))
        .alias("quote_volume"),
    )
    return finalize(out, schemas.CANDLESTICK_SCHEMA)
