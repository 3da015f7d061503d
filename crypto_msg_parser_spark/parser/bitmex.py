"""BitMEX normalization as Catalyst column pipelines.

Behavioral reference (reimplemented, not translated):
  crypto-msg-parser/src/exchanges/bitmex.rs (router :596-658, trade
  :660-700, funding :702-738, l2 :758-825 with id_to_price :743-757,
  orderBook10 :845-897, quote :899-955, tradeBin :957-1027);
  pair rules crypto-pair/src/exchanges/bitmex.rs:38-88 (XBT->BTC, month
  codes); contract values keyed "market_type.pair" with default 1.0
  (crypto-contract-value/src/exchanges/bitmex.rs:136-142).

The 467-entry (symbol -> (index, tick_size)) table rides as a broadcast
dimension join; L2 delta levels without a price recover it as
round9((1e8*index - id) * tick_size) — pure column arithmetic.
"""

from __future__ import annotations

import json
import pathlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_msg_parser_spark import schemas
from crypto_msg_parser_spark.functions.scalar import round9
from crypto_msg_parser_spark.parser.common import (
    explode_with_count,
    finalize,
    quantity_triple,
    sort_book_sides,
)

EXCHANGE = "bitmex"
_DATA = pathlib.Path(__file__).parent / "data"


def normalize_pair(symbol: Column) -> Column:
    """Common BitMEX symbol shapes (crypto-pair bitmex.rs:38-88):
    month-coded futures strip the 3-char date code; XBT maps to BTC;
    USD/USDT/USDC/EUR/ETH quote suffixes; short symbols quote in XBT."""
    # strip trailing "<letter><2 digits>" month code (XBTH21 -> XBT)
    last2_num = symbol.substr(F.length(symbol) - 1, F.lit(2)).rlike("^[0-9]{2}$")
    s = F.when(last2_num, symbol.substr(F.lit(1), F.length(symbol) - 3)).otherwise(
        symbol
    )

    def cur(c: Column) -> Column:
        return F.when(c == "XBT", "BTC").otherwise(c)

    base_quote = (
        F.when(
            (F.length(s) <= 3) & (s == "XBT"), F.array(F.lit("XBT"), F.lit("USD"))
        )
        .when(F.length(s) <= 3, F.array(s, F.lit("XBT")))
        .when(
            s.endswith("_USDT"),
            F.array(s.substr(F.lit(1), F.length(s) - 5), F.lit("USDT")),
        )
        .when(
            s.endswith("USDT"),
            F.array(s.substr(F.lit(1), F.length(s) - 4), F.lit("USDT")),
        )
        .when(
            s.endswith("USDC"),
            F.array(s.substr(F.lit(1), F.length(s) - 4), F.lit("USDC")),
        )
        .when(
            s.endswith("USD"),
            F.array(s.substr(F.lit(1), F.length(s) - 3), F.lit("USD")),
        )
        .when(
            s.endswith("EUR"),
            F.array(s.substr(F.lit(1), F.length(s) - 3), F.lit("EUR")),
        )
        .when(
            s.endswith("ETH") & (F.length(s) > 3),
            F.array(s.substr(F.lit(1), F.length(s) - 3), F.lit("ETH")),
        )
        .otherwise(F.array(s, F.lit("XBT")))
    )
    return F.concat(
        cur(base_quote.getItem(0)), F.lit("/"), cur(base_quote.getItem(1))
    )


def _ticks_dict(spark) -> DataFrame:
    rows = [
        (sym, int(v[0]), float(v[1]))
        for sym, v in json.loads((_DATA / "bitmex_ticks.json").read_text()).items()
    ]
    return spark.createDataFrame(
        rows, "tick_symbol string, sym_index bigint, tick_size double"
    )


def _cv_dict(spark) -> DataFrame:
    rows = [
        (k.split(".", 1)[0], k.split(".", 1)[1], v)
        for k, v in json.loads(
            (_DATA / "bitmex_contract_values.json").read_text()
        ).items()
    ]
    return spark.createDataFrame(
        rows, "cv_market_type string, cv_pair string, cv_val double"
    )


def with_contract_value(df: DataFrame, pair_col: str = "pair") -> DataFrame:
    joined = df.join(
        F.broadcast(_cv_dict(df.sparkSession)),
        (F.col("market_type") == F.col("cv_market_type"))
        & (F.col(pair_col) == F.col("cv_pair")),
        "left",
    ).drop("cv_market_type", "cv_pair")
    return joined.withColumn("cv", F.coalesce(F.col("cv_val"), F.lit(1.0))).drop(
        "cv_val"
    )


def id_to_price(sym_index: Column, tick_size: Column, level_id: Column) -> Column:
    """price = round9((1e8 * symbolIdx - id) * tickSize) (bitmex.rs:743-750)."""
    return round9((F.lit(1e8) * sym_index - level_id) * tick_size)


# ---------------------------------------------------------------- router


def _table(msg: Column) -> Column:
    return F.get_json_object(msg, "$.table")


def get_msg_type(msg: Column) -> Column:
    t = _table(msg)
    return (
        F.when(t.isNull(), "other")
        .when(t == "trade", "trade")
        .when(t.isin("orderBookL2", "orderBookL2_25"), "l2_event")
        .when(t == "orderBook10", "l2_topk")
        .when(t == "quote", "bbo")
        .when(t == "tradeBin", "candlestick")
        .when(t == "funding", "funding_rate")
        .otherwise("other")
    )


def extract_symbol(msg: Column) -> Column:
    snap = F.from_json(msg, "array<struct<symbol:string>>")
    data = F.from_json(
        F.get_json_object(msg, "$.data"), "array<struct<symbol:string>>"
    )
    return (
        F.when(msg.startswith('[{"symbol":'), snap.getItem(0)["symbol"])
        .when((_table(msg) == "funding") & (F.size(data) > 1), "ALL")
        .otherwise(data.getItem(0)["symbol"])
    )


def _rfc3339_ms(col: Column) -> Column:
    t = F.to_timestamp(col)
    return (
        F.unix_timestamp(t) * 1000
        + F.floor(F.date_format(t, "SSSSSS").cast("long") / 1000)
    ).cast("long")


def extract_timestamp(msg: Column) -> Column:
    data = F.from_json(
        F.get_json_object(msg, "$.data"), "array<struct<timestamp:string>>"
    )
    mx = F.array_max(
        F.transform(
            F.filter(data, lambda x: x["timestamp"].isNotNull()),
            lambda x: _rfc3339_ms(x["timestamp"]),
        )
    )
    return F.when(
        msg.startswith('[{"symbol":') | (_table(msg) == "funding"),
        F.lit(None).cast("long"),
    ).otherwise(mx)


# ---------------------------------------------------------------- parsers

_TRADE_ELEM = (
    "struct<timestamp:string, symbol:string, side:string, size:double, "
    "price:double, trdMatchID:string, homeNotional:double, "
    "foreignNotional:double>"
)


def parse_trade(df: DataFrame) -> DataFrame:
    """trade table -> TradeMsg: quantities come straight from
    homeNotional/foreignNotional/size (bitmex.rs:660-700) — the one
    exchange where qq != round9(p*qb) exactly (tests/utils.rs:29-31)."""
    arr = F.from_json(F.get_json_object("msg", "$.data"), f"array<{_TRADE_ELEM}>")
    base = (
        df.filter(_table(F.col("msg")) == "trade")
        .transform(explode_with_count(arr))
        .withColumn("pair", normalize_pair(F.col("d.symbol")))
    )
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        F.col("d.symbol").alias("symbol"),
        "pair",
        F.lit("trade").alias("msg_type"),
        _rfc3339_ms(F.col("d.timestamp")).alias("timestamp"),
        F.when(F.col("n_items") == 1, F.col("msg"))
        .otherwise(F.to_json("d"))
        .alias("json"),
        F.when(F.col("d.side") == "Sell", "sell").otherwise("buy").alias("side"),
        F.col("d.price").alias("price"),
        F.col("d.homeNotional").alias("quantity_base"),
        F.col("d.foreignNotional").alias("quantity_quote"),
        F.col("d.size").alias("quantity_contract"),
        F.col("d.trdMatchID").alias("trade_id"),
    )
    return finalize(out, schemas.TRADE_SCHEMA)


_FUNDING_ELEM = (
    "struct<timestamp:string, symbol:string, fundingInterval:string, "
    "fundingRate:double, fundingRateDaily:double>"
)


def parse_funding_rate(df: DataFrame) -> DataFrame:
    """funding table: timestamp = received_at; funding_time = the
    element's RFC3339 settlement timestamp (bitmex.rs:702-738)."""
    arr = F.from_json(F.get_json_object("msg", "$.data"), f"array<{_FUNDING_ELEM}>")
    base = (
        df.filter(_table(F.col("msg")) == "funding")
        .transform(explode_with_count(arr))
        .withColumn("pair", normalize_pair(F.col("d.symbol")))
    )
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        F.col("d.symbol").alias("symbol"),
        "pair",
        F.lit("funding_rate").alias("msg_type"),
        F.col("received_at").alias("timestamp"),
        F.when(F.col("n_items") == 1, F.col("msg"))
        .otherwise(F.to_json("d"))
        .alias("json"),
        F.col("d.fundingRate").alias("funding_rate"),
        _rfc3339_ms(F.col("d.timestamp")).alias("funding_time"),
        F.lit(None).cast("double").alias("estimated_rate"),
    )
    return finalize(out, schemas.FUNDING_RATE_SCHEMA)


_L2_ELEM = (
    "struct<symbol:string, id:bigint, side:string, size:double, "
    "price:double, timestamp:string>"
)


def parse_l2(df: DataFrame) -> DataFrame:
    """orderBookL2 / orderBookL2_25 -> one OrderBookMsg per message:
    levels split by side; missing prices recovered from the broadcast tick
    table; size 0/null = deletion; snapshot = action 'partial'."""
    arr = F.from_json(F.get_json_object("msg", "$.data"), f"array<{_L2_ELEM}>")
    base = (
        df.filter(_table(F.col("msg")).startswith("orderBookL2"))
        .withColumn("levels", arr)
        .filter(F.size("levels") > 0)
        .withColumn("symbol", F.col("levels").getItem(0)["symbol"])
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .withColumn(
            "snapshot", F.get_json_object("msg", "$.action") == "partial"
        )
        .withColumn(
            "ts",
            F.array_max(
                F.transform(
                    F.filter(F.col("levels"), lambda x: x["timestamp"].isNotNull()),
                    lambda x: _rfc3339_ms(x["timestamp"]),
                )
            ),
        )
    )
    base = with_contract_value(base)
    base = base.join(
        F.broadcast(_ticks_dict(df.sparkSession)),
        F.col("symbol") == F.col("tick_symbol"),
        "left",
    ).drop("tick_symbol")

    def to_order(lv):
        price = F.coalesce(
            lv["price"],
            id_to_price(F.col("sym_index"), F.col("tick_size"), lv["id"]),
        )
        qty = F.coalesce(lv["size"], F.lit(0.0))
        t = quantity_triple(F.col("market_type"), price, qty, F.col("cv"))
        return F.struct(
            price.alias("price"),
            t["quantity_base"].alias("quantity_base"),
            t["quantity_quote"].alias("quantity_quote"),
            t["quantity_contract"].alias("quantity_contract"),
        )

    asks = F.transform(
        F.filter(F.col("levels"), lambda x: x["side"] == "Sell"), to_order
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
        F.coalesce(F.col("ts"), F.col("received_at")).alias("timestamp"),
        F.col("msg").alias("json"),
        "snapshot",
        asks.alias("asks"),
        bids.alias("bids"),
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("prev_seq_id"),
    )
    return finalize(sort_book_sides(out), schemas.ORDERBOOK_SCHEMA)


_BOOK10_ELEM = (
    "struct<symbol:string, timestamp:string, "
    "asks:array<array<double>>, bids:array<array<double>>>"
)


def parse_l2_topk(df: DataFrame) -> DataFrame:
    """orderBook10 -> truncated-book snapshots (bitmex.rs:845-897)."""
    arr = F.from_json(F.get_json_object("msg", "$.data"), f"array<{_BOOK10_ELEM}>")
    base = (
        df.filter(_table(F.col("msg")) == "orderBook10")
        .select("*", F.explode(arr).alias("d"))
        .withColumn("symbol", F.col("d.symbol"))
        .withColumn("pair", normalize_pair(F.col("symbol")))
    )
    base = with_contract_value(base)

    def to_order(lv):
        price = lv.getItem(0)
        qty = lv.getItem(1)
        t = quantity_triple(F.col("market_type"), price, qty, F.col("cv"))
        return F.struct(
            price.alias("price"),
            t["quantity_base"].alias("quantity_base"),
            t["quantity_quote"].alias("quantity_quote"),
            t["quantity_contract"].alias("quantity_contract"),
        )

    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("l2_topk").alias("msg_type"),
        _rfc3339_ms(F.col("d.timestamp")).alias("timestamp"),
        F.col("msg").alias("json"),
        F.lit(True).alias("snapshot"),
        F.transform(F.coalesce(F.col("d.asks"), F.array()), to_order).alias("asks"),
        F.transform(F.coalesce(F.col("d.bids"), F.array()), to_order).alias("bids"),
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("prev_seq_id"),
    )
    return finalize(sort_book_sides(out), schemas.ORDERBOOK_SCHEMA)


_BBO_ELEM = (
    "struct<symbol:string, timestamp:string, askSize:double, askPrice:double, "
    "bidSize:double, bidPrice:double>"
)


def parse_bbo(df: DataFrame) -> DataFrame:
    arr = F.from_json(F.get_json_object("msg", "$.data"), f"array<{_BBO_ELEM}>")
    base = (
        df.filter(_table(F.col("msg")) == "quote")
        .select("*", F.explode(arr).alias("d"))
        .withColumn("symbol", F.col("d.symbol"))
        .withColumn("pair", normalize_pair(F.col("symbol")))
    )
    base = with_contract_value(base)
    mt, cv = F.col("market_type"), F.col("cv")
    ask_t = quantity_triple(mt, F.col("d.askPrice"), F.col("d.askSize"), cv)
    bid_t = quantity_triple(mt, F.col("d.bidPrice"), F.col("d.bidSize"), cv)
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("bbo").alias("msg_type"),
        _rfc3339_ms(F.col("d.timestamp")).alias("timestamp"),
        F.col("msg").alias("json"),
        F.col("d.bidPrice").alias("bid_price"),
        bid_t["quantity_base"].alias("bid_quantity_base"),
        bid_t["quantity_quote"].alias("bid_quantity_quote"),
        bid_t["quantity_contract"].alias("bid_quantity_contract"),
        F.col("d.askPrice").alias("ask_price"),
        ask_t["quantity_base"].alias("ask_quantity_base"),
        ask_t["quantity_quote"].alias("ask_quantity_quote"),
        ask_t["quantity_contract"].alias("ask_quantity_contract"),
        F.lit(None).cast("long").alias("id"),
    )
    return finalize(out, schemas.BBO_SCHEMA)


_CANDLE_ELEM = (
    "struct<timestamp:string, symbol:string, open:double, high:double, "
    "low:double, close:double, volume:double, homeNotional:double, "
    "foreignNotional:double>"
)


def parse_candlestick(df: DataFrame) -> DataFrame:
    """tradeBin{N}m tables: period from the table name; begin_time =
    close_ts - N*60s; volume = homeNotional (bitmex.rs:957-1027)."""
    arr = F.from_json(F.get_json_object("msg", "$.data"), f"array<{_CANDLE_ELEM}>")
    table = _table(F.col("msg"))
    minutes = F.regexp_extract(table, r"^tradeBin(\d+)m$", 1).cast("long")
    base = (
        df.filter(table.startswith("tradeBin"))
        .withColumn("minutes", minutes)
        .select("*", F.explode(arr).alias("d"))
        .withColumn("symbol", F.col("d.symbol"))
        .withColumn("pair", normalize_pair(F.col("symbol")))
    )
    ts = _rfc3339_ms(F.col("d.timestamp"))
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("candlestick").alias("msg_type"),
        ts.alias("timestamp"),
        F.col("msg").alias("json"),
        # reference quirk: bitmex begin_time stays in MILLISECONDS
        # (bitmex.rs:1015, unlike the seconds convention elsewhere)
        (ts - F.col("minutes") * 60000).alias("begin_time"),
        F.col("d.open").alias("open"),
        F.col("d.high").alias("high"),
        F.col("d.low").alias("low"),
        F.col("d.close").alias("close"),
        F.col("d.homeNotional").alias("volume"),
        F.concat(F.col("minutes").cast("string"), F.lit("m")).alias("period"),
        F.when(F.col("d.foreignNotional") > 0, F.col("d.foreignNotional")).alias(
            "quote_volume"
        ),
    )
    return finalize(out, schemas.CANDLESTICK_SCHEMA)
