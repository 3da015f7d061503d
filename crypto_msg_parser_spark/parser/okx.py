"""OKX (v5 API) normalization as Catalyst column pipelines.

Behavioral reference (reimplemented, not translated):
  - router + parsers: crypto-msg-parser/src/exchanges/okx/okx_v5.rs
  - pair rule: crypto-pair/src/lib.rs:66-69 (split '-', BASE/QUOTE)
  - contract values: crypto-contract-value/src/exchanges/okx.rs
    (inverse closed-form BTC 100 / other 10; linear from the offline table,
    shipped as parser/data/okx_contract_values.json and broadcast-joined)

OKX envelopes every message as {arg:{channel,instId}, data:[...]}; all
parsers explode the data array (flatMap), keep the whole raw message as
provenance when len(data)==1 and the element's canonical JSON otherwise.
"""

from __future__ import annotations

import json
import pathlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_msg_parser_spark import schemas
from crypto_msg_parser_spark.parser.common import (
    INVERSE,
    SPOT,
    finalize,
    quantity_triple,
    sort_book_sides,
)

EXCHANGE = "okx"

_DATA = pathlib.Path(__file__).parent / "data/okx_contract_values.json"


def normalize_pair(symbol: Column) -> Column:
    """BTC-USDT-SWAP -> BTC/USDT (lib.rs:66-69: first two '-' fields)."""
    v = F.split(symbol, "-")
    return F.concat(v.getItem(0), F.lit("/"), v.getItem(1))


def _linear_cv_dict(spark) -> DataFrame:
    d = json.loads(_DATA.read_text())
    rows = [
        (mt, pair, cv)
        for mt, table in d.items()
        for pair, cv in table.items()
    ]
    return spark.createDataFrame(
        rows, "cv_market_type string, cv_pair string, cv double"
    )


def with_contract_value(df: DataFrame, pair_col: str = "pair") -> DataFrame:
    """Attach the contract multiplier as column `cv`:
    spot 1, inverse closed-form, linear via broadcast dict join."""
    spark = df.sparkSession
    joined = df.join(
        F.broadcast(_linear_cv_dict(spark)),
        (F.col("market_type") == F.col("cv_market_type"))
        & (F.col(pair_col) == F.col("cv_pair")),
        "left",
    ).drop("cv_market_type", "cv_pair")
    return joined.withColumn(
        "cv",
        F.when(F.col("market_type") == SPOT, F.lit(1.0))
        .when(
            F.col("market_type").isin(*INVERSE),
            F.when(F.col(pair_col).startswith("BTC"), 100.0).otherwise(10.0),
        )
        .when(F.col("market_type") == "european_option", F.lit(1.0))
        .otherwise(F.col("cv")),
    )


# ---------------------------------------------------------------- router


def _channel(msg: Column) -> Column:
    return F.get_json_object(msg, "$.arg.channel")


def get_msg_type(msg: Column) -> Column:
    ch = _channel(msg)
    return (
        F.when(ch.isNull(), "other")
        .when(ch == "trades", "trade")
        .when(ch.isin("books", "books-l2-tbt", "books50-l2-tbt"), "l2_event")
        .when(ch == "books5", "l2_topk")
        .when(ch == "bbo-tbt", "bbo")
        .when(ch == "tickers", "ticker")
        .when(ch == "funding-rate", "funding_rate")
        .when(ch.startswith("candle"), "candlestick")
        .otherwise("other")
    )


def extract_symbol(msg: Column) -> Column:
    """arg.instId for ws messages; REST {code,data:[...]} handling:
    >1 rows -> ALL, ==1 -> its instId or NONE (okx_v5.rs:93-115)."""
    ws = F.get_json_object(msg, "$.arg.instId")
    rest_arr = F.from_json(
        F.get_json_object(msg, "$.data"), "array<struct<instId:string>>"
    )
    code_ok = F.get_json_object(msg, "$.code") == "0"
    return F.when(ws.isNotNull(), ws).when(
        code_ok,
        F.when(F.size(rest_arr) > 1, "ALL")
        .when(
            (F.size(rest_arr) == 1) & rest_arr.getItem(0)["instId"].isNotNull(),
            rest_arr.getItem(0)["instId"],
        )
        .otherwise("NONE"),
    )


def extract_timestamp(msg: Column) -> Column:
    """max(data[].ts) — None for funding-rate and candle channels
    (okx_v5.rs:118-149)."""
    ch = F.coalesce(_channel(msg), F.lit(""))
    arr = F.from_json(
        F.get_json_object(msg, "$.data"), "array<struct<ts:string>>"
    )
    mx = F.array_max(F.transform(arr, lambda x: x["ts"].cast("long")))
    return F.when(
        (ch == "funding-rate") | ch.startswith("candle"),
        F.lit(None).cast("long"),
    ).otherwise(mx)


# ---------------------------------------------------------------- parsers

_TRADE_ELEM = (
    "struct<instId:string, tradeId:string, px:string, sz:string, "
    "side:string, ts:string>"
)


def parse_trade(df: DataFrame) -> DataFrame:
    """trades channel -> TradeMsg rows (okx_v5.rs parse_trade).
    quantity_contract = size for all non-spot markets."""
    arr = F.from_json(F.get_json_object("msg", "$.data"), f"array<{_TRADE_ELEM}>")
    base = (
        df.filter(_channel(F.col("msg")) == "trades")
        .withColumn("n_items", F.size(arr))
        .select("*", F.explode(arr).alias("d"))
        .withColumn("pair", normalize_pair(F.col("d.instId")))
    )
    base = with_contract_value(base)
    price = F.col("d.px").cast("double")
    size = F.col("d.sz").cast("double")
    qt = quantity_triple(F.col("market_type"), price, size, F.col("cv"))
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        F.col("d.instId").alias("symbol"),
        "pair",
        F.lit("trade").alias("msg_type"),
        F.col("d.ts").cast("long").alias("timestamp"),
        F.when(F.col("n_items") == 1, F.col("msg"))
        .otherwise(F.to_json("d"))
        .alias("json"),
        F.when(F.col("d.side") == "sell", "sell").otherwise("buy").alias("side"),
        price.alias("price"),
        qt["quantity_base"].alias("quantity_base"),
        qt["quantity_quote"].alias("quantity_quote"),
        F.when(F.col("market_type") == SPOT, F.lit(None).cast("double"))
        .otherwise(size)
        .alias("quantity_contract"),
        F.col("d.tradeId").alias("trade_id"),
    )
    return finalize(out, schemas.TRADE_SCHEMA)


_BOOK_ELEM = (
    "struct<asks:array<array<string>>, bids:array<array<string>>, ts:string>"
)


def _levels(raw: Column, mt: Column, cv: Column) -> Column:
    def to_order(lv):
        price = lv.getItem(0).cast("double")
        qty = lv.getItem(1).cast("double")
        t = quantity_triple(mt, price, qty, cv)
        return F.struct(
            price.alias("price"),
            t["quantity_base"].alias("quantity_base"),
            t["quantity_quote"].alias("quantity_quote"),
            t["quantity_contract"].alias("quantity_contract"),
        )

    return F.transform(raw, to_order)


def parse_l2(df: DataFrame) -> DataFrame:
    """books/books5/books-l2-tbt channels -> OrderBookMsg
    (okx_v5.rs parse_l2): snapshot = action=='snapshot', or channel=='books5'
    when no action; books5 is L2TopK."""
    ch = _channel(F.col("msg"))
    arr = F.from_json(F.get_json_object("msg", "$.data"), f"array<{_BOOK_ELEM}>")
    action = F.get_json_object("msg", "$.action")
    base = (
        df.filter(
            ch.isin("books", "books-l2-tbt", "books50-l2-tbt", "books5")
        )
        .withColumn("ch", ch)
        .withColumn("action", action)
        .withColumn("n_items", F.size(arr))
        .select("*", F.explode(arr).alias("d"))
        .withColumn(
            "symbol", F.get_json_object("msg", "$.arg.instId")
        )
        .withColumn("pair", normalize_pair(F.col("symbol")))
    )
    base = with_contract_value(base)
    snapshot = F.when(
        F.col("action").isNotNull(), F.col("action") == "snapshot"
    ).otherwise(F.col("ch") == "books5")
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.when(F.col("ch") == "books5", "l2_topk").otherwise("l2_event").alias(
            "msg_type"
        ),
        F.col("d.ts").cast("long").alias("timestamp"),
        F.when(F.col("n_items") == 1, F.col("msg"))
        .otherwise(F.to_json("d"))
        .alias("json"),
        snapshot.alias("snapshot"),
        _levels(F.col("d.asks"), F.col("market_type"), F.col("cv")).alias("asks"),
        _levels(F.col("d.bids"), F.col("market_type"), F.col("cv")).alias("bids"),
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("prev_seq_id"),
    )
    return finalize(sort_book_sides(out), schemas.ORDERBOOK_SCHEMA)


# okx L2TopK rides the same books5 channel; the reference routes
# parse_l2_topk straight to parse_l2 (okx/mod.rs:98-103)
parse_l2_topk = parse_l2


_FUNDING_ELEM = (
    "struct<instType:string, instId:string, fundingRate:string, "
    "nextFundingRate:string, fundingTime:string>"
)


def parse_funding_rate(df: DataFrame) -> DataFrame:
    """funding-rate channel -> FundingRateMsg; timestamp is received_at —
    the message embeds none (okx_v5.rs:222-252, lib.rs:247-251)."""
    arr = F.from_json(
        F.get_json_object("msg", "$.data"), f"array<{_FUNDING_ELEM}>"
    )
    base = (
        df.filter(_channel(F.col("msg")) == "funding-rate")
        .withColumn("n_items", F.size(arr))
        .select("*", F.explode(arr).alias("d"))
        .withColumn("pair", normalize_pair(F.col("d.instId")))
    )
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        F.col("d.instId").alias("symbol"),
        "pair",
        F.lit("funding_rate").alias("msg_type"),
        F.col("received_at").alias("timestamp"),
        F.when(F.col("n_items") == 1, F.col("msg"))
        .otherwise(F.to_json("d"))
        .alias("json"),
        F.col("d.fundingRate").cast("double").alias("funding_rate"),
        F.col("d.fundingTime").cast("long").alias("funding_time"),
        F.col("d.nextFundingRate").cast("double").alias("estimated_rate"),
    )
    return finalize(out, schemas.FUNDING_RATE_SCHEMA)


def parse_bbo(df: DataFrame) -> DataFrame:
    """bbo-tbt channel -> BboMsg from the best level of each side; messages
    with an empty side are dropped (okx_v5.rs:318-330)."""
    arr = F.from_json(F.get_json_object("msg", "$.data"), f"array<{_BOOK_ELEM}>")
    base = (
        df.filter(_channel(F.col("msg")) == "bbo-tbt")
        .withColumn("d", arr.getItem(0))
        .filter((F.size("d.asks") > 0) & (F.size("d.bids") > 0))
        .withColumn("symbol", F.get_json_object("msg", "$.arg.instId"))
        .withColumn("pair", normalize_pair(F.col("symbol")))
    )
    base = with_contract_value(base)
    ask = F.col("d.asks").getItem(0)
    bid = F.col("d.bids").getItem(0)
    ask_t = quantity_triple(
        F.col("market_type"),
        ask.getItem(0).cast("double"),
        ask.getItem(1).cast("double"),
        F.col("cv"),
    )
    bid_t = quantity_triple(
        F.col("market_type"),
        bid.getItem(0).cast("double"),
        bid.getItem(1).cast("double"),
        F.col("cv"),
    )
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("bbo").alias("msg_type"),
        F.col("d.ts").cast("long").alias("timestamp"),
        F.col("msg").alias("json"),
        bid.getItem(0).cast("double").alias("bid_price"),
        bid_t["quantity_base"].alias("bid_quantity_base"),
        bid_t["quantity_quote"].alias("bid_quantity_quote"),
        bid_t["quantity_contract"].alias("bid_quantity_contract"),
        ask.getItem(0).cast("double").alias("ask_price"),
        ask_t["quantity_base"].alias("ask_quantity_base"),
        ask_t["quantity_quote"].alias("ask_quantity_quote"),
        ask_t["quantity_contract"].alias("ask_quantity_contract"),
        F.lit(None).cast("long").alias("id"),
    )
    return finalize(out, schemas.BBO_SCHEMA)


def parse_candlestick(df: DataFrame) -> DataFrame:
    """candle* channels: positional [ts,o,h,l,c,vol,volCcy] arrays;
    timestamp = received_at; period = channel minus candle/utc affixes;
    volume semantics per market family (okx_v5.rs:363-424)."""
    ch = _channel(F.col("msg"))
    arr = F.from_json(
        F.get_json_object("msg", "$.data"), "array<array<string>>"
    )
    base = (
        df.filter(ch.startswith("candle"))
        .withColumn("ch", ch)
        .withColumn("d", arr.getItem(0))
        .withColumn("symbol", F.get_json_object("msg", "$.arg.instId"))
        .withColumn("pair", normalize_pair(F.col("symbol")))
    )
    base = with_contract_value(base)
    period = F.regexp_replace(
        F.regexp_replace(F.col("ch"), "^candle", ""), "utc$", ""
    )
    vol = F.col("d").getItem(5).cast("double")
    vol_ccy = F.col("d").getItem(6).cast("double")
    mt = F.col("market_type")
    volume = (
        F.when(mt == SPOT, vol)
        .when(mt.isin(*INVERSE), vol_ccy)
        .otherwise(vol_ccy)
    )
    quote_volume = (
        F.when(mt == SPOT, vol_ccy)
        .when(mt.isin(*INVERSE), vol * F.col("cv"))
        .otherwise(F.lit(None).cast("double"))
    )
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("candlestick").alias("msg_type"),
        F.col("received_at").alias("timestamp"),
        F.col("msg").alias("json"),
        (F.col("d").getItem(0).cast("long") / 1000).cast("long").alias("begin_time"),
        F.col("d").getItem(1).cast("double").alias("open"),
        F.col("d").getItem(2).cast("double").alias("high"),
        F.col("d").getItem(3).cast("double").alias("low"),
        F.col("d").getItem(4).cast("double").alias("close"),
        volume.alias("volume"),
        period.alias("period"),
        quote_volume.alias("quote_volume"),
    )
    return finalize(out, schemas.CANDLESTICK_SCHEMA)
