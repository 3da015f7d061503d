"""Huobi normalization as Catalyst column pipelines.

Behavioral reference (reimplemented, not translated):
  - router: crypto-msg-parser/src/exchanges/huobi/mod.rs:20-82
  - spot parsers: huobi/huobi_spot.rs; derivative parsers:
    huobi/huobi_inverse.rs + huobi_linear.rs; funding: huobi/funding_rate.rs
  - pair rules: crypto-pair/src/exchanges/huobi.rs:54-77
  - contract values: crypto-contract-value/src/exchanges/huobi.rs:287-297
    (inverse closed-form; linear via parser/data/huobi_contract_values.json)

Huobi envelope: {ch|topic, ts, tick|data}. Symbols ride inside the channel
name (split('.')[1]); spot symbols are lowercase.
"""

from __future__ import annotations

import json
import pathlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_msg_parser_spark import schemas
from crypto_msg_parser_spark.parser.common import (
    explode_with_count,
    INVERSE,
    SPOT,
    finalize,
    normalize_pair_with_quotes,
    quantity_triple,
    sort_book_sides,
)

EXCHANGE = "huobi"

# offline spot quote set (crypto-pair/src/exchanges/huobi.rs:12-17)
SPOT_QUOTES = [
    "brl", "btc", "eth", "eur", "euroc", "gbp", "ht", "husd", "rub", "trx",
    "try", "tusd", "uah", "usdc", "usdd", "usdt", "ust", "ustc",
]

_DATA = pathlib.Path(__file__).parent / "data/huobi_contract_values.json"


def normalize_pair(symbol: Column) -> Column:
    v = F.split(symbol, "-")
    return (
        F.when(
            symbol.endswith("-USD") | symbol.endswith("-USDT"),
            F.translate(symbol, "-", "/"),
        )
        .when(
            symbol.contains("-C-") | symbol.contains("-P-"),
            F.concat(F.upper(v.getItem(0)), F.lit("/"), F.upper(v.getItem(1))),
        )
        .when(
            symbol.endswith("_CW")
            | symbol.endswith("_NW")
            | symbol.endswith("_CQ")
            | symbol.endswith("_NQ"),
            F.concat(
                symbol.substr(F.lit(1), F.length(symbol) - 3), F.lit("/USD")
            ),
        )
        .otherwise(normalize_pair_with_quotes(symbol, SPOT_QUOTES))
    )


def _linear_cv_dict(spark) -> DataFrame:
    d = json.loads(_DATA.read_text())
    rows = [
        (mt, pair, cv) for mt, table in d.items() for pair, cv in table.items()
    ]
    return spark.createDataFrame(
        rows, "cv_market_type string, cv_pair string, cv double"
    )


def with_contract_value(df: DataFrame, pair_col: str = "pair") -> DataFrame:
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
        .otherwise(F.col("cv")),
    )


# ---------------------------------------------------------------- router


def _channel(msg: Column) -> Column:
    return F.coalesce(
        F.get_json_object(msg, "$.ch"), F.get_json_object(msg, "$.topic")
    )


def get_msg_type(msg: Column) -> Column:
    ch = _channel(msg)
    return (
        F.when(ch.isNull(), "other")
        .when(ch.endswith("trade.detail"), "trade")
        .when(
            ch.endswith("depth.size_20.high_freq")
            | ch.endswith("depth.size_150.high_freq")
            | ch.endswith("mbp.20"),
            "l2_event",
        )
        .when(ch.contains(".depth.step"), "l2_topk")
        .when(ch.endswith("bbo"), "bbo")
        .when(ch.endswith(".funding_rate"), "funding_rate")
        .when(ch.endswith("detail"), "ticker")
        .when(ch.contains(".kline."), "candlestick")
        .otherwise("other")
    )


def extract_symbol(msg: Column) -> Column:
    ch = _channel(msg)
    arr = F.from_json(F.get_json_object(msg, "$.data"), "array<string>")
    return (
        F.when(F.size(F.coalesce(arr, F.array())) > 1, "ALL")
        .when(ch == "public.*.funding_rate", "ALL")
        .otherwise(F.split(ch, "\\.").getItem(1))
    )


def extract_timestamp(msg: Column) -> Column:
    return F.get_json_object(msg, "$.ts").cast("long")


# ---------------------------------------------------------------- parsers

_TRADE_TICK = (
    "struct<id:bigint, ts:bigint, data:array<struct<id:bigint, tradeId:bigint, "
    "ts:bigint, amount:double, quantity:double, price:double, direction:string>>>"
)


def parse_trade(df: DataFrame) -> DataFrame:
    """trade.detail -> TradeMsg rows.
    Spot (huobi_spot.rs:81-114): qb=amount, qq=price*amount (no rounding),
    trade_id=tradeId. Derivatives (huobi_inverse.rs:96-141, huobi_linear.rs):
    qb comes from the message's own `quantity`, qq from the quantity
    calculus, qc=amount (contracts), trade_id=id."""
    tick = F.from_json(F.get_json_object("msg", "$.tick"), _TRADE_TICK)
    base = (
        df.withColumn("ch", _channel(F.col("msg")))
        .filter(F.col("ch").endswith("trade.detail"))
        .withColumn("symbol", F.split("ch", "\\.").getItem(1))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .transform(explode_with_count(tick["data"]))
    )
    base = with_contract_value(base)
    is_spot = F.col("market_type") == SPOT
    price = F.col("d.price")
    qt = quantity_triple(
        F.col("market_type"), price, F.col("d.amount"), F.col("cv")
    )
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("trade").alias("msg_type"),
        F.col("d.ts").alias("timestamp"),
        F.when(F.col("n_items") == 1, F.col("msg"))
        .otherwise(F.to_json("d"))
        .alias("json"),
        F.when(F.col("d.direction") == "sell", "sell").otherwise("buy").alias("side"),
        price.alias("price"),
        F.when(is_spot, F.col("d.amount")).otherwise(F.col("d.quantity")).alias(
            "quantity_base"
        ),
        F.when(is_spot, price * F.col("d.amount"))
        .otherwise(qt["quantity_quote"])
        .alias("quantity_quote"),
        F.when(is_spot, F.lit(None).cast("double"))
        .otherwise(F.col("d.amount"))
        .alias("quantity_contract"),
        F.when(is_spot, F.col("d.tradeId"))
        .otherwise(F.col("d.id"))
        .cast("string")
        .alias("trade_id"),
    )
    return finalize(out, schemas.TRADE_SCHEMA)


_SPOT_BOOK = (
    "struct<seqNum:bigint, prevSeqNum:bigint, "
    "asks:array<array<double>>, bids:array<array<double>>>"
)
_DERIV_BOOK = (
    "struct<id:bigint, ts:bigint, mrid:bigint, event:string, "
    "asks:array<array<double>>, bids:array<array<double>>>"
)


def _spot_levels(raw: Column) -> Column:
    def to_order(lv):
        price = lv.getItem(0)
        qty = lv.getItem(1)
        return F.struct(
            price.alias("price"),
            qty.alias("quantity_base"),
            (price * qty).alias("quantity_quote"),
            F.lit(None).cast("double").alias("quantity_contract"),
        )

    return F.transform(F.coalesce(raw, F.array()), to_order)


def _deriv_levels(raw: Column, mt: Column, cv: Column) -> Column:
    def to_order(lv):
        price = lv.getItem(0)
        qty = lv.getItem(1)
        t = quantity_triple(mt, price, qty, cv)
        return F.struct(
            price.alias("price"),
            t["quantity_base"].alias("quantity_base"),
            t["quantity_quote"].alias("quantity_quote"),
            t["quantity_contract"].alias("quantity_contract"),
        )

    # huobi may send JSON null for an absent side (utils.rs:89-98)
    return F.transform(F.coalesce(raw, F.array()), to_order)


def parse_l2(df: DataFrame) -> DataFrame:
    """mbp/depth channels -> OrderBookMsg. Spot mbp = L2Event with
    seqNum/prevSeqNum; *.depth.step* = L2TopK snapshots; derivative
    high_freq events carry mrid + snapshot/update flag."""
    ch = _channel(F.col("msg"))
    spot_tick = F.from_json(F.get_json_object("msg", "$.tick"), _SPOT_BOOK)
    deriv_tick = F.from_json(F.get_json_object("msg", "$.tick"), _DERIV_BOOK)
    base = (
        df.withColumn("ch", ch)
        .filter(
            F.col("ch").contains(".mbp.")
            | F.col("ch").contains(".depth.step")
            | F.col("ch").endswith(".high_freq")
        )
        .withColumn("symbol", F.split("ch", "\\.").getItem(1))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .withColumn("st", spot_tick)
        .withColumn("dt", deriv_tick)
        .withColumn("ts", F.get_json_object("msg", "$.ts").cast("long"))
    )
    base = with_contract_value(base)
    is_spot = F.col("market_type") == SPOT
    is_topk = F.col("ch").contains(".depth.step")
    snapshot = F.when(is_topk, F.lit(True)).otherwise(
        F.coalesce(F.col("dt.event") == "snapshot", F.lit(False))
    )
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.when(is_topk, "l2_topk").otherwise("l2_event").alias("msg_type"),
        F.col("ts").alias("timestamp"),
        F.col("msg").alias("json"),
        snapshot.alias("snapshot"),
        F.when(is_spot, _spot_levels(F.col("st.asks")))
        .otherwise(_deriv_levels(F.col("dt.asks"), F.col("market_type"), F.col("cv")))
        .alias("asks"),
        F.when(is_spot, _spot_levels(F.col("st.bids")))
        .otherwise(_deriv_levels(F.col("dt.bids"), F.col("market_type"), F.col("cv")))
        .alias("bids"),
        F.when(is_spot, F.col("st.seqNum")).otherwise(F.col("dt.mrid")).alias(
            "seq_id"
        ),
        F.when(is_spot, F.col("st.prevSeqNum"))
        .otherwise(F.lit(None).cast("long"))
        .alias("prev_seq_id"),
    )
    return finalize(sort_book_sides(out), schemas.ORDERBOOK_SCHEMA)


parse_l2_topk = parse_l2  # huobi L2TopK rides the same channels (mod.rs:127-132)

_SPOT_BBO = (
    "struct<seqId:bigint, ask:double, askSize:double, bid:double, "
    "bidSize:double, quoteTime:bigint, symbol:string>"
)
_DERIV_BBO = (
    "struct<id:bigint, ts:bigint, mrid:bigint, ch:string, "
    "bid:array<double>, ask:array<double>>"
)


def parse_bbo(df: DataFrame) -> DataFrame:
    ch = _channel(F.col("msg"))
    base = (
        df.withColumn("ch", ch)
        .filter(F.col("ch").endswith(".bbo"))
        .withColumn("symbol", F.split("ch", "\\.").getItem(1))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .withColumn("sb", F.from_json(F.get_json_object("msg", "$.tick"), _SPOT_BBO))
        .withColumn("db", F.from_json(F.get_json_object("msg", "$.tick"), _DERIV_BBO))
        .withColumn("ts", F.get_json_object("msg", "$.ts").cast("long"))
    )
    base = with_contract_value(base)
    is_spot = F.col("market_type") == SPOT
    mt, cv = F.col("market_type"), F.col("cv")
    d_ask = quantity_triple(
        mt, F.col("db.ask").getItem(0), F.col("db.ask").getItem(1), cv
    )
    d_bid = quantity_triple(
        mt, F.col("db.bid").getItem(0), F.col("db.bid").getItem(1), cv
    )
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("bbo").alias("msg_type"),
        F.col("ts").alias("timestamp"),
        F.col("msg").alias("json"),
        F.when(is_spot, F.col("sb.bid"))
        .otherwise(F.col("db.bid").getItem(0))
        .alias("bid_price"),
        F.when(is_spot, F.col("sb.bidSize"))
        .otherwise(d_bid["quantity_base"])
        .alias("bid_quantity_base"),
        F.when(is_spot, F.col("sb.bid") * F.col("sb.bidSize"))
        .otherwise(d_bid["quantity_quote"])
        .alias("bid_quantity_quote"),
        F.when(is_spot, F.lit(None).cast("double"))
        .otherwise(d_bid["quantity_contract"])
        .alias("bid_quantity_contract"),
        F.when(is_spot, F.col("sb.ask"))
        .otherwise(F.col("db.ask").getItem(0))
        .alias("ask_price"),
        F.when(is_spot, F.col("sb.askSize"))
        .otherwise(d_ask["quantity_base"])
        .alias("ask_quantity_base"),
        F.when(is_spot, F.col("sb.ask") * F.col("sb.askSize"))
        .otherwise(d_ask["quantity_quote"])
        .alias("ask_quantity_quote"),
        F.when(is_spot, F.lit(None).cast("double"))
        .otherwise(d_ask["quantity_contract"])
        .alias("ask_quantity_contract"),
        F.when(is_spot, F.col("sb.seqId")).otherwise(F.col("db.mrid")).alias("id"),
    )
    return finalize(out, schemas.BBO_SCHEMA)


_FUNDING = (
    "struct<op:string, topic:string, ts:bigint, data:array<struct<"
    "symbol:string, contract_code:string, funding_time:string, "
    "funding_rate:string, estimated_rate:string, settlement_time:string>>>"
)


def parse_funding_rate(df: DataFrame) -> DataFrame:
    """funding_rate topic -> FundingRateMsg; funding_time comes from
    settlement_time (funding_rate.rs:33-59)."""
    w = F.from_json(F.col("msg"), _FUNDING)
    base = (
        df.withColumn("w", w)
        .filter(F.col("w.topic").endswith(".funding_rate"))
        .withColumn("n_items", F.size("w.data"))
        .select("*", F.explode("w.data").alias("d"))
        .withColumn("pair", normalize_pair(F.col("d.contract_code")))
    )
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        F.col("d.contract_code").alias("symbol"),
        "pair",
        F.lit("funding_rate").alias("msg_type"),
        F.col("w.ts").alias("timestamp"),
        F.when(F.col("n_items") == 1, F.col("msg"))
        .otherwise(F.to_json("d"))
        .alias("json"),
        F.col("d.funding_rate").cast("double").alias("funding_rate"),
        F.col("d.settlement_time").cast("long").alias("funding_time"),
        F.col("d.estimated_rate").cast("double").alias("estimated_rate"),
    )
    return finalize(out, schemas.FUNDING_RATE_SCHEMA)


_CANDLE = (
    "struct<id:bigint, mrid:bigint, open:double, close:double, low:double, "
    "high:double, amount:double, vol:double, count:bigint>"
)


def parse_candlestick(df: DataFrame) -> DataFrame:
    """kline channels -> CandlestickMsg: begin_time = tick.id (already
    seconds); spot quote_volume = vol; derivatives = vol * contract_value."""
    ch = _channel(F.col("msg"))
    base = (
        df.withColumn("ch", ch)
        .filter(F.col("ch").contains(".kline."))
        .withColumn("symbol", F.split("ch", "\\.").getItem(1))
        .withColumn("period", F.split("ch", "\\.").getItem(3))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .withColumn("t", F.from_json(F.get_json_object("msg", "$.tick"), _CANDLE))
        .withColumn("ts", F.get_json_object("msg", "$.ts").cast("long"))
    )
    base = with_contract_value(base)
    is_spot = F.col("market_type") == SPOT
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("candlestick").alias("msg_type"),
        F.col("ts").alias("timestamp"),
        F.col("msg").alias("json"),
        F.col("t.id").alias("begin_time"),
        F.col("t.open").alias("open"),
        F.col("t.high").alias("high"),
        F.col("t.low").alias("low"),
        F.col("t.close").alias("close"),
        F.col("t.amount").alias("volume"),
        "period",
        F.when(is_spot, F.col("t.vol"))
        .otherwise(F.col("t.vol") * F.col("cv"))
        .alias("quote_volume"),
    )
    return finalize(out, schemas.CANDLESTICK_SCHEMA)
