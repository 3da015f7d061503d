"""ZB normalization (spot + linear swaps).

Behavioral reference (reimplemented Spark-first, not translated):
  crypto-msg-parser/src/exchanges/zb/{mod.rs, zb_spot.rs, zb_swap.rs};
  pair rules crypto-pair/src/exchanges/zb.rs:4-18 ('_'->'/' upper, or
  usdt/usdc/qc/btc suffix matching); contract value always 1.0
  (crypto-contract-value/src/lib.rs:25).

Spot channels use underscores (btcusdt_trades); swap channels use dots
(BTC_USDT.Trade). Spot L2 incremental is explicitly unimplemented in the
reference (zb_spot.rs:143-145) — only DepthWhole-style topk snapshots
exist. The swap trade side check compares the TIMESTAMP slot against zero
(zb_swap.rs:112, an upstream quirk) so every swap trade lands as 'buy';
preserved for parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_msg_parser_spark import schemas
from crypto_msg_parser_spark.parser.common import (
    explode_with_count,
    parsed_once,
    SPOT,
    finalize,
    quantity_triple,
    sort_book_sides,
)
from crypto_msg_parser_spark.functions.scalar import round9

EXCHANGE = "zb"


def normalize_pair(symbol: Column) -> Column:
    quote = F.regexp_extract(F.lower(symbol), "(usdt|usdc|qc|btc)$", 1)
    base = symbol.substr(F.lit(1), F.length(symbol) - F.length(quote))
    return F.when(
        symbol.contains("_"), F.upper(F.translate(symbol, "_", "/"))
    ).when(
        quote != "",
        F.upper(F.concat(base, F.lit("/"), quote)),
    )


# ---------------------------------------------------------------- router

def _channel(msg: Column) -> Column:
    return F.get_json_object(msg, "$.channel")


def extract_symbol(msg: Column) -> Column:
    """zb/mod.rs:16-44: channel prefix before '.' (swap) or '_' (spot)."""
    ch = _channel(msg)
    has_book = (
        F.get_json_object(msg, "$.asks").isNotNull()
        & F.get_json_object(msg, "$.bids").isNotNull()
    )
    rest_swap = (
        F.get_json_object(msg, "$.code").isNotNull()
        & F.get_json_object(msg, "$.desc").isNotNull()
        & F.get_json_object(msg, "$.data").isNotNull()
    )
    return (
        F.when(
            ch.isNotNull(),
            F.when(ch.contains("."), F.substring_index(ch, ".", 1)).when(
                ch.contains("_"), F.substring_index(ch, "_", 1)
            ),
        )
        .when(has_book, "NONE")
        .when(
            rest_swap,
            F.coalesce(F.get_json_object(msg, "$.data.symbol"), F.lit("NONE")),
        )
    )


def extract_timestamp(msg: Column) -> Column:
    """zb_spot.rs:13-55 + zb_swap.rs:12-74."""
    ch = _channel(msg)
    spot_ch = F.split(ch, "_")[1]
    swap_ch = F.split(ch, "\\.")[1]
    trades = F.from_json(
        F.get_json_object(msg, "$.data"), "array<struct<date:bigint>>"
    )
    kline_spot = F.from_json(
        F.get_json_object(msg, "$.datas.data"), "array<array<string>>"
    )
    swap_arrays = F.from_json(
        F.get_json_object(msg, "$.data"), "array<array<double>>"
    )
    ticker_map = F.from_json(
        F.get_json_object(msg, "$.data"), "map<string, array<double>>"
    )
    rest_swap = (
        F.get_json_object(msg, "$.code").isNotNull()
        & F.get_json_object(msg, "$.desc").isNotNull()
    )
    return (
        F.when(
            ch.isNotNull() & ch.contains("."),
            F.when(
                swap_ch == "Trade",
                F.array_max(
                    F.transform(swap_arrays, lambda x: x.getItem(3).cast("long"))
                )
                * 1000,
            )
            .when(
                swap_ch.isin("Depth", "DepthWhole"),
                F.get_json_object(msg, "$.data.time").try_cast("long"),
            )
            .when(
                swap_ch == "Ticker",
                F.when(
                    ch == "All.Ticker",
                    F.array_max(
                        F.transform(
                            F.map_values(ticker_map),
                            lambda x: x.getItem(6).cast("long"),
                        )
                    )
                    * 1000,
                ).otherwise(
                    F.get_json_object(msg, "$.data[6]").cast("long") * 1000
                ),
            )
            .when(
                swap_ch.startswith("KLine_"),
                F.array_max(
                    F.transform(swap_arrays, lambda x: x.getItem(5).cast("long"))
                )
                * 1000,
            ),
        )
        .when(
            ch.isNotNull(),
            F.when(
                spot_ch == "ticker",
                F.get_json_object(msg, "$.date").cast("long"),
            )
            .when(
                spot_ch == "depth",
                F.get_json_object(msg, "$.timestamp").try_cast("long") * 1000,
            )
            .when(
                spot_ch == "trades",
                F.array_max(F.transform(trades, lambda x: x["date"])) * 1000,
            )
            .when(
                spot_ch == "kline",
                F.array_max(
                    F.transform(kline_spot, lambda x: x[0].cast("long"))
                ),
            ),
        )
        .when(rest_swap, F.get_json_object(msg, "$.data.time").try_cast("long"))
        .otherwise(F.get_json_object(msg, "$.timestamp").try_cast("long") * 1000)
    )


# ---------------------------------------------------------------- trades

_SPOT_TRADE = (
    "array<struct<date:bigint, amount:string, price:string,"
    " trade_type:string, type:string, tid:bigint>>"
)


def parse_trade(df: DataFrame) -> DataFrame:
    return _parse_trade_spot(df.filter(F.col("market_type") == SPOT)).unionByName(
        _parse_trade_swap(df.filter(F.col("market_type") != SPOT))
    )


def _parse_trade_spot(df: DataFrame) -> DataFrame:
    """zb_spot.rs:104-140: ts = date*1000; trade_id = tid; json is the
    re-serialized element ALWAYS (no single-message override)."""
    arr = F.from_json(F.get_json_object("msg", "$.data"), _SPOT_TRADE)
    base = (
        df.filter(_channel(F.col("msg")).endswith("_trades"))
        .withColumn("symbol", F.substring_index(_channel(F.col("msg")), "_", 1))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .select("*", F.explode(arr).alias("d"))
    )
    price = F.col("d.price").cast("double")
    qty = F.col("d.amount").cast("double")
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("trade").alias("msg_type"),
        (F.col("d.date") * 1000).alias("timestamp"),
        F.to_json("d").alias("json"),
        F.when(F.col("d.type") == "sell", "sell").otherwise("buy").alias("side"),
        price.alias("price"),
        qty.alias("quantity_base"),
        (price * qty).alias("quantity_quote"),
        F.lit(None).cast("double").alias("quantity_contract"),
        F.col("d.tid").cast("string").alias("trade_id"),
    )
    return finalize(out, schemas.TRADE_SCHEMA)


def _parse_trade_swap(df: DataFrame) -> DataFrame:
    """zb_swap.rs:77-119: data = [[price, qty, ?, ts_s]]; trade_id = ts;
    side always 'buy' (reference checks ts<0, preserved quirk)."""
    arr = F.from_json(F.get_json_object("msg", "$.data"), "array<array<double>>")
    base = (
        df.filter(_channel(F.col("msg")).endswith(".Trade"))
        .withColumn("symbol", F.substring_index(_channel(F.col("msg")), ".", 1))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .select("*", F.explode(arr).alias("d"))
    )
    price = F.col("d").getItem(0)
    qty = F.col("d").getItem(1)
    ts = (F.col("d").getItem(3).cast("long") * 1000).cast("long")
    q = quantity_triple(F.col("market_type"), price, qty, F.lit(1.0))
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("trade").alias("msg_type"),
        ts.alias("timestamp"),
        F.to_json("d").alias("json"),
        F.when(F.col("d").getItem(3) < 0, "sell").otherwise("buy").alias("side"),
        price.alias("price"),
        q["quantity_base"].alias("quantity_base"),
        q["quantity_quote"].alias("quantity_quote"),
        q["quantity_contract"].alias("quantity_contract"),
        ts.cast("string").alias("trade_id"),
    )
    return finalize(out, schemas.TRADE_SCHEMA)


# ---------------------------------------------------------------- orderbooks

def parse_l2(df: DataFrame) -> DataFrame:
    """Spot incremental L2 is unimplemented in the reference
    (zb_spot.rs:143-145) — only the swap path emits rows."""
    return _parse_l2_swap(df.filter(F.col("market_type") != SPOT))


def parse_l2_topk(df: DataFrame) -> DataFrame:
    return _parse_l2_topk_spot(df.filter(F.col("market_type") == SPOT)).unionByName(
        _parse_l2_swap(df.filter(F.col("market_type") != SPOT))
    )


def _parse_l2_topk_spot(df: DataFrame) -> DataFrame:
    """zb_spot.rs:147-190: top-level {channel, dataType, timestamp, asks,
    bids}; ts seconds*1000; snapshot."""
    book = F.from_json(
        F.col("msg"),
        "struct<timestamp:bigint, asks:array<array<double>>,"
        " bids:array<array<double>>>",
    )
    base = (
        df.filter(_channel(F.col("msg")).endswith("_depth"))
        .withColumn("symbol", F.substring_index(_channel(F.col("msg")), "_", 1))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .transform(parsed_once(book))
    )

    def order(lv):
        price = lv.getItem(0)
        qty = lv.getItem(1)
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
        "pair",
        F.lit("l2_topk").alias("msg_type"),
        (F.col("d.timestamp") * 1000).alias("timestamp"),
        F.col("msg").alias("json"),
        F.lit(True).alias("snapshot"),
        F.transform(F.coalesce("d.asks", F.array()), order).alias("asks"),
        F.transform(F.coalesce("d.bids", F.array()), order).alias("bids"),
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("prev_seq_id"),
    )
    return finalize(sort_book_sides(out), schemas.ORDERBOOK_SCHEMA)


def _parse_l2_swap(df: DataFrame) -> DataFrame:
    """zb_swap.rs:155-204: .Depth (event; snapshot iff type=='Whole') and
    .DepthWhole (topk snapshot); ts = data.time (ms string)."""
    ch = _channel(F.col("msg"))
    book = F.from_json(
        F.get_json_object("msg", "$.data"),
        "struct<time:string, asks:array<array<double>>,"
        " bids:array<array<double>>>",
    )
    is_topk = ch.endswith(".DepthWhole")
    base = (
        df.filter(ch.endswith(".Depth") | ch.endswith(".DepthWhole"))
        .withColumn("symbol", F.substring_index(ch, ".", 1))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .transform(parsed_once(book))
        .withColumn("is_topk", is_topk)
        .withColumn(
            "snapshot",
            is_topk
            | F.coalesce(
                F.get_json_object("msg", "$.type") == "Whole", F.lit(False)
            ),
        )
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
        F.when(F.col("is_topk"), "l2_topk").otherwise("l2_event").alias("msg_type"),
        F.col("d.time").cast("long").alias("timestamp"),
        F.col("msg").alias("json"),
        "snapshot",
        F.transform(F.coalesce("d.asks", F.array()), order).alias("asks"),
        F.transform(F.coalesce("d.bids", F.array()), order).alias("bids"),
        F.lit(None).cast("long").alias("seq_id"),
        F.lit(None).cast("long").alias("prev_seq_id"),
    )
    return finalize(sort_book_sides(out), schemas.ORDERBOOK_SCHEMA)


# ---------------------------------------------------------------- candles

def parse_candlestick(df: DataFrame) -> DataFrame:
    return _parse_candle_spot(df.filter(F.col("market_type") == SPOT)).unionByName(
        _parse_candle_swap(df.filter(F.col("market_type") != SPOT))
    )


def _parse_candle_spot(df: DataFrame) -> DataFrame:
    """zb_spot.rs:193-266: datas.data = [[ts_ms, o, h, l, c, vol]];
    channel '<sym>_kline_<period>'; quote volume derived from the OHLC
    average price, round9'ed."""
    ch = _channel(F.col("msg"))
    arr = F.from_json(
        F.get_json_object("msg", "$.datas.data"), "array<array<double>>"
    )
    period = F.substring_index(ch, "_", -1)
    num = F.regexp_extract(period, "^([0-9]+)", 1).cast("long")
    m_seconds = (
        F.when(period.endswith("min"), num * 60000)
        .when(period.endswith("hour"), num * 3600000)
        .when(period.endswith("day"), num * 86400000)
        .when(period.endswith("week"), num * 604800000)
        .otherwise(F.lit(0))
    )
    base = (
        df.filter(ch.contains("_kline"))
        .withColumn("symbol", F.substring_index(ch, "_", 1))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .withColumn("period", period)
        .withColumn("m_seconds", m_seconds)
        .transform(explode_with_count(arr))
    )
    ts = F.col("d").getItem(0).cast("long")
    o = F.col("d").getItem(1)
    h = F.col("d").getItem(2)
    low = F.col("d").getItem(3)
    c = F.col("d").getItem(4)
    qty = F.col("d").getItem(5)
    avg = (o + h + low + c) / 4
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("candlestick").alias("msg_type"),
        ts.alias("timestamp"),
        F.col("msg").alias("json"),
        (ts - F.col("m_seconds")).alias("begin_time"),
        o.alias("open"),
        h.alias("high"),
        low.alias("low"),
        c.alias("close"),
        qty.alias("volume"),
        "period",
        round9(round9(qty * avg)).alias("quote_volume"),
    )
    return finalize(out, schemas.CANDLESTICK_SCHEMA)


def _parse_candle_swap(df: DataFrame) -> DataFrame:
    """zb_swap.rs:207-277: data = [[o, h, l, c, vol, ts_s]];
    channel '<sym>.KLine_<period>'; linear quantity math with cv=1."""
    ch = _channel(F.col("msg"))
    arr = F.from_json(F.get_json_object("msg", "$.data"), "array<array<double>>")
    period = F.substring_index(ch, "_", -1)
    num = F.regexp_extract(period, "^([0-9]+)", 1).cast("long")
    m_seconds = (
        F.when(period.endswith("M"), num * 60000)
        .when(period.endswith("H"), num * 3600000)
        .when(period.endswith("D"), num * 86400000)
        .otherwise(F.lit(0))
    )
    base = (
        df.filter(ch.contains(".KLine"))
        .withColumn("symbol", F.substring_index(ch, ".", 1))
        .withColumn("pair", normalize_pair(F.col("symbol")))
        .withColumn("period", period)
        .withColumn("m_seconds", m_seconds)
        .select("*", F.explode(arr).alias("d"))
    )
    ts = (F.col("d").getItem(5).cast("long") * 1000).cast("long")
    o = F.col("d").getItem(0)
    h = F.col("d").getItem(1)
    low = F.col("d").getItem(2)
    c = F.col("d").getItem(3)
    qty = F.col("d").getItem(4)
    avg = (o + h + low + c) / 4
    out = base.select(
        F.lit(EXCHANGE).alias("exchange"),
        "market_type",
        "symbol",
        "pair",
        F.lit("candlestick").alias("msg_type"),
        ts.alias("timestamp"),
        F.col("msg").alias("json"),
        (ts - F.col("m_seconds")).alias("begin_time"),
        o.alias("open"),
        h.alias("high"),
        low.alias("low"),
        c.alias("close"),
        round9(qty).alias("volume"),
        "period",
        round9(round9(qty * avg)).alias("quote_volume"),
    )
    return finalize(out, schemas.CANDLESTICK_SCHEMA)
