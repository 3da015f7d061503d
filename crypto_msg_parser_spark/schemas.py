"""Fixed output schemas for the normalized market-data tables.

Derived from the reference's output structs (crypto-message/src/lib.rs:59-213,
order.rs:9-18) — see SURVEY.md §1.3. All prices/quantities are DoubleType
(the reference uses f64 everywhere, no decimals); timestamps are LongType
Unix milliseconds; `json` is the raw-message provenance column.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Common identity fields (crypto-message/src/lib.rs:12-45 add_common_fields!)
_COMMON = [
    T.StructField("exchange", T.StringType(), False),
    T.StructField("market_type", T.StringType(), False),
    T.StructField("symbol", T.StringType(), False),
    T.StructField("pair", T.StringType(), False),
    T.StructField("msg_type", T.StringType(), False),
    T.StructField("timestamp", T.LongType(), False),
    T.StructField("json", T.StringType(), False),
]

# One orderbook level (crypto-message/src/order.rs:9-18; serialized as a
# 4-float JSON array in the reference's CSV codec — in-engine it is a struct).
ORDER_STRUCT = T.StructType(
    [
        T.StructField("price", T.DoubleType(), False),
        T.StructField("quantity_base", T.DoubleType(), False),
        T.StructField("quantity_quote", T.DoubleType(), False),
        T.StructField("quantity_contract", T.DoubleType(), True),
    ]
)

TRADE_SCHEMA = T.StructType(
    _COMMON
    + [
        T.StructField("side", T.StringType(), False),  # taker side: buy|sell
        T.StructField("price", T.DoubleType(), False),
        T.StructField("quantity_base", T.DoubleType(), False),
        T.StructField("quantity_quote", T.DoubleType(), False),
        T.StructField("quantity_contract", T.DoubleType(), True),  # NULL iff spot
        T.StructField("trade_id", T.StringType(), False),
    ]
)

ORDERBOOK_SCHEMA = T.StructType(
    _COMMON
    + [
        T.StructField("snapshot", T.BooleanType(), False),
        T.StructField("asks", T.ArrayType(ORDER_STRUCT), False),
        T.StructField("bids", T.ArrayType(ORDER_STRUCT), False),
        T.StructField("seq_id", T.LongType(), True),
        T.StructField("prev_seq_id", T.LongType(), True),
    ]
)

FUNDING_RATE_SCHEMA = T.StructType(
    _COMMON
    + [
        T.StructField("funding_rate", T.DoubleType(), False),
        T.StructField("funding_time", T.LongType(), False),
        T.StructField("estimated_rate", T.DoubleType(), True),
    ]
)

BBO_SCHEMA = T.StructType(
    _COMMON
    + [
        T.StructField("bid_price", T.DoubleType(), False),
        T.StructField("bid_quantity_base", T.DoubleType(), False),
        T.StructField("bid_quantity_quote", T.DoubleType(), False),
        T.StructField("bid_quantity_contract", T.DoubleType(), True),
        T.StructField("ask_price", T.DoubleType(), False),
        T.StructField("ask_quantity_base", T.DoubleType(), False),
        T.StructField("ask_quantity_quote", T.DoubleType(), False),
        T.StructField("ask_quantity_contract", T.DoubleType(), True),
        T.StructField("id", T.LongType(), True),
    ]
)

CANDLESTICK_SCHEMA = T.StructType(
    _COMMON
    + [
        T.StructField("begin_time", T.LongType(), False),  # SECONDS (lib.rs:200)
        T.StructField("open", T.DoubleType(), False),
        T.StructField("high", T.DoubleType(), False),
        T.StructField("low", T.DoubleType(), False),
        T.StructField("close", T.DoubleType(), False),
        T.StructField("volume", T.DoubleType(), False),  # base volume
        T.StructField("period", T.StringType(), False),  # e.g. '1m'
        T.StructField("quote_volume", T.DoubleType(), True),
    ]
)

# Crawl payload table (BASELINE.json input_hint): interleaved text+media spans.
SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'text' | 'media'
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
    ]
)

# Routed raw-message table (parse-stage input; FIXTURES.md §2).
RAW_MESSAGES_SCHEMA = T.StructType(
    [
        T.StructField("msg_id", T.StringType(), False),
        T.StructField("exchange", T.StringType(), False),
        T.StructField("market_type", T.StringType(), False),
        T.StructField("msg_type", T.StringType(), True),
        T.StructField("received_at", T.LongType(), True),
        T.StructField("msg", T.StringType(), False),
    ]
)

# Crawl frontier table (FIXTURES.md §4).
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("exchange", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), True),
        T.StructField("rate_budget_per_min", T.IntegerType(), True),
    ]
)

MARKET_TYPES = [
    "spot",
    "linear_future",
    "inverse_future",
    "linear_swap",
    "inverse_swap",
    "quanto_future",
    "quanto_swap",
    "european_option",
    "move",
    "bvol",
    "unknown",
]

MESSAGE_TYPES = [
    "trade",
    "l2_event",
    "l2_topk",
    "l2_snapshot",
    "bbo",
    "ticker",
    "candlestick",
    "funding_rate",
    "other",
]

EXCHANGES = [
    "binance",
    "bitfinex",
    "bitget",
    "bithumb",
    "bitmex",
    "bitstamp",
    "bitz",
    "bybit",
    "coinbase_pro",
    "deribit",
    "dydx",
    "ftx",
    "gate",
    "huobi",
    "kraken",
    "kucoin",
    "mexc",
    "okx",
    "zb",
    "zbg",
]
