"""Symbol -> MarketType inference (crypto-pair get_market_type,
crypto-pair/src/lib.rs:86-109 and per-exchange rules) as pure column
expressions — the third leg of the reference's public pair API
(SURVEY §2.10) next to normalize_pair and get_contract_value.

`is_spot` mirrors the reference's Option<bool> disambiguator for the
exchanges where one symbol exists in both spot and derivative markets
(binance, gate, mexc).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# plain strings: when()/otherwise() lift them; module-level F.lit would
# need an active SparkContext at import time
SPOT = "spot"
UNKNOWN = "unknown"

# crypto-pair/src/exchanges/bitmex.rs:6-15
_BITMEX_FIAT = ["BRL", "CHF", "CNH", "EUR", "INR", "MXN", "NZD", "SEK", "TRY", "USD", "ZAR"]


def _num(col: Column) -> Column:
    return col.rlike("^[0-9]+$")


def _binance(symbol: Column, is_spot: Column) -> Column:
    last6 = symbol.substr(F.length(symbol) - 5, F.lit(6))
    dateless = F.regexp_replace(symbol, ".{7}$", "")
    return (
        F.when(symbol.endswith("USD_PERP"), "inverse_swap")
        .when(symbol.endswith("-P") | symbol.endswith("-C"), "european_option")
        .when(
            (F.length(symbol) > 7) & _num(last6),
            F.when(dateless.endswith("USDT"), "linear_future")
            .when(dateless.endswith("USD"), "inverse_future")
            .otherwise("unknown"),
        )
        .when(is_spot.isNotNull() & is_spot, "spot")
        .otherwise("linear_swap")
    )


def _bitmex(symbol: Column) -> Column:
    """crypto-pair/src/exchanges/bitmex.rs:18-155 (spot/_USDT, FX quanto
    swaps, dated futures by 2-digit year code, linear/inverse/quanto by
    settle currency)."""
    suffix3 = symbol.substr(F.length(symbol) - 2, F.lit(3))
    prefix3 = symbol.substr(F.lit(1), F.lit(3))
    base_fx = symbol.substr(F.lit(1), F.length(symbol) - 3)
    quote_fx = symbol.substr(F.lit(4), F.length(symbol))
    is_fx = F.when(
        suffix3.isin(*_BITMEX_FIAT),
        (base_fx == "USDT") | base_fx.isin(*_BITMEX_FIAT),
    ).otherwise(
        F.when(
            prefix3.isin(*_BITMEX_FIAT),
            (quote_fx == "USDT") | quote_fx.isin(*_BITMEX_FIAT),
        ).otherwise(F.lit(False))
    )
    has_us = symbol.contains("_")
    date_us = F.regexp_extract(symbol, "(..)_[^_]*$", 1)
    date_tail = symbol.substr(F.length(symbol) - 1, F.lit(2))
    is_future = F.when(has_us, _num(date_us)).otherwise(_num(date_tail))
    real = (
        F.when(
            is_future & has_us, F.regexp_replace(symbol, ".{3}_[^_]*$", "")
        )
        .when(is_future, symbol.substr(F.lit(1), F.length(symbol) - 3))
        .otherwise(symbol)
    )
    cls = (
        F.when(real == "USDTUSDC", 2)
        .when(real.endswith("USDT"), 0)
        .when(real.startswith("XBT") | symbol.endswith("_ETH"), 1)
        .when(real.endswith("USD") | real.endswith("EUR"), 2)
        .when(real.endswith("YLD"), 3)
        .otherwise(0)
    )
    return (
        F.when(symbol.endswith("_USDT"), "spot")
        .when(is_fx, "quanto_swap")
        .when(cls == 3, "unknown")
        .when(
            cls == 0, F.when(is_future, "linear_future").otherwise("linear_swap")
        )
        .when(
            cls == 1,
            F.when(is_future, "inverse_future").otherwise("inverse_swap"),
        )
        .otherwise(F.when(is_future, "quanto_future").otherwise("quanto_swap"))
    )


def get_market_type(
    exchange: Column, symbol: Column, is_spot: Column | None = None
) -> Column:
    """(exchange, symbol[, is_spot]) -> snake_case MarketType string."""
    if is_spot is None:
        is_spot = F.lit(None).cast("boolean")
    last2 = symbol.substr(F.length(symbol) - 1, F.lit(2))
    last6 = symbol.substr(F.length(symbol) - 5, F.lit(6))
    last8 = symbol.substr(F.length(symbol) - 7, F.lit(8))
    lower_eq = F.lower(symbol) == symbol
    return (
        F.when(exchange == "binance", _binance(symbol, is_spot))
        .when(
            exchange == "bitfinex",
            F.when(
                symbol.endswith("F0") | symbol.endswith("f0"), "linear_swap"
            ).otherwise(SPOT),
        )
        .when(
            exchange == "bitget",
            # crypto-pair/src/exchanges/bitget.rs:47-79 (v3 + legacy v1)
            F.when(symbol.endswith("_SPBL"), "spot")
            .when(
                symbol.endswith("_UMCBL") | symbol.endswith("_CMCBL"),
                "linear_swap",
            )
            .when(symbol.endswith("_DMCBL"), "inverse_swap")
            .when(
                symbol.contains("_UMCBL_") | symbol.contains("_CMCBL_"),
                "linear_future",
            )
            .when(symbol.contains("_DMCBL_"), "inverse_future")
            .when(symbol.startswith("cmt_"), "linear_swap")
            .when(symbol.contains("_"), "spot")
            .when(symbol.endswith("usd"), "inverse_swap")
            .otherwise(UNKNOWN),
        )
        .when(exchange.isin("bithumb", "bitstamp", "bitz", "coinbase_pro"), SPOT)
        .when(exchange == "bitmex", _bitmex(symbol))
        .when(
            exchange == "bybit",
            F.when(symbol.endswith("USDT"), "linear_swap")
            .when(symbol.endswith("USD"), "inverse_swap")
            .when(_num(last2), "inverse_future")
            .otherwise(UNKNOWN),
        )
        .when(
            exchange == "deribit",
            F.when(symbol.endswith("-PERPETUAL"), "inverse_swap")
            .when((F.length(symbol) > 7) & _num(last2), "inverse_future")
            .when(
                symbol.endswith("-P") | symbol.endswith("-C"),
                "european_option",
            )
            .otherwise(UNKNOWN),
        )
        .when(exchange == "dydx", F.lit("linear_swap"))
        .when(
            exchange == "ftx",
            F.when(symbol.endswith("-PERP"), "linear_swap")
            .when(symbol.contains("-MOVE-"), "move")
            .when(symbol.contains("BVOL/"), "bvol")
            .when(symbol.contains("/"), "spot")
            .when(symbol.contains("-"), "linear_future")
            .otherwise(UNKNOWN),
        )
        .when(
            exchange == "gate",
            # crypto-pair/src/exchanges/gate.rs:3-28
            F.when(
                symbol.endswith("_USD"),
                F.when(is_spot.isNotNull() & is_spot, "spot").otherwise(
                    "inverse_swap"
                ),
            )
            .when(
                symbol.endswith("_USDT"),
                F.when(is_spot.isNotNull() & is_spot, "spot").otherwise(
                    "linear_swap"
                ),
            )
            .when(
                (F.length(symbol) > 8) & _num(last8),
                F.when(symbol.contains("_USD_"), "inverse_future")
                .when(symbol.contains("_USDT_"), "linear_future")
                .otherwise(UNKNOWN),
            )
            .when(symbol.contains("_"), "spot")
            .otherwise(UNKNOWN),
        )
        .when(
            exchange == "huobi",
            F.when(symbol.endswith("-USD"), "inverse_swap")
            .when(symbol.endswith("-USDT"), "linear_swap")
            .when(
                symbol.contains("-C-") | symbol.contains("-P-"),
                "european_option",
            )
            .when(
                symbol.endswith("_CW")
                | symbol.endswith("_NW")
                | symbol.endswith("_CQ")
                | symbol.endswith("_NQ"),
                "inverse_future",
            )
            .otherwise(SPOT),
        )
        .when(
            exchange == "kraken",
            F.when(symbol.rlike("^(pi|PI)_"), "inverse_swap")
            .when(symbol.rlike("^(fi|FI)_"), "inverse_future")
            .otherwise(SPOT),
        )
        .when(
            exchange == "kucoin",
            F.when(symbol.endswith("USDM"), "inverse_swap")
            .when(
                symbol.endswith("USDTM") | symbol.endswith("USDCM"),
                "linear_swap",
            )
            .when(_num(last2), "inverse_future")
            .when(symbol.contains("-"), "spot")
            .otherwise(UNKNOWN),
        )
        .when(
            exchange.isin("mexc", "mxc"),
            F.when(symbol.endswith("_USD"), "inverse_swap")
            .when(
                symbol.endswith("_USDT"),
                F.when(is_spot.isNotNull() & is_spot, "spot").otherwise(
                    "linear_swap"
                ),
            )
            .when(symbol.contains("_"), "spot")
            .otherwise(UNKNOWN),
        )
        .when(
            exchange.isin("okx", "okex"),
            F.when(symbol.endswith("-USD-SWAP"), "inverse_swap")
            .when(
                symbol.endswith("-USDT-SWAP") | symbol.endswith("-USDC-SWAP"),
                "linear_swap",
            )
            .when(
                symbol.endswith("-C") | symbol.endswith("-P"),
                "european_option",
            )
            .when(
                _num(last6),
                F.when(symbol.contains("-USD-"), "inverse_future")
                .when(
                    symbol.contains("-USDT-") | symbol.contains("-USDC-"),
                    "linear_future",
                )
                .otherwise(UNKNOWN),
            )
            .when(symbol.contains("-"), "spot")
            .otherwise(UNKNOWN),
        )
        .when(
            exchange == "zb",
            F.when(lower_eq, "spot").otherwise("linear_swap"),
        )
        .when(
            exchange == "zbg",
            F.when(symbol.endswith("_USD-R"), "inverse_swap")
            .when(
                symbol.endswith("_USDT") | symbol.endswith("_ZUSD"),
                "linear_swap",
            )
            .otherwise(SPOT),
        )
        .otherwise(UNKNOWN)
    )


def normalize_currency(exchange: Column, currency: Column) -> Column:
    """crypto-pair/src/lib.rs:12-20: per-exchange currency aliasing
    (bitfinex/bitmex/kraken/kucoin), uppercase elsewhere."""
    from crypto_msg_parser_spark.parser import bitfinex as _bfx
    from crypto_msg_parser_spark.parser import kraken as _krk
    from crypto_msg_parser_spark.parser import kucoin as _kcn

    return (
        F.when(exchange == "bitfinex", _bfx._norm_currency(currency))
        .when(
            exchange == "bitmex",
            F.when(currency == "XBT", "BTC").otherwise(currency),
        )
        .when(exchange == "kraken", _krk._norm_currency(currency))
        .when(exchange == "kucoin", _kcn._norm_currency(currency))
        .otherwise(F.upper(currency))
    )
