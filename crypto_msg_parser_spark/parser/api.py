"""Public parse-stage API — the engine twin of the reference's lib.rs surface
(crypto-msg-parser/src/lib.rs: extract_symbol :14, extract_timestamp :45,
parse_trade :76, parse_l2 :107, parse_l2_topk :165, parse_bbo :202,
parse_funding_rate :223, parse_candlestick :256, get_msg_type :316).

Each function takes a raw-message DataFrame with columns
(msg, exchange, market_type, received_at, ...) and dispatches per exchange.
The dispatch is a partition-pruning filter per exchange module + unionByName
— Catalyst merges the per-exchange branches into one scan when the input is
partitioned by exchange (the recommended layout:
df.write.partitionBy('exchange', 'market_type', 'msg_type')).

Exchange coverage grows module by module; EXCHANGES maps the reference's 20
dispatch arms to their implementation status.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_msg_parser_spark.parser import (
    binance,
    bitfinex,
    bithumb,
    bitstamp,
    bitz,
    bitget,
    bitmex,
    bybit,
    coinbase_pro,
    deribit,
    dydx,
    ftx,
    gate,
    huobi,
    kraken,
    kucoin,
    mexc,
    okx,
    zb,
    zbg,
)

# exchange -> module implementing (a subset of) the parse functions
_MODULES = {
    "binance": binance,
    "huobi": huobi,
    "okx": okx,
    "okex": okx,  # alias (lib.rs:36)
    "bybit": bybit,
    "dydx": dydx,
    "bitmex": bitmex,
    "gate": gate,
    "bitget": bitget,
    "kucoin": kucoin,
    "deribit": deribit,
    "mexc": mexc,
    "mxc": mexc,  # alias (lib.rs:35)
    "zbg": zbg,
    "bitfinex": bitfinex,
    "kraken": kraken,
    "ftx": ftx,
    "zb": zb,
    "coinbase_pro": coinbase_pro,
    "bithumb": bithumb,
    "bitstamp": bitstamp,
    "bitz": bitz,
}

IMPLEMENTED = sorted(set(_MODULES) - {"okex", "mxc"})
PLANNED: list[str] = []  # all 20 reference dispatch arms implemented

# alias rows in _MODULES (skipped when iterating arms; folded into the
# canonical arm's match set instead). lib.rs:35,41 semantics.
_ALIAS_KEYS = ("okex", "mxc")
_ALIASES = {"okx": ["okex"], "mexc": ["mxc"]}


def _dispatch_arms():
    """Yield (exchange, accepted_names, module) once per canonical arm —
    the single place the alias map and skip set are consulted, so every
    dispatcher (union router, column ladder, struct ladder) matches the
    same name set."""
    for exchange, mod in _MODULES.items():
        if exchange in _ALIAS_KEYS:
            continue
        yield exchange, [exchange, *_ALIASES.get(exchange, [])], mod


def _dispatch(df: DataFrame, fn_name: str) -> DataFrame:
    """Route by the exchange column to each module's parser and union."""
    parts: list[DataFrame] = []
    for _, names, mod in _dispatch_arms():
        fn: Callable[[DataFrame], DataFrame] | None = getattr(mod, fn_name, None)
        if fn is None:
            continue
        sub = df.filter(F.col("exchange").isin(*names))
        parts.append(fn(sub))
    if not parts:
        raise ValueError(f"no exchange implements {fn_name}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def parse_trade(df: DataFrame) -> DataFrame:
    return _dispatch(df, "parse_trade")


def parse_l2(df: DataFrame) -> DataFrame:
    return _dispatch(df, "parse_l2")


def parse_l2_topk(df: DataFrame) -> DataFrame:
    return _dispatch(df, "parse_l2_topk")


def parse_l2_snapshot(df: DataFrame) -> DataFrame:
    """REST depth snapshots — binance/bitfinex/bitget only
    (lib.rs:286-298). The input needs a `routed_symbol` column for the
    response formats that embed no symbol (the reference's Option<&str>
    parameter, filled by the crawler from the request URL)."""
    parts = []
    for name in ("binance", "bitfinex", "bitget"):
        mod = _MODULES[name]
        sub = df.filter(F.col("exchange") == name)
        parts.append(mod.parse_l2_snapshot(sub))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def parse_bbo(df: DataFrame) -> DataFrame:
    return _dispatch(df, "parse_bbo")


def parse_funding_rate(df: DataFrame) -> DataFrame:
    return _dispatch(df, "parse_funding_rate")


def parse_candlestick(df: DataFrame) -> DataFrame:
    return _dispatch(df, "parse_candlestick")


# The reference's top-level get_msg_type sniffs ONLY these 9 exchanges and
# returns Other for everything else (lib.rs:316-329). Several engine
# modules carry sniffers beyond this set (bitstamp, bitfinex,
# coinbase_pro, kucoin, mexc, dydx — useful pre-parse routing the
# reference never exposes); by default the api-level ladder matches the
# reference EXACTLY so routing triples are interchangeable with the
# crate's, and the extra arms are an explicit opt-in (extended=True) or
# direct module calls (e.g. kucoin.get_msg_type).
REFERENCE_MSG_TYPE_ARMS = frozenset(
    {"binance", "bitget", "bitmex", "bybit", "deribit", "ftx", "huobi",
     "kraken", "okx"}
)


def _msg_type_fn(exchange_name: str, mod, extended: bool):
    if not extended and exchange_name not in REFERENCE_MSG_TYPE_ARMS:
        return None
    return getattr(mod, "get_msg_type", None)


def _route_col(
    fn_name: str, exchange: Column, msg: Column, extended: bool = False
) -> Column:
    if fn_name == "get_msg_type":
        # exchanges without a sniffer return Other (lib.rs:327)
        expr = F.lit("other")
    else:
        expr = F.lit(None).cast(
            "string" if fn_name != "extract_timestamp" else "long"
        )
    for name, names, mod in _dispatch_arms():
        if fn_name == "get_msg_type":
            fn = _msg_type_fn(name, mod, extended)
        else:
            fn = getattr(mod, fn_name, None)
        if fn is None:
            continue
        expr = F.when(exchange.isin(*names), fn(msg)).otherwise(expr)
    return expr


def get_msg_type(exchange: Column, msg: Column, extended: bool = False) -> Column:
    """Routing triple part 1 — strict reference parity by default: the 9
    sniffed exchanges of lib.rs:316-329, Other for the rest. extended=True
    additionally engages the engine's extra module sniffers."""
    return _route_col("get_msg_type", exchange, msg, extended=extended)


def extract_symbol(exchange: Column, msg: Column) -> Column:
    """Routing triple part 2 (lib.rs:14-42); ALL/NONE sentinels preserved."""
    return _route_col("extract_symbol", exchange, msg)


def extract_timestamp(exchange: Column, msg: Column) -> Column:
    """Routing triple part 3 (lib.rs:45-73); Unix ms or NULL."""
    return _route_col("extract_timestamp", exchange, msg)


def _route_struct(
    exchange: Column, msg: Column, extended: bool = False
) -> Column:
    """ONE 20-exchange ladder producing the whole routing triple as a
    struct, instead of three parallel ladders: the exchange match and the
    per-arm json probes are emitted once, cutting the generated code and
    per-row work to a third. A module missing one of the three functions
    contributes that ladder's default inside its arm (msg_type 'other',
    symbol/ts NULL — lib.rs:327 semantics), identical to the per-column
    ladders skipping the arm. The msg_type component honors the strict
    9-exchange reference parity of get_msg_type unless extended=True."""
    expr = F.struct(
        F.lit("other").alias("routed_msg_type"),
        F.lit(None).cast("string").alias("routed_symbol"),
        F.lit(None).cast("long").alias("routed_ts"),
    )
    for name, names, mod in _dispatch_arms():
        mt = _msg_type_fn(name, mod, extended)
        sym = getattr(mod, "extract_symbol", None)
        ts = getattr(mod, "extract_timestamp", None)
        if mt is None and sym is None and ts is None:
            continue
        match = exchange.isin(*names)
        arm = F.struct(
            (mt(msg) if mt else F.lit("other")).alias("routed_msg_type"),
            (sym(msg) if sym else F.lit(None).cast("string")).alias(
                "routed_symbol"
            ),
            (ts(msg) if ts else F.lit(None).cast("long")).alias("routed_ts"),
        )
        expr = F.when(match, arm).otherwise(expr)
    return expr


def route(df: DataFrame, extended: bool = False) -> DataFrame:
    """Tag a raw-message table with (msg_type, symbol, timestamp) — the
    pre-parse classifier the crawler shards on (SURVEY §3 EP3). This is the
    one place the crawl job shuffles (by (exchange, msg_type)); everything
    downstream is partition-local.

    Physical-design note (measured on 600k mixed msgs, 16 cores): the
    20-exchange when-ladder is ONE pass over the input at ~230k msgs/s
    steady-state but costs ~40s of one-time Catalyst analysis + codegen;
    the union-of-filtered-branches alternative compiles fast but re-scans
    the input once per exchange (~30k msgs/s steady). At 100 TB the
    one-time compile amortizes to nothing and the single-pass ladder wins.
    The triple is computed as ONE fused struct ladder pinned behind a
    Generate barrier (parsed_once): three parallel column ladders tripled
    the generated code past HotSpot's JIT method limit and the stage ran
    INTERPRETED — same 600k rows swung 2s/20s run-to-run; the fused form
    is a third the code and evaluates the exchange match once per row.
    Per-exchange sub-pipelines remain available directly on the modules
    for partition-pruned inputs."""
    from crypto_msg_parser_spark.parser.common import parsed_once

    triple = _route_struct(F.col("exchange"), F.col("msg"), extended=extended)
    cols = df.columns
    return df.transform(parsed_once(triple, alias="_r")).select(
        *cols,
        F.col("_r.routed_msg_type").alias("routed_msg_type"),
        F.col("_r.routed_symbol").alias("routed_symbol"),
        F.col("_r.routed_ts").alias("routed_ts"),
    )
