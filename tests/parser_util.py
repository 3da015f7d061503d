"""Helpers to replay reference fixtures through the parse stage."""

from __future__ import annotations

import json
import pathlib

from pyspark.sql import functions as F

from crypto_msg_parser_spark.schemas import RAW_MESSAGES_SCHEMA

FIXTURES = pathlib.Path(__file__).parent / "fixtures/reference_fixtures.jsonl"

# reference round9 (crypto-msg-parser/src/exchanges/utils.rs:26-30)
def round9(x: float) -> float:
    import math

    scaled = x * 1e9
    # Rust f64::round = half away from zero
    return (math.floor(scaled + 0.5) if scaled >= 0 else math.ceil(scaled - 0.5)) / 1e9


def load_fixtures(exchange: str | None = None, msg_type: str | None = None):
    rows = [json.loads(line) for line in FIXTURES.open()]
    if exchange:
        rows = [r for r in rows if r["exchange"] == exchange]
    if msg_type:
        rows = [r for r in rows if r["msg_type"] == msg_type]
    return rows


RECEIVED_AT = 1609459200000  # deterministic crawl-receive time for fixtures


def fixtures_df(spark, rows):
    data = [
        (
            r["fixture_id"],
            r["exchange"],
            r["market_type"],
            r["msg_type"],
            RECEIVED_AT,
            r["raw"],
        )
        for r in rows
    ]
    return spark.createDataFrame(data, RAW_MESSAGES_SCHEMA)


def check_trade_invariants(trades, exchange):
    """Replica of the reference's check_trade_fields
    (crypto-msg-parser/tests/utils.rs:8-34)."""
    assert trades, "no trades parsed"
    for t in trades:
        assert t["exchange"] == exchange
        assert t["msg_type"] == "trade"
        assert t["price"] > 0
        assert t["quantity_base"] > 0
        assert t["quantity_quote"] > 0
        if exchange != "bitmex":
            assert round9(t["quantity_quote"]) == round9(
                t["price"] * t["quantity_base"]
            ), t
        assert t["trade_id"]
        assert len(str(t["timestamp"])) == 13, t
        assert "/" in t["pair"], t


def check_orderbook_invariants(books, exchange, msg_type):
    """Replica of check_orderbook_fields (tests/utils.rs:36-66)."""
    assert books, "no orderbooks parsed"
    for ob in books:
        assert ob["exchange"] == exchange
        assert ob["msg_type"] == msg_type
        assert len(str(ob["timestamp"])) == 13, ob
        for order in ob["asks"]:
            assert order["price"] > 0
            assert order["quantity_base"] >= 0
            assert order["quantity_quote"] >= 0
        if ob["snapshot"]:
            ask_prices = [o["price"] for o in ob["asks"]]
            bid_prices = [o["price"] for o in ob["bids"]]
            assert ask_prices == sorted(ask_prices)
            assert bid_prices == sorted(bid_prices, reverse=True)


def check_funding_invariants(rates, exchange):
    """Replica of check_funding_rate_fields (tests/utils.rs:68-88)."""
    assert rates, "no funding rates parsed"
    for fr in rates:
        assert fr["exchange"] == exchange
        assert fr["msg_type"] == "funding_rate"
        assert -1.0 < fr["funding_rate"] < 1.0
        if exchange == "bitmex":
            assert fr["funding_time"] % (4 * 3600000) == 0
        elif exchange == "bitget":
            assert fr["funding_time"] % 3600000 == 0
        else:
            assert fr["funding_time"] % (8 * 3600000) == 0


def rows_by_id(df, raw_df):
    """Parse output joined back to fixture ids via the json column."""
    id_map = {r["msg"]: r["msg_id"] for r in raw_df.collect()}
    out = {}
    for row in df.collect():
        d = row.asDict(recursive=True)
        out.setdefault(id_map.get(d["json"]), []).append(d)
    return out
