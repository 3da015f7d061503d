"""Bybit parse-stage parity with the reference fixtures
(crypto-msg-parser/tests/bybit.rs)."""

from __future__ import annotations

from crypto_msg_parser_spark.parser import bybit
from tests.parser_util import (
    check_orderbook_invariants,
    check_trade_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
)


def _parsed(spark, msg_type, parse_fn):
    rows = [
        r for r in load_fixtures("bybit", msg_type) if r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), rows


def test_trade_fixtures(spark):
    by_id, rows = _parsed(spark, "trade", bybit.parse_trade)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "bybit")

    # golden values from tests/bybit.rs:13-99
    inv = by_id["bybit:trade:inverse_swap:1"][0]
    assert inv["pair"] == "BTC/USD"
    assert inv["timestamp"] == 1616304710061
    assert inv["quantity_base"] == 237.0 / 57073.5
    assert inv["quantity_quote"] == 237.0
    assert inv["quantity_contract"] == 237.0
    assert inv["side"] == "buy"

    lin = by_id["bybit:trade:linear_swap:2"][0]
    assert lin["pair"] == "BTC/USDT"
    assert lin["quantity_base"] == 0.04
    assert lin["price"] == 57170.0
    assert lin["side"] == "buy"

    # inverse_future message fans out to 2 trades; element-level json
    # provenance means they group under no fixture id
    fut_rows = [
        t for t in by_id.get(None, []) if t["market_type"] == "inverse_future"
    ]
    assert len(fut_rows) == 2
    assert {t["quantity_quote"] for t in fut_rows} == {100.0, 300.0}


def test_l2_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_event", bybit.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "bybit", "l2_event")
    snaps = [b for b in books if b["snapshot"]]
    assert snaps
    for b in snaps:
        assert len(b["asks"]) > 0 and len(b["bids"]) > 0
        # inverse contracts are 1 USD: qq == contracts
        if b["market_type"] in ("inverse_swap", "inverse_future"):
            for o in b["asks"] + b["bids"]:
                assert o["quantity_quote"] == o["quantity_contract"]


def test_candlestick_fixtures(spark):
    by_id, _ = _parsed(spark, "candlestick", bybit.parse_candlestick)
    candles = [c for cs in by_id.values() for c in cs] + by_id.get(None, [])
    assert candles
    for c in candles:
        assert c["low"] <= c["high"]
        assert len(str(c["begin_time"])) == 10
        assert len(str(c["timestamp"])) == 13
        assert c["period"] != ""
