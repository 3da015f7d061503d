"""Huobi parse-stage parity with the reference fixtures
(crypto-msg-parser/tests/huobi.rs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_msg_parser_spark.parser import huobi
from tests.parser_util import (
    check_funding_invariants,
    check_orderbook_invariants,
    check_trade_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
)


def _parsed(spark, msg_type, parse_fn):
    rows = [
        r
        for r in load_fixtures("huobi", msg_type)
        if r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), rows


def test_trade_fixtures(spark):
    by_id, rows = _parsed(spark, "trade", huobi.parse_trade)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "huobi")

    # golden values from tests/huobi.rs:9-40 (spot) and :73-105 (inverse)
    spot = by_id["huobi:trade:spot:0"][0]
    assert spot["pair"] == "BTC/USDT"
    assert spot["timestamp"] == 1616243199156  # per-trade ts, not envelope ts
    assert spot["quantity_base"] == 1.98e-4
    assert spot["quantity_quote"] == 58911.07 * 1.98e-4
    assert spot["quantity_contract"] is None
    assert spot["side"] == "sell"
    assert spot["trade_id"] == "102357140867"

    inv = by_id["huobi:trade:inverse_swap:3"][0]
    assert inv["pair"] == "BTC/USD"
    assert inv["quantity_quote"] == 600.0
    assert inv["quantity_base"] == 600.0 / 58666.3
    assert inv["quantity_contract"] == 6.0
    assert inv["side"] == "buy"


def test_l2_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_event", huobi.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "huobi", "l2_event")


def test_l2_topk_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_topk", huobi.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    if books:  # step0 depth fixtures
        check_orderbook_invariants(books, "huobi", "l2_topk")
        assert all(b["snapshot"] for b in books)


def test_bbo_fixtures(spark):
    by_id, _ = _parsed(spark, "bbo", huobi.parse_bbo)
    bbos = [b for bs in by_id.values() for b in bs]
    assert bbos
    for b in bbos:
        assert b["ask_price"] >= b["bid_price"] > 0
        assert b["bid_quantity_base"] > 0


def test_funding_fixtures(spark):
    by_id, _ = _parsed(spark, "funding_rate", huobi.parse_funding_rate)
    rates = [r for rs in by_id.values() for r in rs]
    check_funding_invariants(rates, "huobi")
    for r in rates:
        assert r["estimated_rate"] is not None
        assert "/" in r["pair"]


def test_candlestick_fixtures(spark):
    by_id, _ = _parsed(spark, "candlestick", huobi.parse_candlestick)
    candles = [c for cs in by_id.values() for c in cs]
    assert candles
    for c in candles:
        assert c["low"] <= c["high"]
        assert c["volume"] >= 0
        assert c["quote_volume"] is not None
        assert len(str(c["begin_time"])) == 10


def test_router_columns(spark):
    rows = [
        r
        for r in load_fixtures("huobi")
        if r["msg_type"] is not None and r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    routed = raw.select(
        "msg_id",
        "msg_type",
        huobi.get_msg_type(F.col("msg")).alias("detected"),
        huobi.extract_symbol(F.col("msg")).alias("symbol"),
    ).collect()
    for r in routed:
        if r["detected"] != "other" and r["msg_type"] in (
            "trade",
            "l2_event",
            "l2_topk",
            "bbo",
            "funding_rate",
            "candlestick",
        ):
            assert r["detected"] == r["msg_type"], r
        assert r["symbol"], r
