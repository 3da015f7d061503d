"""Binance parse-stage parity with the reference fixtures
(crypto-msg-parser/tests/binance.rs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_msg_parser_spark.parser import binance
from tests.parser_util import (
    check_funding_invariants,
    check_orderbook_invariants,
    check_trade_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
)


def _parsed(spark, msg_type, parse_fn, market_filter=None):
    rows = load_fixtures("binance", msg_type)
    if market_filter:
        rows = [r for r in rows if market_filter(r["market_type"])]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), raw


def test_trade_fixtures(spark):
    by_id, raw = _parsed(
        spark, "trade", binance.parse_trade, lambda mt: mt != "european_option"
    )
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "binance")

    # golden values from tests/binance.rs:14-146
    spot = by_id["binance:trade:spot:0"][0]
    assert spot["pair"] == "BTC/USDT"
    assert spot["timestamp"] == 1616176861895
    assert spot["quantity_base"] == 0.00035600
    assert spot["quantity_quote"] == 0.00035600 * 58942.01
    assert spot["quantity_contract"] is None
    assert spot["side"] == "buy"
    assert spot["trade_id"] == "640283266"
    assert spot["json"].startswith('{"stream":"btcusdt@aggTrade"')

    inv_fut = by_id["binance:trade:inverse_future:1"][0]
    assert inv_fut["pair"] == "BTC/USD"
    assert inv_fut["quantity_base"] == 500.0 / 62838.0
    assert inv_fut["quantity_quote"] == 500.0
    assert inv_fut["quantity_contract"] == 5.0
    assert inv_fut["side"] == "sell"

    lin_fut = by_id["binance:trade:linear_future:2"][0]
    assert lin_fut["pair"] == "BTC/USDT"
    assert lin_fut["quantity_base"] == 0.094
    assert lin_fut["quantity_contract"] == 0.094

    inv_swap = by_id["binance:trade:inverse_swap:3"][0]
    assert inv_swap["price"] == 58570.1
    assert inv_swap["quantity_base"] == 5800.0 / 58570.1
    assert inv_swap["quantity_quote"] == 5800.0
    assert inv_swap["quantity_contract"] == 58.0
    assert inv_swap["side"] == "sell"

    lin_swap = by_id["binance:trade:linear_swap:4"][0]
    assert lin_swap["quantity_base"] == 0.043
    assert lin_swap["quantity_contract"] == 0.043
    assert lin_swap["side"] == "buy"


def test_l2_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_event", binance.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "binance", "l2_event")
    for b in books:
        assert b["snapshot"] is False
        assert b["seq_id"] is not None


def test_l2_topk_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_topk", binance.parse_l2_topk)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "binance", "l2_topk")
    for b in books:
        assert b["snapshot"] is True


def test_bbo_fixtures(spark):
    by_id, _ = _parsed(spark, "bbo", binance.parse_bbo)
    bbos = [b for bs in by_id.values() for b in bs]
    assert bbos
    for b in bbos:
        assert b["bid_price"] > 0 and b["ask_price"] > 0
        assert b["ask_price"] >= b["bid_price"]
        assert len(str(b["timestamp"])) == 13


def test_funding_fixtures(spark):
    by_id, _ = _parsed(spark, "funding_rate", binance.parse_funding_rate)
    rates = [r for rs in by_id.values() for r in rs]
    check_funding_invariants(rates, "binance")
    # tests/binance.rs:154-181: single markPrice message keeps the whole raw
    single = by_id["binance:funding_rate:inverse_swap:6"]
    assert len(single) == 1
    assert single[0]["funding_rate"] == 0.00073689
    assert single[0]["json"].startswith('{"stream":"btcusd_perp@markPrice"')
    # the @arr fan-out produces many records from one message (element-level
    # json provenance, so these rows group under no fixture id)
    arr_rows = by_id.get(None, [])
    arr_fixtures = [
        r for r in load_fixtures("binance", "funding_rate") if "all" in r["fixture_id"]
    ]
    assert arr_fixtures and len(arr_rows) > len(arr_fixtures)


def test_candlestick_fixtures(spark):
    by_id, _ = _parsed(spark, "candlestick", binance.parse_candlestick)
    candles = [c for cs in by_id.values() for c in cs]
    assert candles
    for c in candles:
        assert c["low"] <= c["high"]
        assert c["low"] <= c["open"] <= c["high"]
        assert c["low"] <= c["close"] <= c["high"]
        assert c["volume"] >= 0
        assert c["period"] != ""
        assert len(str(c["timestamp"])) == 13
        # begin_time is SECONDS (crypto-message/src/lib.rs:200)
        assert len(str(c["begin_time"])) == 10


def test_router_columns(spark):
    rows = load_fixtures("binance")
    raw = fixtures_df(spark, rows)
    routed = raw.select(
        "msg_id",
        "msg_type",
        binance.get_msg_type(F.col("msg")).alias("detected"),
        binance.extract_symbol(F.col("msg")).alias("symbol"),
        binance.extract_timestamp(F.col("msg")).alias("ts"),
    ).collect()
    known = {
        "trade",
        "l2_event",
        "l2_topk",
        "l2_snapshot",
        "bbo",
        "ticker",
        "candlestick",
        "funding_rate",
    }
    for r in routed:
        # option streams (@TRADE_ALL etc.) route to 'other' in the reference
        # too (binance/mod.rs:84-103 has no arm for them)
        if ":option" in r["msg_id"]:
            continue
        # '!bookTicker' (no '@') routes to 'other' in the reference as well
        # (mod.rs:95 checks ends_with("@bookTicker")), so only assert where
        # the reference detects a concrete type
        if (
            r["msg_type"] in known
            and r["msg_type"] != "l2_snapshot"
            and r["detected"] != "other"
        ):
            assert r["detected"] == r["msg_type"], r
        assert r["symbol"] is not None, r
