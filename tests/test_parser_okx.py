"""OKX v5 parse-stage parity with the reference fixtures
(crypto-msg-parser/tests/okx.rs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_msg_parser_spark.parser import okx
from tests.parser_util import (
    RECEIVED_AT,
    check_funding_invariants,
    check_orderbook_invariants,
    check_trade_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
)


def _parsed(spark, msg_type, parse_fn, variant="okx"):
    rows = [
        r
        for r in load_fixtures("okx", msg_type)
        if r["variant"] == variant and r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), rows


def test_trade_fixtures(spark):
    by_id, rows = _parsed(spark, "trade", okx.parse_trade)
    trades = [t for ts in by_id.values() for t in ts]
    # okx trade fixtures all have a single-element data array
    assert len(trades) >= len(rows) - 1
    check_trade_invariants(trades, "okx")

    # golden values from tests/okx.rs:13-99
    spot = by_id["okx:trade:spot:0"][0]
    assert spot["pair"] == "BTC/USDT"
    assert spot["timestamp"] == 1646311839593
    assert spot["quantity_base"] == 0.00373695
    assert spot["price"] == 43474.1
    assert spot["quantity_contract"] is None
    assert spot["side"] == "buy"
    assert spot["trade_id"] == "314161276"

    lin_fut = by_id["okx:trade:linear_future:1"][0]
    assert lin_fut["pair"] == "BTC/USDT"
    assert lin_fut["price"] == 43535.3
    assert lin_fut["quantity_contract"] == 2.0
    assert lin_fut["quantity_base"] == 2.0 * 0.01
    assert lin_fut["side"] == "sell"

    lin_swap = by_id["okx:trade:linear_swap:2"][0]
    assert lin_swap["quantity_contract"] == 7.0
    assert lin_swap["quantity_base"] == 7.0 * 0.01
    assert lin_swap["side"] == "buy"

    inv_fut = by_id["okx:trade:inverse_future:3"][0]
    assert inv_fut["pair"] == "BTC/USD"
    assert inv_fut["quantity_quote"] == 100.0  # 1 contract x 100 USD
    assert inv_fut["quantity_base"] == 100.0 / 43568.7


def test_l2_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_event", okx.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "okx", "l2_event")
    for b in books:
        assert b["seq_id"] is None


def test_l2_topk_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_topk", okx.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "okx", "l2_topk")
    for b in books:
        assert b["snapshot"] is True  # books5 is an exchange-truncated book


def test_funding_fixtures(spark):
    by_id, _ = _parsed(spark, "funding_rate", okx.parse_funding_rate)
    rates = [r for rs in by_id.values() for r in rs]
    check_funding_invariants(rates, "okx")
    for r in rates:
        assert r["timestamp"] == RECEIVED_AT  # no embedded ts: crawl time
        assert r["estimated_rate"] is not None


def test_bbo_fixtures(spark):
    by_id, _ = _parsed(spark, "bbo", okx.parse_bbo)
    bbos = [b for bs in by_id.values() for b in bs]
    assert bbos
    for b in bbos:
        assert b["ask_price"] >= b["bid_price"] > 0


def test_candlestick_fixtures(spark):
    by_id, _ = _parsed(spark, "candlestick", okx.parse_candlestick)
    candles = [c for cs in by_id.values() for c in cs]
    assert candles
    for c in candles:
        assert c["low"] <= c["open"] <= c["high"]
        assert c["low"] <= c["close"] <= c["high"]
        assert c["period"] in ("1m", "1H", "1D", "5m", "15m")
        assert c["timestamp"] == RECEIVED_AT
        assert len(str(c["begin_time"])) == 10


def test_router_columns(spark):
    rows = [
        r
        for r in load_fixtures("okx")
        if r["variant"] == "okx" and r["msg_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    routed = raw.select(
        "msg_id",
        "msg_type",
        okx.get_msg_type(F.col("msg")).alias("detected"),
        okx.extract_symbol(F.col("msg")).alias("symbol"),
    ).collect()
    for r in routed:
        if r["detected"] != "other" and r["msg_type"] in (
            "trade",
            "l2_event",
            "l2_topk",
            "bbo",
            "funding_rate",
            "candlestick",
            "ticker",
        ):
            assert r["detected"] == r["msg_type"], r
