"""MEXC parse-stage parity (crypto-msg-parser/tests/mexc.rs)."""

from __future__ import annotations

from crypto_msg_parser_spark.parser import mexc
from tests.parser_util import (
    RECEIVED_AT,
    check_orderbook_invariants,
    check_trade_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
    round9,
)


def _parsed(spark, msg_type, parse_fn):
    rows = [
        r for r in load_fixtures("mexc", msg_type) if r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), rows


def test_trade_fixtures(spark):
    by_id, _ = _parsed(spark, "trade", mexc.parse_trade)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "mexc")
    assert len(trades) == 6

    # tests/mexc.rs:33-36 (spot, object envelope)
    spot = by_id["mexc:trade:spot:0"][0]
    assert spot["timestamp"] == 1646996447307
    assert spot["price"] == 39008.35
    assert spot["quantity_base"] == 0.003533
    assert spot["side"] == "sell"
    assert spot["trade_id"] == "1646996447307"
    assert spot["pair"] == "BTC/USDT"

    # tuple-envelope spot fixture parses identically
    spot2 = by_id["mexc:trade:spot:9"][0]
    assert spot2["pair"] == "BTC/USDT"

    # tests/mexc.rs:60-65 (linear swap, BTC_USDT cv=0.0001)
    lin = by_id["mexc:trade:linear_swap:1"][0]
    assert lin["timestamp"] == 1646999591755
    assert lin["quantity_contract"] == 32.0
    assert lin["quantity_base"] == 0.0001 * 32.0
    assert lin["quantity_quote"] == round9(0.0001 * 32.0 * 39766.5)
    assert lin["side"] == "sell"

    # tests/mexc.rs:89-94 (inverse swap, BTC cv=100)
    inv = by_id["mexc:trade:inverse_swap:2"][0]
    assert inv["quantity_contract"] == 8.0
    assert inv["quantity_quote"] == 100.0 * 8.0
    assert inv["quantity_base"] == 100.0 * 8.0 / 39885.5
    assert inv["side"] == "sell"


def test_l2_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_event", mexc.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "mexc", "l2_event")
    assert len(books) == 6

    # tests/mexc.rs:113-130 (spot: quote from the `a` field; ts=received_at)
    spot = by_id["mexc:l2_event:spot:3"][0]
    assert spot["timestamp"] == RECEIVED_AT
    assert spot["seq_id"] == 672257402
    assert len(spot["asks"]) == 0 and len(spot["bids"]) == 1
    assert spot["bids"][0]["price"] == 39763.35
    assert spot["bids"][0]["quantity_base"] == 0.054069

    # tests/mexc.rs:141-166 (linear swap deltas; zero-qty deletions kept)
    lin = by_id["mexc:l2_event:linear_swap_update:4"][0]
    assert lin["timestamp"] == 1647000258746
    assert lin["seq_id"] == 4702740808
    assert lin["asks"][0]["price"] == 39961.0
    assert lin["asks"][0]["quantity_contract"] == 0.0
    assert lin["bids"][0]["quantity_contract"] == 58272.0
    assert lin["bids"][0]["quantity_base"] == 0.0001 * 58272.0

    # tests/mexc.rs:195-198 (inverse swap, BTC cv=100)
    inv = by_id["mexc:l2_event:inverse_swap_update:5"][0]
    assert inv["bids"][0]["quantity_quote"] == 100.0 * 943.0
    assert inv["bids"][0]["quantity_base"] == 100.0 * 943.0 / 39944.0


def test_l2_topk_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_topk", mexc.parse_l2_topk)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "mexc", "l2_topk")
    assert len(books) == 3
    for b in books:
        assert b["snapshot"] is True

    # tests/mexc.rs:217-238 (spot push.limit.depth)
    spot = by_id["mexc:l2_topk:spot:6"][0]
    assert spot["timestamp"] == RECEIVED_AT
    assert spot["seq_id"] == 1502380137
    assert len(spot["asks"]) == 5 and len(spot["bids"]) == 5
    assert spot["bids"][0]["price"] == 31623.82
    assert spot["bids"][0]["quantity_base"] == 0.179844
    assert spot["bids"][0]["quantity_quote"] == 31623.82 * 0.179844


def test_candlestick_fixtures(spark):
    by_id, _ = _parsed(spark, "candlestick", mexc.parse_candlestick)
    candles = [c for cs in by_id.values() for c in cs]
    assert len(candles) == 4
    for c in candles:
        assert c["high"] >= c["low"]
        assert "/" in c["pair"]
        assert c["period"].startswith("Min")
        assert c["quote_volume"] is not None
    # swap: linear volume scaled by cv; inverse volume from `a`
    lin = by_id["mexc:candlestick:linear_swap:18"][0]
    assert lin["timestamp"] == lin["begin_time"] + 60000
    spot = by_id["mexc:candlestick:spot:15"][0]
    assert spot["market_type"] == "spot"


def test_extract_symbol_and_timestamp(spark):
    from pyspark.sql import functions as F

    rows = [
        dict(r, market_type=r["market_type"] or "unknown")
        for r in load_fixtures("mexc")
    ]
    raw = fixtures_df(spark, rows)
    got = {
        r["msg_id"]: (r["sym"], r["ts"])
        for r in raw.select(
            "msg_id",
            mexc.extract_symbol(F.col("msg")).alias("sym"),
            mexc.extract_timestamp(F.col("msg")).alias("ts"),
        ).collect()
    }
    assert got["mexc:trade:spot:0"][0] == "BTC_USDT"
    assert got["mexc:trade:spot:9"][0] == "BTC_USDT"  # tuple frame
    assert got["mexc:trade:spot:9"][1] is not None
    assert got["mexc:l2_event:spot:3"][1] is None  # no ts in spot l2
    assert got["mexc:trade:linear_swap:1"][0] == "BTC_USDT"
    # swap messages carry envelope ts
    assert got["mexc:l2_event:linear_swap_update:4"][1] == 1647000258746
    # REST snapshots
    assert got["mexc:l2_snapshot:spot:21"][0] == "NONE"
    assert got["mexc:l2_snapshot:inverse_swap:22"][0] == "NONE"
