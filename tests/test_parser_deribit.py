"""Deribit parse-stage parity (crypto-msg-parser/tests/deribit.rs)."""

from __future__ import annotations

from crypto_msg_parser_spark.parser import deribit
from tests.parser_util import (
    check_orderbook_invariants,
    check_trade_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
)


def _parsed(spark, msg_type, parse_fn):
    rows = [
        r for r in load_fixtures("deribit", msg_type) if r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), rows


def test_trade_fixtures(spark):
    by_id, _ = _parsed(spark, "trade", deribit.parse_trade)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "deribit")
    assert len(trades) == 4  # inverse_swap fixture fans out to 2

    # tests/deribit.rs:34-37 (inverse future: BTC cv = 10 USD)
    fut = by_id["deribit:trade:inverse_future:0"][0]
    assert fut["quantity_base"] == 10.0 * 6000.0 / 56273.5
    assert fut["quantity_quote"] == 10.0 * 6000.0
    assert fut["quantity_contract"] == 6000.0
    assert fut["side"] == "buy"

    # tests/deribit.rs:64-72 (inverse swap fan-out of 2)
    swaps = [t for t in trades if t["market_type"] == "inverse_swap"]
    assert len(swaps) == 2
    assert {t["quantity_quote"] for t in swaps} == {10.0 * 5580.0, 10.0 * 60.0}

    # tests/deribit.rs:99-101 (option: 1 coin per contract)
    opt = [t for t in trades if t["market_type"] == "european_option"][0]
    assert opt["quantity_base"] == 0.1
    assert opt["quantity_quote"] == 0.007 * 0.1
    assert opt["quantity_contract"] == 0.1
    assert opt["pair"] == "BTC/BTC"


def test_l2_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_event", deribit.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "deribit", "l2_event")
    assert len(books) == 5

    # tests/deribit.rs:136-153 (inverse future snapshot)
    snap = by_id["deribit:l2_event:inverse_future_snapshot:3"][0]
    assert snap["timestamp"] == 1622626472678
    assert snap["seq_id"] == 31479219781
    assert snap["prev_seq_id"] is None
    assert snap["snapshot"] is True
    assert snap["bids"][0]["price"] == 37317.0
    assert snap["bids"][0]["quantity_base"] == 10.0 * 2960.0 / 37317.0
    assert snap["bids"][0]["quantity_quote"] == 10.0 * 2960.0
    assert snap["bids"][0]["quantity_contract"] == 2960.0

    updates = [b for b in books if not b["snapshot"]]
    for b in updates:
        assert b["prev_seq_id"] is not None


def test_l2_topk_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_topk", deribit.parse_l2_topk)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "deribit", "l2_topk")
    assert len(books) == 3
    for b in books:
        assert b["snapshot"] is True
        assert b["seq_id"] is not None


def test_bbo_fixtures(spark):
    by_id, _ = _parsed(spark, "bbo", deribit.parse_bbo)
    bbos = [b for bs in by_id.values() for b in bs]
    assert len(bbos) == 2
    for b in bbos:
        assert b["ask_price"] >= b["bid_price"] > 0
        assert len(str(b["timestamp"])) == 13
        assert b["id"] is None
    inv = [b for b in bbos if b["market_type"] == "inverse_swap"]
    for b in inv:
        # inverse: quote leg is contracts * 10 USD
        assert b["ask_quantity_quote"] == b["ask_quantity_contract"] * 10.0


def test_candlestick_fixtures(spark):
    by_id, _ = _parsed(spark, "candlestick", deribit.parse_candlestick)
    candles = [c for cs in by_id.values() for c in cs]
    assert len(candles) == 3
    for c in candles:
        assert c["high"] >= c["low"]
        assert "/" in c["pair"]
        assert c["quote_volume"] is not None
        # chart.trades.<sym>.<res> — begin_time = tick - minutes*60000
        assert c["begin_time"] < c["timestamp"]


def test_extract_symbol_and_timestamp(spark):
    from pyspark.sql import functions as F

    rows = [
        dict(r, market_type=r["market_type"] or "unknown")
        for r in load_fixtures("deribit")
    ]
    raw = fixtures_df(spark, rows)
    got = {
        r["msg_id"]: (r["sym"], r["ts"], r["mt"])
        for r in raw.select(
            "msg_id",
            deribit.extract_symbol(F.col("msg")).alias("sym"),
            deribit.extract_timestamp(F.col("msg")).alias("ts"),
            deribit.get_msg_type(F.col("msg")).alias("mt"),
        ).collect()
    }
    assert got["deribit:trade:inverse_future:0"][0] == "BTC-26MAR21"
    assert got["deribit:trade:inverse_future:0"][2] == "trade"
    assert got["deribit:l2_event:inverse_future_snapshot:3"][1] == 1622626472678
    assert got["deribit:l2_event:inverse_future_snapshot:3"][2] == "l2_event"
    topk = [k for k in got if k.startswith("deribit:l2_topk")]
    for k in topk:
        assert got[k][2] == "l2_topk", (k, got[k])
    for k, v in got.items():
        if k.startswith("deribit:candlestick"):
            assert v[2] == "candlestick"
        if k.startswith("deribit:bbo"):
            assert v[2] == "bbo"
