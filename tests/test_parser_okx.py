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


# ------------------------------------------------------------------ v3
# legacy table-keyed format; golden values from tests/okx_v3.rs


def test_v3_trade_fixtures(spark):
    by_id, rows = _parsed(spark, "trade", okx.parse_trade, variant="okx_v3")
    trades = [t for ts in by_id.values() for t in ts]
    assert len(trades) == len(rows)
    check_trade_invariants(trades, "okx")

    spot = by_id["okx_v3:trade:spot:0"][0]
    assert spot["pair"] == "BTC/USDT"
    assert spot["timestamp"] == 1616375788687
    assert spot["quantity_base"] == 0.00020621
    assert spot["quantity_contract"] is None
    assert spot["side"] == "sell"

    lin_fut = by_id["okx_v3:trade:linear_future:1"][0]
    assert lin_fut["pair"] == "BTC/USDT"
    assert lin_fut["timestamp"] == 1616376738087
    assert lin_fut["quantity_base"] == 20.0 * 0.01
    assert lin_fut["quantity_quote"] == 20.0 * 0.01 * 60059.7
    assert lin_fut["quantity_contract"] == 20.0
    assert lin_fut["side"] == "buy"

    inv_fut = by_id["okx_v3:trade:inverse_future:3"][0]
    assert inv_fut["pair"] == "BTC/USD"
    assert inv_fut["quantity_base"] == 100.0 * 7.0 / 59999.7
    assert inv_fut["quantity_quote"] == 100.0 * 7.0
    assert inv_fut["quantity_contract"] == 7.0

    opt = by_id["okx_v3:trade:option:5"][0]
    assert opt["pair"] == "BTC/USD"
    assert opt["quantity_base"] == 1.0 * 4.0
    assert opt["quantity_quote"] == 1.0 * 4.0 * 0.1545
    assert opt["quantity_contract"] == 4.0


def test_v3_funding_fixtures(spark):
    by_id, rows = _parsed(
        spark, "funding_rate", okx.parse_funding_rate, variant="okx_v3"
    )
    rates = [r for rs in by_id.values() for r in rs]
    assert len(rates) == len(rows)
    check_funding_invariants(rates, "okx")

    inv = by_id["okx_v3:funding_rate:inverse_swap:7"][0]
    assert inv["pair"] == "BTC/USD"
    assert inv["funding_rate"] == 0.00072933
    assert inv["estimated_rate"] == 0.00065
    assert inv["funding_time"] == 1617321600000
    assert inv["timestamp"] == RECEIVED_AT


def test_v3_l2_fixtures(spark):
    by_id, rows = _parsed(spark, "l2_event", okx.parse_l2, variant="okx_v3")
    books = [b for bs in by_id.values() for b in bs]
    assert len(books) == len(rows)
    check_orderbook_invariants(books, "okx", "l2_event")

    snap = by_id["okx_v3:l2_event:spot_snapshot:9"][0]
    assert snap["snapshot"] is True
    assert snap["timestamp"] == 1622723951253
    assert snap["bids"][0]["price"] == 38929.9
    assert snap["bids"][0]["quantity_base"] == 0.05005381
    assert snap["asks"][0]["price"] == 38930.0
    assert snap["asks"][0]["quantity_quote"] == 38930.0 * 3.84264467

    upd = by_id["okx_v3:l2_event:spot_update:10"][0]
    assert upd["snapshot"] is False
    assert upd["bids"][0]["quantity_base"] == 0.0

    inv = by_id["okx_v3:l2_event:inverse_swap_snapshot:12"][0]
    assert inv["asks"][0]["quantity_base"] == 13000.0 / 39167.2
    assert inv["asks"][0]["quantity_quote"] == 13000.0
    assert inv["asks"][0]["quantity_contract"] == 130.0

    opt = by_id["okx_v3:l2_event:option_snapshot:13"][0]
    assert opt["asks"][0]["quantity_base"] == 906.0
    assert opt["bids"] == []


def test_v3_l2_topk_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_topk", okx.parse_l2, variant="okx_v3")
    book = by_id["okx_v3:l2_topk:linear_swap:14"][0]
    assert book["msg_type"] == "l2_topk"
    assert book["snapshot"] is True
    assert book["timestamp"] == 1645749905387
    assert book["seq_id"] is None
    assert book["asks"][0]["price"] == 38407.4
    assert book["asks"][0]["quantity_base"] == 0.01 * 1502.0
    assert book["asks"][0]["quantity_contract"] == 1502.0
    assert book["bids"][4]["quantity_base"] == 0.01 * 28.0
    # parse_l2_topk routes to parse_l2 (okx/mod.rs:98-103)
    by_id2, _ = _parsed(spark, "l2_topk", okx.parse_l2_topk, variant="okx_v3")
    assert by_id2.keys() == by_id.keys()


def test_v3_router(spark):
    rows = [r for r in load_fixtures("okx") if r["variant"] == "okx_v3"]
    raw = fixtures_df(spark, rows)
    routed = {
        r["msg_id"]: r
        for r in raw.select(
            "msg_id",
            "msg_type",
            okx.get_msg_type(F.col("msg")).alias("detected"),
            okx.extract_symbol(F.col("msg")).alias("symbol"),
            okx.extract_timestamp(F.col("msg")).alias("ts"),
        ).collect()
    }
    for fid, r in routed.items():
        if "candlestick" in fid:
            # v3 table is e.g. spot/candle60s; the reference compares the
            # channel to the exact string "candle", so v3 candles route to
            # other (okx_v3.rs:122) — quirk preserved
            assert r["detected"] == "other"
            assert r["ts"] == 1643675400000
            assert r["symbol"] == "CELR-USDT"
        elif "funding_rate" in fid:
            assert r["detected"] == "funding_rate"
            assert r["ts"] is None
        else:
            assert r["detected"] == r["msg_type"], r
    assert routed["okx_v3:trade:spot:0"]["ts"] == 1616375788687
    assert routed["okx_v3:trade:spot:0"]["symbol"] == "BTC-USDT"
