"""Bitget parse-stage parity (crypto-msg-parser/tests/bitget.rs) — both the
mix (`arg`) and legacy (`table`) formats."""

from __future__ import annotations

from crypto_msg_parser_spark.parser import bitget
from tests.parser_util import (
    RECEIVED_AT,
    check_funding_invariants,
    check_orderbook_invariants,
    check_trade_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
    round9,
)


def _parsed(spark, msg_type, parse_fn):
    rows = [
        r for r in load_fixtures("bitget", msg_type) if r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), rows


def test_trade_fixtures(spark):
    by_id, _ = _parsed(spark, "trade", bitget.parse_trade)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "bitget")
    # mix fixtures fan out 1+1+2, legacy fixtures 3+3
    assert len(trades) == 10

    # tests/bitget.rs:29-34 (mix spot)
    spot = by_id["bitget:trade:spot:0"][0]
    assert spot["timestamp"] == 1653873778747
    assert spot["price"] == 29443.24
    assert spot["quantity_base"] == 0.4134
    assert spot["quantity_quote"] == 29443.24 * 0.4134
    assert spot["quantity_contract"] is None
    assert spot["side"] == "buy"
    assert spot["trade_id"] == "1653873778747"
    assert spot["symbol"] == "BTCUSDT_SPBL"
    assert spot["pair"] == "BTC/USDT"

    # tests/bitget.rs:54-59 (mix inverse swap: NO cv scaling)
    inv = by_id["bitget:trade:inverse_swap:1"][0]
    assert inv["symbol"] == "BTCUSD_DMCBL"
    assert inv["quantity_base"] == 0.024
    assert inv["quantity_quote"] == 30285.0 * 0.024
    assert inv["quantity_contract"] == 0.024

    # tests/bitget.rs:918-944 (legacy inverse swap: contract math, fan-out 3)
    legacy_inv = [
        t
        for ts in by_id.values()
        for t in ts
        if t["symbol"] == "btcusd" and t["msg_type"] == "trade"
    ]
    assert len(legacy_inv) == 3
    assert {t["quantity_quote"] for t in legacy_inv} == {158.0, 450.0, 762.0}
    for t in legacy_inv:
        assert t["quantity_base"] == t["quantity_quote"] / 58722.0
        assert t["side"] == "sell"
        assert t["pair"] == "BTC/USD"

    # tests/bitget.rs:956-973 (legacy linear swap: cmt_btcusdt cv=0.001)
    legacy_lin = [
        t for ts in by_id.values() for t in ts if t["symbol"] == "cmt_btcusdt"
    ]
    assert len(legacy_lin) == 3
    assert {t["quantity_base"] for t in legacy_lin} == {
        round9(1265.0 * 0.001),
        25.0 * 0.001,
        181.0 * 0.001,
    }


def test_l2_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_event", bitget.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "bitget", "l2_event")
    assert len(books) == 7  # 3 mix + 4 legacy swap/depth

    # tests/bitget.rs:125-142 (mix spot)
    spot = by_id["bitget:l2_event:spot:3"][0]
    assert spot["asks"][0]["price"] == 30266.73
    assert spot["asks"][0]["quantity_base"] == 0.0109
    assert spot["asks"][0]["quantity_quote"] == 30266.73 * 0.0109
    assert spot["asks"][0]["quantity_contract"] is None
    assert spot["snapshot"] is False

    # tests/bitget.rs:184-191 (mix inverse swap: base = raw size)
    inv = by_id["bitget:l2_event:inverse_swap:4"][0]
    assert inv["asks"][0]["quantity_base"] == 0.073
    assert inv["asks"][0]["quantity_quote"] == 30693.5 * 0.073
    assert inv["asks"][0]["quantity_contract"] == 0.073


def test_l2_legacy_orderbooks(spark):
    rows = [
        r
        for r in load_fixtures("bitget", "l2_event")
        if "l2_orderbook" in r["fixture_id"] and r["market_type"]
    ]
    raw = fixtures_df(spark, rows)
    by_id = rows_by_id(bitget.parse_l2(raw), raw)
    books = [b for bs in by_id.values() for b in bs]
    assert len(books) == 4
    snaps = [b for b in books if b["snapshot"]]
    upds = [b for b in books if not b["snapshot"]]
    assert len(snaps) == 2 and len(upds) == 2  # action partial vs update
    # legacy linear swap snapshot: cmt_btcusdt cv=0.001
    lin = [b for b in snaps if b["symbol"] == "cmt_btcusdt"][0]
    assert lin["timestamp"] == 1622432420458
    assert lin["asks"][0]["price"] == 34589.0
    assert lin["asks"][0]["quantity_base"] == round9(507 * 0.001)
    assert lin["asks"][0]["quantity_contract"] == 507.0
    # legacy inverse swap: quote = contract count
    inv = [b for b in snaps if b["symbol"] == "btcusd"][0]
    for o in inv["asks"]:
        assert o["quantity_quote"] == o["quantity_contract"]


def test_l2_topk_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_topk", bitget.parse_l2_topk)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "bitget", "l2_topk")
    assert len(books) == 4  # 3 mix books5 + 1 legacy swap/depth5
    for b in books:
        assert b["snapshot"] is True
        assert b["msg_type"] == "l2_topk"
    # tests/bitget.rs:273-295 (mix spot books5)
    spot = by_id["bitget:l2_topk:spot:6"][0]
    assert spot["timestamp"] == 1653936946292
    assert spot["asks"][0]["quantity_base"] == 0.0119
    assert spot["bids"][0]["quantity_base"] == 0.0122
    # legacy depth5 (tests/bitget.rs:1232+): cmt_bchusdt, BCH cv=0.01
    legacy = by_id["bitget:l2_topk:linear_swap:33"][0]
    assert legacy["symbol"] == "cmt_bchusdt"
    assert legacy["pair"] == "BCH/USDT"
    assert legacy["asks"][0]["quantity_base"] == round9(307 * 0.01)


def test_funding_rate_fixtures(spark):
    by_id, _ = _parsed(spark, "funding_rate", bitget.parse_funding_rate)
    rates = [r for rs in by_id.values() for r in rs]
    check_funding_invariants(rates, "bitget")
    assert len(rates) == 4  # 2 fixture pairs duplicated old/new test files
    for r in rates:
        assert r["timestamp"] == RECEIVED_AT
        assert r["funding_time"] == 1617346800000
    by_pair = {r["pair"] for r in rates}
    assert by_pair == {"BTC/USD", "BTC/USDT"}


def test_candlestick_fixtures(spark):
    by_id, _ = _parsed(spark, "candlestick", bitget.parse_candlestick)
    candles = [c for cs in by_id.values() for c in cs]
    assert len(candles) == 11  # mix snapshot fixtures fan out
    for c in candles:
        assert c["high"] >= c["low"]
        assert "/" in c["pair"]

    # mix 1m: begin_time = ts - 60000 (multi-element snapshots re-serialize
    # the json column per element, so match on symbol rather than msg id)
    mix = [c for c in candles if c["symbol"] == "BTCUSDT_SPBL"]
    assert mix
    for c in mix:
        assert c["period"] == "1m"
        assert c["begin_time"] == c["timestamp"] - 60000
        assert c["quote_volume"] is None

    # tests/bitget.rs:1290-1319 (legacy inverse candle60s)
    inv = by_id["bitget:candlestick:inverse_swap:34"][0]
    assert inv["symbol"] == "btcusd"
    assert inv["pair"] == "BTC/USD"
    assert inv["timestamp"] == 1646092800000
    assert inv["begin_time"] == 1646092740000
    assert inv["period"] == "60s"
    assert inv["volume"] == 0.035845449809
    assert inv["quote_volume"] == 1547.0

    # tests/bitget.rs:1323-1345 (legacy linear: volume scaled by cv)
    lin = by_id["bitget:candlestick:linear_swap:35"][0]
    assert lin["symbol"] == "cmt_btcusdt"
    assert lin["begin_time"] == 1648801740000
    assert lin["volume"] == 1273 * 0.001
    assert lin["quote_volume"] == 57633.802


def test_extract_symbol_timestamp_msgtype(spark):
    from pyspark.sql import functions as F

    rows = load_fixtures("bitget")
    raw = fixtures_df(spark, rows)
    got = {
        r["msg_id"]: (r["sym"], r["ts"], r["mt"])
        for r in raw.select(
            "msg_id",
            bitget.extract_symbol(F.col("msg")).alias("sym"),
            bitget.extract_timestamp(F.col("msg")).alias("ts"),
            bitget.get_msg_type(F.col("msg")).alias("mt"),
        ).collect()
    }
    assert got["bitget:trade:spot:0"] == ("BTCUSDT_SPBL", 1653873778747, "trade")
    assert got["bitget:trade:inverse_swap:1"][0] == "BTCUSD_DMCBL"
    assert got["bitget:trade:linear_swap:2"][0] == "BTCUSDT_UMCBL"
    assert got["bitget:l2_event:spot:3"][2] == "l2_event"
    assert got["bitget:l2_topk:spot:6"][2] == "l2_topk"
    assert got["bitget:candlestick:spot_snapshot:11"][2] == "candlestick"
    assert got["bitget:candlestick:inverse_swap:34"] == (
        "btcusd", 1646092800000, "candlestick",
    )
    assert got["bitget:trade:inverse_swap:25"][0] == "btcusd"
    assert got["bitget:funding_rate:inverse_swap:9"][2] == "funding_rate"
    # REST messages: symbol from data, type l2_snapshot
    assert got["bitget:open_interest:inverse_swap:23"][0] == "BTCUSD_DMCBL"
    assert got["bitget:l2_snapshot:spot:20"] == ("NONE", 1677628818450, "l2_snapshot")
