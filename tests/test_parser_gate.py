"""Gate parse-stage parity (crypto-msg-parser/tests/gate.rs)."""

from __future__ import annotations

from crypto_msg_parser_spark.parser import gate
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
        r for r in load_fixtures("gate", msg_type) if r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), rows


def test_trade_fixtures(spark):
    by_id, _ = _parsed(spark, "trade", gate.parse_trade)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "gate")
    assert len(trades) == 8  # inverse_future fixture fans out to 2

    # tests/gate.rs:13-36 (legacy spot)
    legacy = by_id["gate:trade:spot_20210916:0"][0]
    assert legacy["timestamp"] == 1616327474624
    assert legacy["pair"] == "BTC/USDT"
    assert legacy["quantity_base"] == 0.0037
    assert legacy["quantity_quote"] == 0.0037 * 56173.28
    assert legacy["quantity_contract"] is None
    assert legacy["side"] == "sell"

    # tests/gate.rs:40-65 (current spot; fractional-ms string truncates)
    spot = by_id["gate:trade:spot:1"][0]
    assert spot["timestamp"] == 1631824310261
    assert spot["price"] == 47395.009
    assert spot["quantity_base"] == 0.00052
    assert spot["side"] == "buy"
    assert spot["trade_id"] == "1638417041"

    # tests/gate.rs:95-118 (linear future, cv = 0.0001)
    lf = [
        t
        for ts in by_id.values()
        for t in ts
        if t["market_type"] == "linear_future"
    ][0]
    assert lf["timestamp"] == 1615253386000
    assert lf["quantity_base"] == 19.0 * 0.0001
    assert lf["quantity_quote"] == round9(0.0019 * 53560.5)
    assert lf["quantity_contract"] == 19.0
    assert lf["side"] == "sell"

    # tests/gate.rs:122-145 (inverse swap, quantity in USD)
    isw = by_id["gate:trade:inverse_swap:4"][0]
    assert isw["timestamp"] == 1616327545436
    assert isw["quantity_base"] == 7.0 / 56155.2
    assert isw["quantity_quote"] == 7.0
    assert isw["quantity_contract"] == 7.0

    # tests/gate.rs:176-205 (numeric price + MOB cv=1)
    mob = by_id["gate:trade:linear_swap_2:6"][0]
    assert mob["timestamp"] == 1667469835931
    assert mob["quantity_base"] == 90.0
    assert mob["quantity_quote"] == round9(90.0 * 0.836)
    assert mob["side"] == "sell"


def test_l2_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_event", gate.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "gate", "l2_event")
    assert len(books) == 8

    # tests/gate.rs:218-253 legacy snapshot: ts = crawl receive time
    legacy = by_id["gate:l2_event:spot_snapshot_20200916:7"][0]
    assert legacy["timestamp"] == RECEIVED_AT
    assert legacy["snapshot"] is True
    assert legacy["asks"][0]["price"] == 37483.21
    assert legacy["asks"][0]["quantity_base"] == 0.048
    assert legacy["asks"][0]["quantity_quote"] == 37483.21 * 0.048

    # tests/gate.rs:293-335 current spot update: seq ids from u/U
    cur = by_id["gate:l2_event:spot_update:9"][0]
    assert cur["timestamp"] == 1631836142325
    assert cur["seq_id"] == 4622074364
    assert cur["prev_seq_id"] == 4622074360
    assert cur["asks"][0]["price"] == 47813.04
    assert cur["asks"][0]["quantity_base"] == 0.0355

    # linear_future update goes through the stateful path: deletions with
    # unseen prices are dropped (gate_swap.rs:372-380 with empty state)
    upd = by_id["gate:l2_event:linear_future_update:14"][0]
    assert upd["snapshot"] is False
    assert upd["timestamp"] == 1622769533000
    for o in upd["asks"] + upd["bids"]:
        assert o["quantity_contract"] is not None

    # inverse_future snapshot: quantities via inverse math (cv=1)
    snapf = by_id["gate:l2_event:inverse_future_snapshot:12"][0]
    assert snapf["snapshot"] is True
    for o in snapf["asks"]:
        assert o["quantity_quote"] == o["quantity_contract"]


def test_l2_topk_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_topk", gate.parse_l2_topk)
    books = [b for bs in by_id.values() for b in bs]
    assert len(books) == 3
    for b in books:
        assert b["snapshot"] is True
    spot = by_id["gate:l2_topk:spot:15"][0]
    assert spot["msg_type"] == "l2_topk"
    assert spot["timestamp"] == 1662630117190
    swaps = [b for bs in by_id.values() for b in bs if b["market_type"] != "spot"]
    for b in swaps:
        assert b["msg_type"] == "l2_topk"


def test_bbo_fixtures(spark):
    by_id, _ = _parsed(spark, "bbo", gate.parse_bbo)
    bbos = [b for bs in by_id.values() for b in bs]
    assert len(bbos) == 3
    for b in bbos:
        assert b["ask_price"] > 0 and b["bid_price"] > 0
        assert b["ask_price"] >= b["bid_price"]
        assert len(str(b["timestamp"])) == 13
    spot = by_id["gate:bbo:spot:18"][0]
    assert spot["ask_quantity_contract"] is None
    inv = by_id["gate:bbo:inverse_swap:19"][0]
    assert inv["ask_quantity_quote"] == inv["ask_quantity_contract"]


def test_candlestick_fixtures(spark):
    by_id, _ = _parsed(spark, "candlestick", gate.parse_candlestick)
    candles = [c for cs in by_id.values() for c in cs]
    assert len(candles) == 6  # inverse_future result[] fans out to 2
    for c in candles:
        assert c["open"] > 0 and c["close"] > 0
        assert c["high"] >= c["low"]
        assert len(str(c["timestamp"])) == 13
        assert c["period"]
        assert "/" in c["pair"]
    # spot: volume column carries `a` (quote-currency total, the reference's
    # own mapping gate_spot_current.rs:340-341), quote_volume carries `v`
    spot = by_id["gate:candlestick:spot:21"][0]
    assert spot["begin_time"] == 1662803040
    # inverse swap: v*cv is quote volume; base derived from avg OHLC price
    inv = by_id["gate:candlestick:inverse_swap:24"][0]
    assert inv["quote_volume"] is not None
    assert abs(inv["volume"] * (inv["open"] + inv["high"] + inv["low"] + inv["close"]) / 4
               - inv["quote_volume"]) < 1e-6
    # linear: no quote volume
    lin = by_id["gate:candlestick:linear_swap:25"][0]
    assert lin["quote_volume"] is None


def test_extract_symbol_and_timestamp(spark):
    from pyspark.sql import functions as F

    rows = load_fixtures("gate")
    raw = fixtures_df(spark, rows)
    got = {
        r["msg_id"]: (r["sym"], r["ts"])
        for r in raw.select(
            "msg_id",
            gate.extract_symbol(F.col("msg")).alias("sym"),
            gate.extract_timestamp(F.col("msg")).alias("ts"),
        ).collect()
    }
    # tests/gate.rs asserted extractions
    assert got["gate:trade:spot_20210916:0"] == ("BTC_USDT", 1616327474624)
    assert got["gate:trade:spot:1"] == ("BTC_USDT", 1631824310261)
    assert got["gate:trade:inverse_future:2"] == ("BTC_USD_20220603", 1653808101000)
    assert got["gate:trade:inverse_swap:4"] == ("BTC_USD", 1616327545436)
    assert got["gate:trade:linear_swap_2:6"] == ("MOB_USDT", 1667469835931)
    assert got["gate:l2_event:spot_update:9"] == ("BTC_USDT", 1631836142325)
    assert got["gate:l2_event:linear_future_update:14"][0] == "BTC_USDT_20210625"
    assert got["gate:candlestick:spot:21"][0] == "BTC_USDT"
    assert got["gate:bbo:spot:18"][0] == "BTC_USDT"
    # REST snapshots: spot current is ms, swap current is float seconds
    assert got["gate:l2_snapshot:spot:32"] == ("NONE", 1654249533113)
    assert got["gate:l2_snapshot:inverse_swap:35"] == ("NONE", 1654251302768)
    # open interest: symbol NONE, no timestamp
    assert got["gate:open_interest:inverse_swap:37"][0] == "NONE"
    assert got["gate:open_interest:inverse_swap:37"][1] is None
