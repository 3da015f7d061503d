"""KuCoin parse-stage parity (crypto-msg-parser/tests/kucoin.rs)."""

from __future__ import annotations

from crypto_msg_parser_spark.parser import kucoin
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
        r for r in load_fixtures("kucoin", msg_type) if r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), rows


def test_trade_fixtures(spark):
    by_id, _ = _parsed(spark, "trade", kucoin.parse_trade)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "kucoin")
    assert len(trades) == 4

    # tests/kucoin.rs:33-35 (spot; ns timestamp / 1e6)
    spot = by_id["kucoin:trade:spot:0"][0]
    assert spot["symbol"] == "BTC-USDT"
    assert spot["pair"] == "BTC/USDT"
    assert spot["quantity_base"] == 0.00013064
    assert spot["quantity_contract"] is None
    assert spot["side"] == "buy"
    assert len(str(spot["timestamp"])) == 13

    # tests/kucoin.rs:59-62 (linear swap, XBTUSDTM cv=0.001)
    lin = by_id["kucoin:trade:linear_swap:1"][0]
    assert lin["pair"] == "BTC/USDT"
    assert lin["quantity_base"] == 0.001 * 16.0
    assert lin["quantity_quote"] == round9(0.001 * 16.0 * 57850.0)
    assert lin["quantity_contract"] == 16.0

    # tests/kucoin.rs:86-89 (inverse swap, quantity in USD)
    inv = by_id["kucoin:trade:inverse_swap:2"][0]
    assert inv["pair"] == "BTC/USD"
    assert inv["quantity_base"] == 5000.0 / 57798.0
    assert inv["quantity_quote"] == 5000.0
    assert inv["quantity_contract"] == 5000.0

    # tests/kucoin.rs:113-116 (inverse future XBTMH21)
    fut = by_id["kucoin:trade:inverse_future:3"][0]
    assert fut["pair"] == "BTC/USD"
    assert fut["quantity_base"] == 1510.0 / 57963.0
    assert fut["side"] == "sell"


def test_l2_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_event", kucoin.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "kucoin", "l2_event")
    assert len(books) == 5

    # tests/kucoin.rs:134-153 (spot: no time field -> crawl receive time)
    spot = by_id["kucoin:l2_event:spot_update:4"][0]
    assert spot["timestamp"] == RECEIVED_AT
    assert spot["seq_id"] == 1617071937790
    assert len(spot["asks"]) == 0 and len(spot["bids"]) == 1
    assert spot["bids"][0]["price"] == 39272.0
    assert spot["bids"][0]["quantity_base"] == 0.0530867
    assert spot["bids"][0]["quantity_quote"] == 39272.0 * 0.0530867

    # tests/kucoin.rs:180-187 (RUNE-USDC carries data.time in ms)
    rune = by_id["kucoin:l2_event:spot_sample_2:5"][0]
    assert rune["symbol"] == "RUNE-USDC"
    assert rune["timestamp"] == 1658449800752
    assert rune["seq_id"] == 4197479

    # tests/kucoin.rs:214-220 (inverse swap single-change routing)
    inv = by_id["kucoin:l2_event:inverse_swap_update:6"][0]
    assert inv["timestamp"] == 1622718985044
    assert len(inv["asks"]) == 0 and len(inv["bids"]) == 1
    assert inv["bids"][0]["quantity_base"] == 23960.0 / 39069.0
    assert inv["bids"][0]["quantity_quote"] == 23960.0
    assert inv["bids"][0]["quantity_contract"] == 23960.0

    # tests/kucoin.rs:246-252 (linear swap cv=0.001)
    lin = by_id["kucoin:l2_event:linear_swap_update:7"][0]
    assert lin["bids"][0]["quantity_base"] == 4.374
    assert lin["bids"][0]["quantity_contract"] == 4374.0

    # sell change routes to asks (tests/kucoin.rs:261-262)
    fut = by_id["kucoin:l2_event:inverse_future_update:8"][0]
    assert len(fut["asks"]) == 1 and len(fut["bids"]) == 0


def test_l2_topk_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_topk", kucoin.parse_l2_topk)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "kucoin", "l2_topk")
    assert len(books) == 4
    for b in books:
        assert b["snapshot"] is True
        assert len(b["asks"]) == 5 and len(b["bids"]) == 5
    spot = by_id["kucoin:l2_topk:spot:9"][0]
    assert spot["symbol"] == "BTC-USDT"
    assert spot["seq_id"] is None
    swaps = [
        b for bs in by_id.values() for b in bs if b["market_type"] != "spot"
    ]
    for b in swaps:
        assert b["seq_id"] is not None


def test_bbo_fixtures(spark):
    by_id, rows = _parsed(spark, "bbo", kucoin.parse_bbo)
    bbos = [b for bs in by_id.values() for b in bs]
    # swap tickerV2 is todo!() in the reference -> only the 2 spot fixtures
    assert len(bbos) == 2
    for b in bbos:
        assert b["ask_price"] >= b["bid_price"]
        assert b["id"] is not None
        assert b["ask_quantity_quote"] == round9(
            b["ask_price"] * b["ask_quantity_base"]
        )
    all_ticker = [b for b in bbos if b["symbol"] == "DOT-USDT"]
    assert all_ticker and all_ticker[0]["pair"] == "DOT/USDT"


def test_candlestick_fixtures(spark):
    by_id, _ = _parsed(spark, "candlestick", kucoin.parse_candlestick)
    candles = [c for cs in by_id.values() for c in cs]
    # swap candles are todo!() in the reference -> only the spot fixture
    assert len(candles) == 1
    c = candles[0]
    assert c["symbol"] == "BTC-USDT"
    assert c["period"] == "1week"
    assert c["high"] >= c["low"]
    assert len(str(c["timestamp"])) == 13
    assert len(str(c["begin_time"])) == 10  # seconds
    assert c["quote_volume"] is not None


def test_extract_symbol_and_timestamp(spark):
    from pyspark.sql import functions as F

    rows = [
        dict(r, market_type=r["market_type"] or "unknown")
        for r in load_fixtures("kucoin")
    ]
    raw = fixtures_df(spark, rows)
    got = {
        r["msg_id"]: (r["sym"], r["ts"])
        for r in raw.select(
            "msg_id",
            kucoin.extract_symbol(F.col("msg")).alias("sym"),
            kucoin.extract_timestamp(F.col("msg")).alias("ts"),
        ).collect()
    }
    assert got["kucoin:trade:spot:0"][0] == "BTC-USDT"
    assert got["kucoin:trade:linear_swap:1"][0] == "XBTUSDTM"
    assert got["kucoin:l2_event:spot_update:4"][1] is None
    assert got["kucoin:l2_event:spot_sample_2:5"] == ("RUNE-USDC", 1658449800752)
    assert got["kucoin:l2_event:inverse_swap_update:6"] == (
        "XBTUSDM", 1622718985044,
    )
    # candle topic strips the _period suffix
    assert got["kucoin:candlestick:spot:22"][0] == "BTC-USDT"
    assert got["kucoin:candlestick:inverse_swap:24"][0] == "XBTUSDM"
    # ticker:all takes the subject
    assert got["kucoin:bbo:spot_2:14"][0] == "DOT-USDT"
    # snapshot topics: data.data.datetime
    assert got["kucoin:ticker:spot:26"][0] == "BTC-USDT"
    assert got["kucoin:ticker:spot:26"][1] is not None
    # REST: object data with symbol / without
    assert got["kucoin:l2_snapshot:spot:30"][0] == "NONE"
    assert got["kucoin:l2_snapshot:spot:30"][1] == 1654325095225
    assert got["kucoin:l2_snapshot:inverse_swap:32"][0] == "XBTUSDM"
    # REST: array data with >1 element
    assert got["kucoin:open_interest:unknown:34"][0] == "ALL"
    assert got["kucoin:open_interest:unknown:34"][1] is None
