"""ZBG parse-stage parity (crypto-msg-parser/tests/zbg.rs)."""

from __future__ import annotations

from crypto_msg_parser_spark.parser import zbg
from tests.parser_util import (
    check_orderbook_invariants,
    check_trade_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
)


def _parsed(spark, msg_type, parse_fn):
    rows = [
        r for r in load_fixtures("zbg", msg_type) if r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), rows


def test_trade_fixtures(spark):
    by_id, _ = _parsed(spark, "trade", zbg.parse_trade)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "zbg")
    assert len(trades) == 4

    # tests/zbg.rs:33-34 (spot 2-D frame)
    s0 = by_id["zbg:trade:spot:0"][0]
    assert s0["symbol"] == "btc_usdt"
    assert s0["pair"] == "BTC/USDT"
    assert s0["quantity_base"] == 0.0488
    assert s0["side"] == "buy"
    assert s0["timestamp"] == 1616384937000

    # tests/zbg.rs:55-56 (spot 1-D frame)
    s1 = by_id["zbg:trade:spot:1"][0]
    assert s1["quantity_base"] == 0.654172
    assert s1["side"] == "sell"

    # tests/zbg.rs:81-84 (linear swap, BTC_USDT unit=0.01)
    lin = by_id["zbg:trade:linear_swap:2"][0]
    assert lin["symbol"] == "BTC_USDT"
    assert lin["quantity_base"] == 0.01 * 31.0
    assert lin["quantity_quote"] == 0.01 * 31.0 * 57326.0
    assert lin["quantity_contract"] == 31.0
    assert lin["side"] == "sell"
    assert lin["timestamp"] == 1616385064674

    # tests/zbg.rs:108-111 (inverse swap, BTC_USD-R unit=1)
    inv = by_id["zbg:trade:inverse_swap:3"][0]
    assert inv["pair"] == "BTC/USD"
    assert inv["quantity_base"] == 188.0 / 57370.0
    assert inv["quantity_quote"] == 188.0
    assert inv["quantity_contract"] == 188.0


def test_l2_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_event", zbg.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "zbg", "l2_event")
    # snapshot_1 + snapshot_2 + update + 2 swaps; null-ts snapshot dropped
    assert len(books) == 5

    # tests/zbg.rs:145-153 (spot snapshot; asks re-sorted ascending)
    snap = by_id["zbg:l2_event:spot_snapshot_1:4"][0]
    assert snap["timestamp"] == 1622729950000
    assert snap["snapshot"] is True
    assert snap["bids"][0]["price"] == 38388.7
    assert snap["bids"][0]["quantity_base"] == 0.146025
    assert snap["asks"][0]["price"] == 38394.2
    assert snap["asks"][0]["quantity_base"] == 0.195885

    # numeric-literal levels also parse (SOS_USDT snapshot)
    sos = by_id["zbg:l2_event:spot_snapshot_2:5"][0]
    assert sos["pair"] == "SOS/USDT"
    assert len(sos["asks"]) == 2

    # update routes to one side
    upd = by_id["zbg:l2_event:spot_update:7"][0]
    assert upd["snapshot"] is False
    assert len(upd["bids"]) == 1 and len(upd["asks"]) == 0

    # swap update: contract-unit quantity math, µs -> ms
    lin = by_id["zbg:l2_event:linear_swap_update:8"][0]
    assert lin["symbol"] == "BTC_USDT"
    assert lin["asks"][0]["quantity_base"] == 2684 * 0.01
    assert lin["asks"][0]["quantity_contract"] == 2684.0
    assert len(str(lin["timestamp"])) == 13


def test_candlestick_fixtures(spark):
    by_id, _ = _parsed(spark, "candlestick", zbg.parse_candlestick)
    candles = [c for cs in by_id.values() for c in cs]
    assert len(candles) >= 4
    for c in candles:
        assert c["high"] >= c["low"]
        assert "/" in c["pair"]
    spot = [c for c in candles if c["market_type"] == "spot"]
    for c in spot:
        assert c["period"] == "1M"
        assert c["begin_time"] == c["timestamp"] - 60000
    swap = [c for c in candles if c["market_type"] != "spot"]
    for c in swap:
        # range is already in ms for futures ("60000"/"180000")
        assert c["begin_time"] == c["timestamp"] - int(c["period"])
        assert c["quote_volume"] is not None


def test_extract_symbol_and_timestamp(spark):
    from pyspark.sql import functions as F

    rows = [
        dict(r, market_type=r["market_type"] or "unknown")
        for r in load_fixtures("zbg")
    ]
    raw = fixtures_df(spark, rows)
    got = {
        r["msg_id"]: (r["sym"], r["ts"])
        for r in raw.select(
            "msg_id",
            zbg.extract_symbol(F.col("msg")).alias("sym"),
            zbg.extract_timestamp(F.col("msg")).alias("ts"),
        ).collect()
    }
    assert got["zbg:trade:spot:0"] == ("btc_usdt", 1616384937000)
    assert got["zbg:trade:linear_swap:2"][0] == "BTC_USDT"
    assert got["zbg:trade:linear_swap:2"][1] == 1616385064674
    assert got["zbg:trade:inverse_swap:3"][0] == "BTC_USD-R"
    # trade_statistic: single row resolves through the spot-id map
    assert got["zbg:ticker:spot:14"] == ("btc_usdt", None)
    # swap indicator: te field (µs)
    assert got["zbg:ticker:inverse_swap:16"][0] == "BTC_USD-R"
    # REST: datas.sb / datas.timestamp|te
    assert got["zbg:open_interest:inverse_swap:21"][0] == "BTC_USD-R"
    assert len(str(got["zbg:open_interest:inverse_swap:21"][1])) == 13
    assert got["zbg:l2_snapshot:spot:18"][0] == "NONE"
