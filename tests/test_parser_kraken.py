"""Kraken parse-stage parity (crypto-msg-parser/tests/kraken.rs)."""

from __future__ import annotations

from crypto_msg_parser_spark.parser import kraken
from tests.parser_util import (
    check_orderbook_invariants,
    check_trade_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
    round9,
)


def _parsed(spark, msg_type, parse_fn):
    rows = [
        r for r in load_fixtures("kraken", msg_type) if r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), rows


def test_trade_fixtures(spark):
    by_id, _ = _parsed(spark, "trade", kraken.parse_trade)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "kraken")

    # tests/kraken.rs:29-30 (spot; trade_id IS the timestamp)
    spot = by_id["kraken:trade:spot:0"][0]
    assert spot["symbol"] == "XBT/USD"
    assert spot["pair"] == "BTC/USD"
    assert spot["quantity_base"] == 0.02063928
    assert spot["side"] == "buy"
    assert spot["trade_id"] == str(spot["timestamp"])

    # futures: qty is USD notional (tests/kraken.rs:53-58 etc.)
    futs = [t for t in trades if t["market_type"] != "spot"]
    assert futs
    for t in futs:
        assert t["quantity_base"] == t["quantity_quote"] / t["price"]
        assert t["quantity_contract"] == t["quantity_quote"]
        assert t["pair"] == "BTC/USD"


def test_l2_fixtures(spark):
    by_id, rows = _parsed(spark, "l2_event", kraken.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "kraken", "l2_event")
    # 8 fixtures; the empty as/bs snapshot (PERP/EUR) yields nothing
    assert len(books) == 7

    # tests/kraken.rs:170-179 (spot single-update frame)
    upd = by_id["kraken:l2_event:spot_update:7"][0]
    assert upd["timestamp"] == 1622714256068
    assert upd["snapshot"] is False
    assert upd["bids"][0]["price"] == 39071.4
    assert upd["bids"][0]["quantity_base"] == 7.26106570
    assert upd["bids"][0]["quantity_quote"] == 39071.4 * 7.26106570

    # 5-element frame merges both update payloads
    upd2 = by_id["kraken:l2_event:spot_update:8"][0]
    assert len(upd2["asks"]) == 1 and len(upd2["bids"]) == 1

    # futures snapshot: USD-notional order quantities
    snap = by_id["kraken:l2_event:inverse_swap_snapshot:9"][0]
    assert snap["snapshot"] is True
    assert snap["seq_id"] == 270511410
    for o in snap["asks"]:
        assert o["quantity_quote"] == o["quantity_contract"]

    # futures update routes by side ('buy' -> bids)
    fupd = by_id["kraken:l2_event:inverse_swap_update:10"][0]
    assert len(fupd["bids"]) == 1 and len(fupd["asks"]) == 0
    assert fupd["seq_id"] == 270613033


def test_bbo_fixtures(spark):
    by_id, _ = _parsed(spark, "bbo", kraken.parse_bbo)
    bbos = [b for bs in by_id.values() for b in bs]
    assert len(bbos) == 1
    b = bbos[0]
    assert b["symbol"] == "XBT/USD"
    assert b["bid_price"] == 31760.0
    assert b["ask_price"] == 31760.1
    assert b["timestamp"] == 1654031976197
    assert b["bid_quantity_quote"] == round9(31760.0 * 0.02167307)


def test_candlestick_fixtures(spark):
    by_id, _ = _parsed(spark, "candlestick", kraken.parse_candlestick)
    candles = [c for cs in by_id.values() for c in cs]
    assert len(candles) == 1
    c = candles[0]
    assert c["pair"] == "BTC/USD"
    assert c["timestamp"] == 1675209613118
    # etime=1675209660 (s), period "1" -> begin = 1675209660 - 60
    assert c["begin_time"] == 1675209600
    assert c["period"] == "1"
    assert c["quote_volume"] is not None


def test_extract_symbol_and_timestamp(spark):
    from pyspark.sql import functions as F

    rows = [
        dict(r, market_type=r["market_type"] or "unknown")
        for r in load_fixtures("kraken")
    ]
    raw = fixtures_df(spark, rows)
    got = {
        r["msg_id"]: (r["sym"], r["ts"], r["mt"])
        for r in raw.select(
            "msg_id",
            kraken.extract_symbol(F.col("msg")).alias("sym"),
            kraken.extract_timestamp(F.col("msg")).alias("ts"),
            kraken.get_msg_type(F.col("msg")).alias("mt"),
        ).collect()
    }
    assert got["kraken:trade:spot:0"] == ("XBT/USD", 1616333924737, "trade")
    assert got["kraken:trade:inverse_swap_update:2"][0] == "PI_XBTUSD"
    assert got["kraken:trade:inverse_swap_update:2"][2] == "trade"
    assert got["kraken:l2_event:spot_update:7"] == (
        "XBT/USD", 1622714256068, "l2_event",
    )
    assert got["kraken:l2_event:inverse_swap_snapshot:9"] == (
        "PI_XBTUSD", 1646478671000, "l2_event",
    )
    assert got["kraken:bbo:spot:13"][2] == "bbo"
    assert got["kraken:candlestick:spot:14"][2] == "candlestick"
    assert got["kraken:ticker:spot:15"][2] == "ticker"
    # spot REST: single result key = the symbol; ts None
    assert got["kraken:l2_snapshot:spot:18"] == ("XXBTZUSD", None, "other")
    # futures REST: serverTime RFC3339 -> ms
    assert got["kraken:l2_snapshot:inverse_swap:20"][0] == "NONE"
    assert len(str(got["kraken:l2_snapshot:inverse_swap:20"][1])) == 13
