"""FTX parse-stage parity (crypto-msg-parser/tests/ftx.rs)."""

from __future__ import annotations

from crypto_msg_parser_spark.parser import ftx
from tests.parser_util import (
    check_orderbook_invariants,
    check_trade_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
    round9,
)


def _fill_mt(r):
    mt = r["market_type"]
    if mt is None:
        if "-MOVE-" in r["raw"]:
            mt = "move"
        elif '"result":[' in r["raw"].replace(" ", ""):
            mt = "unknown"
        else:
            mt = "linear_future"
    return dict(r, market_type=mt)


def _parsed(spark, msg_type, parse_fn):
    rows = [_fill_mt(r) for r in load_fixtures("ftx", msg_type)]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), rows


def test_trade_fixtures(spark):
    by_id, _ = _parsed(spark, "trade", ftx.parse_trade)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "ftx")

    spot = by_id["ftx:trade:spot:0"][0]
    assert spot["symbol"] == "BTC/USD"
    assert spot["pair"] == "BTC/USD"
    assert spot["quantity_contract"] is None
    assert len(str(spot["timestamp"])) == 13

    swap = by_id["ftx:trade:linear_swap:2"][0]
    assert swap["pair"] == "BTC/USD"
    assert swap["quantity_contract"] is not None
    assert swap["quantity_base"] == round9(swap["quantity_contract"])

    move = by_id["ftx:trade:volatility_move:3"][0]
    assert move["market_type"] == "move"
    assert move["pair"] == "BTC/USD"


def test_l2_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_event", ftx.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "ftx", "l2_event")
    assert len(books) == 6
    snaps = [b for b in books if b["snapshot"]]
    assert len(snaps) == 3  # 'partial' action
    fut = by_id["ftx:l2_event:linear_future_snapshot:6"][0]
    assert fut["pair"] == "BTC/USD"
    for o in fut["asks"]:
        assert o["quantity_contract"] is not None


def test_bbo_fixtures(spark):
    by_id, _ = _parsed(spark, "bbo", ftx.parse_bbo)
    bbos = [b for bs in by_id.values() for b in bs]
    assert len(bbos) == 3
    for b in bbos:
        assert b["ask_price"] >= b["bid_price"]
        assert len(str(b["timestamp"])) == 13
    spot = by_id["ftx:bbo:spot:10"][0]
    assert spot["bid_price"] == 31679.0
    assert spot["ask_quantity_contract"] is None


def test_extract_symbol_and_timestamp(spark):
    from pyspark.sql import functions as F

    rows = [_fill_mt(r) for r in load_fixtures("ftx")]
    raw = fixtures_df(spark, rows)
    got = {
        r["msg_id"]: (r["sym"], r["ts"], r["mt"])
        for r in raw.select(
            "msg_id",
            ftx.extract_symbol(F.col("msg")).alias("sym"),
            ftx.extract_timestamp(F.col("msg")).alias("ts"),
            ftx.get_msg_type(F.col("msg")).alias("mt"),
        ).collect()
    }
    assert got["ftx:trade:spot:0"][0] == "BTC/USD"
    assert got["ftx:trade:spot:0"][2] == "trade"
    assert got["ftx:l2_event:spot_update:5"][2] == "l2_event"
    assert len(str(got["ftx:l2_event:spot_update:5"][1])) == 13
    assert got["ftx:bbo:spot:10"][2] == "ticker"  # reference maps ticker
    assert got["ftx:l2_snapshot:spot:13"][0] == "NONE"
    assert got["ftx:l2_snapshot:spot:13"][1] is None
    assert got["ftx:open_interest:unknown:16"][0] == "ALL"
