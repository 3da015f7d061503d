"""BitMEX parse-stage parity (crypto-msg-parser/tests/bitmex.rs) including
the id->price tick-table recovery."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_msg_parser_spark.parser import bitmex
from tests.parser_util import (
    RECEIVED_AT,
    check_funding_invariants,
    check_orderbook_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
)


def _parsed(spark, msg_type, parse_fn, include_quanto=True):
    rows = [
        r
        for r in load_fixtures("bitmex", msg_type)
        if r["market_type"] is not None
        # quanto markets have no quantity calculus in the reference either
        # (utils.rs:33-58 has no Quanto arm; quanto l2 tests only exercise
        # the router) — exclude them from parse replay
        and (include_quanto or not r["market_type"].startswith("quanto"))
    ]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), rows


def test_trade_fixtures(spark):
    by_id, rows = _parsed(spark, "trade", bitmex.parse_trade)
    trades = [t for ts in by_id.values() for t in ts] + by_id.get(None, [])
    assert trades
    for t in trades:
        # bitmex quantities come from home/foreignNotional — qq==p*qb is
        # deliberately NOT asserted (tests/utils.rs:29-31 excludes bitmex)
        assert t["price"] > 0 and t["quantity_base"] > 0
        assert t["quantity_contract"] is not None
        assert t["trade_id"]
        assert len(str(t["timestamp"])) == 13
        assert "/" in t["pair"]
        assert t["pair"].startswith("BTC") or "XBT" not in t["pair"]


def test_id_to_price_closed_form(spark):
    """Golden pair from bitmex.rs:1047-1058: XBTUSD id 8794863350 ->
    51366.5 via (1e8*88 - id) * 0.01."""
    df = spark.createDataFrame([("XBTUSD", 8794863350)], "symbol string, id long")
    ticks = bitmex._ticks_dict(spark)
    got = (
        df.join(F.broadcast(ticks), F.col("symbol") == F.col("tick_symbol"))
        .select(
            bitmex.id_to_price(
                F.col("sym_index"), F.col("tick_size"), F.col("id")
            ).alias("price")
        )
        .collect()[0]["price"]
    )
    assert got == 51366.5


def test_l2_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_event", bitmex.parse_l2, include_quanto=False)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "bitmex", "l2_event")
    # delta levels have no price in the payload: every price must have been
    # recovered through the tick table
    for b in books:
        for o in b["asks"] + b["bids"]:
            assert o["price"] > 0


def test_l2_topk_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_topk", bitmex.parse_l2_topk, include_quanto=False)
    books = [b for bs in by_id.values() for b in bs]
    if books:
        check_orderbook_invariants(books, "bitmex", "l2_topk")


def test_bbo_fixtures(spark):
    by_id, _ = _parsed(spark, "bbo", bitmex.parse_bbo)
    bbos = [b for bs in by_id.values() for b in bs] + by_id.get(None, [])
    assert bbos
    for b in bbos:
        assert b["ask_price"] >= b["bid_price"] > 0


def test_funding_fixtures(spark):
    by_id, _ = _parsed(spark, "funding_rate", bitmex.parse_funding_rate)
    rates = [r for rs in by_id.values() for r in rs] + by_id.get(None, [])
    check_funding_invariants(rates, "bitmex")
    for r in rates:
        assert r["timestamp"] == RECEIVED_AT


def test_candlestick_fixtures(spark):
    by_id, _ = _parsed(spark, "candlestick", bitmex.parse_candlestick)
    candles = [c for cs in by_id.values() for c in cs] + by_id.get(None, [])
    assert candles
    for c in candles:
        assert c["low"] <= c["high"]
        # bitmex begin_time stays in ms (bitmex.rs:1015)
        assert c["begin_time"] == c["timestamp"] - 60000 * int(c["period"][:-1])


def test_router_columns(spark):
    rows = [
        r
        for r in load_fixtures("bitmex")
        if r["msg_type"] is not None and r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    routed = raw.select(
        "msg_id",
        "msg_type",
        bitmex.get_msg_type(F.col("msg")).alias("detected"),
        bitmex.extract_symbol(F.col("msg")).alias("symbol"),
    ).collect()
    for r in routed:
        if r["detected"] != "other" and r["msg_type"] in (
            "trade",
            "l2_event",
            "l2_topk",
            "bbo",
            "funding_rate",
        ):
            assert r["detected"] == r["msg_type"], r
        assert r["symbol"], r
