"""Bitfinex parse-stage parity (crypto-msg-parser/tests/bitfinex.rs)."""

from __future__ import annotations

from crypto_msg_parser_spark.parser import bitfinex
from tests.parser_util import (
    RECEIVED_AT,
    check_orderbook_invariants,
    check_trade_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
)


def _fill_mt(r):
    # the fixture extractor left swap trades untyped; tBTC F0 symbols are
    # linear swaps (crypto-pair/src/exchanges/bitfinex.rs:121-126)
    mt = r["market_type"]
    if mt is None:
        mt = "linear_swap" if "F0" in r["raw"] else "spot"
    return dict(r, market_type=mt)


def _parsed(spark, msg_type, parse_fn):
    rows = [_fill_mt(r) for r in load_fixtures("bitfinex", msg_type)]
    raw = fixtures_df(spark, rows)
    return rows_by_id(parse_fn(raw), raw), rows


def test_trade_fixtures(spark):
    by_id, _ = _parsed(spark, "trade", bitfinex.parse_trade)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "bitfinex")

    # te frame: single trade with whole-msg provenance
    te = by_id["bitfinex:trade:spot_te:0"][0]
    assert te["symbol"] == "tBTCUST"
    assert te["pair"] == "BTC/USDT"
    assert te["timestamp"] == 1615232733897
    assert te["price"] == 51350.0
    assert te["quantity_base"] == 0.11546588
    assert te["side"] == "buy"
    assert te["trade_id"] == "637771130"

    # swap te: F0 symbol still normalizes to BTC/USDT; contract qty set
    swap = by_id["bitfinex:trade:swap_te:3"][0]
    assert swap["pair"] == "BTC/USDT"
    assert swap["quantity_contract"] == 0.00020449

    # snapshots fan out; negative amounts are sells
    snap_trades = [
        t for ts in by_id.values() for t in ts if t["trade_id"] == "647256201"
    ]
    assert snap_trades and snap_trades[0]["side"] == "sell"
    assert snap_trades[0]["quantity_base"] == 0.06153795


def test_l2_fixtures(spark):
    by_id, _ = _parsed(spark, "l2_event", bitfinex.parse_l2)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "bitfinex", "l2_event")
    assert len(books) == 4
    for b in books:
        assert b["timestamp"] == RECEIVED_AT

    snap = by_id["bitfinex:l2_event:spot_snapshot:6"][0]
    assert snap["snapshot"] is True
    assert snap["asks"] and snap["bids"]
    for o in snap["bids"]:
        assert o["quantity_base"] > 0

    upd = by_id["bitfinex:l2_event:spot_update:7"][0]
    assert upd["snapshot"] is False
    # [34668, 1, -0.00813136] -> ask side
    assert len(upd["asks"]) == 1 and len(upd["bids"]) == 0
    assert upd["asks"][0]["price"] == 34668.0
    assert upd["asks"][0]["quantity_base"] == 0.00813136

    swap_upd = by_id["bitfinex:l2_event:linear_swap_update:9"][0]
    assert len(swap_upd["bids"]) == 1
    assert swap_upd["bids"][0]["quantity_contract"] == 2.27726294


def test_l2_snapshot_fixtures(spark):
    from pyspark.sql import functions as F

    rows = [_fill_mt(r) for r in load_fixtures("bitfinex", "l2_snapshot")]
    raw = fixtures_df(spark, rows).withColumn(
        "routed_symbol",
        F.when(F.col("market_type") == "spot", "tBTCUSD").otherwise(
            "tBTCF0:USTF0"
        ),
    )
    by_id = rows_by_id(bitfinex.parse_l2_snapshot(raw), raw)
    books = [b for bs in by_id.values() for b in bs]
    assert len(books) == 2
    for b in books:
        assert b["msg_type"] == "l2_snapshot"
        assert b["snapshot"] is True
        assert b["timestamp"] == RECEIVED_AT
        assert b["pair"] in ("BTC/USD", "BTC/USDT")
        ask_prices = [o["price"] for o in b["asks"]]
        assert ask_prices == sorted(ask_prices)
        assert b["bids"] and b["asks"]


def test_candlestick_fixtures(spark):
    by_id, _ = _parsed(spark, "candlestick", bitfinex.parse_candlestick)
    candles = [c for cs in by_id.values() for c in cs]
    assert len(candles) >= 4
    for c in candles:
        assert c["high"] >= c["low"]
        assert c["pair"] == "BTC/USDT"
        assert c["period"] == "1m"
        assert c["timestamp"] == c["begin_time"]
        assert c["quote_volume"] is None
    upd = by_id["bitfinex:candlestick:spot_update:15"][0]
    # [1654075080000, 31619, 31619, 31619, 31619, 0.00843875] = t,o,c,h,l,v
    assert upd["begin_time"] == 1654075080000
    assert upd["volume"] == 0.00843875


def test_extract_symbol_and_timestamp(spark):
    from pyspark.sql import functions as F

    rows = [_fill_mt(r) for r in load_fixtures("bitfinex")]
    raw = fixtures_df(spark, rows)
    got = {
        r["msg_id"]: (r["sym"], r["ts"], r["mt"])
        for r in raw.select(
            "msg_id",
            bitfinex.extract_symbol(F.col("msg")).alias("sym"),
            bitfinex.extract_timestamp(F.col("msg")).alias("ts"),
            bitfinex.get_msg_type(F.col("msg")).alias("mt"),
        ).collect()
    }
    assert got["bitfinex:trade:spot_te:0"] == ("tBTCUST", 1615232733897, "trade")
    assert got["bitfinex:trade:spot_snapshot:2"][1] is not None
    assert got["bitfinex:l2_event:spot_update:7"][1] is None
    assert got["bitfinex:l2_event:spot_update:7"][2] == "l2_event"
    assert got["bitfinex:l3_event:spot_update:11"][2] == "l3_event"
    assert got["bitfinex:candlestick:spot_update:15"] == (
        "tBTCUST", 1654075080000, "candlestick",
    )
    assert got["bitfinex:candlestick:linear_swap_snapshot:16"][0] == "tBTCF0:USTF0"
    assert got["bitfinex:ticker:spot:18"][2] == "ticker"
