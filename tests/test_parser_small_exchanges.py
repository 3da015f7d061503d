"""Parse-stage parity for the small exchanges: zb, coinbase_pro, bithumb,
bitstamp, bitz (crypto-msg-parser/tests/{zb,coinbase_pro,bithumb,bitstamp,
bitz}.rs). Completes all 20 reference dispatch arms."""

from __future__ import annotations

from crypto_msg_parser_spark.parser import (
    bithumb,
    bitstamp,
    bitz,
    coinbase_pro,
    zb,
)
from tests.parser_util import (
    RECEIVED_AT,
    check_orderbook_invariants,
    check_trade_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
    round9,
)


def _rows(spark, exchange, pred):
    rows = [
        dict(r, market_type=r["market_type"] or "spot")
        for r in load_fixtures(exchange)
        if pred(r)
    ]
    return fixtures_df(spark, rows)


# ------------------------------------------------------------------- zb

def test_zb_trades(spark):
    raw = _rows(spark, "zb", lambda r: r["msg_type"] == "trade")
    by_id = rows_by_id(zb.parse_trade(raw), raw)
    trades = [t for ts in by_id.values() for t in ts]
    # spot fixture fans out (json re-serialized), swap too
    assert trades
    spot = [t for t in trades if t["market_type"] == "spot"]
    assert spot
    for t in spot:
        assert t["pair"] == "BTC/USDT"
        assert t["quantity_quote"] == t["price"] * t["quantity_base"]
        assert len(str(t["timestamp"])) == 13
    swap = [t for t in trades if t["market_type"] == "linear_swap"]
    assert swap
    for t in swap:
        assert t["pair"] == "BTC/USDT"
        assert t["side"] == "buy"  # reference quirk: ts-slot sign check
        assert t["quantity_contract"] is not None
        assert t["trade_id"] == str(t["timestamp"])


def test_zb_orderbooks(spark):
    raw = _rows(spark, "zb", lambda r: r["msg_type"] == "l2_event")
    by_id = rows_by_id(zb.parse_l2(raw), raw)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "zb", "l2_event")
    assert len(books) == 3  # swap-only: spot incremental unimplemented
    snap = by_id["zb:l2_event:linear_swap_snapshot:2"][0]
    assert snap["snapshot"] is True  # type == "Whole"
    upd = by_id["zb:l2_event:linear_swap_update:3"][0]
    assert upd["snapshot"] is False

    raw = _rows(spark, "zb", lambda r: r["msg_type"] == "l2_topk")
    by_id = rows_by_id(zb.parse_l2_topk(raw), raw)
    topk = [b for bs in by_id.values() for b in bs]
    assert len(topk) == 2
    for b in topk:
        assert b["snapshot"] is True
        assert b["msg_type"] == "l2_topk"
    spot = by_id["zb:l2_topk:spot:5"][0]
    assert spot["pair"] == "BTC/USDT"
    assert len(str(spot["timestamp"])) == 13


def test_zb_candles(spark):
    raw = _rows(spark, "zb", lambda r: r["msg_type"] == "candlestick")
    by_id = rows_by_id(zb.parse_candlestick(raw), raw)
    candles = [c for cs in by_id.values() for c in cs]
    assert len(candles) >= 3
    for c in candles:
        assert c["pair"] == "BTC/USDT"
        assert c["high"] >= c["low"]
        avg = (c["open"] + c["high"] + c["low"] + c["close"]) / 4
        assert c["quote_volume"] == round9(round9(c["volume"] * avg))
        assert len(str(c["timestamp"])) == 13


def test_zb_extract(spark):
    from pyspark.sql import functions as F

    raw = _rows(spark, "zb", lambda r: True)
    got = {
        r["msg_id"]: (r["sym"], r["ts"])
        for r in raw.select(
            "msg_id",
            zb.extract_symbol(F.col("msg")).alias("sym"),
            zb.extract_timestamp(F.col("msg")).alias("ts"),
        ).collect()
    }
    assert got["zb:trade:linear_swap:1"] == ("BTC_USDT", 1653774742000)
    assert got["zb:l2_topk:linear_swap:6"][0] == "BTC_USDT"
    assert got["zb:l2_snapshot:spot:12"][0] == "NONE"
    assert got["zb:l2_snapshot:linear_swap:13"][0] == "NONE"
    assert got["zb:ticker:linear_swap:8"][1] == 1653783012000


# --------------------------------------------------------- coinbase_pro

def test_coinbase_pro(spark):
    raw = _rows(spark, "coinbase_pro", lambda r: "trade" in r["fixture_id"])
    by_id = rows_by_id(coinbase_pro.parse_trade(raw), raw)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "coinbase_pro")
    t = trades[0]
    assert t["symbol"] == "BTC-USD"
    assert t["pair"] == "BTC/USD"
    assert t["trade_id"] == "147587438"

    raw = _rows(
        spark, "coinbase_pro", lambda r: "l2_orderbook" in r["fixture_id"]
    )
    by_id = rows_by_id(coinbase_pro.parse_l2(raw), raw)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "coinbase_pro", "l2_event")
    assert len(books) == 2
    snap = [b for b in books if b["snapshot"]][0]
    assert snap["timestamp"] == RECEIVED_AT  # snapshots carry no time
    upd = [b for b in books if not b["snapshot"]][0]
    assert len(upd["bids"]) == 1  # single "buy" change
    assert len(str(upd["timestamp"])) == 13


def test_coinbase_pro_extract(spark):
    from pyspark.sql import functions as F

    raw = _rows(spark, "coinbase_pro", lambda r: True)
    got = {
        r["msg_id"]: (r["sym"], r["ts"], r["mt"])
        for r in raw.select(
            "msg_id",
            coinbase_pro.extract_symbol(F.col("msg")).alias("sym"),
            coinbase_pro.extract_timestamp(F.col("msg")).alias("ts"),
            coinbase_pro.get_msg_type(F.col("msg")).alias("mt"),
        ).collect()
    }
    assert got["coinbase_pro:None:trade:0"][0] == "BTC-USD"
    assert got["coinbase_pro:None:trade:0"][2] == "trade"
    assert got["coinbase_pro:None:l2_orderbook_snapshot:1"][1] is None
    assert got["coinbase_pro:None:l2_orderbook_update:2"][2] == "l2_event"
    assert got["coinbase_pro:None:l3_event:3"][2] == "l3_event"
    assert got["coinbase_pro:None:l2_snapshot:5"][0] == "NONE"


# -------------------------------------------------------------- bithumb

def test_bithumb(spark):
    raw = _rows(spark, "bithumb", lambda r: "trade" in r["fixture_id"])
    by_id = rows_by_id(bithumb.parse_trade(raw), raw)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "bithumb")
    upd = [t for t in trades if t["symbol"] == "ETH-USDT"][0]
    assert upd["pair"] == "ETH/USDT"
    assert upd["trade_id"] == "15186035"
    assert upd["timestamp"] == 1616487024000

    raw = _rows(spark, "bithumb", lambda r: "l2_orderbook" in r["fixture_id"])
    by_id = rows_by_id(bithumb.parse_l2(raw), raw)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "bithumb", "l2_event")
    assert len(books) == 2
    snap = [b for b in books if b["snapshot"]][0]
    assert snap["seq_id"] is not None


# ------------------------------------------------------------- bitstamp

def test_bitstamp(spark):
    raw = _rows(spark, "bitstamp", lambda r: r["fixture_id"].endswith("trade:0"))
    by_id = rows_by_id(bitstamp.parse_trade(raw), raw)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "bitstamp")
    t = trades[0]
    assert t["symbol"] == "btcusd"
    assert t["pair"] == "BTC/USD"
    assert len(str(t["timestamp"])) == 13

    raw = _rows(
        spark,
        "bitstamp",
        lambda r: "l2_event" in r["fixture_id"] or "l2_topk" in r["fixture_id"],
    )
    by_id = rows_by_id(bitstamp.parse_l2(raw), raw)
    books = [b for bs in by_id.values() for b in bs]
    assert len(books) == 2
    diff = [b for b in books if b["msg_type"] == "l2_event"][0]
    assert diff["snapshot"] is False
    assert diff["timestamp"] == 1622520011989
    topk = [b for b in books if b["msg_type"] == "l2_topk"][0]
    assert topk["snapshot"] is True


def test_bitstamp_extract(spark):
    from pyspark.sql import functions as F

    raw = _rows(spark, "bitstamp", lambda r: True)
    got = {
        r["msg_id"]: (r["sym"], r["ts"], r["mt"])
        for r in raw.select(
            "msg_id",
            bitstamp.extract_symbol(F.col("msg")).alias("sym"),
            bitstamp.extract_timestamp(F.col("msg")).alias("ts"),
            bitstamp.get_msg_type(F.col("msg")).alias("mt"),
        ).collect()
    }
    assert got["bitstamp:None:trade:0"][0] == "btcusd"
    assert got["bitstamp:None:trade:0"][2] == "trade"
    assert got["bitstamp:None:l3_event:3"][2] == "l3_event"
    assert got["bitstamp:None:l2_snapshot:4"][0] == "NONE"
    assert got["bitstamp:None:l2_snapshot:4"][1] == 1654243213142


# ----------------------------------------------------------------- bitz

def test_bitz(spark):
    raw = _rows(spark, "bitz", lambda r: "trade" in r["fixture_id"])
    by_id = rows_by_id(bitz.parse_trade(raw), raw)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "bitz")
    for t in trades:
        assert t["pair"] == "BTC/USDT"
        assert t["trade_id"] == str(t["timestamp"])

    raw = _rows(spark, "bitz", lambda r: "l2" in r["fixture_id"])
    by_id = rows_by_id(bitz.parse_l2(raw), raw)
    books = [b for bs in by_id.values() for b in bs]
    assert len(books) == 1
    b = books[0]
    assert b["snapshot"] is False
    assert b["pair"] == "BTC/USDT"
    for o in b["asks"] + b["bids"]:
        assert o["price"] > 0
