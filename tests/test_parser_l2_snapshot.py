"""api.parse_l2_snapshot parity — REST depth snapshots for the three
exchanges lib.rs:286-298 supports (binance, bitfinex, bitget)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_msg_parser_spark.parser import api
from tests.parser_util import RECEIVED_AT, fixtures_df, load_fixtures


_SYMBOLS = {
    ("binance", "spot"): "BTCUSDT",
    ("binance", "linear_swap"): "BTCUSDT",
    ("binance", "linear_future"): "BTCUSDT_220930",
    ("binance", "inverse_swap"): None,  # embedded in the response
    ("binance", "inverse_future"): None,
    ("bitfinex", "spot"): "tBTCUSD",
    ("bitfinex", "linear_swap"): "tBTCF0:USTF0",
    ("bitget", "spot"): "BTCUSDT_SPBL",
    ("bitget", "linear_swap"): "BTCUSDT_UMCBL",
    ("bitget", "inverse_swap"): "BTCUSD_DMCBL",
}


def _raw(spark):
    rows = []
    for ex in ("binance", "bitfinex", "bitget"):
        for r in load_fixtures(ex, "l2_snapshot"):
            mt = r["market_type"] or (
                "linear_swap" if "F0" in r["raw"] else "spot"
            )
            rows.append(dict(r, market_type=mt))
    df = fixtures_df(spark, rows)
    sym = F.lit(None).cast("string")
    for (ex, mt), s in _SYMBOLS.items():
        if s is not None:
            sym = F.when(
                (F.col("exchange") == ex) & (F.col("market_type") == mt), s
            ).otherwise(sym)
    return df.withColumn("routed_symbol", sym)


def test_l2_snapshots(spark):
    raw = _raw(spark)
    out = api.parse_l2_snapshot(raw).collect()
    assert out
    by_ex = {}
    for row in out:
        d = row.asDict(recursive=True)
        by_ex.setdefault(d["exchange"], []).append(d)
    assert set(by_ex) == {"binance", "bitfinex", "bitget"}
    for books in by_ex.values():
        for b in books:
            assert b["msg_type"] == "l2_snapshot"
            assert b["snapshot"] is True
            assert "/" in b["pair"]
            assert b["asks"] and b["bids"]
            ask_prices = [o["price"] for o in b["asks"]]
            assert ask_prices == sorted(ask_prices)
            bid_prices = [o["price"] for o in b["bids"]]
            assert bid_prices == sorted(bid_prices, reverse=True)
    # binance inverse embeds the symbol + E timestamp
    inv = [
        b
        for b in by_ex["binance"]
        if b["market_type"] in ("inverse_swap", "inverse_future")
    ]
    for b in inv:
        assert b["symbol"].startswith("BTCUSD")
        assert b["timestamp"] != RECEIVED_AT
    # binance spot: neither -> routed symbol + crawl receive time
    spot = [b for b in by_ex["binance"] if b["market_type"] == "spot"]
    for b in spot:
        assert b["symbol"] == "BTCUSDT"
        assert b["timestamp"] == RECEIVED_AT
        assert b["seq_id"] is not None
    # bitfinex: timestamp is always the crawl receive time
    for b in by_ex["bitfinex"]:
        assert b["timestamp"] == RECEIVED_AT
    # bitget: contract quantity set for derivatives
    deriv = [b for b in by_ex["bitget"] if b["market_type"] != "spot"]
    for b in deriv:
        for o in b["asks"]:
            assert o["quantity_contract"] is not None
