"""dYdX parse-stage parity (crypto-msg-parser/tests/dydx.rs)."""

from __future__ import annotations

from crypto_msg_parser_spark.parser import dydx
from tests.parser_util import (
    RECEIVED_AT,
    check_orderbook_invariants,
    check_trade_invariants,
    fixtures_df,
    load_fixtures,
    rows_by_id,
)


def test_trade_fixtures(spark):
    rows = [
        r for r in load_fixtures("dydx", "trade") if r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    by_id = rows_by_id(dydx.parse_trade(raw), raw)
    trades = [t for ts in by_id.values() for t in ts]
    check_trade_invariants(trades, "dydx")
    for t in trades:
        assert t["trade_id"] == str(t["timestamp"])  # dydx_swap.rs:132
        assert t["quantity_contract"] == t["quantity_base"]


def test_l2_fixtures(spark):
    rows = [
        r
        for r in load_fixtures("dydx", "l2_event")
        if r["market_type"] is not None
    ]
    raw = fixtures_df(spark, rows)
    by_id = rows_by_id(dydx.parse_l2(raw), raw)
    books = [b for bs in by_id.values() for b in bs]
    check_orderbook_invariants(books, "dydx", "l2_event")
    for b in books:
        assert b["timestamp"] == RECEIVED_AT  # crawl receive time
