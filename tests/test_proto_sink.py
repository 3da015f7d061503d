"""proto3 wire-format sink: golden bytes (hand-computed against the proto3
spec) + Spark round-trip through the mapInPandas encode/decode stages."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from crypto_msg_parser_spark.proto_sink import (
    decode_trade,
    encode_trade,
    from_proto_trades,
    to_proto_trades,
)


def test_trade_golden_bytes():
    # timestamp=1500ms -> seconds=1 (varint 0x01), nanos=500_000_000
    # (varint 80 ca b5 ee 01, derived by hand: 500000000 in base-128 LSB
    # groups = [0, 74, 53, 110, 1])
    buf = encode_trade(1500, "sell", 2.5, 1.5, 3.75, None)
    ts_sub = b"\x08" + b"\x01" + b"\x10" + b"\x80\xca\xb5\xee\x01"
    expect = (
        b"\x0a" + bytes([len(ts_sub)]) + ts_sub  # field1 Timestamp
        + b"\x10\x01"                            # field2 side=true (sell)
        + b"\x1d" + struct.pack("<f", 2.5)       # field3 price
        + b"\x25" + struct.pack("<f", 1.5)       # field4 quantity_base
        + b"\x2d" + struct.pack("<f", 3.75)      # field5 quantity_quote
    )
    assert buf == expect  # spot (qc=None): optional field 6 absent

    # buy side (false) omitted per proto3 default rules; qc present -> 0x35
    buf2 = encode_trade(0, "buy", 0.0, 0.0, 0.0, 7.0)
    assert buf2 == b"\x0a\x00" + b"\x35" + struct.pack("<f", 7.0)

    d = decode_trade(buf)
    assert d["timestamp"] == 1500
    # large-timestamp round trip (varint multi-byte path)
    assert decode_trade(encode_trade(1616176801500, "buy", 1, 1, 1, None))[
        "timestamp"
    ] == 1616176801500
    assert d["side"] == "sell"
    assert d["price"] == 2.5 and d["quantity_contract"] is None
    assert decode_trade(buf2)["quantity_contract"] == 7.0


def test_trade_spark_roundtrip(spark):
    from crypto_msg_parser_spark.parser import gate
    from tests.parser_util import fixtures_df, load_fixtures

    rows = [r for r in load_fixtures("gate", "trade") if r["variant"] == "gate"]
    parsed = gate.parse_trade(fixtures_df(spark, rows))
    back = from_proto_trades(to_proto_trades(parsed))
    a = {
        r["symbol"]: r
        for r in parsed.select(
            "symbol", "timestamp", "side", "price", "quantity_base"
        ).collect()
    }
    b = {r["symbol"]: r for r in back.collect()}
    assert a.keys() == b.keys()
    for sym, r in a.items():
        # float32 precision round trip, exact timestamp/side
        assert b[sym]["timestamp"] == r["timestamp"]
        assert b[sym]["side"] == r["side"]
        assert abs(b[sym]["price"] - r["price"]) <= abs(r["price"]) * 1e-6
        assert (
            abs(b[sym]["quantity_base"] - r["quantity_base"])
            <= abs(r["quantity_base"]) * 1e-6
        )


def test_orderbook_roundtrip():
    from crypto_msg_parser_spark.proto_sink import (
        decode_orderbook,
        encode_orderbook,
    )

    asks = [
        {"price": 100.5, "quantity_base": 2.0, "quantity_quote": 201.0,
         "quantity_contract": 4.0},
        {"price": 101.0, "quantity_base": 0.0, "quantity_quote": 0.0,
         "quantity_contract": 0.0},  # deletion level: zeros survive
    ]
    bids = [
        {"price": 99.5, "quantity_base": 1.0, "quantity_quote": 99.5,
         "quantity_contract": None},  # spot: optional qc absent
    ]
    buf = encode_orderbook(1500, True, asks, bids)
    d = decode_orderbook(buf)
    assert d["timestamp"] == 1500 and d["snapshot"] is True
    assert [o["price"] for o in d["asks"]] == [100.5, 101.0]
    assert d["asks"][1]["quantity_contract"] == 0.0  # optional-present zero
    assert d["bids"][0]["quantity_contract"] is None
    assert d["bids"][0]["quantity_quote"] == 99.5


def test_orderbook_spark_roundtrip(spark):
    """DF-level orderbook proto wrappers mirror OrderBookMsg::to_proto /
    from_proto (crypto-message/src/lib.rs:385-469): f32 precision on level
    fields, exact timestamp/snapshot, seq_id/prev_seq_id dropped to NULL."""
    from crypto_msg_parser_spark.parser import binance
    from crypto_msg_parser_spark.proto_sink import (
        from_proto_orderbooks,
        to_proto_orderbooks,
    )
    from tests.parser_util import fixtures_df, load_fixtures

    rows = load_fixtures("binance", "l2_event")
    parsed = binance.parse_l2(fixtures_df(spark, rows))
    back = from_proto_orderbooks(to_proto_orderbooks(parsed))
    a = {r["symbol"]: r for r in parsed.collect()}
    b = {r["symbol"]: r for r in back.collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for sym, r in a.items():
        got = b[sym]
        assert got["timestamp"] == r["timestamp"]
        assert got["snapshot"] == r["snapshot"]
        assert got["seq_id"] is None and got["prev_seq_id"] is None
        for side in ("asks", "bids"):
            want_side, got_side = r[side], got[side]
            assert len(want_side) == len(got_side)
            for w, g in zip(want_side, got_side):
                for k in ("price", "quantity_base", "quantity_quote"):
                    assert abs(g[k] - w[k]) <= abs(w[k]) * 1e-6
                wc, gc = w["quantity_contract"], g["quantity_contract"]
                if wc is None:
                    # f32 wire: absent optional decodes as None
                    assert gc is None
                else:
                    assert abs(gc - wc) <= abs(wc) * 1e-6


def test_write_proto_orderbooks_partition_layout(spark, tmp_path):
    from crypto_msg_parser_spark.parser import binance
    from crypto_msg_parser_spark.proto_sink import write_proto_orderbooks
    from tests.parser_util import fixtures_df, load_fixtures

    rows = load_fixtures("binance", "l2_event")
    parsed = binance.parse_l2(fixtures_df(spark, rows))
    path = str(tmp_path / "proto_books")
    write_proto_orderbooks(parsed, path)
    got = spark.read.parquet(path)
    assert got.count() == parsed.count()
    assert set(got.columns) >= {"exchange", "market_type", "msg_type", "payload"}
