"""Protobuf sink/source (crypto-message/src/lib.rs:283-331, proto schema
crypto-message/src/proto/message.proto).

The container has no protobuf runtime, so the proto3 WIRE FORMAT is
implemented directly — for this schema that is three primitives: varints,
fixed32 floats, and length-delimited submessages. Encoding follows proto3
emission rules exactly (scalar fields with default values are omitted;
`optional` fields are presence-tracked and emitted whenever set), so the
bytes are what protobuf's own serializer produces — asserted against
hand-computed golden bytes in tests/test_proto_sink.py.

Spark shape: Arrow-batched pandas UDFs (binary in/out). Encoding is a
per-row byte-assembly loop inside each Arrow batch — the classic
"Python is unavoidable, so batch it" sink stage; everything upstream
stays in codegen'd Column land.

Field mapping (Trade): 1 Timestamp{1:seconds varint, 2:nanos varint},
2 side bool (true = sell/taker-is-seller), 3 price float, 4 quantity_base,
5 quantity_quote, 6 quantity_contract (optional). Orderbook: 1 Timestamp,
2 snapshot bool, 3 repeated asks{1:price,2:qb,3:qq,4:qc?}, 4 repeated bids.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f32(field: int, value, always: bool = False) -> bytes:
    if value is None:
        return b""
    v = struct.unpack("<f", struct.pack("<f", float(value)))[0]
    if v == 0.0 and not always:
        return b""  # proto3 omits default-valued scalars
    return _tag(field, 5) + struct.pack("<f", float(value))


def _timestamp_field(field: int, ts_ms: int) -> bytes:
    seconds, nanos = ts_ms // 1000, (ts_ms % 1000) * 1_000_000
    sub = b""
    if seconds:
        sub += _tag(1, 0) + _varint(seconds)
    if nanos:
        sub += _tag(2, 0) + _varint(nanos)
    return _tag(field, 2) + _varint(len(sub)) + sub


def encode_trade(ts_ms: int, side: str, price, qb, qq, qc) -> bytes:
    out = _timestamp_field(1, int(ts_ms))
    if side == "sell":  # side bool: True = seller is taker (lib.rs:291)
        out += _tag(2, 0) + b"\x01"
    out += _f32(3, price)
    out += _f32(4, qb)
    out += _f32(5, qq)
    out += _f32(6, qc, always=True)  # optional: emitted whenever present
    return out


def _encode_order(price, qb, qq, qc) -> bytes:
    sub = _f32(1, price) + _f32(2, qb) + _f32(3, qq) + _f32(4, qc, always=True)
    return sub


def encode_orderbook(ts_ms: int, snapshot: bool, asks, bids) -> bytes:
    out = _timestamp_field(1, int(ts_ms))
    if snapshot:
        out += _tag(2, 0) + b"\x01"
    # NB: `side` may be a numpy array when called from an Arrow batch
    # (truthiness of a len>1 ndarray raises), so test None explicitly.
    for field, side in ((3, asks), (4, bids)):
        if side is None:
            continue
        for o in side:
            sub = _encode_order(
                o["price"], o["quantity_base"], o["quantity_quote"],
                o["quantity_contract"],
            )
            out += _tag(field, 2) + _varint(len(sub)) + sub
    return out


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _decode_fields(buf: bytes):
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 5:
            v = struct.unpack("<f", buf[i : i + 4])[0]
            i += 4
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        else:  # pragma: no cover — schema uses only wires 0/2/5
            raise ValueError(f"unsupported wire type {wire}")
        yield field, v


def decode_trade(buf: bytes) -> dict:
    out = {
        "timestamp": 0, "side": "buy", "price": 0.0,
        "quantity_base": 0.0, "quantity_quote": 0.0, "quantity_contract": None,
    }
    for field, v in _decode_fields(buf):
        if field == 1:
            ts = dict(_decode_fields(v))
            out["timestamp"] = ts.get(1, 0) * 1000 + ts.get(2, 0) // 1_000_000
        elif field == 2:
            out["side"] = "sell" if v else "buy"
        elif field == 3:
            out["price"] = v
        elif field == 4:
            out["quantity_base"] = v
        elif field == 5:
            out["quantity_quote"] = v
        elif field == 6:
            out["quantity_contract"] = v
    return out


def _decode_order(buf: bytes) -> dict:
    out = {
        "price": 0.0, "quantity_base": 0.0, "quantity_quote": 0.0,
        "quantity_contract": None,
    }
    names = {1: "price", 2: "quantity_base", 3: "quantity_quote", 4: "quantity_contract"}
    for field, v in _decode_fields(buf):
        if field in names:
            out[names[field]] = v
    return out


def decode_orderbook(buf: bytes) -> dict:
    out = {"timestamp": 0, "snapshot": False, "asks": [], "bids": []}
    for field, v in _decode_fields(buf):
        if field == 1:
            ts = dict(_decode_fields(v))
            out["timestamp"] = ts.get(1, 0) * 1000 + ts.get(2, 0) // 1_000_000
        elif field == 2:
            out["snapshot"] = bool(v)
        elif field == 3:
            out["asks"].append(_decode_order(v))
        elif field == 4:
            out["bids"].append(_decode_order(v))
    return out


# ------------------------------------------------------------- DataFrame API

PROTO_TRADE_DDL = (
    "exchange string, market_type string, msg_type string, pair string, "
    "symbol string, payload binary"
)


def to_proto_trades(df: DataFrame) -> DataFrame:
    """TradeMsg rows -> proto3 payloads. Identity columns ride alongside
    the payload (the proto message itself carries none — from_proto takes
    them as arguments in the reference, lib.rs:301-307)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = [
                encode_trade(t, s, p, qb, qq, qc)
                for t, s, p, qb, qq, qc in zip(
                    pdf["timestamp"], pdf["side"], pdf["price"],
                    pdf["quantity_base"], pdf["quantity_quote"],
                    pdf["quantity_contract"],
                )
            ]
            out = pdf[
                ["exchange", "market_type", "msg_type", "pair", "symbol"]
            ].copy()
            out["payload"] = payload
            yield out

    return df.mapInPandas(run, PROTO_TRADE_DDL)


FROM_PROTO_TRADE_DDL = (
    "exchange string, market_type string, msg_type string, pair string, "
    "symbol string, timestamp long, side string, price double, "
    "quantity_base double, quantity_quote double, quantity_contract double"
)


def from_proto_trades(df: DataFrame) -> DataFrame:
    """proto3 payloads -> TradeMsg rows (float32 precision, empty
    trade_id/json — exactly the reference's from_proto, lib.rs:301-331)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_trade(b) for b in pdf["payload"]]
            out = pdf[
                ["exchange", "market_type", "msg_type", "pair", "symbol"]
            ].copy()
            for k in ("timestamp", "side", "price", "quantity_base",
                      "quantity_quote", "quantity_contract"):
                out[k] = [r[k] for r in rows]
            yield out

    return df.mapInPandas(run, FROM_PROTO_TRADE_DDL)


def write_proto_trades(df: DataFrame, path: str) -> None:
    """Materialize as parquet with identity partition pruning — same
    layout rule as the TSV sink (identity in the path, payload in the
    file)."""
    to_proto_trades(df).write.partitionBy(
        "exchange", "market_type", "msg_type"
    ).mode("overwrite").parquet(path)


PROTO_ORDERBOOK_DDL = PROTO_TRADE_DDL


def to_proto_orderbooks(df: DataFrame) -> DataFrame:
    """OrderBookMsg rows -> proto3 payloads (the reference's
    OrderBookMsg::to_proto, crypto-message/src/lib.rs:385-420). Identity
    columns ride alongside the payload; the proto message carries only
    timestamp/snapshot/asks/bids — seq_id and prev_seq_id are NOT part of
    the wire schema, matching from_proto's None on the way back."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = [
                encode_orderbook(t, bool(snap), asks, bids)
                for t, snap, asks, bids in zip(
                    pdf["timestamp"], pdf["snapshot"], pdf["asks"],
                    pdf["bids"],
                )
            ]
            out = pdf[
                ["exchange", "market_type", "msg_type", "pair", "symbol"]
            ].copy()
            out["payload"] = payload
            yield out

    return df.mapInPandas(run, PROTO_ORDERBOOK_DDL)


_ORDER_DDL = (
    "array<struct<price:double, quantity_base:double, "
    "quantity_quote:double, quantity_contract:double>>"
)

FROM_PROTO_ORDERBOOK_DDL = (
    "exchange string, market_type string, msg_type string, pair string, "
    "symbol string, timestamp long, snapshot boolean, "
    f"asks {_ORDER_DDL}, bids {_ORDER_DDL}, "
    "seq_id long, prev_seq_id long"
)


def from_proto_orderbooks(df: DataFrame) -> DataFrame:
    """proto3 payloads -> OrderBookMsg rows (float32 precision; seq_id /
    prev_seq_id null and json empty — exactly the reference's
    OrderBookMsg::from_proto, crypto-message/src/lib.rs:422-469)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_orderbook(b) for b in pdf["payload"]]
            out = pdf[
                ["exchange", "market_type", "msg_type", "pair", "symbol"]
            ].copy()
            out["timestamp"] = [r["timestamp"] for r in rows]
            out["snapshot"] = [r["snapshot"] for r in rows]
            out["asks"] = [r["asks"] for r in rows]
            out["bids"] = [r["bids"] for r in rows]
            out["seq_id"] = None
            out["prev_seq_id"] = None
            yield out

    return df.mapInPandas(run, FROM_PROTO_ORDERBOOK_DDL)


def write_proto_orderbooks(df: DataFrame, path: str) -> None:
    """Orderbook twin of write_proto_trades — identity in the partition
    path, proto payload in the file."""
    to_proto_orderbooks(df).write.partitionBy(
        "exchange", "market_type", "msg_type"
    ).mode("overwrite").parquet(path)
