"""Streaming/batch parity + keyed state + streaming parse."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from crypto_msg_parser_spark.parser import binance
from crypto_msg_parser_spark.streaming.jobs import (
    run_available_now,
    stream_events,
    tumbling_counts,
    user_totals_stateful,
)
from tests.conftest import SF_SMOKE
from tests.parser_util import fixtures_df, load_fixtures


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # stream source dir containing just the events parquet
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "events.parquet")
    return str(d)


def test_tumbling_counts_stream_equals_batch(spark, events_dir):
    stream = tumbling_counts(stream_events(spark, events_dir))
    got = run_available_now(stream, "t_counts")
    batch = (
        spark.read.parquet(f"{events_dir}/events.parquet")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_stateful_user_totals(spark, events_dir):
    ev = stream_events(spark, events_dir)
    q = (
        user_totals_stateful(ev)
        .writeStream.format("memory")
        .queryName("u_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per user == batch aggregate
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql("SELECT * FROM u_totals").collect()
    }
    batch = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in spark.read.parquet(f"{events_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == batch


def test_streaming_parse_trade(spark, tmp_path):
    """The stateless parse pipeline runs unchanged under readStream."""
    rows = load_fixtures("binance", "trade")
    rows = [r for r in rows if r["market_type"] != "european_option"]
    raw = fixtures_df(spark, rows)
    src = str(tmp_path / "raw_msgs")
    raw.write.parquet(src)
    stream = spark.readStream.schema(raw.schema).parquet(src)
    parsed = binance.parse_trade(stream)
    q = (
        parsed.writeStream.format("memory")
        .queryName("s_trades")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM s_trades").collect()
    want = binance.parse_trade(raw).collect()
    assert sorted(r["trade_id"] for r in got) == sorted(r["trade_id"] for r in want)
    assert len(got) == len(rows)
