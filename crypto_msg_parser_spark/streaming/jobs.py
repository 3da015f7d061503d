"""Structured Streaming variants of the engine's operators (SURVEY §2.9).

The parse stage is stateless per-row, so the exact same column pipelines run
under readStream unchanged; windowed aggregations add watermarks; keyed
state uses applyInPandasWithState (the gate-swap-style per-symbol state of
SURVEY §2.9 — the one operator family Catalyst can't express).

Batch/stream parity is the test contract: every streaming job here has a
batch twin in the registry and tests assert equal results under
Trigger.availableNow.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (schema pinned — streaming
    sources never infer)."""
    return (
        spark.readStream.schema(EVENTS_DDL)
        .parquet(f"{sf_dir}")
    )


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Watermarked tumbling-window counts — the streaming twin of the
    registry's events_tumbling_window."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain a stream with Trigger.availableNow into a memory sink and
    return the materialized result."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def user_totals_stateful(events: DataFrame) -> DataFrame:
    """Keyed running totals via applyInPandasWithState — the
    per-key-state shape of the reference's gate_swap PRICE_HASHMAP
    (gate/gate_swap.rs:268-271): state persists across micro-batches."""

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get() if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": total}]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
