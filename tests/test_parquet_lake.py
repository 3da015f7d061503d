"""Parquet-lake archival sink: partition layout, event-time day
derivation, and — the scale contract — partition pruning + parquet
predicate pushdown on read-back, asserted against the physical plan."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from crypto_msg_parser_spark.sinks import (
    LAKE_PARTITIONS,
    read_parquet_lake,
    write_parquet_lake,
)

DAY_MS = 86_400_000


def _trades(spark):
    rows = []
    for i, ex in enumerate(("binance", "okx", "kraken")):
        for d in (0, 1):
            for j in range(5):
                rows.append(
                    (
                        ex,
                        "spot",
                        "trade",
                        "BTC/USDT",
                        "BTCUSDT",
                        1_700_000_000_000 + d * DAY_MS + j,
                        "buy" if j % 2 == 0 else "sell",
                        100.0 + i + j,
                        1.5,
                        "t-%d-%d-%d" % (i, d, j),
                    )
                )
    return spark.createDataFrame(
        rows,
        "exchange string, market_type string, msg_type string, "
        "pair string, symbol string, timestamp long, side string, "
        "price double, quantity_base double, trade_id string",
    )


def test_lake_roundtrip_layout_and_pruning(spark, tmp_path):
    path = str(tmp_path / "lake")
    df = _trades(spark)
    write_parquet_lake(df, path, mode="overwrite")

    # physical layout: identity dirs then event-time day dirs
    assert os.path.isdir(
        os.path.join(
            path, "exchange=binance", "market_type=spot", "msg_type=trade"
        )
    )
    days = os.listdir(
        os.path.join(
            path, "exchange=binance", "market_type=spot", "msg_type=trade"
        )
    )
    assert sorted(d for d in days if d.startswith("dt=")) == [
        "dt=2023-11-14",
        "dt=2023-11-15",
    ]

    back = read_parquet_lake(spark, path)
    assert back.count() == df.count()
    assert set(LAKE_PARTITIONS) <= set(back.columns)

    # the scale contract: a slice query prunes directories AND pushes the
    # data-column predicate into the parquet scan
    sliced = back.filter(
        (F.col("exchange") == "binance")
        & (F.col("dt") == "2023-11-14")
        & (F.col("price") > 100.5)
    )
    plan = sliced._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "exchange" in pf and "dt" in pf, pf
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "GreaterThan(price,100.5)" in pushed, pushed
    got = sliced.select("trade_id", "price").collect()
    assert len(got) == 4 and all(r["price"] > 100.5 for r in got)

    # event-time partitioning: a backfilled late row lands in ITS day
    late = _trades(spark).filter(
        (F.col("exchange") == "okx") & (F.col("timestamp") % DAY_MS < 3)
    ).withColumn("timestamp", F.col("timestamp") - 2 * DAY_MS)
    write_parquet_lake(late, path, mode="append")
    again = read_parquet_lake(spark, path)
    assert again.filter(F.col("dt") == "2023-11-12").count() == late.count()
    # and the original partitions were not rewritten by the append
    assert again.count() == df.count() + late.count()
