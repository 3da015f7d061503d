"""One benchmark process: frontier + parse throughput at a given core count.

Invoked by tools/bench_scaling.py once per parallelism level (separate
processes — a JVM's master can't change); prints one JSON line.

Workload construction notes (scaling-correctness of the bench itself):
  - inputs are generated with spark.range(n, numPartitions=cores*4) so task
    parallelism scales with the core count (a crossJoin against a tiny
    dimension would collapse to its partition count instead);
  - results are drained with a noop datasource write, which materializes
    every output column — a count() would let Catalyst prune the from_json
    / window work away and time only the join keys.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crypto_msg_parser_spark.crawl.frontier import dedup_against_seen  # noqa: E402
from crypto_msg_parser_spark.crawl.scheduler import (  # noqa: E402
    bucketize,
    prepare_frontier,
    schedule,
)
from crypto_msg_parser_spark.parser import binance  # noqa: E402
from crypto_msg_parser_spark.session import get_spark  # noqa: E402

N_URLS = int(os.environ.get("BENCH_N_URLS", "2000000"))
N_MSGS = int(os.environ.get("BENCH_N_MSGS", "2000000"))


def frontier_df(spark, cores):
    k = F.col("id") % 10
    host = (
        F.when(k <= 5, "api.binance.com")
        .when(k <= 7, "www.okx.com")
        .when(k == 8, "api.huobi.pro")
        .otherwise("api.kraken.com")
    )
    return spark.range(N_URLS, numPartitions=cores * 4).select(
        F.format_string(
            "HTTPS://%s:443/api/symbols?id=%d&page=%d#f",
            host,
            F.col("id"),
            F.col("id") % 7,
        ).alias("url"),
        host.alias("host"),
        (F.col("id") % 3).cast("int").alias("priority"),
        F.lit(600).cast("int").alias("rate_budget_per_min"),
    )


def msgs_df(spark, cores):
    fixtures = pathlib.Path(
        os.environ.get(
            "BENCH_FIXTURES",
            str(
                pathlib.Path(__file__).resolve().parent.parent
                / "tests/fixtures/reference_fixtures.jsonl"
            ),
        )
    )
    rows = [json.loads(line) for line in fixtures.open()]
    trades = [
        (r["market_type"], r["raw"])
        for r in rows
        if r["exchange"] == "binance"
        and r["msg_type"] == "trade"
        and r["market_type"] not in (None, "european_option")
    ]
    mts = F.array(*[F.lit(mt) for mt, _ in trades])
    msgs = F.array(*[F.lit(m) for _, m in trades])
    idx = (F.col("id") % len(trades) + 1).cast("int")
    return spark.range(N_MSGS, numPartitions=cores * 4).select(
        F.element_at(mts, idx).alias("market_type"),
        F.element_at(msgs, idx).alias("msg"),
        F.lit(None).cast("long").alias("received_at"),
    )


N_TIMED_RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def _drain(df) -> float:
    """Steady-state timing: one warm drain (JIT/codegen compile), then the
    minimum of N_TIMED_RUNS measured drains. Minimum, not mean: this sandbox
    shares CPUs with noisy neighbors (identical cached jobs vary 1.2s-26s),
    and min-of-k is the standard least-interference throughput estimate."""
    df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(N_TIMED_RUNS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    cores = int(os.environ.get("BENCH_CORES", "8"))
    # AQE off for the BENCH only: its per-query stage re-planning costs a
    # fixed ~0.4s regardless of core count, which reads as false
    # inefficiency in an N-vs-4N comparison over a fixed, known-shape
    # input. Production sessions keep AQE on (skew-join handling).
    spark = get_spark(
        f"bench_scaling_{cores}",
        cores=cores,
        shuffle_partitions=cores * 2,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.range(1000000).select(F.sum("id")).collect()  # warm JVM

    # ---- frontier: canonicalize -> hash -> rank/epoch -> seen anti-join
    # raw URLs are materialized first (a real frontier reads from storage);
    # canonicalization is timed separately from schedule+dedup
    raw = frontier_df(spark, cores).persist()
    raw.count()
    t_canon = _drain(prepare_frontier(raw))
    # frontier state is materialized BUCKETED on rank_bucket (the Iceberg
    # bucket(N, url_hash) layout) — the scheduler window and the seen-set
    # anti-join both plan with zero exchanges on top of it
    prepared = bucketize(prepare_frontier(raw), cores * 4).persist()
    prepared.count()
    # the scheduler's product table: canonical supersedes the raw url, so
    # don't shuffle the raw form (half the bytes)
    sched = schedule(prepared).select(
        "rank_bucket", "canonical", "url_hash", "host", "priority",
        "in_host_rank", "epoch",
    )
    seen = prepared.filter(F.col("url_hash") % 3 == 0).select(
        "rank_bucket", "url_hash", "canonical"
    )
    t_sched = _drain(dedup_against_seen(sched, seen))
    frontier_s = t_canon + t_sched
    prepared.unpersist()
    raw.unpersist()

    # ---- parse: full binance trade pipeline over materialized raw messages
    m = msgs_df(spark, cores).persist()
    m.count()
    parse_s = _drain(binance.parse_trade(m))
    m.unpersist()

    print(
        json.dumps(
            {
                "cores": cores,
                "n_urls": N_URLS,
                "canonicalize_s": round(t_canon, 3),
                "schedule_dedup_s": round(t_sched, 3),
                "frontier_s": round(frontier_s, 3),
                "frontier_urls_per_s": round(N_URLS / frontier_s),
                "n_msgs": N_MSGS,
                "parse_s": round(parse_s, 3),
                "parse_msgs_per_s": round(N_MSGS / parse_s),
            }
        )
    )


if __name__ == "__main__":
    main()
