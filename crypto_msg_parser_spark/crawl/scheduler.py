"""Deterministic per-host politeness scheduler (north_rule; SURVEY §7.3).

Spec (engine-defined, since the reference's sibling crawler is not vendored;
this file is the normative definition and crawl/oracle_sim.py is its
single-threaded executable oracle):

  - work unit: one canonicalized URL with (host, priority, budget)
  - per-host service order: (priority ASC, url_hash ASC, url ASC) — total,
    deterministic, independent of arrival order and parallelism
  - politeness: host h may be visited at most budget(h) times per epoch
    (epoch = one rate window, e.g. a minute)
  - epoch assignment: the r-th URL of a host (1-based) runs in epoch
    (r-1) // budget(h)
  - global visit sequence: sort by (epoch ASC, host ASC, in_host_rank ASC)

Determinism under parallelism comes from scheduling by *logical epoch*, not
wall clock: any cluster size produces the identical (epoch, host, rank)
triple per URL, hence the identical visit sequence. In Spark the whole
schedule is two window functions over a shuffle on host — no driver loop,
no collect; at 10^10 URLs the shuffle key (host) is salted for storage but
ranks are computed per real host (skew handled by AQE; binance/okx dominate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from crypto_msg_parser_spark.crawl.canonicalize import canonical_url
from crypto_msg_parser_spark.functions.scalar import stable_hash64


def schedule(frontier: DataFrame) -> DataFrame:
    """frontier(url, host, priority, rate_budget_per_min, ...) ->
    + (canonical, url_hash, in_host_rank, epoch).

    The returned (epoch, host, in_host_rank) is the total visit order."""
    w = W.partitionBy("host").orderBy("priority", "url_hash", "canonical")
    return (
        frontier.withColumn("canonical", canonical_url(F.col("url")))
        .withColumn("url_hash", stable_hash64(F.col("canonical")))
        .withColumn("in_host_rank", F.row_number().over(w))
        .withColumn(
            "epoch",
            F.floor((F.col("in_host_rank") - 1) / F.col("rate_budget_per_min")).cast(
                "long"
            ),
        )
    )


def visit_sequence(frontier: DataFrame) -> DataFrame:
    """Globally ordered visit sequence (collect-free; ordering is encoded in
    the sort key, materialized only when written)."""
    return schedule(frontier).orderBy("epoch", "host", "in_host_rank")
