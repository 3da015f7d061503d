"""Robots cache: per-host robots.txt rules as an engine dimension table.

SURVEY §2.9 crawl-state list: URL-seen set, politeness queue, robots cache.
The reference's polite client fetches with a fixed UA (crypto-msg-parser/
src/exchanges/utils.rs:8-24); the crawl layer this engine adds must honor
each host's robots.txt before scheduling.

Spark-first shape:
  - PARSE is a pure-Catalyst fold: ``F.aggregate`` over the body's lines
    with a struct accumulator runs the User-agent section state machine
    (track whether we are inside a ``User-agent: *`` group; collect its
    Disallow prefixes and Crawl-delay) entirely inside whole-stage codegen
    — no Python, no UDF.
  - The rules table (host, disallow[], crawl_delay) is tiny per row; at
    exchange scale (hundreds of hosts) it broadcasts, at web scale
    (millions of hosts) the same join shuffles on host — both plans fall
    out of the one declarative join below.
  - APPLY = left join on host + EXISTS over the prefix array against the
    URL path; crawl_delay clamps the per-host politeness budget before
    scheduling (min(rate_budget, 60/delay)).
  - CACHE refresh = latest-fetched_at-per-host upsert with a TTL filter —
    a groupBy(max) the same shape as the seen-set checkpoint tables.

Subset honestly implemented: ``User-agent: *`` groups only (the crawler
presents one UA and exchange robots files in practice only carry the star
group); specific-UA precedence would add a second fold pass with the same
accumulator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROBOTS_FETCH_SCHEMA = "host string, fetched_at long, body string"

_ACC = (
    "struct<in_star:boolean, disallow:array<string>, crawl_delay:double>"
)


def _fold_line(acc: Column, line: Column) -> Column:
    """One robots.txt line through the section state machine."""
    l = F.lower(F.trim(line))
    agent = F.trim(F.substring_index(l, ":", -1))
    is_ua = l.startswith("user-agent:")
    is_dis = l.startswith("disallow:")
    is_delay = l.startswith("crawl-delay:")
    value = F.trim(F.substring_index(F.trim(line), ":", -1))
    return (
        F.when(
            is_ua,
            F.struct(
                (agent == "*").alias("in_star"),
                acc["disallow"].alias("disallow"),
                acc["crawl_delay"].alias("crawl_delay"),
            ),
        )
        .when(
            is_dis & acc["in_star"] & (value != ""),
            F.struct(
                acc["in_star"].alias("in_star"),
                F.array_append(acc["disallow"], value).alias("disallow"),
                acc["crawl_delay"].alias("crawl_delay"),
            ),
        )
        .when(
            is_delay & acc["in_star"],
            F.struct(
                acc["in_star"].alias("in_star"),
                acc["disallow"].alias("disallow"),
                value.cast("double").alias("crawl_delay"),
            ),
        )
        .otherwise(acc)
    )


def parse_robots(fetched: DataFrame) -> DataFrame:
    """(host, fetched_at, body) -> (host, fetched_at, disallow[],
    crawl_delay) — the ``User-agent: *`` group's rules, parsed by a
    codegen'd line fold (no Python)."""
    init = F.expr(
        "named_struct('in_star', false, 'disallow', array(), "
        "'crawl_delay', cast(null as double))"
    ).cast(_ACC)
    folded = F.aggregate(
        F.split(F.coalesce(F.col("body"), F.lit("")), "\n"), init, _fold_line
    )
    return fetched.select(
        "host",
        "fetched_at",
        folded["disallow"].alias("disallow"),
        folded["crawl_delay"].alias("crawl_delay"),
    )


def robots_cache_refresh(
    cached: DataFrame, fresh: DataFrame, ttl_ms: int, now_ms: int
) -> DataFrame:
    """Upsert newest rules per host, dropping entries older than the TTL.
    One shuffle on host — the same key the politeness scheduler groups on,
    so the exchange reuses downstream."""
    return (
        cached.unionByName(fresh)
        .filter(F.col("fetched_at") >= now_ms - ttl_ms)
        .groupBy("host")
        .agg(
            F.max_by(F.struct("fetched_at", "disallow", "crawl_delay"), "fetched_at").alias("r")
        )
        .select("host", "r.fetched_at", "r.disallow", "r.crawl_delay")
    )


def _url_path(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))


def apply_robots(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """Drop frontier URLs a host's robots disallow, and clamp the per-host
    politeness budget by Crawl-delay (min(rate_budget_per_min, 60/delay)).
    Hosts without rules are unrestricted (fail-open matches the reference's
    fetch-anyway client; flip the coalesce for fail-closed)."""
    r = rules.select(
        F.col("host").alias("r_host"),
        F.col("disallow").alias("r_disallow"),
        F.col("crawl_delay").alias("r_delay"),
    )
    joined = frontier.join(
        F.broadcast(r), frontier["host"] == F.col("r_host"), "left"
    ).drop("r_host")
    path = _url_path(F.col("canonical") if "canonical" in frontier.columns else F.col("url"))
    blocked = F.exists(
        F.coalesce(F.col("r_disallow"), F.array()),
        lambda p: path.startswith(p),
    )
    clamped = F.when(
        F.col("r_delay").isNotNull() & (F.col("r_delay") > 0),
        F.least(
            F.col("rate_budget_per_min"),
            F.greatest(
                F.floor(F.lit(60.0) / F.col("r_delay")).cast("int"), F.lit(1)
            ),
        ),
    ).otherwise(F.col("rate_budget_per_min"))
    return (
        joined.filter(~blocked)
        .withColumn("rate_budget_per_min", clamped)
        .drop("r_disallow", "r_delay")
    )
