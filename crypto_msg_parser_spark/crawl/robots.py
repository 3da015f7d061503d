"""Robots cache: per-host robots.txt rules as an engine dimension table.

SURVEY §2.9 crawl-state list: URL-seen set, politeness queue, robots cache.
The reference's polite client fetches with a fixed UA (crypto-msg-parser/
src/exchanges/utils.rs:8-24); the crawl layer this engine adds must honor
each host's robots.txt before scheduling.

Rule semantics follow RFC 9309 (Robots Exclusion Protocol, public spec):

  - both ``Allow:`` and ``Disallow:`` rules of the matched group;
  - ``*`` in a rule matches any character run, ``$`` anchors the rule at
    the end of the path;
  - precedence is MOST-SPECIFIC WINS: among the rules matching a path,
    the longest rule (octet length of the pattern) decides; on a
    length tie Allow beats Disallow;
  - no matching rule -> allowed; no robots.txt -> unrestricted
    (fail-open matches the reference's fetch-anyway client);
  - ``#`` starts a comment; blank Disallow lines are ignored.

Spark-first shape:
  - PARSE is a pure-Catalyst fold: ``F.aggregate`` over the body's lines
    with a struct accumulator runs the User-agent section state machine
    (track whether we are inside a ``User-agent: *`` group; collect its
    Allow/Disallow rules and Crawl-delay) entirely inside whole-stage
    codegen — no Python, no UDF.
  - MATCHING is also pure Catalyst: the wildcard pattern is evaluated by
    a greedy segment scan (split on ``*`` + an ``aggregate`` fold of
    ``locate`` calls), NOT by per-row regex compilation — the standard
    greedy algorithm for glob-subset matching, O(len(path)) per rule.
  - The rules table (host, rules[], crawl_delay) is tiny per row; at
    exchange scale (hundreds of hosts) it broadcasts, at web scale
    (millions of hosts) the same join shuffles on host — both plans fall
    out of the one declarative join below.
  - APPLY = left join on host + longest-match verdict over the rules
    array against the URL path; crawl_delay clamps the per-host
    politeness budget before scheduling (min(rate_budget, 60/delay)).
  - CACHE refresh = latest-fetched_at-per-host upsert with a TTL filter —
    a groupBy(max) the same shape as the seen-set checkpoint tables.

Subset honestly implemented: ``User-agent: *`` groups only (the crawler
presents one UA and exchange robots files in practice only carry the star
group); specific-UA precedence would add a second fold pass with the same
accumulator. Rules match the URL PATH (query excluded) — the common
crawler simplification; extending to path+query is the same expressions
over ``parse_url(url, 'QUERY')`` concatenated on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROBOTS_FETCH_SCHEMA = "host string, fetched_at long, body string"

_RULE = "struct<allow:boolean, pattern:string>"
_ACC = (
    f"struct<in_star:boolean, saw_rule:boolean, "
    f"rules:array<{_RULE}>, crawl_delay:double>"
)


def _fold_line(acc: Column, line: Column) -> Column:
    """One robots.txt line through the section state machine.

    RFC 9309 §2.1 merges ADJACENT ``User-agent`` lines into one group:
    in ``User-agent: *\\nUser-agent: googlebot\\nDisallow: /x`` the
    Disallow applies to BOTH agents. The accumulator therefore carries a
    ``saw_rule`` flag: a UA line after a rule line starts a fresh group
    (in_star resets to this agent), while a UA line immediately following
    another UA line only WIDENS the current group's membership
    (in_star OR= this-agent-is-star). Rule lines (allow/disallow/
    crawl-delay) set saw_rule regardless of group so a later ``UA: *``
    after a specific-UA group starts clean.
    """
    # comments run from '#' to end of line (RFC 9309 §2.2.4)
    raw = F.substring_index(line, "#", 1)
    l = F.lower(F.trim(raw))
    agent = F.trim(F.substring_index(l, ":", -1))
    is_ua = l.startswith("user-agent:")
    is_dis = l.startswith("disallow:")
    is_allow = l.startswith("allow:")
    is_delay = l.startswith("crawl-delay:")
    is_rule = is_dis | is_allow | is_delay
    # value keeps original case (paths are case-sensitive); everything
    # after the FIRST ':' so patterns containing ':' survive
    value = F.trim(F.regexp_extract(F.trim(raw), "^[^:]*:(.*)$", 1))

    def _acc(in_star: Column, saw_rule: Column, rules: Column,
             crawl_delay: Column) -> Column:
        return F.struct(
            in_star.alias("in_star"),
            saw_rule.alias("saw_rule"),
            rules.alias("rules"),
            crawl_delay.alias("crawl_delay"),
        )

    def _with_rule(allow: bool) -> Column:
        rule = F.struct(
            F.lit(allow).alias("allow"), value.alias("pattern")
        )
        return _acc(
            acc["in_star"],
            F.lit(True),
            F.array_append(acc["rules"], rule),
            acc["crawl_delay"],
        )

    ua_starts_group = acc["saw_rule"]  # previous group ended by a rule line
    return (
        F.when(
            is_ua,
            _acc(
                F.when(ua_starts_group, agent == "*").otherwise(
                    acc["in_star"] | (agent == "*")
                ),
                F.lit(False),
                acc["rules"],
                acc["crawl_delay"],
            ),
        )
        .when(is_dis & acc["in_star"] & (value != ""), _with_rule(False))
        .when(is_allow & acc["in_star"] & (value != ""), _with_rule(True))
        .when(
            is_delay & acc["in_star"],
            _acc(
                acc["in_star"],
                F.lit(True),
                acc["rules"],
                value.cast("double"),
            ),
        )
        # rule line outside the star group (or empty-value rule): it still
        # TERMINATES UA-line accumulation for the current group
        .when(is_rule, _acc(acc["in_star"], F.lit(True), acc["rules"],
                            acc["crawl_delay"]))
        .otherwise(acc)
    )


def parse_robots(fetched: DataFrame) -> DataFrame:
    """(host, fetched_at, body) -> (host, fetched_at, rules[], disallow[],
    crawl_delay) — the ``User-agent: *`` group's rules, parsed by a
    codegen'd line fold (no Python). ``disallow`` is the plain-prefix
    projection kept for consumers that only need the deny list."""
    # saw_rule starts TRUE so the file's first UA line starts a fresh group
    init = F.expr(
        "named_struct('in_star', false, 'saw_rule', true, 'rules', "
        f"cast(array() as array<{_RULE}>), "
        "'crawl_delay', cast(null as double))"
    ).cast(_ACC)
    folded = F.aggregate(
        F.split(F.coalesce(F.col("body"), F.lit("")), "\n"), init, _fold_line
    )
    return fetched.select(
        "host",
        "fetched_at",
        folded["rules"].alias("rules"),
        F.transform(
            F.filter(folded["rules"], lambda r: ~r["allow"]),
            lambda r: r["pattern"],
        ).alias("disallow"),
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
            F.max_by(
                F.struct("fetched_at", "rules", "disallow", "crawl_delay"),
                "fetched_at",
            ).alias("r")
        )
        .select(
            "host", "r.fetched_at", "r.rules", "r.disallow", "r.crawl_delay"
        )
    )


def _url_path(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))


def _wild_match(path: Column, pat: Column) -> Column:
    """RFC 9309 rule match as pure column expressions: ``*`` = any run,
    trailing ``$`` = end anchor, otherwise prefix-anchored. Greedy
    left-to-right segment placement (split on ``*``; each literal segment
    is located at the earliest position after the previous one) — the
    classical glob-match algorithm, correct because placing a segment as
    early as possible never forecloses a later match."""
    end = pat.endswith("$")
    core = F.when(end, F.substr(pat, F.lit(1), F.length(pat) - 1)).otherwise(
        pat
    )
    segs = F.split(core, "\\*", -1)
    n = F.size(segs)
    s0 = F.element_at(segs, 1)
    last = F.element_at(segs, -1)
    # acc = 0-based offset where the next segment may start; -1 = dead
    acc0 = F.when(
        path.startswith(s0), F.length(s0).cast("int")
    ).otherwise(F.lit(-1).cast("int"))
    mids = F.slice(segs, 2, F.greatest(n - 2, F.lit(0)))

    def _step(acc: Column, s: Column) -> Column:
        found = F.call_function("locate", s, path, acc + 1)
        return (
            F.when(acc < 0, acc)
            .when(F.length(s) == 0, acc)
            .when(found == 0, F.lit(-1).cast("int"))
            .otherwise((found + F.length(s) - 1).cast("int"))
        )

    folded = F.aggregate(mids, acc0, _step)
    # single-segment pattern: pure prefix (or exact match with '$')
    single = (path.startswith(s0)) & (
        ~end | (F.length(path) == F.length(s0))
    )
    with_end = (
        (folded >= 0)
        & path.endswith(last)
        & (F.length(path) - F.length(last) >= folded)
    )
    without_end = F.when(F.length(last) == 0, folded >= 0).otherwise(
        F.call_function("locate", last, path, folded + 1) > 0
    )
    return F.when(n == 1, single).otherwise(
        F.when(end, with_end).otherwise((folded >= 0) & without_end)
    )


def robots_verdict(path: Column, rules: Column) -> Column:
    """True iff ``path`` is allowed under ``rules`` (array of
    (allow, pattern)). Longest matching pattern decides; ties go to
    Allow; no match (or no rules) -> allowed."""
    matching = F.filter(rules, lambda r: _wild_match(path, r["pattern"]))
    # lexicographic struct max: longest pattern first, Allow on ties
    best = F.array_max(
        F.transform(
            matching,
            lambda r: F.struct(
                F.length(r["pattern"]).alias("l"),
                r["allow"].cast("int").alias("a"),
            ),
        )
    )
    return best.isNull() | (best["a"] == 1)


def apply_robots(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """Drop frontier URLs the host's robots rules disallow (longest-match
    Allow/Disallow verdict), and clamp the per-host politeness budget by
    Crawl-delay (min(rate_budget_per_min, 60/delay)). Hosts without rules
    are unrestricted (fail-open matches the reference's fetch-anyway
    client; flip the coalesce for fail-closed).

    No broadcast hint on the rules side: at exchange scale (hundreds of
    hosts) AQE broadcasts it automatically; at web scale (millions of
    hosts, rule arrays attached) the rules table is NOT driver-bounded and
    the join must be free to shuffle on host — the same key the politeness
    scheduler partitions on, so the exchange is reused downstream."""
    r = rules.select(
        F.col("host").alias("r_host"),
        F.col("rules").alias("r_rules"),
        F.col("crawl_delay").alias("r_delay"),
    )
    joined = frontier.join(
        r, frontier["host"] == F.col("r_host"), "left"
    ).drop("r_host")
    path = _url_path(
        F.col("canonical") if "canonical" in frontier.columns else F.col("url")
    )
    allowed = robots_verdict(
        path, F.coalesce(F.col("r_rules"), F.expr(f"cast(array() as array<{_RULE}>)"))
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
        joined.filter(allowed)
        .withColumn("rate_budget_per_min", clamped)
        .drop("r_rules", "r_delay")
    )
