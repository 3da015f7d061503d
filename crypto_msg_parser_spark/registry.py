"""Central query registry.

Every operator the engine claims (SURVEY.md §2 plus the training-data
pipeline ops) registers here as a named query over the driver's testdata
tables, together with an equivalent DuckDB oracle SQL string. The driver's
__spark_entry__.py re-exports this registry; the local pytest suite replays
it against DuckDB at sf0.001 so oracle mismatches are caught before the
driver's own sf0.01 run.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQueryFn = Callable[[SparkSession, str], DataFrame]

# Runtime-settable SQL confs every query needs regardless of who built the
# SparkSession. The driver harness (and any embedding application) passes
# its OWN default-config session; without these, binance's case-significant
# payload keys (e/E, t/T) are ambiguous and timestamp semantics drift with
# the host timezone. Both are per-session SQL confs, safe to set at entry.
_REQUIRED_CONFS = {
    "spark.sql.caseSensitive": "true",
    "spark.sql.session.timeZone": "UTC",
    # deactivate whole-stage codegen for subtrees whose generated method
    # exceeds HotSpot's 8000-byte JIT limit (they would run interpreted,
    # ~10x slower — the 20-exchange routing ladder hits this); everything
    # JIT-able keeps codegen. Runtime-settable SQL conf, safe on a host
    # session.
    "spark.sql.codegen.hugeMethodLimit": "8000",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Make an arbitrary host SparkSession safe for the engine's queries."""
    for k, v in _REQUIRED_CONFS.items():
        spark.conf.set(k, v)


@dataclass
class Query:
    name: str
    spark_fn: SparkQueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Modules whose import registers queries (order = display order).
_QUERY_MODULES = [
    "crypto_msg_parser_spark.plans.relational",
    "crypto_msg_parser_spark.plans.scalarfn",
    "crypto_msg_parser_spark.operators.dedup",
    "crypto_msg_parser_spark.operators.textstats",
    "crypto_msg_parser_spark.operators.similarity",
    "crypto_msg_parser_spark.operators.multimodal",
    "crypto_msg_parser_spark.operators.interleaved",
    "crypto_msg_parser_spark.operators.corpus",
    "crypto_msg_parser_spark.operators.scrub",
    "crypto_msg_parser_spark.operators.asof",
    "crypto_msg_parser_spark.parser.queries",
    "crypto_msg_parser_spark.crawl.queries",
]


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: SparkQueryFn) -> SparkQueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn  # inspect.unwrap -> the real plan builder
        _REGISTRY[name] = Query(name=name, spark_fn=wrapped, oracle=oracle, doc=doc)
        return fn

    return deco


# Driver-sample priority. The driver's CORRECTNESS run caps at 50 queries,
# taken in dict order — so the queries most in need of a driver-green row
# this round must come first, independent of module import order.
#
# Round-4 rotation (VERDICT r03 "Next round #1"): every §2 family already
# holds a driver-green row (r03: 50/50), so this round's sample goes to the
# 35 queries that have NEVER had a driver row across r01-r03 (the wave-2
# analytics/scrub/crawl-discovery/media families), plus the flagship new
# this round, plus 5 canaries the verdict named (regression sentinels for
# the parse ladder, the two corpus flagships, and the stateful streaming
# replay), with the tail filled by the rows whose latest driver evidence
# is oldest (r01) or whose family was refactored.
_PRIORITY = [
    # ---- canaries (VERDICT r03 #1 names) ----
    "parse_binance_spot_trade",
    "route_mixed_exchanges",
    "corpus_prep_full",
    "web_corpus_prep_full",
    "frontier_seen_batch_replay",
    # ---- NEW this round: the market-data composed flagship ----
    "market_analytics_full",
    # ---- NEW this round: streaming checkpoint-RESTART row (the state
    # store must rehydrate across two availableNow query instances) ----
    "frontier_stream_resume",
    # ---- never driver-sampled (r01-r03): market analytics wave ----
    "l2_book_reconstruct",
    "l2_spread_stats",
    "candles_rollup_5m",
    "vwap_1m",
    "order_flow_imbalance_1m",
    "funding_accrual_8h",
    # ---- never sampled: scrub / corpus-quality wave ----
    "pii_scrub",
    "gopher_quality_filter",
    "dup_ngram_windows",
    "corpus_importance_resample",
    "corpus_audit_report",
    "corpus_domain_rebalance",
    # ---- never sampled: crawl-discovery wave ----
    "sitemap_extract",
    "robots_sitemap_discovery",
    "redirect_resolve",
    "recrawl_backoff",
    "pagerank_priority",
    "host_circuit_breaker",
    "url_canonicalize",
    # NEW this round: the composed crawl-scheduling flagship (stage
    # coupling: canonicalize -> seen anti-join -> robots gate -> rank
    # tiers -> clamped politeness epochs, one plan). frontier_seen_dedup
    # yields its slot — its anti-join is a verbatim stage of this plan
    # and of the frontier_seen_batch_replay canary above
    "crawl_schedule_full",
    # NEW this round: the crawl x interleaved link-discovery bridge
    # (anchor extract -> resolve -> canonicalize -> seen anti-join ->
    # host-graph edges). host_skew_stats yields — it carries r01/r02
    # driver evidence; this row has none
    "outlink_frontier_handoff",
    # ---- never sampled: dedup/similarity quality wave ----
    "semantic_dedup_drop",
    "minhash_estimate_quality",
    "word_rarity_score",
    "embedding_quantize_int8",
    "ann_recall_report",
    "length_percentiles_by_source",
    "length_percentiles_approx_by_source",
    # ---- never sampled: interleaved-spans / lake / media ----
    "spans_boilerplate_strip",
    "spans_token_truncate",
    "spans_caption_extract",
    "docs_lake_roundtrip",
    "media_resize",
    "media_feature_extract",
    "media_embedding_neardup",
    # NEW this round: multi-epoch BFS frontier expansion (the growth
    # loop: wave = links(prev wave) ANTI accumulated seen).
    # range_join_error_follow yields — it keeps r01 driver evidence and
    # oracle(local) coverage; this row has none
    "crawl_bfs_expansion",
    # NEW this round: hourly realized volatility (integer-exact
    # sum-of-squares on minute closes) — candles_recompute_1m yields its
    # slot (r01 evidence + oracle(local); rv exercises the same minute
    # close math downstream)
    "realized_volatility_1h",
    # NEW this round: streaming sequence-gap recovery (desync -> discard
    # -> snapshot re-seed -> healed book) — q1_pricing_summary yields its
    # slot: it keeps r02 driver evidence AND the driver's entry() smoke
    # exercises the same plan every round
    "stream_book_resync",
    # NEW this round: lake compaction planner (manifest-window bin pack)
    # — spans_interleave_roundtrip yields (r02 evidence + oracle(local);
    # the spans family keeps 4 other rows in the sample)
    "lake_compaction_plan",
    # NEW this round: streaming L2 book maintenance (keyed state across
    # interleaved micro-batches, LWW(seq) merge) — the live twin of
    # l2_book_reconstruct. tfidf_top_terms yields its slot: it keeps r02
    # driver evidence + oracle(local) coverage; this row has none
    "stream_book_reconstruct",
    # NEW this round: proto3 wire-format round trips (f32 closed-form
    # oracles, trade + repeated-field orderbook) — outrank two more r02
    # re-verifies (events_tumbling_window yields to stream_candles_1m,
    # the strictly stronger streaming-window row: real parse pipeline +
    # watermark-flush semantics; media_frame_sample yields, its family
    # keeps resize/features/neardup above)
    "proto_trade_roundtrip",
    "proto_orderbook_roundtrip",
    # NEW this round: streaming OHLCV candles through the real parse
    # plan — availableNow + append-mode flush checked against the
    # closed-form batch recompute
    "stream_candles_1m",
]


def all_queries() -> dict[str, Query]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    rank = {name: i for i, name in enumerate(_PRIORITY)}
    missing = set(rank) - set(_REGISTRY)
    if missing:
        raise ValueError(f"_PRIORITY names unknown queries: {sorted(missing)}")
    names = sorted(
        _REGISTRY,
        key=lambda n: (rank.get(n, len(rank)), list(_REGISTRY).index(n)),
    )
    return {n: _REGISTRY[n] for n in names}
