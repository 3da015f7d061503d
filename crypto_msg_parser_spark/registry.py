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
        _REGISTRY[name] = Query(name=name, spark_fn=wrapped, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
