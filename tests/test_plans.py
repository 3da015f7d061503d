"""Replay every registry query against its DuckDB oracle at sf0.001 —
the local twin of the driver's CORRECTNESS gate (at sf0.01 use
SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01)."""

from __future__ import annotations

import os

import pytest

from crypto_msg_parser_spark.registry import all_queries
from tests.oracle_util import compare, duckdb_conn

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

QUERIES = all_queries()


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, con):
    q = QUERIES[name]
    df = q.spark_fn(spark, SF)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    compare(df, con, q.oracle, name)
