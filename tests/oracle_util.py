"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and values as an
order-insensitive multiset (exact for non-floats, tight tolerance for
floats so any real mismatch — not just summation-order noise — fails).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from crypto_msg_parser_spark.sources.testdata import TABLES

_REL_TOL = 1e-9
_ABS_TOL = 1e-9


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return float(v)
    if hasattr(v, "isoformat"):  # datetime/date; strip tz if any
        try:
            v = v.tz_localize(None)
        except (AttributeError, TypeError):
            pass
        return v.isoformat() if hasattr(v, "isoformat") else str(v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return v


def _canon_df(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(r[c]) for c in cols)
        for _, r in df.astype(object).where(pd.notnull(df), None).iterrows()
    ]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def _cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=_REL_TOL, abs_tol=_ABS_TOL)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=_REL_TOL, abs_tol=_ABS_TOL)
        except (TypeError, ValueError):
            return False
    return a == b


def _dtype_kind(dtype) -> str:
    """Coarse dtype class for cross-engine comparison.

    DuckDB's HUGEINT (int128, the type of a bare integer SUM) lands in
    pandas as object/float — distinct from Spark's int64 — and the driver's
    value hash sees the representation. Comparing kinds locally catches
    that class before the driver does. Datetime unit (ns vs us) and
    int width (32 vs 64) are NOT distinguished — the driver canonicalizes
    those.
    """
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "datetime"
    if k == "b":
        return "bool"
    return "object"


def compare(spark_df, con, oracle_sql: str, name: str = "") -> None:
    sp = spark_df.toPandas()
    du = con.execute(oracle_sql).fetchdf()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    )
    kind_mismatch = {
        c: (str(sp[c].dtype), str(du[c].dtype))
        for c in sp.columns
        if _dtype_kind(sp[c].dtype) != _dtype_kind(du[c].dtype)
    }
    assert not kind_mismatch, (
        f"{name}: dtype-kind mismatch (spark, duck): {kind_mismatch} — "
        "likely a DuckDB HUGEINT sum; CAST the oracle aggregate to BIGINT"
    )
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duck={len(du)}"
    sp_rows, du_rows = _canon_df(sp), _canon_df(du)
    bad = [
        (a, b)
        for a, b in zip(sp_rows, du_rows)
        if not _cells_equal(a, b)
    ]
    assert not bad, f"{name}: {len(bad)} mismatched rows; first: {bad[0]}"
