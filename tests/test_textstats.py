"""Accuracy contract of the approx-percentile 100 TB twin (round-3 VERDICT
next-round #4): at sf0.01 the Greenwald-Khanna sketch's returned values must
sit within the published rank-error bound of the exact percentiles, and the
registered in-plan gate must agree (all booleans TRUE)."""

from collections import defaultdict

from pyspark.sql import functions as F

from crypto_msg_parser_spark.operators.textstats import (
    _APPROX_PCTL_ACCURACY,
    _APPROX_PCTL_PS,
)
from crypto_msg_parser_spark.registry import all_queries

from tests.conftest import SF_ORACLE


def test_approx_percentile_within_rank_bound(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    ps = ", ".join(str(p) for p in _APPROX_PCTL_PS)
    ap_rows = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                f"approx_percentile(n_chars, array({ps}), "
                f"{_APPROX_PCTL_ACCURACY})"
            ).alias("ap"),
        )
        .collect()
    )
    by_source = defaultdict(list)
    for r in docs.select("source", "n_chars").collect():
        by_source[r["source"]].append(r["n_chars"])
    assert ap_rows and by_source
    for r in ap_rows:
        vals = sorted(by_source[r["source"]])
        n = r["n"]
        tol = n / _APPROX_PCTL_ACCURACY + 1
        for p, v in zip(_APPROX_PCTL_PS, r["ap"]):
            lt = sum(1 for x in vals if x < v)
            le = sum(1 for x in vals if x <= v)
            # the value's true rank interval must intersect p*n +- tol
            assert lt <= p * n + tol and le >= p * n - tol, (
                f"source={r['source']} p={p}: value {v} has rank interval "
                f"[{lt}, {le}] outside {p * n} +- {tol} (n={n})"
            )


def test_length_percentiles_approx_gate_all_true(spark):
    q = all_queries()["length_percentiles_approx_by_source"]
    rows = q.spark_fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"], dict(r.asDict())


def test_corpus_drift_topk_is_true_topk(spark):
    """The TakeOrderedAndProject top-k equals the exact top-k recomputed
    from full token counts, and every drift value is the quantized
    micro-rate difference (int64-safe at any corpus size)."""
    from collections import Counter

    from crypto_msg_parser_spark.operators.textstats import (
        TOPK_DRIFT,
        _DRIFT_RATE_UNIT,
        corpus_drift_topk,
    )
    from crypto_msg_parser_spark.sources.testdata import load_table

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text").collect()
    ca, cb = Counter(), Counter()
    for r in docs:
        (ca if r["doc_id"] % 2 == 0 else cb).update(r["text"].split(" "))
    div_a = max(sum(ca.values()) // _DRIFT_RATE_UNIT, 1)
    div_b = max(sum(cb.values()) // _DRIFT_RATE_UNIT, 1)
    drift = {
        w: abs(ca.get(w, 0) // div_a - cb.get(w, 0) // div_b)
        for w in set(ca) | set(cb)
    }
    want = sorted(drift.items(), key=lambda t: (-t[1], t[0]))[:TOPK_DRIFT]

    rows = corpus_drift_topk(spark, SF_ORACLE).collect()
    assert [(r["word"], r["drift_micro"]) for r in rows] == want
    for r in rows:
        assert r["drift_micro"] == abs(r["rate_a_micro"] - r["rate_b_micro"])
        assert r["rate_a_micro"] == r["n_a"] // div_a
        assert r["rate_b_micro"] == r["n_b"] // div_b
