"""Unified dispatch API over a mixed-exchange message table."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_msg_parser_spark.parser import api
from tests.parser_util import fixtures_df, load_fixtures


def _mixed_rows(msg_type):
    rows = []
    for ex in api.IMPLEMENTED:
        for r in load_fixtures(ex):
            # small exchanges carry msg_type only in the fixture id; the
            # id grammar is <exchange>:<msg_type>:<variant>:<n> (or with a
            # None slot for untyped extracts)
            mt = r["msg_type"] or (
                msg_type if f":{msg_type}:" in r["fixture_id"] else None
            )
            if mt != msg_type or r["variant"] != ex:
                continue
            if r["market_type"] == "european_option":
                continue
            rows.append(
                dict(r, market_type=r["market_type"] or "spot", msg_type=mt)
            )
    return rows


def test_mixed_parse_trade(spark):
    rows = _mixed_rows("trade")
    raw = fixtures_df(spark, rows)
    out = api.parse_trade(raw)
    got = out.groupBy("exchange").count().collect()
    by_ex = {r["exchange"]: r["count"] for r in got}
    assert set(by_ex) == set(api.IMPLEMENTED)
    assert all(v > 0 for v in by_ex.values())
    # every record normalized: unified pair + 13-digit ms timestamp
    bad = out.filter(
        ~F.col("pair").contains("/") | (F.length(F.col("timestamp").cast("string")) != 13)
    ).count()
    assert bad == 0


def test_mixed_routing_triple(spark):
    rows = _mixed_rows("trade") + _mixed_rows("l2_event")
    raw = fixtures_df(spark, rows)
    routed = api.route(raw)
    r = routed.select("exchange", "msg_type", "routed_msg_type", "routed_symbol").collect()
    for row in r:
        if row["routed_msg_type"] != "other":
            assert row["routed_msg_type"] == row["msg_type"], row
        assert row["routed_symbol"], row


def test_dispatch_prunes_unimplemented(spark):
    # rows from an unknown exchange are simply not emitted (the reference
    # panics per message; a table engine drops them into the unparsed
    # remainder instead)
    rows = _mixed_rows("trade")
    raw = fixtures_df(spark, rows).withColumn(
        "exchange", F.lit("poloniex")
    )
    assert api.parse_trade(raw).count() == 0


def test_parse_stage_has_no_python_udfs(spark):
    """BASELINE.json input_hint: vectorized/Catalyst-only parse stage.
    Every api.parse_* plan must be free of Python evaluation nodes
    (BatchEvalPython / ArrowEvalPython / FlatMapGroupsInPandas) except the
    gate futures stateful path, which is the reference's one keyed-state
    operator (SURVEY §2.9) and is explicitly an applyInPandas."""
    rows = _mixed_rows("trade")
    raw = fixtures_df(spark, rows)
    for fn in (api.parse_trade, api.parse_bbo, api.parse_funding_rate,
               api.parse_candlestick, api.route):
        plan = fn(raw)._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan, (fn.__name__, marker)
    l2_plan = api.parse_l2(raw)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in l2_plan
    # the ONLY pandas node allowed anywhere: gate's stateful delta replay
    assert l2_plan.count("FlatMapGroupsInPandas") <= 1


def test_l2_topk_dispatch_aliases(spark):
    """The reference routes parse_l2_topk straight to parse_l2 for huobi
    (huobi/mod.rs:127-132) and okx (okx/mod.rs:98-103); binance has a
    dedicated depthK path. The api dispatch must produce rows for all
    three, not silently drop exchanges lacking a parse_l2_topk attr."""
    rows = _mixed_rows("l2_topk")
    exchanges = {r["exchange"] for r in rows}
    assert {"binance", "huobi", "okx"} <= exchanges
    raw = fixtures_df(spark, rows)
    out = api.parse_l2_topk(raw)
    by_ex = {
        r["exchange"]: r["count"]
        for r in out.groupBy("exchange").count().collect()
    }
    for ex in ("binance", "huobi", "okx"):
        assert by_ex.get(ex, 0) > 0, f"{ex} dropped by parse_l2_topk dispatch"


def test_get_msg_type_strict_reference_parity(spark):
    """The reference's top-level get_msg_type sniffs EXACTLY 9 exchanges
    and returns Other for the rest (lib.rs:316-329) — even where this
    engine carries a module-level sniffer (kucoin, mexc, bitstamp, ...).
    Default must be reference-equal; extended=True opts into the extras."""
    rows = _mixed_rows("trade")
    raw = fixtures_df(spark, rows)
    strict = raw.select(
        "exchange",
        api.get_msg_type(F.col("exchange"), F.col("msg")).alias("mt"),
    ).collect()
    sniffed = {r["exchange"] for r in strict if r["mt"] != "other"}
    assert sniffed <= set(api.REFERENCE_MSG_TYPE_ARMS)
    # the 9 reference arms do classify their own trade messages
    assert "binance" in sniffed and "huobi" in sniffed and "okx" in sniffed

    ext = raw.select(
        "exchange",
        api.get_msg_type(F.col("exchange"), F.col("msg"), extended=True).alias("mt"),
    ).collect()
    ext_sniffed = {r["exchange"] for r in ext if r["mt"] != "other"}
    # extras engage beyond the reference set, and nothing regresses
    assert sniffed <= ext_sniffed
    assert ext_sniffed - set(api.REFERENCE_MSG_TYPE_ARMS)
