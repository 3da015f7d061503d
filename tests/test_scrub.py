"""Semantics tests for the scrub family (PII redaction, Gopher quality
gate, duplicated n-gram windows) beyond the registry's oracle replay:
crafted inputs exercising each rule edge."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from crypto_msg_parser_spark.operators.scrub import (
    DUP_FRAC_FLAG,
    EMAIL_RE,
    GOPHER_STOPWORDS,
    IPV4_RE,
    MIN_STOP_HITS,
    PHONE_RE,
    WINDOW_W,
    scrub_pii,
)


def _scrub_one(spark, text: str) -> str:
    df = spark.createDataFrame([Row(t=text)])
    return df.select(scrub_pii(F.col("t")).alias("s")).head()[0]


def test_scrub_all_three_classes(spark):
    out = _scrub_one(
        spark,
        "mail bob.smith+x@sub.example.org then +1-555-0100 from 192.168.0.1 done",
    )
    assert out == "mail <EMAIL> then <PHONE> from <IP> done"


def test_scrub_is_global_not_first_match(spark):
    out = _scrub_one(spark, "a@b.co c@d.io 1.2.3.4 5.6.7.8")
    assert out == "<EMAIL> <EMAIL> <IP> <IP>"


def test_scrub_leaves_clean_text_alone(spark):
    text = "version 1.2 costs 3 dollars at example dot com"
    assert _scrub_one(spark, text) == text


def test_scrub_order_email_before_ip(spark):
    # the host part of an email contains dotted tokens; email redaction
    # must claim the whole address before the IP pass sees fragments
    out = _scrub_one(spark, "x user@10.0.0.1.example.com y")
    assert out == "x <EMAIL> y"
    assert "<IP>" not in out


def test_patterns_are_re2_compatible():
    # the DuckDB side runs RE2: no lookaround/backrefs may creep in
    for pat in (EMAIL_RE, IPV4_RE, PHONE_RE):
        assert "(?<" not in pat and "(?=" not in pat and "\\1" not in pat


def test_gopher_gate_bounds(spark):
    from crypto_msg_parser_spark.operators.scrub import gopher_quality_filter

    rows = gopher_quality_filter(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.keep == (
            r.pass_words and r.pass_mwl and r.pass_alpha and r.pass_stop
        )
        if r.n_words < 50:
            assert not r.pass_words
        assert r.pass_stop == (r.n_stop_hits >= MIN_STOP_HITS)
    assert len(GOPHER_STOPWORDS) >= MIN_STOP_HITS


def _dup_windows(spark, docs):
    """Run the dup-window plan on an in-memory documents frame via a
    temp-view monkeypatch-free path: write to a temp dir is overkill —
    reuse the operator's internals by building the same plan inline."""
    from crypto_msg_parser_spark.operators import scrub as S

    ws = F.split("text", " ")
    n_win = F.greatest(F.size(ws) - (S.WINDOW_W - 1), F.lit(0))
    idx = F.when(n_win >= 1, F.sequence(F.lit(1), n_win)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, S.WINDOW_W)))
    wins = docs.select("doc_id", n_win.cast("long").alias("n_windows"), grams.alias("gs"))
    base = wins.select("doc_id", F.explode("gs").alias("g"))
    dup = (
        base.distinct()
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g")
    )
    hits = base.join(dup, "g").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_windows")
    )
    return {
        r.doc_id: (r.n_windows, r.n_dup_windows or 0)
        for r in wins.select("doc_id", "n_windows")
        .join(hits, "doc_id", "left")
        .collect()
    }


def test_dup_windows_crafted(spark):
    shared = " ".join(f"w{i}" for i in range(WINDOW_W))  # exactly one window
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=shared + " tail1 tail2"),
            Row(doc_id=2, text="head1 head2 " + shared),
            Row(doc_id=3, text="totally different words here only once ok fine"),
            Row(doc_id=4, text="short doc"),  # < W words -> zero windows
        ]
    )
    got = _dup_windows(spark, docs)
    # docs 1 and 2 share the `shared` window (1 of 3 windows each)
    assert got[1] == (3, 1)
    assert got[2] == (3, 1)
    assert got[3][1] == 0
    assert got[4] == (0, 0)
    assert 0 < DUP_FRAC_FLAG < 1


def test_spans_pii_scrub_preserves_sequence(spark):
    from crypto_msg_parser_spark.operators.interleaved import (
        span_sequence_signature,
        spans_pii_scrub,
        synth_interleaved,
    )
    from crypto_msg_parser_spark.operators.scrub import _augmented_text
    from crypto_msg_parser_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    out = spans_pii_scrub(spark, sf)
    docs = load_table(spark, sf, "documents")
    aug = docs.select("doc_id", _augmented_text().alias("text"))
    before = span_sequence_signature(synth_interleaved(aug)).select(
        "doc_id", F.col("seq_sig").alias("sig_before")
    )
    joined = out.join(before, "doc_id").select("seq_sig", "sig_before").collect()
    assert joined and all(r.seq_sig == r.sig_before for r in joined)
    # at least the planted emails get redacted (doc_id % 3 == 0 tail spans)
    n_red = out.agg(F.sum("n_redactions")).head()[0]
    assert n_red > 0


def test_pii_scrub_differential_fuzz(spark):
    """Differential check of the Catalyst PII scrubber against Python `re`
    with the same patterns over seeded-random text with planted and
    near-miss PII tokens — one Spark job. The patterns live in the
    Java-regex ∩ RE2 ∩ Python-re common subset, so all three engines
    must agree exactly."""
    import random
    import re

    from crypto_msg_parser_spark.operators.scrub import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        scrub_pii,
    )

    def ref(s: str) -> str:
        s = re.sub(EMAIL_RE, "<EMAIL>", s)
        s = re.sub(PHONE_RE, "<PHONE>", s)
        return re.sub(IPV4_RE, "<IP>", s)

    rng = random.Random(20240818)
    words = ["alpha", "beta", "v1.2", "x", "a.b", "dot.", ".start", "a-b"]
    pii = [
        lambda: f"user{rng.randrange(999)}@ex{rng.randrange(9)}.org",
        lambda: f"{rng.randrange(256)}.{rng.randrange(256)}."
        f"{rng.randrange(256)}.{rng.randrange(256)}",
        lambda: f"+{rng.randrange(1, 99)}-{rng.randrange(100, 999)}-"
        f"{rng.randrange(1000, 9999)}",
        # near-misses: must NOT be redacted / only partially match
        lambda: "user@@double.at",
        lambda: "1.2.3",  # 3 octets only
        lambda: "+1-55-0100",  # 2-digit middle group
        lambda: "semver 10.2.33.444.5",  # 5 dotted groups
        lambda: "a@b",  # no TLD
    ]
    texts = []
    for _ in range(2000):
        parts = []
        for _ in range(rng.randrange(1, 8)):
            parts.append(
                pii[rng.randrange(len(pii))]()
                if rng.random() < 0.5
                else rng.choice(words)
            )
        texts.append(" ".join(parts))
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    from pyspark.sql import functions as F

    got = df.select("t", scrub_pii(F.col("t")).alias("s")).collect()
    bad = [(r["t"], r["s"], ref(r["t"])) for r in got if r["s"] != ref(r["t"])]
    assert not bad, f"{len(bad)} mismatches, first 5: {bad[:5]}"
