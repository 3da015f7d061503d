"""Interleaved span-table invariants (BASELINE.json input_hint).

The contract: the table is (doc_id:string, spans:array<struct<kind,text,
media_ref,offset>>), and the (kind, text, media_ref, order) sequence per
doc survives any pipeline hop — here explode/reassemble and a
checkpoint commit/restore cycle.
"""

from pyspark.sql import functions as F

from crypto_msg_parser_spark.operators.interleaved import (
    span_sequence_signature,
    synth_interleaved,
)
from crypto_msg_parser_spark.schemas import DOCUMENTS_SCHEMA
from crypto_msg_parser_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_synth_schema_matches_input_hint(spark):
    inter = synth_interleaved(load_table(spark, SF, "documents"))
    got = {f.name: f.dataType.simpleString() for f in inter.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in DOCUMENTS_SCHEMA.fields}
    assert got == want, f"{got} != {want}"


def test_roundtrip_holds_for_every_doc(spark):
    from crypto_msg_parser_spark.operators.interleaved import (
        spans_interleave_roundtrip,
    )

    bad = spans_interleave_roundtrip(spark, SF).filter(~F.col("roundtrip_ok"))
    assert bad.count() == 0


def test_signature_survives_checkpoint_restore(spark, tmp_path):
    """Commit the interleaved docs to a parquet snapshot and restore; the
    span-sequence signature set must be identical (the north-rule resume
    invariant, doc-level)."""
    inter = synth_interleaved(load_table(spark, SF, "documents"))
    path = str(tmp_path / "docs_snapshot")
    inter.write.mode("overwrite").parquet(path)
    restored = spark.read.parquet(path)

    a = span_sequence_signature(inter)
    b = span_sequence_signature(restored)
    # anti-joins both ways on the full signature row
    cols = ["doc_id", "n_spans", "seq_sig", "reassembled"]
    assert a.join(b, cols, "left_anti").count() == 0
    assert b.join(a, cols, "left_anti").count() == 0


def test_signature_detects_span_reorder(spark):
    """Sanity: the fingerprint is actually sensitive — swapping two spans'
    offsets changes seq_sig for affected docs."""
    inter = synth_interleaved(load_table(spark, SF, "documents"))
    mutated = inter.withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                F.when(s["kind"] == "media", F.lit(-1))
                .otherwise(s["offset"])
                .cast("int")
                .alias("offset"),
            ),
        ),
    )
    a = span_sequence_signature(inter).select("doc_id", "seq_sig")
    b = span_sequence_signature(mutated).select("doc_id", "seq_sig")
    changed = a.join(b, "doc_id").filter(a["seq_sig"] != b["seq_sig"]).count()
    media_docs = inter.filter(
        F.exists("spans", lambda s: s["kind"] == "media")
    ).count()
    assert changed == media_docs and media_docs > 0


def test_interleaved_pack_budget_invariants(spark):
    """Modality-aware packing: media docs carry exactly one 576-token
    image budget, offsets are the exact prefix sum in doc_id order, and
    pack_id is the offset's 256-token window."""
    from crypto_msg_parser_spark.operators.corpus import PACK_TOKENS
    from crypto_msg_parser_spark.operators.interleaved import (
        MEDIA_TOKENS_PER_SPAN,
        interleaved_pack_budget,
    )

    rows = sorted(
        interleaved_pack_budget(spark, SF).collect(),
        key=lambda r: r["doc_id"],
    )
    assert rows
    cum = 0
    for r in rows:
        expected_media = (
            MEDIA_TOKENS_PER_SPAN if r["doc_id"] % 7 == 0 else 0
        )
        assert r["media_tokens"] == expected_media
        assert r["n_tok"] == r["text_tokens"] + r["media_tokens"]
        assert r["start_offset"] == cum
        assert r["pack_id"] == cum // PACK_TOKENS
        cum += r["n_tok"]
