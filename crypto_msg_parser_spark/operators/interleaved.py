"""Interleaved text+media span documents — the crawl payload table.

This is the input_hint table shape from BASELINE.json:
    (doc_id: string,
     spans: array<struct<kind: string, text: string,
                         media_ref: string, offset: int32>>)

The reference pipeline (crypto-crawler -> crypto-msg-parser) lands fetched
payloads as ordered message sequences; the per-row invariant we carry is
span-sequence equality: (kind, text, media_ref, order) must survive every
transformation of the table.  `span_sequence_signature` reduces a document
to a deterministic per-doc fingerprint of exactly that tuple sequence, so
two pipelines (or a pipeline and its checkpoint-restore) can be compared
with a single equi-join.

The driver's `documents` parquet has no spans column, so
`synth_interleaved` derives the interleaved table deterministically from
(doc_id, text): two text spans split at floor(len/2) plus, for every 7th
doc, a trailing media span — mirroring `crawl.frontier.fetch_stub`'s
emission convention.  The DuckDB oracles rebuild the same spans with
UNION ALL, making the explode -> order -> reassemble path a value-hashed
CORRECTNESS row rather than a pytest-only claim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.testdata import load_table


def synth_interleaved(docs: DataFrame) -> DataFrame:
    """(doc_id, text, ...) -> the interleaved span table, deterministically.

    Span layout per doc (L = length(text), h = floor(L/2)):
      [text  | text[1..h]   | null                      | 0]
      [text  | text[h+1..L] | null                      | h]
      [media | null         | media/<doc_id>.{svg|bin}  | L]   (doc_id %% 7 == 0;
                                                               .svg when %% 14 == 0)
    """
    L = F.length("text")
    half = F.floor(L / F.lit(2)).cast("int")
    did = F.col("doc_id").cast("string")
    ext = F.when(F.col("doc_id") % 14 == 0, F.lit(".svg")).otherwise(F.lit(".bin"))
    ref = F.concat(F.lit("media/"), did, ext)
    nul = F.lit(None).cast("string")

    def span(kind, text, media_ref, offset):
        return F.struct(
            F.lit(kind).alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            offset.cast("int").alias("offset"),
        )

    s1 = span("text", F.col("text").substr(F.lit(1), half), nul, F.lit(0))
    s2 = span("text", F.col("text").substr(half + F.lit(1), L), nul, half)
    sm = span("media", nul, ref, L)
    spans = F.when(F.col("doc_id") % 7 == 0, F.array(s1, s2, sm)).otherwise(
        F.array(s1, s2)
    )
    return docs.select(did.alias("doc_id"), spans.alias("spans"))


def span_sequence_signature(inter: DataFrame) -> DataFrame:
    """Per-doc fingerprint of the (kind, media_ref, order) sequence plus the
    reassembled text — the north-rule span-sequence-equality invariant as
    one row per doc.  Explodes, re-sorts by (offset, tie-breakers), and
    folds back; any reorder, drop, or mutation of a span changes the row.
    """
    ex = inter.select("doc_id", F.explode("spans").alias("s"))
    sig_item = F.struct(
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.coalesce(F.col("s.media_ref"), F.lit("")).alias("media_ref"),
    )
    txt_item = F.struct(
        F.col("s.offset").alias("offset"),
        F.coalesce(F.col("s.text"), F.lit("")).alias("text"),
    )
    return ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(sig_item)),
                lambda s: F.concat_ws(
                    ":", s["kind"], s["offset"].cast("string"), s["media_ref"]
                ),
            ),
            "|",
        ).alias("seq_sig"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(txt_item)), lambda s: s["text"]),
            "",
        ).alias("reassembled"),
    )


# Shared oracle fragment: the same spans, built with UNION ALL in DuckDB.
_SQL_SPANS = """
  base AS (
    SELECT doc_id AS did, doc_id::VARCHAR AS doc_id, text,
           length(text) AS L, CAST(length(text) // 2 AS INT) AS h
    FROM documents
  ),
  spans AS (
    SELECT doc_id, 'text' AS kind, substr(text, 1, h) AS stext,
           '' AS media_ref, 0 AS soff FROM base
    UNION ALL
    SELECT doc_id, 'text', substr(text, h + 1, L), '', h FROM base
    UNION ALL
    SELECT doc_id, 'media', NULL,
           'media/' || doc_id || CASE WHEN did % 14 = 0 THEN '.svg' ELSE '.bin' END,
           L
    FROM base WHERE did % 7 = 0
  )
"""


@query(
    "spans_interleave_roundtrip",
    oracle=f"""
    WITH {_SQL_SPANS},
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_spans,
             string_agg(kind || ':' || soff || ':' || coalesce(media_ref, ''),
                        '|' ORDER BY soff, kind, coalesce(media_ref, '')) AS seq_sig,
             coalesce(string_agg(stext, '' ORDER BY soff, coalesce(stext, '')),
                      '') AS reassembled
      FROM spans GROUP BY doc_id
    )
    SELECT a.doc_id, a.n_spans, a.seq_sig,
           (length(a.reassembled) > 0) AS has_payload,
           (a.reassembled = b.text) AS roundtrip_ok
    FROM agg a JOIN base b USING (doc_id)
    """,
    doc="input_hint invariant as a value-hashed row: synthesize the "
    "interleaved span table, explode, re-sort, fingerprint the "
    "(kind, offset, media_ref) sequence, and verify the text spans "
    "reassemble to the source text.",
)
def spans_interleave_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    inter = synth_interleaved(docs)
    sig = span_sequence_signature(inter)
    src = docs.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    return (
        sig.join(src, "doc_id")
        .select(
            "doc_id",
            "n_spans",
            "seq_sig",
            (F.length("reassembled") > 0).alias("has_payload"),
            (F.col("reassembled") == F.col("text")).alias("roundtrip_ok"),
        )
    )


@query(
    "spans_media_extract",
    oracle="""
    SELECT 'media/' || doc_id || CASE WHEN doc_id % 14 = 0
                                      THEN '.svg' ELSE '.bin' END AS media_ref,
           CASE WHEN doc_id % 14 = 0 THEN 'image/svg+xml'
                ELSE 'application/octet-stream' END AS media_type
    FROM documents WHERE doc_id % 7 = 0
    """,
    doc="media-span extraction from the interleaved table into the "
    "multimodal decode shape (operators.multimodal.media_from_documents).",
)
def spans_media_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal import media_from_documents

    inter = synth_interleaved(load_table(spark, sf_dir, "documents"))
    return media_from_documents(inter).select("media_ref", "media_type")


@query(
    "spans_text_stats",
    oracle=f"""
    WITH {_SQL_SPANS}
    SELECT doc_id,
           CAST(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_text_spans,
           CAST(sum(CASE WHEN kind = 'media' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_media_spans,
           CAST(sum(coalesce(length(stext), 0)) AS BIGINT) AS n_chars,
           CAST(sum(CASE WHEN kind = 'text'
                         THEN len(string_split(stext, ' ')) ELSE 0 END)
                AS BIGINT) AS n_tokens
    FROM spans GROUP BY doc_id
    """,
    doc="token/char accounting over the INTERLEAVED payload (the "
    "input_hint table), per doc: text-span and media-span counts, chars "
    "and whitespace tokens summed over text spans only — the quantity a "
    "mixed text+media training mixture budgets by. Explode -> single "
    "partial-aggregated groupBy(doc_id); media spans contribute to span "
    "counts but never to the token budget.",
)
def spans_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    inter = synth_interleaved(load_table(spark, sf_dir, "documents"))
    ex = inter.select("doc_id", F.explode("spans").alias("s"))
    is_text = (F.col("s.kind") == "text").cast("long")
    return ex.groupBy("doc_id").agg(
        F.sum(is_text).alias("n_text_spans"),
        F.sum((F.col("s.kind") == "media").cast("long")).alias("n_media_spans"),
        F.sum(F.coalesce(F.length("s.text"), F.lit(0))).alias("n_chars"),
        F.sum(
            F.when(
                F.col("s.kind") == "text", F.size(F.split("s.text", " "))
            ).otherwise(0)
        ).alias("n_tokens"),
    )
