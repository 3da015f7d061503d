"""Composed training-corpus preparation pipeline.

The end-to-end path a 100 TB pretraining-data job runs over the documents
table, as ONE declarative plan: exact dedup (content-hash survivors) ->
near-dup removal (bigram-shingle MinHash-LSH pairs; the higher doc_id of
each confirmed pair is dropped) -> lexical quality gate -> per-doc token
accounting for the kept corpus.

Scale shape: every stage reuses the operators' own scale story — one
shuffle for exact dedup, banded LSH (no all-pairs), codegen'd quality/token
expressions — and the composition adds only doc_id equi-joins (the drop set
is tiny relative to the corpus, so AQE broadcasts it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.testdata import load_table
from .dedup import (
    _SQL_BANDS,
    _SQL_HASHED,
    _SQL_REPS,
    _SQL_SIG,
    JACCARD_THRESHOLD,
    neardup_minhash_lsh,
)
from .textstats import STOPWORDS

QUALITY_MIN = 0.7  # corpus median at sf0.01 — keeps the gate non-trivial


def corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    reps = docs.groupBy(F.md5("text").alias("_h")).agg(
        F.min("doc_id").alias("doc_id"), F.any_value("text").alias("text")
    )
    drop = (
        neardup_minhash_lsh(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = reps.join(drop, "doc_id", "left_anti")

    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    ttr = F.size(F.array_distinct(words)) / n_words
    swr = (
        F.size(F.filter(words, lambda w: F.array_contains(F.lit(STOPWORDS), w)))
        / n_words
    )
    quality = (ttr + (F.lit(1.0) - swr)) / F.lit(2.0)
    subwords = F.aggregate(
        F.transform(words, lambda w: F.floor((F.length(w) + 3) / 4).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        kept.select(
            "doc_id",
            quality.alias("quality_score"),
            n_words.cast("long").alias("n_tokens"),
            subwords.alias("n_subwords_est"),
        )
        .filter(F.col("quality_score") >= QUALITY_MIN)
    )


@query(
    "corpus_prep_pipeline",
    oracle=f"""
    WITH reps AS ({_SQL_REPS}),
    hashed AS ({_SQL_HASHED}),
    sig AS ({_SQL_SIG}),
    bands AS ({_SQL_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           AND a.doc_id < b.doc_id),
    nd AS (
      SELECT doc_a, doc_b FROM (
        SELECT c.doc_a, c.doc_b,
               len(list_filter(wa.wh, x -> list_contains(wb.wh, x))) /
               (len(wa.wh) + len(wb.wh)
                - len(list_filter(wa.wh, x -> list_contains(wb.wh, x)))) AS jaccard
        FROM cand c
        JOIN hashed wa ON wa.doc_id = c.doc_a
        JOIN hashed wb ON wb.doc_id = c.doc_b)
      WHERE jaccard >= {JACCARD_THRESHOLD}),
    kept AS (
      SELECT doc_id, text FROM reps
      WHERE doc_id NOT IN (SELECT doc_b FROM nd)),
    scored AS (
      SELECT doc_id,
             (len(list_distinct(string_split(text, ' ')))
                / len(string_split(text, ' '))
              + (1.0
                 - len(list_filter(string_split(text, ' '),
                       w -> list_contains({STOPWORDS!r}, w)))
                   / len(string_split(text, ' ')))) / 2.0 AS quality_score,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(list_aggregate(list_transform(string_split(text, ' '),
                 w -> (length(w) + 3) // 4), 'sum') AS BIGINT) AS n_subwords_est
      FROM kept)
    SELECT doc_id, quality_score, n_tokens, n_subwords_est
    FROM scored WHERE quality_score >= {QUALITY_MIN}
    """,
    doc="composed corpus-prep pipeline: exact dedup -> LSH near-dup drop "
    "(higher doc_id of each confirmed pair) -> quality gate (>= "
    f"{QUALITY_MIN}) -> per-doc token accounting. One declarative plan; "
    "stages reuse dedup/textstats operators unchanged.",
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_prep(spark, sf_dir)
