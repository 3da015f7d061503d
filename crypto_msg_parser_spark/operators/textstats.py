"""Text-analysis operators over the `documents` table.

Language-ID (marker-word scoring), quality scoring (lexical ratios), token
counting (whitespace + subword estimate), and document fingerprinting.

All pure column expressions — per-row, no shuffle until the final optional
aggregation, so they pipeline inside whole-stage codegen at any scale.
Division results are single IEEE ops on exact integer counts, so the DuckDB
oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_msg_parser_spark.registry import query
from crypto_msg_parser_spark.sources.testdata import load_table

# tiny in-expression stopword profiles (a real pipeline broadcasts full sets;
# the mechanism — set membership scoring — is identical)
STOPWORDS = ["the", "a", "of", "and", "to", "in"]
LANG_MARKERS = {
    "en": ["the", "a", "of"],
    "de": ["der", "die", "das"],
    "fr": ["le", "la", "et"],
}


def _words(col):
    return F.split(col, " ")


def _bigrams_all(words):
    """ALL word bigrams, order-preserving, duplicates kept (the distinct
    variant lives in dedup._bigrams): zip the word array against itself
    shifted by one; the null pad from the shorter side is filtered."""
    shifted = F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0)))
    return F.filter(
        F.zip_with(
            words, shifted,
            lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b)),
        ),
        lambda x: x.isNotNull(),
    )


@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id, n_words, n_distinct, type_token_ratio, stopword_ratio,
           (type_token_ratio + (1.0 - stopword_ratio)) / 2.0 AS quality_score
    FROM (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             len(list_distinct(string_split(text, ' ')))
               / len(string_split(text, ' ')) AS type_token_ratio,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({STOPWORDS!r}, w)))
               / len(string_split(text, ' ')) AS stopword_ratio
      FROM documents)
    """,
    doc="quality scoring from lexical ratios (type-token ratio, stopword "
    "ratio) — per-row, codegen'd, no Python.",
)
def text_quality_score(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    stop = F.size(
        F.filter(words, lambda w: F.array_contains(F.lit(STOPWORDS), w))
    )
    ttr = n_distinct / n_words
    swr = stop / n_words
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct"),
        ttr.alias("type_token_ratio"),
        swr.alias("stopword_ratio"),
        ((ttr + (F.lit(1.0) - swr)) / F.lit(2.0)).alias("quality_score"),
    )


@query(
    "token_count",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(list_aggregate(list_transform(string_split(text, ' '),
               w -> (length(w) + 3) // 4), 'sum')) AS BIGINT) AS n_subwords_est,
           CAST(sum(length(text)) AS BIGINT) AS n_chars
    FROM documents
    GROUP BY source
    """,
    doc="token counting per source: whitespace tokens plus a BPE-ish "
    "subword estimate (ceil(len/4) per word) — integer-exact aggregation.",
)
def token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    subwords = F.aggregate(
        F.transform(words, lambda w: F.floor((F.length(w) + 3) / 4).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words)).cast("long").alias("n_tokens"),
        F.sum(subwords).alias("n_subwords_est"),
        F.sum(F.length("text")).alias("n_chars"),
    )


_SQL_LANG_SCORES = {
    lang: (
        f"len(list_filter(string_split(text, ' '), "
        f"w -> list_contains({markers!r}, w)))"
    )
    for lang, markers in LANG_MARKERS.items()
}


@query(
    "lang_id_markers",
    oracle=f"""
    SELECT doc_id,
           CASE
             WHEN {_SQL_LANG_SCORES['en']} >= {_SQL_LANG_SCORES['de']}
              AND {_SQL_LANG_SCORES['en']} >= {_SQL_LANG_SCORES['fr']}
              AND {_SQL_LANG_SCORES['en']} > 0 THEN 'en'
             WHEN {_SQL_LANG_SCORES['de']} >= {_SQL_LANG_SCORES['fr']}
              AND {_SQL_LANG_SCORES['de']} > 0 THEN 'de'
             WHEN {_SQL_LANG_SCORES['fr']} > 0 THEN 'fr'
             ELSE 'und'
           END AS pred_lang,
           {_SQL_LANG_SCORES['en']} AS score_en,
           {_SQL_LANG_SCORES['de']} AS score_de,
           {_SQL_LANG_SCORES['fr']} AS score_fr
    FROM documents
    """,
    doc="language ID via marker-word scoring with deterministic "
    "tie-breaking (priority en > de > fr, fallback 'und').",
)
def lang_id_markers(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))

    def score(markers):
        return F.size(
            F.filter(words, lambda w: F.array_contains(F.lit(markers), w))
        )

    s_en, s_de, s_fr = (score(LANG_MARKERS[lg]) for lg in ("en", "de", "fr"))
    pred = (
        F.when((s_en >= s_de) & (s_en >= s_fr) & (s_en > 0), "en")
        .when((s_de >= s_fr) & (s_de > 0), "de")
        .when(s_fr > 0, "fr")
        .otherwise("und")
    )
    return docs.select(
        "doc_id",
        pred.alias("pred_lang"),
        s_en.alias("score_en"),
        s_de.alias("score_de"),
        s_fr.alias("score_fr"),
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
               ' ')) AS content_fp,
           md5(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '))
             AS prefix_fp
    FROM documents
    """,
    doc="document fingerprinting: order-insensitive content fingerprint "
    "(sorted distinct words) + positional prefix fingerprint — the "
    "rolling-hash family reduced to deterministic md5 fingerprints.",
)
def doc_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.sort_array(F.array_distinct(words)))
        ).alias("content_fp"),
        F.md5(F.concat_ws(" ", F.slice(words, 1, 8))).alias("prefix_fp"),
    )


@query(
    "text_repetition_ratio",
    oracle="""
    WITH bi AS (
      SELECT doc_id, g.g FROM (
        SELECT doc_id,
               list_transform(generate_series(1, len(ws) - 1),
                              i -> ws[i] || ' ' || ws[i + 1]) AS gs
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
        UNNEST(gs) AS g(g)),
    counts AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g)
    SELECT doc_id,
           CAST(max(c) AS BIGINT) AS top_bigram_count,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS rep_ratio
    FROM counts GROUP BY doc_id
    """,
    doc="Gopher-style repetition filter signal: fraction of a doc's word "
    "bigrams accounted for by its single most frequent bigram. Scale "
    "shape: explode -> two-level aggregate keyed by (doc_id[, bigram]) — "
    "key cardinality grows with the corpus so partitions stay bounded; "
    "partial aggregation absorbs the per-doc fan-out map-side. The "
    "per-row array form (count occurrences inside the array) would be "
    "O(len^2) per document — wrong for book-length docs.",
)
def text_repetition_ratio(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    bigrams = _bigrams_all(words)
    counts = (
        docs.select("doc_id", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_count"),
        F.sum("c").alias("n_bigrams"),
        (F.max("c") / F.sum("c")).alias("rep_ratio"),
    )


TOPK_NGRAMS = 20


@query(
    "frequent_ngrams_topk",
    oracle=f"""
    WITH bi AS (
      SELECT g.g FROM (
        SELECT list_transform(generate_series(1, len(ws) - 1),
                              i -> ws[i] || ' ' || ws[i + 1]) AS gs
        FROM (SELECT string_split(text, ' ') AS ws FROM documents)),
        UNNEST(gs) AS g(g))
    SELECT g AS ngram, CAST(count(*) AS BIGINT) AS n
    FROM bi GROUP BY g
    ORDER BY n DESC, ngram
    LIMIT {TOPK_NGRAMS}
    """,
    doc="corpus-level top-k frequent bigrams (vocabulary heavy hitters): "
    "explode -> partial-aggregated count -> global top-k. The ORDER BY "
    "LIMIT compiles to TakeOrderedAndProject — each partition keeps only "
    "k rows of state and the driver merges k*partitions rows, so no full "
    "sort materializes at any corpus size; ties break lexicographically "
    "for cross-engine determinism.",
)
def frequent_ngrams_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    bigrams = _bigrams_all(words)
    return (
        docs.select(F.explode(bigrams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "ngram")
        .limit(TOPK_NGRAMS)
    )


TFIDF_TOP_TERMS = 3


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_words, t.term
      FROM documents, UNNEST(string_split(text, ' ')) AS t(term)),
    tf AS (
      SELECT doc_id, term, count(*) AS c, any_value(n_words) AS n_words
      FROM toks GROUP BY doc_id, term),
    idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             (CAST(tf.c AS DOUBLE) / tf.n_words)
               * (CAST(n.n_docs AS DOUBLE) / idf.df) AS tfidf
      FROM tf JOIN idf USING (term) CROSS JOIN n)
    SELECT doc_id, term, tfidf, rank FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rank
      FROM scored)
    WHERE rank <= {TFIDF_TOP_TERMS}
    """,
    doc="per-doc top-k TF-IDF terms. IDF is the rational N/df (not ln): "
    "libm log is not bit-identical across engines, while IEEE "
    "divide/multiply is — so the oracle matches exactly and the ranking "
    "is engine-stable. Scale shape: tokens explode once; term "
    "frequencies and document frequencies are two partial-aggregated "
    "groupBys; the IDF table equi-joins on term (AQE broadcasts it while "
    "it fits, falls back to a hash join at web-scale vocabularies); "
    "top-k is a per-doc window.",
)
def tfidf_top_terms(spark, sf_dir):
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_words"),
        F.explode(F.split("text", " ")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("c"), F.any_value("n_words").alias("n_words")
    )
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus size as a plan literal: one tiny count action at build time
    # beats carrying a 1-row cross join (BroadcastNestedLoopJoin) through
    # the plan — same precedent as the k-means centroid literals
    n_docs = float(docs.count())
    scored = tf.join(idf, "term").select(
        "doc_id",
        "term",
        (
            (F.col("c").cast("double") / F.col("n_words"))
            * (F.lit(n_docs) / F.col("df"))
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_TERMS)
        .select("doc_id", "term", "tfidf", "rank")
    )


@query(
    "word_rarity_score",
    oracle="""
    WITH dw AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
      FROM documents),
    df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM dw GROUP BY w)
    SELECT dw.doc_id,
           CAST(count(*) AS BIGINT) AS n_distinct_words,
           CAST(sum(1000000 // df.df) AS BIGINT) AS rarity_micro,
           CAST(sum(1000000 // df.df) AS BIGINT) / count(*) AS mean_rarity
    FROM dw JOIN df ON df.w = dw.w
    GROUP BY dw.doc_id
    """,
    doc="unigram-surprise quality signal (the cheap proxy for perplexity "
    "filtering): per-doc sum of inverse document frequency over distinct "
    "words, accumulated in INTEGER micro-units (floor(1e6/df)) — an "
    "integer sum is associative, so the score is bit-identical under any "
    "partial-agg order, where a float idf sum (or a log-based one: ln() "
    "ulps differ across engines) would drift under value-hash compare. "
    "Two shuffles: groupBy(word) for global df, groupBy(doc_id) for the "
    "score; the word join is equi, never all-pairs. SKEW CONTRACT: the "
    "raw word key is maximally skewed at corpus scale (a stop word like "
    "'the' touches ~every doc, so one join partition would receive ~the "
    "whole corpus). The engine relies on AQE's skew-join split "
    "(spark.sql.adaptive.skewJoin, on by default and asserted by "
    "tests/test_plan_shapes.py) to subdivide hot word partitions of the "
    "sort-merge join at runtime; the dimension side (one row per distinct "
    "word) is duplicated per split, which is sound because the join is "
    "1:N on the df side. This is the same tested-reliance pattern as the "
    "decontamination shingle join. Do NOT force a broadcast of the df "
    "side: the vocabulary of a web corpus is unbounded (plan-shape guard "
    "forbids it).",
)
def word_rarity_score(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    dw = docs.select(
        "doc_id", F.explode(F.array_distinct(_words(F.col("text")))).alias("w")
    ).localCheckpoint(eager=False)  # feeds both the df build and the join
    df = dw.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    j = dw.join(df, "w")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.sum(F.expr("1000000 DIV df")).cast("long").alias("rarity_micro"),
        (
            F.sum(F.expr("1000000 DIV df")).cast("long")
            / F.count(F.lit(1))
        ).alias("mean_rarity"),
    )


@query(
    "length_percentiles_by_source",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           quantile_cont(n_chars, 0.5) AS p50,
           quantile_cont(n_chars, 0.9) AS p90,
           quantile_cont(n_chars, 0.99) AS p99
    FROM documents GROUP BY source
    """,
    doc="per-source document-length percentiles — the length-distribution "
    "drift monitor every corpus-ingest pipeline runs (a source whose p99 "
    "collapses is truncating; one whose p50 explodes is concatenating). "
    "Spark's exact `percentile` and DuckDB's quantile_cont share the "
    "linear-interpolation convention, verified bit-exact on every group. "
    "CONTRACT (bounded groups): exact percentile buffers each group's "
    "values in executor memory, so this row is only for per-source doc "
    "counts that fit one executor (fine for per-day/per-shard monitoring "
    "slices); the registered 100 TB path is the sketch-merged "
    "length_percentiles_approx_by_source below, whose in-plan rank gate "
    "proves the sketch against exact ranks on every run.",
)
def length_percentiles_by_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("percentile(n_chars, 0.5)").alias("p50"),
        F.expr("percentile(n_chars, 0.9)").alias("p90"),
        F.expr("percentile(n_chars, 0.99)").alias("p99"),
    )


_APPROX_PCTL_ACCURACY = 10000
_APPROX_PCTL_PS = (0.5, 0.9, 0.99)


@query(
    "length_percentiles_approx_by_source",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM documents GROUP BY source
    """,
    doc="the 100 TB twin of length_percentiles_by_source: "
    "approx_percentile (Greenwald-Khanna sketch, constant memory per "
    "group, partial-agg mergeable — never buffers a group's values) with "
    "an IN-PLAN accuracy gate. The sketch's raw outputs aren't hash-"
    "comparable across engines, so the row instead verifies the sketch's "
    "published rank guarantee and returns booleans: the per-source "
    "approx values (a tiny frame, |sources| rows) are equi-joined back "
    "onto documents, each value's true rank interval [count(<v), "
    "count(<=v)] is computed by one partial agg, and pXX_ok asserts the "
    "interval intersects [p*n - tol, p*n + tol] with tol = n/accuracy + 1 "
    "(the GK bound, +1 for rank-convention slack). Oracle = the all-TRUE "
    "closed form with exact per-source counts — a sketch that ever "
    "violates its bound turns a boolean false and fails the value hash. "
    "Two shuffles (sketch agg, rank agg) + one small-side equi-join that "
    "AQE broadcasts at runtime; scale-safe at any group size.",
)
def length_percentiles_approx_by_source(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ps = ", ".join(str(p) for p in _APPROX_PCTL_PS)
    ap = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(
            f"approx_percentile(n_chars, array({ps}), {_APPROX_PCTL_ACCURACY})"
        ).alias("ap"),
    )
    j = docs.select("source", "n_chars").join(ap, "source")
    aggs = [F.first("n_docs").alias("n_docs")]
    for i in range(len(_APPROX_PCTL_PS)):
        v = F.col("ap")[i]
        aggs.append(
            F.sum((F.col("n_chars") < v).cast("long")).alias(f"lt{i}")
        )
        aggs.append(
            F.sum((F.col("n_chars") <= v).cast("long")).alias(f"le{i}")
        )
    ranked = j.groupBy("source").agg(*aggs)
    n = F.col("n_docs").cast("double")
    tol = n / _APPROX_PCTL_ACCURACY + 1
    cols = [F.col("source"), F.col("n_docs")]
    for i, p in enumerate(_APPROX_PCTL_PS):
        target = F.lit(p) * n
        ok = (F.col(f"lt{i}") <= target + tol) & (
            F.col(f"le{i}") >= target - tol
        )
        cols.append(ok.alias(f"p{int(p * 100)}_ok"))
    return ranked.select(*cols)


TOPK_DRIFT = 20
_DRIFT_RATE_UNIT = 1_000_000  # micro-rate: word frequency per 1M tokens


@query(
    "corpus_drift_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id % 2 AS snap, unnest(string_split(text, ' ')) AS w
      FROM documents),
    counts AS (
      SELECT w AS word,
             CAST(sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b
      FROM tok GROUP BY w),
    tot AS (
      SELECT greatest(sum(n_a) // {_DRIFT_RATE_UNIT}, 1) AS div_a,
             greatest(sum(n_b) // {_DRIFT_RATE_UNIT}, 1) AS div_b
      FROM counts),
    rated AS (
      SELECT word, n_a, n_b,
             CAST(n_a // div_a AS BIGINT) AS rate_a_micro,
             CAST(n_b // div_b AS BIGINT) AS rate_b_micro
      FROM counts CROSS JOIN tot)
    SELECT word, n_a, n_b, rate_a_micro, rate_b_micro,
           CAST(abs(rate_a_micro - rate_b_micro) AS BIGINT) AS drift_micro
    FROM rated
    ORDER BY drift_micro DESC, word ASC
    LIMIT {TOPK_DRIFT}
    """,
    doc="corpus drift monitor between two snapshots (crawl waves, filter "
    "versions): per word, the ABSOLUTE micro-rate divergence "
    "|rate_A - rate_B| where rate = n // max(T // 1e6, 1) — a quantized "
    "per-million frequency whose arithmetic stays inside int64 at ANY "
    "corpus size (dividing the TOTAL first caps the divisor at T/1e6 "
    "and never forms the n*1e6 product that overflows past ~9e12 "
    "tokens; the naive cross-product n_a*T_b form overflows a thousand "
    "times earlier). Top-k heavy drifters via ORDER BY LIMIT -> "
    "TakeOrderedAndProject: each partition keeps k rows, no global "
    "sort materializes. Snapshot split is doc_id parity (deterministic "
    "stand-in for wave ids); the 1-row totals frame rides a documented "
    "cross join. Ties break lexicographically for cross-engine "
    "determinism. A production pipeline alerts on drift_micro spikes "
    "before shipping a new crawl into training.",
)
def corpus_drift_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        (F.col("doc_id") % 2).alias("snap"),
        F.explode(F.split("text", " ")).alias("w"),
    )
    counts = tok.groupBy(F.col("w").alias("word")).agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    tot = counts.agg(
        F.greatest(
            F.expr(f"sum(n_a) DIV {_DRIFT_RATE_UNIT}"), F.lit(1)
        ).alias("div_a"),
        F.greatest(
            F.expr(f"sum(n_b) DIV {_DRIFT_RATE_UNIT}"), F.lit(1)
        ).alias("div_b"),
    )
    rated = counts.crossJoin(tot).select(
        "word",
        "n_a",
        "n_b",
        F.expr("n_a DIV div_a").cast("long").alias("rate_a_micro"),
        F.expr("n_b DIV div_b").cast("long").alias("rate_b_micro"),
    )
    return (
        rated.select(
            "word",
            "n_a",
            "n_b",
            "rate_a_micro",
            "rate_b_micro",
            F.abs(F.col("rate_a_micro") - F.col("rate_b_micro"))
            .cast("long")
            .alias("drift_micro"),
        )
        .orderBy(F.desc("drift_micro"), F.asc("word"))
        .limit(TOPK_DRIFT)
    )


COLLOC_MIN_COUNT = 2
COLLOC_TOPK = 20


@query(
    "collocation_lift_topk",
    oracle=f"""
    WITH ws AS (SELECT string_split(text, ' ') AS ws FROM documents),
    tok AS (SELECT t.t AS w FROM ws, UNNEST(ws) AS t(t)),
    uni AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    n AS (SELECT count(*) AS n_tokens FROM tok),
    bi AS (
      SELECT g.g FROM (
        SELECT list_transform(generate_series(1, len(ws) - 1),
                              i -> ws[i] || ' ' || ws[i + 1]) AS gs
        FROM ws), UNNEST(gs) AS g(g)),
    bc AS (SELECT g, count(*) AS c_xy FROM bi GROUP BY g
           HAVING count(*) >= {COLLOC_MIN_COUNT}),
    parts AS (
      SELECT g, c_xy,
             string_split(g, ' ')[1] AS w1,
             string_split(g, ' ')[2] AS w2
      FROM bc),
    j AS (
      SELECT p.g AS ngram, p.c_xy, u1.c AS c_x, u2.c AS c_y, n.n_tokens
      FROM parts p
      JOIN uni u1 ON u1.w = p.w1
      JOIN uni u2 ON u2.w = p.w2
      CROSS JOIN n)
    SELECT ngram,
           CAST(c_xy AS BIGINT) AS n_xy,
           CAST(c_x AS BIGINT) AS n_x,
           CAST(c_y AS BIGINT) AS n_y,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(c_xy * n_tokens AS DOUBLE) / (c_x * c_y) AS lift
    FROM j ORDER BY lift DESC, ngram LIMIT {COLLOC_TOPK}
    """,
    doc="bigram collocation mining by LIFT — the log-free core of PMI "
    "(PMI = log2(lift)), ranking word pairs that co-occur far above "
    "the independence expectation: lift = P(xy)/(P(x)P(y)) = "
    "n_xy*N / (n_x*n_y). Logs are deliberately avoided: libm log() is "
    "not bit-portable across engines, but the lift RATIO carries the "
    "identical ordering and is one IEEE division on exact integers "
    "(numerator n_xy*N <= ~2^40 at petabyte scale, denominator "
    "n_x*n_y < 2^53 while both factors stay under ~10^8 distinct "
    "token occurrences per word — bounds documented, far from either "
    "engine's exact range). The four counts publish alongside so the "
    "gate is anchored on integers. Shape: one explode+groupBy each "
    "for unigrams and bigrams, the vocabulary-sized unigram table "
    "joined TWICE onto the bigram counts (left word, right word) with "
    "NO broadcast hint — the vocabulary is unbounded at corpus scale, "
    "so AQE chooses (broadcast when measured small, shuffle+skew-split "
    "otherwise, the module's word_rarity contract), the 1-row corpus "
    "total cross-joined (documented grand-"
    "total crossJoin, same as corpus_pack_sequences), min-count "
    "pre-filter BEFORE the joins so the joined frame is heavy-hitters "
    "only, and ORDER BY LIMIT compiling to TakeOrderedAndProject — "
    "no full sort at any corpus size.",
)
def collocation_lift_topk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    tok = docs.select(F.explode(words).alias("w"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n = tok.agg(F.count(F.lit(1)).alias("n_tokens"))
    bc = (
        docs.select(F.explode(_bigrams_all(words)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= COLLOC_MIN_COUNT)
    )
    parts = bc.select(
        "ngram",
        "c_xy",
        F.split("ngram", " ").getItem(0).alias("w1"),
        F.split("ngram", " ").getItem(1).alias("w2"),
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    # No broadcast hint on the unigram attaches: the vocabulary is
    # unbounded at corpus scale (Heaps' law), so the module contract —
    # AQE picks broadcast when the side measures small, shuffle join
    # with skew split otherwise — applies here exactly as it does to
    # word_rarity_score. Only the 1-row grand total is hinted.
    j = parts.join(u1, "w1").join(u2, "w2").crossJoin(F.broadcast(n))
    return (
        j.select(
            "ngram",
            F.col("c_xy").cast("long").alias("n_xy"),
            F.col("c_x").cast("long").alias("n_x"),
            F.col("c_y").cast("long").alias("n_y"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (
                (F.col("c_xy") * F.col("n_tokens")).cast("double")
                / (F.col("c_x") * F.col("c_y"))
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "ngram")
        .limit(COLLOC_TOPK)
    )


POSTINGS_HEAD = 10


@query(
    "inverted_index_postings",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, t.t AS term
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           UNNEST(ws) AS t(t)),
    tf AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY term, doc_id)
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           CAST(max(tf) AS BIGINT) AS max_tf,
           array_to_string(
             list_slice(
               list_sort(list(doc_id || ':' || tf)),
               1, {POSTINGS_HEAD}),
             ',') AS postings_head
    FROM tf GROUP BY term
    """,
    doc="inverted-index build (the retrieval-side twin of "
    "tfidf_top_terms): one explode to (term, doc) pairs, one "
    "partial-agg groupBy for per-doc term frequency, one groupBy(term) "
    "folding the dictionary row — document frequency, corpus tf, max "
    "tf (the BM25 saturation anchor) and the head of the posting list. "
    "Postings are materialized as the FIRST 10 entries of "
    "the 'doc:tf'-lexicographic sort, not the full list: a stopword's "
    "postings at web scale is the corpus itself, so the full list "
    "never transits as one value — a real deployment range-partitions "
    "postings by (term, doc_id) and this row carries the dictionary "
    "plus a bounded sample (cap documented, exact integer stats are "
    "complete either way). Lexicographic doc:tf strings make the "
    "sample engine-identical without numeric-sort/NULLS quibbles; "
    "both groupBys ride one shuffle each on keys Catalyst "
    "partial-aggregates map-side.",
)
def inverted_index_postings(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(_words(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    posting = F.concat_ws(
        ":", F.col("doc_id").cast("string"), F.col("tf").cast("string")
    )
    return (
        tf.select("term", "tf", posting.alias("posting"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.max("tf").cast("long").alias("max_tf"),
            F.array_join(
                F.slice(
                    F.array_sort(F.collect_list("posting")),
                    1,
                    POSTINGS_HEAD,
                ),
                ",",
            ).alias("postings_head"),
        )
    )


OOV_VOCAB_K = 1000


@query(
    "oov_rate_by_source",
    oracle=f"""
    WITH tok AS (
      SELECT source, t.t AS word
      FROM (SELECT source, string_split(text, ' ') AS ws FROM documents),
           UNNEST(ws) AS t(t)),
    sw AS (
      SELECT source, word, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY source, word),
    tot AS (
      SELECT word, CAST(sum(c) AS BIGINT) AS n FROM sw GROUP BY word),
    vocab AS (
      SELECT word FROM tot ORDER BY n DESC, word LIMIT {OOV_VOCAB_K})
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct_words,
           CAST(COALESCE(sum(c) FILTER (WHERE v.word IS NULL), 0)
                AS BIGINT) AS oov_tokens,
           CAST(count(*) FILTER (WHERE v.word IS NULL) AS BIGINT)
             AS oov_distinct,
           CAST(1000000 * COALESCE(sum(c) FILTER (WHERE v.word IS NULL),
                                   0) // sum(c) AS BIGINT) AS oov_ppm
    FROM sw LEFT JOIN vocab v ON v.word = sw.word
    GROUP BY source
    """,
    doc="out-of-vocabulary rate per source against the corpus's own "
    "top-1000 vocabulary — the tokenizer-coverage audit run before "
    "committing a fixed vocab (or a BPE merge table) to a training "
    "mixture: sources whose token mass falls outside the head "
    "vocabulary dominate UNK rates downstream. Vocabulary selection "
    "is the total (count DESC, word ASC) order LIMIT K, so boundary "
    "ties resolve identically in both engines; rates are exact "
    "integer ppm over token counts. Scale shape: one explode + "
    "partial-agg groupBy(source, word) — the same shuffle "
    "word-frequency rows pay — one groupBy(word) rollup for corpus "
    "counts, a TakeOrderedAndProject for the K-row vocab, and a "
    "LEFT join of (source, word) counts against the K-row vocab, "
    "broadcast BY CONSTRUCTION bounded at K=1000 (this is the "
    "bounded-dictionary case; the unbounded-vocabulary rows like "
    "collocation_lift_topk deliberately do NOT broadcast).",
)
def oov_rate_by_source(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(_words(F.col("text"))).alias("word")
    )
    sw = tok.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = sw.groupBy("word").agg(F.sum("c").cast("long").alias("n"))
    vocab = (
        tot.orderBy(F.col("n").desc(), "word")
        .limit(OOV_VOCAB_K)
        .select("word", F.lit(True).alias("in_vocab"))
    )
    j = sw.join(F.broadcast(vocab), "word", "left")
    oov = F.col("in_vocab").isNull()
    return j.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
        F.coalesce(F.sum(F.when(oov, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("oov_tokens"),
        F.count(F.when(oov, 1)).cast("long").alias("oov_distinct"),
        F.expr(
            "(1000000 * coalesce(sum(CASE WHEN in_vocab IS NULL THEN c END),"
            " 0)) DIV sum(c)"
        )
        .cast("long")
        .alias("oov_ppm"),
    )
