"""Deduplication operators over the `documents` table.

Large-scale-training-pipeline dedup family: exact (hash groupBy), MinHash +
LSH banding, SimHash + hamming-band join, and n-gram/word-set Jaccard.

Scale design:
- Exact dedup is a single shuffle on the content hash.
- MinHash signatures and SimHash are computed per-row with array
  expressions (no shuffle, no Python) — at 100 TB the only shuffles are the
  LSH band self-joins, which group by (band_idx, band_hash), a key whose
  cardinality grows with corpus size so partitions stay bounded; AQE skew
  join covers pathological bands.
- The O(n^2) verify step only ever runs on LSH candidate pairs, never on
  the full corpus.

All hashes use the md5-derived stable_hash64 (functions/scalar.py) so the
DuckDB oracle reproduces them exactly; Spark-internal-only keys would use
xxhash64 instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crypto_msg_parser_spark.registry import query
from crypto_msg_parser_spark.sources.testdata import load_table

N_MINHASH = 8  # minhash permutations (md5-salted)
N_BANDS = 4  # LSH bands of 2 rows each
SIMHASH_BITS = 16
JACCARD_THRESHOLD = 0.6


def _words(col):
    """Distinct word set of a document (order-irrelevant downstream)."""
    return F.array_distinct(F.split(col, " "))


def _sql_words(expr: str) -> str:
    return f"list_distinct(string_split({expr}, ' '))"


def _word_hash(word_col, salt: int):
    # per-word salted stable hash; identical to the DuckDB template below
    return F.conv(
        F.substring(F.md5(F.concat(word_col, F.lit(f"#{salt}"))), 1, 15), 16, 10
    ).cast("long")


def _sql_word_hash(expr: str, salt: int) -> str:
    return f"('0x' || substr(md5({expr} || '#{salt}'), 1, 15))::BIGINT"


def _hasher(salt: int):
    # single-arg closure: a 2-arg lambda would make F.transform/F.filter pass
    # the element *index* as the second argument
    return lambda w: _word_hash(w, salt)


# xor-permutation constants for the MinHash family: md5 runs ONCE per word
# (the base 60-bit hash); each of the N_MINHASH permutations is h XOR C_s,
# a bijection of the hash space costing one integer op instead of a fresh
# md5 pass. Round-1 profiling put neardup_minhash_lsh at 76% of the whole
# bench, almost all of it 8x md5 over every distinct word. xor stays inside
# 60 bits, so both engines agree with no overflow semantics in play
# (DuckDB BIGINT arithmetic errors on overflow; Java wraps).
_XOR_SALTS = [
    0x0,
    0x243F6A8885A308D,  # pi digits
    0x13198A2E0370734,
    0xA4093822299F31D,
    0x082EFA98EC4E6C8,
    0x452821E638D0137,
    0xBE5466CF34E90C6,
    0xC0AC29B7C97C50D,
]
assert len(_XOR_SALTS) == N_MINHASH


def minhash_cols(hashes_col):
    """N_MINHASH min-hash values from a pre-hashed word array (no shuffle,
    one md5 pass shared by all permutations)."""
    def _perm(c):
        return lambda h: h.bitwiseXOR(F.lit(c).cast("long"))

    return [
        F.array_min(F.transform(hashes_col, _perm(c))).alias(f"mh{s}")
        for s, c in enumerate(_XOR_SALTS)
    ]


def _sql_word_hashes(words_expr: str) -> str:
    return (
        f"list_transform({words_expr}, "
        f"w -> ('0x' || substr(md5(w || '#0'), 1, 15))::BIGINT)"
    )


def _sql_minhash(hashes_expr: str, salt_idx: int) -> str:
    c = _XOR_SALTS[salt_idx]
    return (
        f"list_aggregate(list_transform({hashes_expr}, "
        f"h -> xor(h, {c})), 'min')"
    )


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash, count(*) AS n_copies,
           min(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY md5(text)
    """,
    doc="exact dedup: hash-groupBy on content, deterministic survivor "
    "(min doc_id). One shuffle on the 128-bit content hash.",
)
def dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keep_doc_id"),
    )


@query(
    "dedup_exact_groups",
    oracle="""
    SELECT content_hash, n_copies, keep_doc_id FROM (
      SELECT md5(text) AS content_hash, count(*) AS n_copies,
             min(doc_id) AS keep_doc_id
      FROM documents GROUP BY md5(text))
    WHERE n_copies > 1
    """,
    doc="duplicate groups only (the rows exact dedup would drop).",
)
def dedup_exact_groups(spark, sf_dir):
    return dedup_exact(spark, sf_dir).filter(F.col("n_copies") > 1)


@query(
    "minhash_signatures",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, {_sql_word_hashes(_sql_words('text'))} AS wh
      FROM documents)
    SELECT doc_id,
           {", ".join(f"{_sql_minhash('wh', s)} AS mh{s}" for s in range(N_MINHASH))}
    FROM hashed
    """,
    doc="per-doc MinHash signature over the distinct-word set, computed as "
    "pure array expressions (no shuffle, no Python); one md5 per word, "
    "xor-permutations for the signature rows.",
)
def minhash_signatures(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    hashes = F.transform(_words(F.col("text")), _hasher(0))
    return docs.select("doc_id", *minhash_cols(hashes))


def _lsh_bands(sig_df: DataFrame) -> DataFrame:
    """Explode a signature table into (doc_id, band_idx, band_hash) rows.
    The band key is the plain joined minhash pair — hashing it again buys
    nothing (the groupBy key is already uniform) and md5 isn't free."""
    rows_per_band = N_MINHASH // N_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                ).alias("band_hash"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sig_df.select("doc_id", F.explode(bands).alias("band")).select(
        "doc_id", "band.band_idx", "band.band_hash"
    )


_SQL_REPS = (
    "SELECT min(doc_id) AS doc_id, any_value(text) AS text "
    "FROM documents GROUP BY md5(text)"
)
_SQL_HASHED = (
    f"SELECT doc_id, {_sql_word_hashes(_sql_words('text'))} AS wh FROM reps"
)
_SQL_SIG = (
    "SELECT doc_id, wh, "
    + ", ".join(f"{_sql_minhash('wh', s)} AS mh{s}" for s in range(N_MINHASH))
    + " FROM hashed"
)
_SQL_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, "
    f"concat_ws(',', mh{2 * b}::VARCHAR, mh{2 * b + 1}::VARCHAR) AS band_hash "
    f"FROM sig"
    for b in range(N_BANDS)
)


@query(
    "neardup_minhash_lsh",
    oracle=f"""
    WITH reps AS ({_SQL_REPS}),
    hashed AS ({_SQL_HASHED}),
    sig AS ({_SQL_SIG}),
    bands AS ({_SQL_BANDS}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT c.doc_a, c.doc_b,
             len(list_filter(wa.wh, x -> list_contains(wb.wh, x))) /
             (len(wa.wh) + len(wb.wh)
              - len(list_filter(wa.wh, x -> list_contains(wb.wh, x)))) AS jaccard
      FROM cand c
      JOIN hashed wa ON wa.doc_id = c.doc_a
      JOIN hashed wb ON wb.doc_id = c.doc_b)
    WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
    doc="near-dup pairs over exact-dedup REPRESENTATIVES (min doc_id per "
    "content hash): MinHash -> LSH banding -> bucket pair expansion -> "
    "word-set Jaccard verify on candidates only, computed on the hashed "
    "word sets (60-bit, collision odds ~n^2/2^60 — identical in both "
    "engines either way). Exact duplicates are the exact-dedup pass's job "
    "(dedup_exact) — feeding them to LSH creates quadratic buckets of "
    "identical docs, which at sf0.1 blew the pair count to 6.6M rows for "
    "zero information.",
)
def neardup_minhash_lsh(spark, sf_dir):
    raw_docs = load_table(spark, sf_dir, "documents")
    # ONE md5 pass: representatives' word sets are hashed once and that
    # array feeds every consumer — all 8 minhash permutations (xor-min) AND
    # both sides of the Jaccard verify. Round 1 ran 8 separate md5 passes
    # for the signature plus a string-array intersect for the verify; this
    # was 76% of the whole bench. localCheckpoint materializes the compact
    # (doc_id, int-array) table; at 100 TB swap it for a persistent
    # checkpoint (parquet/Iceberg) so executor loss doesn't recompute.
    hashed = (
        raw_docs.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"), F.any_value("text").alias("text"))
        .select(
            "doc_id",
            F.transform(_words(F.col("text")), _hasher(0)).alias("wh"),
        )
        .localCheckpoint(eager=True)
    )
    sig = hashed.select("doc_id", *minhash_cols(F.col("wh")))
    bands = _lsh_bands(sig)
    # two measured pathologies at sf0.1 steer this shape:
    #   (a) a naive band self-join evaluates the signature pipeline once
    #       PER SIDE (2x the query cost);
    #   (b) expanding each bucket's pairs inside one array row serializes
    #       the biggest near-dup family onto one task (skew: 126s vs 55s).
    # So: materialize the SMALL bucket table once, then a self-join over
    # the materialized buckets spreads pair expansion across tasks, with
    # AQE skew-split on top.
    ids = F.sort_array(F.collect_set("doc_id")).alias("ids")
    buckets = (
        bands.groupBy("band_idx", "band_hash")
        .agg(ids)
        .filter(F.size("ids") > 1)
        .localCheckpoint(eager=True)
    )
    a = buckets.select(
        "band_idx", "band_hash", F.explode("ids").alias("doc_a")
    )
    b = buckets.select(
        "band_idx", "band_hash", F.explode("ids").alias("doc_b")
    )
    cand = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    inter = F.size(F.array_intersect(F.col("wa"), F.col("wb")))
    union = F.size(F.col("wa")) + F.size(F.col("wb")) - inter
    return (
        cand.join(
            hashed.select(F.col("doc_id").alias("doc_a"), F.col("wh").alias("wa")),
            "doc_a",
        )
        .join(
            hashed.select(F.col("doc_id").alias("doc_b"), F.col("wh").alias("wb")),
            "doc_b",
        )
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def simhash_col(words_col):
    """SIMHASH_BITS-bit SimHash as a pure column expression.

    bit_i set iff more than half the document's distinct words have bit_i
    set in their stable hash (tie -> 0)."""
    hashes = F.transform(words_col, _hasher(0))

    def _bit_set(i: int):
        return lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1

    bits = [
        (
            F.when(
                2 * F.size(F.filter(hashes, _bit_set(i))) > F.size(hashes),
                F.lit(1).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            * F.lit(1 << i).cast("long")
        )
        for i in range(SIMHASH_BITS)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _sql_simhash(words_expr: str) -> str:
    hashes = (
        f"list_transform({words_expr}, "
        f"w -> ('0x' || substr(md5(w || '#0'), 1, 15))::BIGINT)"
    )
    terms = [
        f"(CASE WHEN 2 * len(list_filter({hashes}, h -> (h >> {i}) & 1 = 1))"
        f" > len({hashes}) THEN {1 << i} ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    ]
    return "(" + " + ".join(terms) + ")::BIGINT"


@query(
    "dedup_simhash",
    oracle=f"""
    SELECT doc_id, {_sql_simhash(_sql_words('text'))} AS simhash
    FROM documents
    """,
    doc="per-doc SimHash fingerprint (16-bit here; 64-bit at scale) as a "
    "pure column expression.",
)
def dedup_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", simhash_col(_words(F.col("text"))).alias("simhash")
    )


@query(
    "neardup_simhash",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_sql_simhash(_sql_words('text'))} AS simhash
      FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash::UBIGINT, b.simhash::UBIGINT))::BIGINT AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash::UBIGINT, b.simhash::UBIGINT)) <= 3
    """,
    doc="SimHash near-dup pairs (hamming <= 3). Spark side joins on 4-bit "
    "bands (pigeonhole: hamming<=3 over 4 bands forces one equal band) so "
    "it scales; the oracle is the O(n^2) definition.",
)
def neardup_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", simhash_col(_words(F.col("text"))).alias("simhash"))
    # 4 bands of 4 bits; any pair with hamming<=3 shares at least one band
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(F.col("simhash"), 4 * b)
                        .bitwiseAND(F.lit(0xF))
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("long")
    return (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )


@query(
    "neardup_word_jaccard",
    oracle=f"""
    WITH w AS (SELECT doc_id, lang, {_sql_words('text')} AS ws FROM documents)
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_filter(a.ws, x -> list_contains(b.ws, x))) /
             (len(a.ws) + len(b.ws)
              - len(list_filter(a.ws, x -> list_contains(b.ws, x)))) AS jaccard
      FROM w a JOIN w b ON a.lang = b.lang AND a.doc_id < b.doc_id)
    WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
    doc="word-set Jaccard near-dup within a blocking key (lang) — the "
    "n-gram Jaccard family with explicit candidate blocking.",
)
def neardup_word_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", "lang", _words(F.col("text")).alias("ws"))
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws")))
    union = F.size(F.col("a.ws")) + F.size(F.col("b.ws")) - inter
    return (
        w.alias("a")
        .join(
            w.alias("b"),
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
