"""Alternate codecs / sinks (SURVEY §1.5, §2.1).

TSV codec mirroring crypto-message's to_csv_string/from_csv_string:
  - the 5 identity columns (exchange, market_type, msg_type, pair, symbol)
    are NOT in the line — they ride in the partition path, exactly the
    reference's "to save disk space" trick (crypto-message/src/lib.rs:
    226-228); `write_tsv` materializes that layout with
    partitionBy(identity columns)
  - TradeMsg line = ts \\t side \\t price \\t round9(qb) \\t round9(qq)
    \\t round9(qc)|'' \\t trade_id \\t json   (lib.rs:228-245)
  - OrderBookMsg line = ts \\t snapshot \\t asks-json \\t bids-json
    \\t seq_id|'' \\t prev_seq_id|''   (lib.rs:338-349); levels serialize
    as JSON ARRAYS [price, qb, qq(, qc)] with quantities limited to 9
    decimals (crypto-message/src/order.rs:31-50)
  - round-trip: from_tsv_* reverses the codec (numeric text differences
    aside: the engine prints doubles via Java Double.toString, the
    reference via Rust's shortest-repr — both round-trip losslessly
    through their own readers, which is what the reference tests assert,
    lib.rs:478-572)

The compact sink's ahash(1,2,3,4) symbol interning is platform-unstable in
the reference itself (ignored test compact/message.rs:520-525); the engine
standardizes on xxhash64 (`compact_symbol_hash`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_msg_parser_spark import schemas
from crypto_msg_parser_spark.functions.scalar import round9

IDENTITY_COLS = ["exchange", "market_type", "msg_type", "pair", "symbol"]


def _num_str(col: Column) -> Column:
    """Double -> text without trailing '.0' on integral values (Rust's {}
    prints 7.0 as '7'; Java Double.toString prints '7.0')."""
    s = col.cast("string")
    return F.when(s.endswith(".0"), F.regexp_replace(s, "\\.0$", "")).otherwise(s)


def trade_tsv_line(df: DataFrame) -> Column:
    """crypto-message/src/lib.rs:228-245."""
    return F.concat_ws(
        "\t",
        F.col("timestamp").cast("string"),
        F.col("side"),
        _num_str(F.col("price")),
        _num_str(round9(F.col("quantity_base"))),
        _num_str(round9(F.col("quantity_quote"))),
        F.coalesce(_num_str(round9(F.col("quantity_contract"))), F.lit("")),
        F.col("trade_id"),
        F.col("json"),
    )


def _order_json(lv) -> Column:
    """[price, qb, qq(, qc)] with 9-decimal quantities (order.rs:31-50)."""
    head = F.concat_ws(
        ",",
        _num_str(lv["price"]),
        _num_str(round9(lv["quantity_base"])),
        _num_str(round9(lv["quantity_quote"])),
    )
    return F.concat(
        F.lit("["),
        F.when(
            lv["quantity_contract"].isNotNull(),
            F.concat(head, F.lit(","), _num_str(lv["quantity_contract"])),
        ).otherwise(head),
        F.lit("]"),
    )


def orderbook_tsv_line(df: DataFrame) -> Column:
    """crypto-message/src/lib.rs:338-349."""
    def side(col):
        return F.concat(
            F.lit("["),
            F.concat_ws(",", F.transform(F.col(col), _order_json)),
            F.lit("]"),
        )

    return F.concat_ws(
        "\t",
        F.col("timestamp").cast("string"),
        F.col("snapshot").cast("string"),
        side("asks"),
        side("bids"),
        F.coalesce(F.col("seq_id").cast("string"), F.lit("")),
        F.coalesce(F.col("prev_seq_id").cast("string"), F.lit("")),
    )


def write_tsv(df: DataFrame, path: str, kind: str = "trade") -> None:
    """Materialize the reference's disk layout: identity columns in the
    partition path, one TSV line per record in the data files. At scale
    this is ALSO the right physical design — the partition columns prune
    whole directories at read time."""
    line = trade_tsv_line(df) if kind == "trade" else orderbook_tsv_line(df)
    (
        df.select(*IDENTITY_COLS, line.alias("value"))
        .write.partitionBy(*IDENTITY_COLS)
        .mode("overwrite")
        .text(path)
    )


def read_tsv_trades(spark, path: str) -> DataFrame:
    """from_csv_string twin (lib.rs:246-281): identity columns recovered
    from the partition path, the rest split from the line."""
    raw = spark.read.text(path)
    v = F.split(F.col("value"), "\t")
    out = raw.select(
        *IDENTITY_COLS,
        v.getItem(0).cast("long").alias("timestamp"),
        F.col("value"),
    ).select(
        *IDENTITY_COLS,
        "timestamp",
        F.split("value", "\t").getItem(1).alias("side"),
        F.split("value", "\t").getItem(2).cast("double").alias("price"),
        F.split("value", "\t").getItem(3).cast("double").alias("quantity_base"),
        F.split("value", "\t").getItem(4).cast("double").alias("quantity_quote"),
        F.split("value", "\t").getItem(5).try_cast("double").alias("quantity_contract"),
        F.split("value", "\t").getItem(6).alias("trade_id"),
        F.split("value", "\t").getItem(7).alias("json"),
    )
    cols = [f.name for f in schemas.TRADE_SCHEMA.fields]
    return out.select(*cols)


def read_tsv_orderbooks(spark, path: str) -> DataFrame:
    """OrderBookMsg from_csv_string twin (crypto-message/src/lib.rs:
    351-382): identity columns recovered from the partition path; the
    6-field line splits into ts/snapshot/asks/bids/seq_id/prev_seq_id;
    levels parse from their JSON-array-of-arrays form ([price, qb, qq] or
    [price, qb, qq, qc] — a missing 4th element is a NULL
    quantity_contract, the reference's Option semantics); `json` is empty
    on read-back exactly as the reference sets it (lib.rs:380)."""
    raw = spark.read.text(path)
    v = F.split(F.col("value"), "\t")

    def levels(idx: int) -> Column:
        arr = F.from_json(v.getItem(idx), "array<array<double>>")
        return F.transform(
            arr,
            lambda x: F.struct(
                x.getItem(0).alias("price"),
                x.getItem(1).alias("quantity_base"),
                x.getItem(2).alias("quantity_quote"),
                # 3-element level -> NULL contract (ANSI mode errors on an
                # out-of-bounds [], get() tolerates it)
                F.get(x, 3).alias("quantity_contract"),
            ),
        )

    out = raw.select(
        *IDENTITY_COLS,
        v.getItem(0).cast("long").alias("timestamp"),
        F.lit("").alias("json"),
        v.getItem(1).cast("boolean").alias("snapshot"),
        levels(2).alias("asks"),
        levels(3).alias("bids"),
        F.nullif(v.getItem(4), F.lit("")).cast("long").alias("seq_id"),
        F.nullif(v.getItem(5), F.lit("")).cast("long").alias("prev_seq_id"),
    )
    cols = [f.name for f in schemas.ORDERBOOK_SCHEMA.fields]
    return out.select(*cols)


def compact_symbol_hash(symbol: Column) -> Column:
    """Compact-sink symbol interning (compact/message.rs:217-220). The
    reference's ahash(1,2,3,4) is platform-unstable (its own test is
    #[ignore]d, compact/message.rs:520-525); the engine standardizes on
    xxhash64 — which is also the shuffle-key hash, so downstream fan-out
    partitions without rehashing."""
    return F.xxhash64(symbol)


_QUANTITY_CHOICE = {
    "base": "quantity_base",
    "quote": "quantity_quote",
    "contract": "quantity_contract",
}


def compact_trade(df: DataFrame, quantity_choice: str = "base") -> DataFrame:
    """Compact TradeMsg projection (compact/message.rs:222-241): interned
    symbol hash + the ONE quantity field selected by QuantityChoice
    (Base/Quote/Contract) — the reference's disk-size trick of not storing
    the redundant quantity triple. quantity_contract is non-null for every
    non-spot market (parse invariant), matching the reference's unwrap."""
    q = _QUANTITY_CHOICE[quantity_choice]
    return df.select(
        "exchange",
        "market_type",
        "msg_type",
        compact_symbol_hash(F.col("symbol")).alias("symbol"),
        "timestamp",
        "price",
        F.col(q).alias("quantity"),
        "side",
    )


def compact_orderbook(df: DataFrame, quantity_choice: str = "base") -> DataFrame:
    """Compact OrderBookMsg projection (compact/message.rs:243-276): each
    level becomes (price, quantity) with the QuantityChoice field."""
    q = _QUANTITY_CHOICE[quantity_choice]

    def conv(lv):
        return F.struct(lv["price"].alias("price"), lv[q].alias("quantity"))

    return df.select(
        "exchange",
        "market_type",
        "msg_type",
        compact_symbol_hash(F.col("symbol")).alias("symbol"),
        "timestamp",
        "snapshot",
        F.transform("asks", conv).alias("asks"),
        F.transform("bids", conv).alias("bids"),
        "seq_id",
        "prev_seq_id",
    )


LAKE_PARTITIONS = ["exchange", "market_type", "msg_type", "dt"]


def write_parquet_lake(
    df: DataFrame,
    path: str,
    mode: str = "append",
    max_records_per_file: int = 5_000_000,
) -> None:
    """Columnar archive of parsed messages partitioned
    exchange/market_type/msg_type/UTC-day — the layout that keeps a
    100 TB archive's reads proportional to the slice queried: filters on
    the partition columns become PartitionFilters (whole directories
    pruned, no file outside the slice ever opened) and filters on data
    columns become parquet PushedFilters (row-group pruning). The day
    derives from the message timestamp (ms), so late or backfilled data
    lands in its EVENT-TIME partition regardless of arrival; `append`
    mode makes re-runs of an ingest epoch additive per partition.
    `maxRecordsPerFile` bounds file size so a hot (exchange, day) cell
    splits into parallel-scannable files instead of one giant one."""
    out = df.withColumn(
        "dt", F.to_date(F.timestamp_millis(F.col("timestamp")))
    )
    (
        out.write.partitionBy(*LAKE_PARTITIONS)
        .option("maxRecordsPerFile", max_records_per_file)
        .mode(mode)
        .parquet(path)
    )


def read_parquet_lake(spark, path: str) -> DataFrame:
    """Read the archive back; partition columns come back as directory
    columns, everything else from parquet. Filter on LAKE_PARTITIONS
    members to prune directories (assert-able via PartitionFilters in the
    scan plan)."""
    return spark.read.parquet(path)
