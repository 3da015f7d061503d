"""Shared parse-stage machinery (SURVEY.md §2.2-2.3).

Everything here is pure Column expressions — the parse stage is a per-row
flatMap with dictionary lookups, which in Spark is `from_json` + expression
math + `explode`, entirely inside whole-stage codegen. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crypto_msg_parser_spark.functions.scalar import round9

# market types (crypto-market-type enum, serialized snake_case; SURVEY §1.2)
SPOT = "spot"
LINEAR_FUTURE = "linear_future"
INVERSE_FUTURE = "inverse_future"
LINEAR_SWAP = "linear_swap"
INVERSE_SWAP = "inverse_swap"
QUANTO_FUTURE = "quanto_future"
QUANTO_SWAP = "quanto_swap"
EUROPEAN_OPTION = "european_option"
MOVE = "move"
BVOL = "bvol"

INVERSE = (INVERSE_SWAP, INVERSE_FUTURE)
LINEARISH = (LINEAR_SWAP, LINEAR_FUTURE, MOVE, BVOL)


def parsed_once(expr: Column, alias: str = "d"):
    """``df.transform(parsed_once(expr))``: materialize an expensive parse
    expression (a from_json envelope) through a Generate node so it is
    evaluated exactly once per row.

    A deterministic filter over ``withColumn(alias, expr)`` is pushed below
    the projection by Catalyst with alias substitution, re-evaluating the
    whole parse chain per reference — JsonToStructs is CodegenFallback, so
    neither whole-stage codegen nor subexpression elimination dedups it.
    Predicates that reference a generator's output cannot cross the
    Generate, so ``explode(array(expr))`` pins ONE evaluation.
    Measured on the binance trade path at sf0.1/32 cores: 5.1s -> 1.3s.
    ``array(expr)`` is never empty, so row count and null semantics are
    unchanged (a null parse yields one row with a null struct).
    """

    def _apply(df):
        return df.select("*", F.explode(F.array(expr)).alias(alias))

    return _apply


def explode_with_count(arr_expr: Column, alias: str = "d", n_alias: str = "n_items"):
    """``df.transform(explode_with_count(arr))``: fan out a parsed array
    with its element count available (for the whole-msg-vs-element json
    provenance choice), evaluating the array parse exactly ONCE.

    The prevailing ``withColumn(n_items, size(arr)) + explode(arr)`` shape
    evaluates the whole from_json chain twice per row (plus once more in
    any pushed-down filter). Wrapping the (count, items) struct in the
    same Generate barrier as parsed_once pins one evaluation; the explode
    then reads the materialized struct. Empty/null arrays drop the row —
    identical to exploding the raw array."""

    def _apply(df):
        # the struct holds ONLY the parsed array: __env is a Generate
        # output attribute, so the size() below reads materialized data —
        # putting size(arr_expr) inside the struct would re-evaluate the
        # whole from_json chain a second time per row
        env = F.struct(arr_expr.alias("__items"))
        return (
            df.select("*", F.explode(F.array(env)).alias("__env"))
            .withColumn(n_alias, F.size("__env.__items"))
            .select("*", F.explode("__env.__items").alias(alias))
            .drop("__env")
        )

    return _apply


def explode_env_with_count(
    env_expr: Column,
    items_field: str,
    keep=None,
    alias: str = "d",
    n_alias: str = "n_items",
):
    """``df.transform(explode_env_with_count(env, "result", keep=...))``:
    parse a WHOLE-message envelope exactly once, filter on its fields, and
    fan out ``env.<items_field>`` with its element count.

    This is the one-tokenization form of the channel-probe + extract +
    nested-from_json chain (3 JSON scans per row -> 1): the envelope sits
    behind the same Generate barrier as parsed_once, and ``keep`` runs on
    the materialized struct — a predicate on a generator output cannot be
    pushed below the Generate, so the parse is never re-evaluated. Rows
    whose payload does not match the envelope schema parse to nulls
    (PERMISSIVE) and are dropped by ``keep`` / the explode, matching the
    raw-text probe's routing behavior."""

    def _apply(df):
        wrapped = F.struct(env_expr.alias("__e"))
        out = df.select("*", F.explode(F.array(wrapped)).alias("__env"))
        if keep is not None:
            out = out.filter(keep(F.col("__env.__e")))
        return (
            out.withColumn(n_alias, F.size(f"__env.__e.{items_field}"))
            .select("*", F.explode(f"__env.__e.{items_field}").alias(alias))
            .drop("__env")
        )

    return _apply


def quantity_triple(
    market_type: Column, price: Column, quantity: Column, contract_value: Column
) -> Column:
    """(quantity_base, quantity_quote, quantity_contract) as a struct column.

    Reimplements calc_quantity_and_volume
    (crypto-msg-parser/src/exchanges/utils.rs:33-58) exactly, including the
    round9 placement:
      Spot:            (q,            round9(q*p),        NULL)
      Inverse*:        (q*cv/p,       q*cv,               q)
      Linear*/Move/BVOL:(round9(q*cv), round9(q*cv*p),    q)
      EuropeanOption:  (q*cv,         q*cv*p,             q)
    """
    qq_inv = quantity * contract_value
    qb_lin = quantity * contract_value
    qb = (
        F.when(market_type == SPOT, quantity)
        .when(market_type.isin(*INVERSE), qq_inv / price)
        .when(market_type.isin(*LINEARISH), round9(qb_lin))
        .when(market_type == EUROPEAN_OPTION, qb_lin)
    )
    qq = (
        F.when(market_type == SPOT, round9(quantity * price))
        .when(market_type.isin(*INVERSE), qq_inv)
        .when(market_type.isin(*LINEARISH), round9(qb_lin * price))
        .when(market_type == EUROPEAN_OPTION, qb_lin * price)
    )
    qc = F.when(market_type == SPOT, F.lit(None).cast("double")).otherwise(quantity)
    return F.struct(
        qb.alias("quantity_base"),
        qq.alias("quantity_quote"),
        qc.alias("quantity_contract"),
    )


def normalize_pair_with_quotes(symbol: Column, quotes: list[str]) -> Column:
    """BASEQUOTE -> BASE/QUOTE by quote-suffix matching.

    The reference iterates a HashSet (crypto-pair/src/exchanges/utils.rs:22-31)
    — nondeterministic on conflicting suffixes; the engine matches the
    LONGEST quote first, which agrees on every unambiguous symbol (all the
    reference's tests) and is deterministic on the rest.
    """
    # single anchored alternation: the leftmost match start that reaches $
    # is automatically the LONGEST matching suffix, and one compiled regex
    # per row keeps this inside whole-stage codegen (a per-quote when-ladder
    # was 34 regexes per row and throttled the parse stage at high core
    # counts)
    pattern = "(" + "|".join(sorted(quotes, key=len, reverse=True)) + ")$"
    quote = F.regexp_extract(symbol, pattern, 1)
    base = symbol.substr(F.lit(1), F.length(symbol) - F.length(quote))
    return F.when(
        (quote != "") & (F.length(symbol) > F.length(quote)),
        F.upper(F.concat(base, F.lit("/"), quote)),
    ).otherwise(F.lit(None).cast("string"))


def sort_book_sides(df, snapshot_col: str = "snapshot"):
    """Central post-pass (crypto-msg-parser/src/lib.rs:148-161): for
    snapshots, asks ascending / bids descending by price. Struct arrays sort
    lexicographically — price is the first field, so array_sort works."""
    is_snap = F.col(snapshot_col)
    return df.withColumn(
        "asks", F.when(is_snap, F.array_sort("asks")).otherwise(F.col("asks"))
    ).withColumn(
        "bids",
        F.when(is_snap, F.reverse(F.array_sort("bids"))).otherwise(F.col("bids")),
    )


def finalize(df, schema):
    """Project to the canonical column order of an output schema.

    Primitive columns are cast to the declared type; nested array/struct
    columns are selected as-built (casting would fight nullability flags)."""
    cols = []
    for f in schema.fields:
        c = F.col(f.name)
        if f.dataType.typeName() not in ("array", "struct", "map"):
            c = c.cast(f.dataType)
        cols.append(c.alias(f.name))
    return df.select(*cols)
