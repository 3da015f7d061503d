"""TSV codec round-trip (crypto-message/src/lib.rs:478-572) and the
get_market_type classifier (crypto-pair per-exchange tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_msg_parser_spark import sinks
from crypto_msg_parser_spark.parser import binance
from crypto_msg_parser_spark.parser.market_type import get_market_type
from tests.parser_util import fixtures_df, load_fixtures


def test_trade_tsv_round_trip(spark, tmp_path):
    rows = [
        r
        for r in load_fixtures("binance", "trade")
        if r["market_type"] not in (None, "european_option")
    ]
    raw = fixtures_df(spark, rows)
    trades = binance.parse_trade(raw)
    path = str(tmp_path / "tsv")
    sinks.write_tsv(trades, path, kind="trade")
    back = sinks.read_tsv_trades(spark, path)
    # the codec rounds quantities to 9 decimals on write (lib.rs:232-240),
    # so compare against the rounded originals — the same equivalence the
    # reference round-trip test asserts (lib.rs:478-572)
    from crypto_msg_parser_spark.functions.scalar import round9

    rounded = trades.withColumns(
        {
            c: round9(F.col(c))
            for c in ("quantity_base", "quantity_quote", "quantity_contract")
        }
    )
    a = sorted(map(tuple, rounded.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b

    # identity columns live in the partition path, not the line
    import glob

    files = glob.glob(f"{path}/**/*.txt", recursive=True)
    assert files
    assert any("exchange=binance" in f and "msg_type=trade" in f for f in files)
    with open(files[0]) as fh:
        line = fh.readline().rstrip("\n")
    assert line.count("\t") == 7
    assert "binance" not in line.split("\t")[:7]  # only in json provenance


def test_orderbook_tsv_line_shape(spark):
    rows = [
        r
        for r in load_fixtures("binance", "l2_event")
        if r["market_type"] not in (None, "european_option")
    ]
    raw = fixtures_df(spark, rows)
    books = binance.parse_l2(raw)
    lines = books.select(sinks.orderbook_tsv_line(books).alias("line")).collect()
    for r in lines:
        parts = r["line"].split("\t")
        assert len(parts) == 6
        assert parts[1] in ("true", "false")
        assert parts[2].startswith("[") and parts[3].startswith("[")


_CASES = [
    # from crypto-pair per-exchange test asserts
    ("binance", "BTCUSD_PERP", "inverse_swap"),
    ("binance", "BTCUSDT_220930", "linear_future"),
    ("binance", "BTCUSD_220930", "inverse_future"),
    ("binance", "BTCUSDT", "linear_swap"),
    ("bitfinex", "tBTCF0:USTF0", "linear_swap"),
    ("bitfinex", "tBTCUST", "spot"),
    ("bitget", "BTCUSD_DMCBL_221230", "inverse_future"),
    ("bitget", "BTCPERP_CMCBL", "linear_swap"),
    ("bitget", "BTCUSDT_SPBL", "spot"),
    ("bitget", "cmt_btcusdt", "linear_swap"),
    ("bithumb", "BTC-USDT", "spot"),
    ("bitmex", "XBTUSD", "inverse_swap"),
    ("bitmex", "XBTM23", "inverse_future"),
    ("bitmex", "ETHUSDT", "linear_swap"),
    ("bitmex", "ETHUSD", "quanto_swap"),
    ("bitmex", "EURUSD", "quanto_swap"),  # FX swap
    ("bitmex", "LINKUSDT_USDT", "spot"),
    ("bitstamp", "btcusd", "spot"),
    ("bybit", "BTCUSDT", "linear_swap"),
    ("bybit", "BTCUSD", "inverse_swap"),
    ("bybit", "BTCUSDM23", "inverse_future"),
    ("coinbase_pro", "BTC-USD", "spot"),
    ("deribit", "BTC-PERPETUAL", "inverse_swap"),
    ("deribit", "BTC-30DEC22", "inverse_future"),
    ("deribit", "BTC-17JUN22-21000-P", "european_option"),
    ("dydx", "BTC-USD", "linear_swap"),
    ("ftx", "BTC-PERP", "linear_swap"),
    ("ftx", "BTC-MOVE-WK-0402", "move"),
    ("ftx", "BTC/USD", "spot"),
    ("ftx", "BTC-0624", "linear_future"),
    ("gate", "BTC_USD", "inverse_swap"),
    ("gate", "BTC_USDT", "linear_swap"),
    ("gate", "BTC_USD_20220603", "inverse_future"),
    ("gate", "BTC_USDT_20220930", "linear_future"),
    ("gate", "btc_eth", "spot"),
    ("huobi", "BTC-USD", "inverse_swap"),
    ("huobi", "BTC-USDT", "linear_swap"),
    ("huobi", "BTC_CQ", "inverse_future"),
    ("huobi", "btcusdt", "spot"),
    ("kraken", "PI_XBTUSD", "inverse_swap"),
    ("kraken", "FI_XBTUSD_220624", "inverse_future"),
    ("kraken", "XBT/USD", "spot"),
    ("kucoin", "XBTUSDM", "inverse_swap"),
    ("kucoin", "XBTUSDTM", "linear_swap"),
    ("kucoin", "XBTUSDCM", "linear_swap"),
    ("kucoin", "XBTMH21", "inverse_future"),
    ("kucoin", "ETH2-ETH", "spot"),
    ("mexc", "BTC_USD", "inverse_swap"),
    ("mexc", "BTC_USDT", "linear_swap"),
    ("okx", "BTC-USD-SWAP", "inverse_swap"),
    ("okx", "BTC-USDT-SWAP", "linear_swap"),
    ("okx", "BTC-USD-220624", "inverse_future"),
    ("okx", "BTC-USDT-220624", "linear_future"),
    ("okx", "BTC-USDT", "spot"),
    ("okx", "BTC-USD-220624-50000-C", "european_option"),
    ("zb", "btc_usdt", "spot"),
    ("zb", "BTC_USDT", "linear_swap"),
    ("zbg", "BTC_USD-R", "inverse_swap"),
    ("zbg", "BTC_USDT", "linear_swap"),
    ("zbg", "btc_usdt", "spot"),
]


def test_get_market_type(spark):
    df = spark.createDataFrame(
        [(e, s, exp) for e, s, exp in _CASES], "exchange string, symbol string, expected string"
    )
    got = df.select(
        "exchange",
        "symbol",
        "expected",
        get_market_type(F.col("exchange"), F.col("symbol")).alias("got"),
    ).collect()
    bad = [(r["exchange"], r["symbol"], r["expected"], r["got"]) for r in got if r["got"] != r["expected"]]
    assert not bad, bad


def test_get_market_type_is_spot_disambiguation(spark):
    df = spark.createDataFrame(
        [
            ("binance", "BTCUSDT", True, "spot"),
            ("binance", "BTCUSDT", False, "linear_swap"),
            ("gate", "BTC_USDT", True, "spot"),
            ("gate", "BTC_USDT", False, "linear_swap"),
            ("mexc", "BTC_USDT", True, "spot"),
            ("mexc", "BTC_USDT", False, "linear_swap"),
        ],
        "exchange string, symbol string, is_spot boolean, expected string",
    )
    got = df.select(
        "expected",
        get_market_type(
            F.col("exchange"), F.col("symbol"), F.col("is_spot")
        ).alias("got"),
    ).collect()
    assert all(r["got"] == r["expected"] for r in got), got


def test_compact_quantity_choice(spark):
    from crypto_msg_parser_spark.sinks import compact_orderbook, compact_trade
    from tests.parser_util import fixtures_df, load_fixtures
    from crypto_msg_parser_spark.parser import gate

    rows = [
        r
        for r in load_fixtures("gate", "trade")
        if r["variant"] == "gate" and r["market_type"] == "linear_swap"
    ]
    parsed = gate.parse_trade(fixtures_df(spark, rows))
    full = {r["trade_id"]: r.asDict() for r in parsed.collect()}
    for choice, field in [
        ("base", "quantity_base"),
        ("quote", "quantity_quote"),
        ("contract", "quantity_contract"),
    ]:
        got = compact_trade(parsed, choice).collect()
        assert got, choice
        for r in got:
            # symbol interned to a 64-bit hash; quantity is the chosen field
            assert isinstance(r["symbol"], int)
            assert "quantity_base" not in r.asDict()
        chosen = sorted(r["quantity"] for r in got)
        expect = sorted(v[field] for v in full.values())
        assert chosen == expect, choice

    books_rows = [
        r
        for r in load_fixtures("gate", "l2_event")
        if r["variant"] == "gate" and r["market_type"] == "linear_swap"
    ]
    books = gate.parse_l2(fixtures_df(spark, books_rows))
    cb = compact_orderbook(books, "contract").collect()
    assert cb
    for r in cb:
        for lv in r["asks"]:
            assert set(lv.asDict()) == {"price", "quantity"}


def test_orderbook_tsv_round_trip(spark, tmp_path):
    """Mirrors the reference's orderbook CSV round-trip test
    (crypto-message/src/lib.rs:555-572): write -> read back -> equal on
    every field, with json empty on read-back (lib.rs:380) and level
    quantities compared at the codec's 9-decimal write precision."""
    from crypto_msg_parser_spark.functions.scalar import round9

    rows = [
        r
        for r in load_fixtures("binance", "l2_event")
        if r["market_type"] not in (None, "european_option")
    ]
    raw = fixtures_df(spark, rows)
    books = binance.parse_l2(raw)
    path = str(tmp_path / "ob_tsv")
    sinks.write_tsv(books, path, kind="orderbook")
    back = sinks.read_tsv_orderbooks(spark, path)

    def norm_levels(col):
        return F.transform(
            F.col(col),
            lambda lv: F.struct(
                lv["price"].alias("price"),
                round9(lv["quantity_base"]).alias("quantity_base"),
                round9(lv["quantity_quote"]).alias("quantity_quote"),
                lv["quantity_contract"].alias("quantity_contract"),
            ),
        )

    expected = books.withColumn("json", F.lit("")).withColumns(
        {"asks": norm_levels("asks"), "bids": norm_levels("bids")}
    ).select(*back.columns)
    a = sorted(map(str, expected.collect()))
    b = sorted(map(str, back.collect()))
    assert a and a == b
    # same names and types; nullability legitimately differs (everything
    # parsed back from text is nullable)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in expected.schema.fields
    ]
