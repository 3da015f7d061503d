from crypto_msg_parser_spark.sources.testdata import load_table  # noqa: F401
