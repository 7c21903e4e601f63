from hivekudu_handler_spark.sources.table_store import TableStore  # noqa: F401
