from zvdb_spark.queries.registry import all_queries, oracle_sql, queries, register  # noqa: F401
