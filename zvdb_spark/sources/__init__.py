from zvdb_spark.sources.tables import TABLES, load, load_all, register_views  # noqa: F401
