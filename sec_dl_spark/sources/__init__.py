from sec_dl_spark.sources.fixtures import load_table, register_fixtures  # noqa: F401
