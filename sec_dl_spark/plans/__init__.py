from sec_dl_spark.plans.catalog import REGISTRY, QuerySpec, query  # noqa: F401
