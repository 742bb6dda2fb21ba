"""Seed-table CSV readers — the reference's init-stage loads
(/root/reference/sec_dl/utils/init_tables.py:72-100, SURVEY S1/S2).

Always explicit schema (never inferSchema) for determinism; header + quoted
fields + UTF-8 BOM handled by the DataFrameReader options (the companies
seed has a BOM and quoted names with commas, FIXTURES.md §A).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sec_dl_spark import schemas


def load_companies_csv(spark: SparkSession, path: str) -> DataFrame:
    """companies.csv: permno,ticker,cik,business_name (4,116 rows in the
    reference universe)."""
    return (
        spark.read.schema(schemas.COMPANIES)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("encoding", "UTF-8")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def load_filing_types_csv(spark: SparkSession, path: str) -> DataFrame:
    """filing_types.csv: type_id,type,keep (type_id is an ordinary column in
    Spark — the reference's index_col, SURVEY S2)."""
    return (
        spark.read.schema(schemas.FILING_TYPES)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
