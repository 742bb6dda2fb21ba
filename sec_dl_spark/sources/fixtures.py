"""Parquet fixture scans (TESTDATA.md).

These are plain declarative `spark.read.parquet` scans so Catalyst performs
column pruning and predicate pushdown into the parquet reader — the manual
equivalents the reference hand-codes (`columns=['cik']`,
sec_dl/utils/load_filings_idx.py:33) come for free here (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sec_dl_spark.schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Filters/projections applied by callers are
    pushed down into this scan by Catalyst (verify with .explain:
    PushedFilters / ReadSchema)."""
    if name == "events":
        # The fixture generator has shipped `ts` two ways across rounds:
        # parquet TIMESTAMP(NANOS) (readable only as int64 nanos, see
        # session.RUNTIME_CONFS) and plain TIMESTAMP(MICROS)/NTZ. Adapt to
        # whichever landed so both generations of testdata load identically.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # int64 nanos → truncate to micros with integer division —
            # double division would lose precision at ~1.7e18 ns. DuckDB's
            # parquet reader truncates ns→us the same way, so oracle
            # comparisons line up exactly.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Naive micros: reinterpret AS UTC so downstream window/date
            # functions see the same TIMESTAMP type AND values as the nanos
            # path produced. A bare cast would read the NTZ value in the
            # session timezone — value-shifting on any session built
            # without session.tune() — so convert at the EXPRESSION level
            # instead: NTZ-to-NTZ subtraction is timezone-free, giving
            # micros-since-epoch that timestamp_micros reinterprets as an
            # instant. No session conf is read or mutated (ADVICE r4; a
            # conf set here would also leak a global behavior change out
            # of a loader, and being lazy it wouldn't even reliably cover
            # execution).
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr(
                        "timestampdiff(MICROSECOND, "
                        "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                    )
                ),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_fixtures(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in FIXTURE_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
