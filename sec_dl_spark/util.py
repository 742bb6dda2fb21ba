"""Small filesystem helpers shared across batch and streaming modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def try_read_parquet(spark: SparkSession, path: str) -> DataFrame | None:
    """Probe a parquet dataset by reading it — os.path/os.walk only see the
    driver's local disk and silently no-op on any remote filesystem.
    Returns None when the path is absent or holds no readable data."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None  # absent (or empty: no schema to infer)


def hadoop_delete(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` on whatever filesystem it lives on
    (no-op if absent) — driver-local shutil would miss remote schemes."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(p, True)
