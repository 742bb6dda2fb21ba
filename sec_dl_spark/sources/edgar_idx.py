"""EDGAR master.idx ingestion — the reference's index-load stage
(/root/reference/sec_dl/utils/load_filings_idx.py:11-58) as declarative
Spark transforms.

Reference behavior reproduced:
- (year, quarter) URL grid from FILING_START_YR → today (:17-29);
- pipe-delimited parse with 9 preamble lines + a '----' separator row
  (:38-42, SURVEY S3/P2/P3);
- positional rename to (cik, business_name, type, date, path) (:42);
- utf-8 decode with errors ignored (:38, F12) — Spark's text reader
  replaces malformed bytes, same capability.

The preamble/separator drop is a *content* filter (rows must start with a
numeric CIK and a pipe) rather than positional skiprows — order-independent,
so it parallelizes over any number of idx files at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IDX_URL_FMT = "https://www.sec.gov/Archives/edgar/full-index/%d/QTR%d/master.idx"


def idx_url_grid(spark: SparkSession, start_year: int, end_year: int | None = None) -> DataFrame:
    """(year, qtr, url) download grid — cross join of years × quarters
    (reference :17-29; SURVEY J4/F8). end_year defaults to the current year.

    The current year is capped at the current quarter, mirroring the
    reference grid (load_filings_idx.py:26-28) — future-quarter master.idx
    URLs 404 and would sit in the pending/fetch path forever."""
    years = (
        spark.range(start_year, end_year + 1).select(F.col("id").alias("year"))
        if end_year is not None
        else spark.range(start_year, start_year + 1)
        .select(F.col("id").alias("year"))
        .select(
            F.explode(
                F.sequence(F.col("year"), F.year(F.current_date()).cast("long"))
            ).alias("year")
        )
    )
    quarters = spark.range(1, 5).select(F.col("id").alias("qtr"))
    # the quarter cap applies ONLY to the current year — a bare
    # `qtr <= current_quarter` disjunct would re-admit future-YEAR urls
    # (which 404 and sit in the pending path) when end_year is explicit
    not_future = (F.col("year") < F.year(F.current_date())) | (
        (F.col("year") == F.year(F.current_date()))
        & (F.col("qtr") <= F.quarter(F.current_date()))
    )
    return (
        years.crossJoin(F.broadcast(quarters))
        .where(not_future)
        .select("year", "qtr", F.format_string(IDX_URL_FMT, "year", "qtr").alias("url"))
        .orderBy("year", "qtr")
    )


def parse_master_idx(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Parse raw master.idx text file(s) → IDX_RECORD rows.

    Data rows are `CIK|Company Name|Form Type|Date Filed|Filename`; the
    9-line preamble and the `----` separator cannot match `^\\d+\\|`, so one
    filter replaces skiprows+drop-row-0 and stays correct when many files
    are globbed into one scan."""
    lines = spark.read.text(paths)
    parts = F.split(F.col("value"), r"\|", 5)
    return (
        lines.where(F.col("value").rlike(r"^\d+\|"))
        .select(
            # F.get / try_to_date, not getItem / to_date: ANSI mode makes
            # out-of-bounds access and malformed dates THROW; one truncated
            # row in a 30-year idx backfill must not kill the scan (the
            # reference tolerates it via errors='ignore', F12)
            F.get(parts, 0).cast("int").alias("cik"),
            F.get(parts, 1).alias("business_name"),
            F.get(parts, 2).alias("type"),
            F.try_to_date(F.get(parts, 3), "yyyy-MM-dd").alias("date"),
            F.get(parts, 4).alias("path"),
        )
    )
