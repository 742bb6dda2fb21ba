"""Progress monitoring — the reference's polling monitor
(/root/reference/sec_dl/utils/monitor_scraper_progress.py:5-29) as a single
aggregate (and StreamingQuery.lastProgress when ingest runs as a stream)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scrape_progress(meta: DataFrame, text: DataFrame, rate_per_min: float | None = None) -> DataFrame:
    """(n_total, n_done, n_pending, pct_done[, eta_min]) in one pass.
    The reference recomputes this with a COUNT over `text IS NULL` every
    5 minutes; same predicate here (SURVEY A1/P5)."""
    done = text.where(F.col("text").isNotNull()).select("filing_id")
    joined = meta.select("filing_id").join(done, "filing_id", "left_outer").withColumn(
        "is_done", done["filing_id"].isNotNull()
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("is_done"), 1)).alias("n_done"),
    ).select(
        "n_total",
        "n_done",
        (F.col("n_total") - F.col("n_done")).alias("n_pending"),
        F.round(F.col("n_done") * 100.0 / F.greatest(F.col("n_total"), F.lit(1)), 2).alias("pct_done"),
    )
    if rate_per_min:
        agg = agg.withColumn("eta_min", F.round(F.col("n_pending") / rate_per_min, 1))
    return agg
