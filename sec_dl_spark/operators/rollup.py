"""Incremental aggregate maintenance: mergeable partial rollups.

A 100 TB warehouse cannot recompute its rollup tables from scratch per
batch — it maintains PARTIAL aggregates (count / sum / min / max per
group) and folds each delta in, because those aggregates form a monoid:
merge(a, b) per key is (cnt_a+cnt_b, sum_a+sum_b, min(min_a,min_b),
max(max_a,max_b)), and non-mergeable stats derive at read time
(avg = sum/cnt). This is materialized-view maintenance re-expressed as
two Spark primitives: build = one groupBy over the delta; merge =
union + one groupBy over (existing ∪ delta-partial) — the second groupBy
touches ROLLUP-sized data (|groups|), never the history.

The reference recomputes its progress counts from full scans every time
(/root/reference/sec_dl/utils/monitor_progress.py); this module is the
scalable form of that capability (SURVEY §2.11).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Measure:
    """One measured column. The partial columns are named
    ``cnt_<col>``, ``sum_<col>``, ``min_<col>``, ``max_<col>``, and — with
    ``distinct=True`` — ``hll_<col>``, a DataSketches HLL binary sketch
    (count-distinct is NOT a monoid on exact values, but the sketch is:
    union merges losslessly, so incremental distinct counts cost the
    sketch's ~1% error instead of a full recompute)."""

    col: str
    distinct: bool = False
    # hist_bins > 0 adds ``hist_<col>``: fixed-bin counts over
    # [hist_lo, hist_hi) with under/overflow slots at index 0 and bins+1
    # (width_bucket layout). Unlike sketches this partial is EXACTLY
    # mergeable — element-wise sum — so incremental distribution tracking
    # is lossless at the chosen resolution.
    hist_bins: int = 0
    hist_lo: float = 0.0
    hist_hi: float = 1.0


def _partial_cols(m: Measure):
    cols = [
        F.count(F.col(m.col)).cast("long").alias(f"cnt_{m.col}"),
        F.sum(F.col(m.col)).alias(f"sum_{m.col}"),
        F.min(F.col(m.col)).alias(f"min_{m.col}"),
        F.max(F.col(m.col)).alias(f"max_{m.col}"),
    ]
    if m.distinct:
        cols.append(F.hll_sketch_agg(F.col(m.col)).alias(f"hll_{m.col}"))
    if m.hist_bins:
        wb = F.width_bucket(
            F.col(m.col), F.lit(m.hist_lo), F.lit(m.hist_hi), F.lit(m.hist_bins)
        )
        cols.append(
            F.array(
                *[
                    F.sum(F.when(wb == i, 1).otherwise(0)).cast("long")
                    for i in range(m.hist_bins + 2)
                ]
            ).alias(f"hist_{m.col}")
        )
    return cols


def _merge_cols(m: Measure):
    cols = [
        F.sum(F.col(f"cnt_{m.col}")).cast("long").alias(f"cnt_{m.col}"),
        F.sum(F.col(f"sum_{m.col}")).alias(f"sum_{m.col}"),
        F.min(F.col(f"min_{m.col}")).alias(f"min_{m.col}"),
        F.max(F.col(f"max_{m.col}")).alias(f"max_{m.col}"),
    ]
    if m.distinct:
        cols.append(F.hll_union_agg(F.col(f"hll_{m.col}")).alias(f"hll_{m.col}"))
    if m.hist_bins:
        zero = F.array(*[F.lit(0).cast("long")] * (m.hist_bins + 2))
        cols.append(
            F.aggregate(
                F.collect_list(F.col(f"hist_{m.col}")),
                zero,
                lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
            ).alias(f"hist_{m.col}")
        )
    return cols


def build_rollup(df: DataFrame, keys: list[str], measures: list[Measure]) -> DataFrame:
    """Partial-aggregate table of ``df``: one row per key combination with
    mergeable (cnt/sum/min/max) columns per measure. One shuffle on the
    keys; map-side combine applies."""
    aggs = [c for m in measures for c in _partial_cols(m)]
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(
    existing: DataFrame, delta: DataFrame, keys: list[str], measures: list[Measure]
) -> DataFrame:
    """Fold a delta partial into an existing partial: union + one groupBy
    re-aggregation with each column's own merge function. Keys present in
    only one side pass through (count/sum of the absent side contribute
    nothing; min/max ignore NULL), so no outer-join null plumbing."""
    aggs = [c for m in measures for c in _merge_cols(m)]
    return existing.unionByName(delta).groupBy(*keys).agg(*aggs)


def finalize(rollup: DataFrame, measures: list[Measure]) -> DataFrame:
    """Attach derived stats that are NOT mergeable but are exact functions
    of the partials (avg = sum/cnt; approx distinct from the HLL sketch).
    Read-time projection, zero jobs."""
    out = rollup
    for m in measures:
        out = out.withColumn(
            f"avg_{m.col}",
            F.col(f"sum_{m.col}") / F.col(f"cnt_{m.col}"),
        )
        if m.distinct:
            out = out.withColumn(
                f"approx_distinct_{m.col}",
                F.hll_sketch_estimate(F.col(f"hll_{m.col}")),
            ).drop(f"hll_{m.col}")
    return out
