"""Relational operators Spark lacks as single primitives (SURVEY.md §2.4
"not present in the reference" list): as-of join and gap-based
sessionization. Both are single-shuffle compositions of existing DataFrame
ops — no UDFs, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the most recent right row with
    ``right.ts <= left.ts`` sharing the join key (DuckDB `ASOF LEFT JOIN` /
    pandas `merge_asof` semantics). ``tolerance_seconds`` bounds the
    lookback (pandas merge_asof tolerance; the batch twin of the
    stream-stream interval join's horizon): matches older than the
    tolerance yield NULLs. Timestamp ts columns only when tolerance is set.

    Implementation is the scalable union-sort-carry pattern, NOT a per-row
    lookup: tag both sides, union, and carry the latest right payload
    forward with last(ignorenulls) over an ordered window. Cost = one
    shuffle + sort on (key, ts) — identical shape to a sort-merge join, so
    it survives arbitrary scale; skewed keys split via AQE like any sort.

    Right rows sort before left rows at equal timestamps, so ties match
    (the <= in the contract). When several right rows share (key, ts), the
    window order tie-breaks on the payload struct itself, so the carried
    row is the maximum payload — deterministic run to run (last(ignorenulls)
    over an underspecified order would pick an arbitrary one).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    payload_fields = [F.col(c) for c in right_cols]
    if tolerance_seconds is not None:
        payload_fields.append(F.col(right_ts).alias("__rts"))
    payload = F.struct(*payload_fields)

    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType.simpleString()
        ).alias("_right"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("p")).schema["p"].dataType.simpleString()
        ).alias("_left"),
        payload.alias("_right"),
    )

    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag", F.col("_right").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .withColumn("_carried", F.last("_right", ignorenulls=True).over(w))
        .where(F.col("_tag") == 1)
    )
    if tolerance_seconds is not None:
        in_window = F.col("_carried.__rts").isNotNull() & (
            F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_carried.__rts"))
            <= int(tolerance_seconds * 1_000_000)
        )
        carried = carried.withColumn(
            "_carried", F.when(in_window, F.col("_carried"))
        )
    out = carried.select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_carried.{c}").alias(c + suffix if c in left.columns else c) for c in right_cols],
    )
    return out


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when the
    time since the previous event exceeds ``gap_seconds``. Classic
    lag + cumulative-sum sessionization — one shuffle on the key.

    Adds ``session_id`` (1-based per key). Integer microsecond arithmetic so
    batch and oracle agree bit-for-bit.
    """
    us = F.unix_micros(F.col(ts_col))
    extra = [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key).orderBy(us, *extra)
    gap_us = gap_seconds * 1_000_000
    new_session = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us), 1
    ).otherwise(0)
    w_acc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(new_session).over(w_acc).cast("long"))


def exact_percentiles(
    df: DataFrame,
    group_col: str,
    specs: dict[str, list[tuple[float, str]]],
) -> DataFrame:
    """Exact interpolated (quantile_cont / type-7) percentiles per group,
    as a distinct-value + cumulative-count plan instead of Spark's
    `percentile` TypedImperativeAggregate.

    Why: `percentile` buffers EVERY value per group in an interpreted
    aggregation buffer and merges per-group in a single task — the final
    merge is the serial cost center, and the buffer is O(group size). This
    formulation shuffles only (group, distinct value, count) — map-side
    combinable, fully codegen, merge parallel across distinct values — so
    it survives groups of any row count; cost scales with DISTINCT values
    per group, not rows.

    Plan: stack every value column into (group, which, value) rows — ONE
    count shuffle and ONE window pass cover all columns — then per
    distinct value compute its cumulative rank range [lo, hi] (+ lead for
    interpolation); the row whose range contains the target rank
    k = floor((n-1)·p) emits x_k + frac·(x_{k+1} − x_k); max() per group
    picks the single non-null. NULL values are excluded, matching the
    builtin's semantics.

    ``specs``: {value_col: [(p, out_name), ...]}. Returns one row per
    group with every out_name column (double).
    """
    cols = list(specs)
    stack_args = ", ".join(f"'{c}', cast({c} as double)" for c in cols)
    stacked = df.selectExpr(
        group_col, f"stack({len(cols)}, {stack_args}) as (which, val)"
    ).where(F.col("val").isNotNull())
    c = stacked.groupBy(group_col, "which", "val").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(group_col, "which").orderBy("val")
    wp = Window.partitionBy(group_col, "which")
    c = (
        c.withColumn("hi", F.sum("cnt").over(w) - 1)
        .withColumn("n", F.sum("cnt").over(wp))
        .withColumn("nxt", F.lead("val").over(w))
    )
    lo = F.col("hi") - F.col("cnt") + 1
    aggs = []
    for value_col, ps in specs.items():
        for p, name in ps:
            h = (F.col("n") - 1) * F.lit(float(p))
            k = F.floor(h)
            frac = h - k
            px = F.when(
                (F.col("which") == value_col) & (k >= lo) & (k <= F.col("hi")),
                F.when(
                    (k == F.col("hi")) & (frac > 0),
                    F.col("val") + frac * (F.col("nxt") - F.col("val")),
                ).otherwise(F.col("val")),
            )
            aggs.append(F.max(px).alias(name))
    return c.groupBy(group_col).agg(*aggs)
