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
