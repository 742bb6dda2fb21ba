"""Grouped-map and grouped-aggregate Python surface (SURVEY.md §2.10 —
the extended engine's applyInPandas slot for per-group analytics).

These are the escape hatches for per-group logic a window/agg expression
can't express (model scoring, per-group fitting). The examples shipped here
ARE window-expressible on purpose: that makes them oracle-checkable, so the
Arrow plumbing itself is verified against SQL, not just smoke-tested.
Arrow batches one group per call — groups must fit in executor memory, so
at 100 TB key choice matters (users: fine; one global group: never)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def zscore_per_group(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-group z-score via applyInPandas (grouped map: one pandas frame
    per key). Population std (ddof=0); groups with zero variance emit 0.0."""
    out_schema = T.StructType(
        [
            T.StructField(key, df.schema[key].dataType),
            T.StructField("event_id", T.LongType()),
            T.StructField("z", T.DoubleType()),
        ]
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value].astype("float64")
        std = v.std(ddof=0)
        z = (v - v.mean()) / std if std > 0 else v * 0.0
        return pd.DataFrame({key: pdf[key], "event_id": pdf["event_id"], "z": z})

    return df.groupBy(key).applyInPandas(norm, schema=out_schema)


@F.pandas_udf("double")
def geomean_udaf(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (Arrow-batched UDAF): geometric mean.
    import-free math so the closure ships clean to executors."""
    import numpy as np

    x = v.astype("float64")
    x = x[x > 0]
    if len(x) == 0:
        return float("nan")
    return float(np.exp(np.log(x).mean()))


PACKED_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("seq_id", T.LongType()),
    ]
)


def pack_sequences(
    docs_with_counts: DataFrame,
    budget: int = 512,
    key: str = "source",
) -> DataFrame:
    """Greedy sequence packing (the pretraining step that fills fixed
    token-budget training sequences with whole documents): within each
    group, walk docs in doc_id order and start a new sequence whenever the
    running total would exceed ``budget``. Documents longer than the budget
    get a sequence of their own.

    Inherently a stateful sequential scan (a bin boundary depends on every
    prior doc), so it is a grouped-map applyInPandas — the documented
    escape hatch — not a window expression. Groups are packing domains
    (source/shard), so state stays bounded per group.
    Returns (key, doc_id, n_tokens, seq_id) with seq_id dense from 0."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq, total, seq_ids = 0, 0, []
        for n in pdf["n_tokens"]:
            if total > 0 and total + n > budget:
                seq += 1
                total = 0
            total += n
            seq_ids.append(seq)
        pdf["seq_id"] = seq_ids
        return pdf[["source", "doc_id", "n_tokens", "seq_id"]]

    return docs_with_counts.groupBy(key).applyInPandas(pack, schema=PACKED_SCHEMA)


def assign_shards(
    df: DataFrame,
    n_shards: int,
    weight_col: str,
    order_cols: list[str] | None = None,
    shard_col: str = "shard",
) -> DataFrame:
    """Weight-balanced shard assignment (the training-output step that
    spreads documents across N output shards so every shard carries a
    near-equal token load): rank rows by descending weight, then deal them
    out boustrophedon (snake) — rank r goes to shard ``r mod N`` on even
    passes and ``N-1-(r mod N)`` on odd passes. With sorted weights this is
    the classic LPT-style greedy: each pass pairs the currently-largest
    remaining items against the shards that received the smallest items
    last pass, so shard totals converge instead of drifting.

    The rank comes from :func:`sec_dl_spark.operators.relational.global_rank`
    — the distributed range-partition + offset formulation, NOT a global
    window (which would collapse every row into one partition); the dealing
    itself is a codegen projection. No driver loop, no Python.
    Deterministic: ties broken by ``order_cols`` (required to make the
    rank total), so the assignment is oracle-checkable against a SQL
    ``row_number`` twin."""
    from sec_dl_spark.operators.relational import global_rank

    order = [F.col(weight_col).desc()] + [F.asc(c) for c in (order_cols or [])]
    ranked = global_rank(df, order, rank_col="_r")
    r = F.col("_r")
    pos = r % n_shards
    fwd = F.floor(r / n_shards) % 2 == 0
    shard = F.when(fwd, pos).otherwise(n_shards - 1 - pos)
    return ranked.withColumn(shard_col, shard.cast("int")).drop("_r")
