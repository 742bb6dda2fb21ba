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
