"""Streaming maintenance of a partial-aggregate rollup (merge-on-read).

Composes operators/rollup.py with the micro-batch loop: each batch writes
its OWN partial-rollup partition (``run=<run>/batch=<id>`` — a retry
overwrites the same directory, so commits are idempotent without any
read-modify-write race), and the READ path merges all partials with one
rollup-sized aggregation. This is the same append-only + merge-on-read
discipline the cross-batch dedup registry uses (streaming/dedup.py), for
the same reason: per-batch state mutation under overwrite semantics is
where streaming sinks corrupt themselves. ``compact_rollup`` folds the
accumulated partitions back to one when |batches| makes the read-side
merge noticeable — the fold reads rollup-sized data only.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from sec_dl_spark.operators.rollup import Measure, build_rollup, merge_rollups


def incremental_rollup_sink(
    stream: DataFrame,
    rollup_path: str,
    checkpoint_dir: str,
    keys: list[str],
    measures: list[Measure],
    run: str | None = None,
):
    """availableNow foreachBatch sink: per micro-batch, aggregate the
    batch to its partial rollup and publish it as its own partition.
    Returns the started StreamingQuery."""
    run = run or uuid.uuid4().hex[:12]

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = build_rollup(batch_df, keys, measures)
        part.write.mode("overwrite").parquet(
            f"{rollup_path}/run={run}/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(
    spark: SparkSession,
    rollup_path: str,
    keys: list[str],
    measures: list[Measure],
) -> DataFrame:
    """Merged view over every published partial partition: one groupBy
    over rollup-sized data. Pass the result to operators/rollup.finalize
    for derived stats."""
    parts = spark.read.parquet(rollup_path).drop("run", "batch")
    # merge_rollups is union+agg; with the union already materialized as
    # one frame, a single re-aggregation is the same algebra
    return merge_rollups(parts.limit(0), parts, keys, measures)


def compact_rollup(
    spark: SparkSession,
    rollup_path: str,
    keys: list[str],
    measures: list[Measure],
) -> None:
    """Fold all partitions into a single ``run=__compact__/batch=0``
    partition. Two-phase: write the fold to a fresh run directory FIRST,
    then delete the superseded partitions — a crash between the phases
    leaves extra partials whose re-merge is idempotent (merging a fold
    with its own inputs would double-count, so the fold is written under
    a run name the reader treats like any other and the inputs are
    removed before the function returns; a crash mid-delete requires
    finishing the delete, never recomputing)."""
    from py4j.java_gateway import java_import

    jvm = spark.sparkContext._jvm
    java_import(jvm, "org.apache.hadoop.fs.Path")
    fs = jvm.Path(rollup_path).getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())

    old_runs = [
        f.getPath()
        for f in fs.listStatus(jvm.Path(rollup_path))
        if f.isDirectory() and f.getPath().getName().startswith("run=")
    ]
    folded = read_rollup(spark, rollup_path, keys, measures)
    staging = f"{rollup_path}/__fold_tmp__"
    folded.write.mode("overwrite").parquet(staging)
    for p in old_runs:
        fs.delete(p, True)
    fs.mkdirs(jvm.Path(f"{rollup_path}/run=__compact__"))
    fs.rename(jvm.Path(staging), jvm.Path(f"{rollup_path}/run=__compact__/batch=0"))


def incremental_hll_sink(
    stream: DataFrame,
    sketch_path: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
    run: str | None = None,
):
    """Streaming maintenance of DISTINCT counts via mergeable HLL
    sketches — the COUNT(DISTINCT) twin of ``incremental_rollup_sink``
    (sums/mins merge trivially; distincts need a sketch to merge without
    re-reading raw data). Per micro-batch: one ``hll_sketch_agg`` per key
    group, published as that batch's own ``run=<run>/batch=<id>``
    partition (idempotent overwrite-on-retry, same append-only
    discipline). Batch partials are key-cardinality-sized binaries —
    never user-cardinality-sized — so a day of batches stays tiny and
    the read-side union is exact-merge cheap."""
    from pyspark.sql import functions as F

    run = run or uuid.uuid4().hex[:12]

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.groupBy(*keys).agg(
            F.hll_sketch_agg(value_col).alias("sk")
        )
        part.write.mode("overwrite").parquet(
            f"{sketch_path}/run={run}/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_hll_rollup(
    spark: SparkSession,
    sketch_path: str,
    keys: list[str],
    estimate_col: str = "n_distinct",
) -> DataFrame:
    """Merged distinct-count view over every published sketch partition:
    ``hll_union_agg`` per key, then the estimate. Identical to sketching
    the raw union directly (DataSketches HLL is deterministic per value
    set), which the cross-batch pytest pins."""
    from pyspark.sql import functions as F

    parts = spark.read.parquet(sketch_path).drop("run", "batch")
    return parts.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(estimate_col)
    )


def read_hll_window_rollup(
    spark: SparkSession,
    sketch_path: str,
    day_col: str = "day",
    window_days: int = 7,
    estimate_col: str = "n_distinct",
) -> DataFrame:
    """Trailing-window distinct counts off per-day HLL partials: each
    observed day merges the sketches of its last ``window_days`` days
    (inclusive) — the at-scale form of a DAU→WAU/MAU dashboard, where
    the exact user-day explode (plans/streaming_batch.py:
    events_dau_wau_mau documents the swap) is replaced by
    day-cardinality-sized sketch unions. The spine is the observed
    days; the window join fans each day's sketch onto ≤ window_days
    spine days (days × window rows total), then one ``hll_union_agg``
    per spine day. Repeat users across days/batches collapse inside
    the union — the property the cross-batch pytest pins against the
    exact distinct."""
    from pyspark.sql import functions as F

    parts = spark.read.parquet(sketch_path).drop("run", "batch")
    # one sketch per day first (several batches may share a day)
    daily = parts.groupBy(day_col).agg(F.hll_union_agg("sk").alias("sk"))
    fan = daily.select(
        F.col("sk"),
        F.explode(
            F.expr(f"sequence({day_col}, date_add({day_col}, {window_days - 1}))")
        ).alias("sday"),
    )
    spine = daily.select(F.col(day_col).alias("sday"))
    return (
        fan.join(spine, "sday")
        .groupBy("sday")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(estimate_col))
        .withColumnRenamed("sday", day_col)
    )


def incremental_cms_sink(
    stream: DataFrame,
    sketch_path: str,
    checkpoint_dir: str,
    col: str,
    width: int = 256,
    depth: int = 4,
    run: str | None = None,
):
    """Streaming maintenance of point-frequency estimates via the
    engine-portable count-min sketch (operators/sketch.py:cms_build) —
    the "how OFTEN is this key arriving" twin of ``incremental_hll_sink``
    (which answers "how many DISTINCT"). Per micro-batch: one cms_build
    over the batch (≤ depth·width counter rows, whatever the batch
    size), published as that batch's own ``run=<run>/batch=<id>``
    partition. The run id derives from the checkpoint path (the ivm.py
    convention), so a restarted job re-publishing a replayed batch
    OVERWRITES its own partition instead of double-counting; the read
    side sums partials by (row, slot) — the CM sketch is a counter
    monoid, so batching is invariant by algebra and estimates from the
    merged sketch equal a from-scratch build over everything ingested
    (pinned by pytest).

    CAUTION — unlike the sibling ``incremental_hll_sink`` (HLL union is
    idempotent, so duplicated runs merge harmlessly), a counter monoid
    double-counts across runs: reprocessing the same source with a FRESH
    checkpoint dir (or a new explicit ``run``) publishes a new
    ``run=<id>`` partition while the old run's partials remain.
    ``read_cms_sketch`` therefore refuses a multi-run sketch_path by
    default — clear ``sketch_path`` whenever the checkpoint is reset, or
    read a single run via its ``run=`` argument."""
    import hashlib

    from pyspark.sql import functions as F  # noqa: F401 — parity w/ siblings

    from sec_dl_spark.operators.sketch import cms_build

    run = run or hashlib.sha256(checkpoint_dir.encode()).hexdigest()[:12]

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = cms_build(batch_df, col, width=width, depth=depth)
        part.write.mode("overwrite").parquet(
            f"{sketch_path}/run={run}/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cms_sketch(
    spark: SparkSession,
    sketch_path: str,
    run: str | None = None,
    allow_multiple_runs: bool = False,
) -> DataFrame:
    """Merged (row, slot, cnt) view over the published CMS partials —
    one groupBy over ≤ batches·depth·width counter rows. Feed to
    operators/sketch.py:cms_estimate for point queries.

    Counts are NOT idempotent across runs (unlike the HLL sibling):
    a reprocessed source under a fresh checkpoint publishes a second
    ``run=<id>`` partition and a naive sum would double-count every
    key. So: ``run=`` reads exactly that run's partials; with no run
    given, a sketch_path holding more than one run raises instead of
    silently over-counting. Pass ``allow_multiple_runs=True`` only when
    the runs are KNOWN disjoint sources (deliberate multi-stream merge,
    where summing across runs is the intended total)."""
    from pyspark.sql import functions as F

    if run is not None:
        parts = spark.read.parquet(f"{sketch_path}/run={run}").drop("batch")
    else:
        parts = spark.read.parquet(sketch_path)
        if not allow_multiple_runs:
            runs = [r["run"] for r in parts.select("run").distinct().collect()]
            if len(runs) > 1:
                raise ValueError(
                    f"CMS sketch at {sketch_path!r} holds {len(runs)} runs "
                    f"({sorted(map(str, runs))}); summing across runs double-"
                    "counts every key reprocessed under a reset checkpoint. "
                    "Clear the sketch_path when resetting the checkpoint, "
                    "read one run via run=..., or pass "
                    "allow_multiple_runs=True for a deliberate merge of "
                    "disjoint sources."
                )
        parts = parts.drop("run", "batch")
    return parts.groupBy("row", "slot").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
