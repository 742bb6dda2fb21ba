"""Idempotent per-batch commit machinery shared by every foreachBatch sink
(dedup gates, incremental FTS index).

Both sinks of a gate are written with DYNAMIC partition overwrite scoped
to (`ingest_run`, `ingest_batch`): a retried batch replaces its own
earlier partial output instead of appending beside it. The run token is
derived from the checkpoint location — stable across restarts from the
same checkpoint, distinct per logical ingest run — because foreachBatch
batch_ids restart at 0 for every new checkpoint and would collide across
runs sharing one output.

Contract: wiping a checkpoint and re-running against the SAME unchanged
source is a safe replay (batch boundaries reproduce, partitions overwrite
in place). Starting a genuinely NEW ingest — different source files or
batching — requires a NEW checkpoint path: reusing the old path reuses
the old run token, and batches that no longer exist in the new run would
leave their old partitions in place beside the new ones. That contract is
ENFORCED, not just documented: every batch persists a per-(run, batch)
content fingerprint marker next to the sink, and a replayed batch under
the same run token fails fast if its fingerprint differs — the
wiped-checkpoint-over-a-changed-source hazard surfaces as an error
instead of silently leaving stale partitions beside new output, even
when the divergence starts after batch 0 (``check_source_marker``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_token(checkpoint_dir: str) -> str:
    """Stable identifier for a logical ingest run: survives query restarts
    (same checkpoint → same token) yet never collides across runs, unlike
    foreachBatch's batch_id which restarts at 0 per checkpoint. The 'r'
    prefix keeps the value non-numeric so readers that infer partition
    column types never parse an all-digit token as a number (which would
    collapse distinct tokens differing only in leading zeros)."""
    import hashlib

    return "r" + hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]


def commit_batch_partition(
    df: DataFrame, path: str, run: str, batch_id: int, *extra_cols: str
) -> None:
    """Idempotent per-batch commit: dynamic partition overwrite of this
    batch's own `ingest_run=…/ingest_batch=…` partition (plus
    ``extra_cols`` sub-partitions). A retried batch replaces its earlier
    partial write; every other (run, batch) partition is untouched."""
    (
        df.withColumn("ingest_run", F.lit(run))
        .withColumn("ingest_batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_run", "ingest_batch", *extra_cols)
        .parquet(path)
    )


def not_own_batch(run: str, batch_id: int):
    """Predicate excluding a batch's own (run, batch) partition from a
    historical read — a retry's earlier attempt may have landed registry
    rows for the very documents being re-processed."""
    return ~((F.col("ingest_run") == run) & (F.col("ingest_batch") == batch_id))


def check_source_marker(
    batch_df: DataFrame, sink_path: str, run: str, batch_id: int, id_col: str
) -> None:
    """Fail-fast guard for the replay contract, enforced on EVERY batch:
    computes an order-independent content fingerprint of the batch (count
    + sum of xxhash64 over ``id_col``) and compares it to the marker row
    this (run, batch) persisted beside the sink on its first run. A
    mismatch at ANY batch means the checkpoint was wiped and re-pointed at
    a CHANGED source while keeping the same run token — exactly the
    silent-stale-partition hazard the module docstring describes — so
    raise instead of degrading. Batch 0 catches a wholesale source swap;
    the per-batch rows extend the guard to sources that diverge only in
    later batches (identical batch 0, different tail).

    Residual scope limit: if the new source produces FEWER batches than
    the marker has rows for, the missing tail is never re-fingerprinted,
    so a replay that ends early leaves the old run's extra batch
    partitions in place undetected — that final hole is what the atomic
    commit-log sink (``atomic`` module) closes with an explicit manifest.

    Marker writes are idempotent per (run, batch) — dynamic overwrite of
    the batch's own partition — so a retry with an unchanged source
    re-verifies and rewrites the same row. Cost is one tiny agg job per
    batch over data the sink is about to process anyway."""
    spark = batch_df.sparkSession
    marker_path = f"{sink_path}_runs"
    # top 31 hash bits per row: the sum stays < 2^31 · rows, so it cannot
    # hit ANSI long overflow before ~2^32 rows in one batch, while staying
    # order-independent and sensitive to any id multiset change
    row = batch_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.shiftrightunsigned(F.xxhash64(F.col(id_col)), 33)), F.lit(0)
        ).alias("fp"),
    ).first()
    from sec_dl_spark.util import try_read_parquet

    existing = try_read_parquet(spark, marker_path)
    if existing is not None:
        if "ingest_batch" not in existing.columns:
            # Marker written by the earlier batch-0-only format (one row
            # per run, partitioned by ingest_run alone): its single row IS
            # the batch-0 fingerprint. Migrate the directory to the
            # per-batch layout in place — appending the new layout beside
            # the old one would mix partition depths, which Spark's
            # partition discovery rejects on the next read.
            rows = existing.select("n", "fp", "ingest_run").collect()
            jvm = spark._jvm
            jpath = jvm.org.apache.hadoop.fs.Path(marker_path)
            jpath.getFileSystem(spark._jsc.hadoopConfiguration()).delete(jpath, True)
            (
                spark.createDataFrame(
                    [(r["n"], r["fp"], r["ingest_run"]) for r in rows],
                    "n long, fp long, ingest_run string",
                )
                .withColumn("ingest_batch", F.lit(0))
                .write.mode("overwrite")
                .partitionBy("ingest_run", "ingest_batch")
                .parquet(marker_path)
            )
            existing = try_read_parquet(spark, marker_path)
        # cast the partition column rather than trusting inference: the
        # marker must read identically whether the session infers
        # partition types or keeps them as strings
        prior = (
            existing.where(
                (F.col("ingest_run") == run)
                & (F.col("ingest_batch").cast("long") == batch_id)
            )
            .select("n", "fp")
            .collect()
        )
        if prior and (prior[0]["n"] != row["n"] or prior[0]["fp"] != row["fp"]):
            raise ValueError(
                f"run token {run!r} at {sink_path!r} first committed batch "
                f"{batch_id} from a source with fingerprint (n={prior[0]['n']}, "
                f"fp={prior[0]['fp']}), but this batch {batch_id} has "
                f"(n={row['n']}, fp={row['fp']}): the checkpoint was wiped "
                "over a CHANGED source. Use a NEW checkpoint path (new run "
                "token) for a new ingest — replaying a stale token would "
                "leave the old run's extra batch partitions beside the new "
                "output."
            )
    (
        spark.createDataFrame([(row["n"], row["fp"])], "n long, fp long")
        .withColumn("ingest_run", F.lit(run))
        .withColumn("ingest_batch", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_run", "ingest_batch")
        .parquet(marker_path)
    )
