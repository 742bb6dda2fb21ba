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
leave their old partitions in place beside the new ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_token(checkpoint_dir: str) -> str:
    """Stable identifier for a logical ingest run: survives query restarts
    (same checkpoint → same token) yet never collides across runs, unlike
    foreachBatch's batch_id which restarts at 0 per checkpoint."""
    import hashlib

    return hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]


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
