"""Incremental exact dedup over a document stream — dedup each arriving
micro-batch against EVERYTHING already accepted, not just within the batch.

This is the shape a training-data ingest actually needs: a new crawl drop
must not re-admit content the corpus already holds, whichever run ingested
it. State is a persisted fingerprint registry (parquet, partitioned by
fingerprint prefix so the per-batch anti-join prunes directories); each
micro-batch:

  1. fingerprints its documents (md5 over the canonical token stream —
     the same fingerprint as batch dedup, functions/analysis.py),
  2. drops in-batch duplicates (first doc_id wins, deterministically),
  3. anti-joins the registry to drop historical duplicates,
  4. appends the surviving documents to the accepted sink and their
     fingerprints to the registry.

Only (fingerprint, doc_id) rows ever join or persist — text flows straight
to the accepted sink, so state size is O(distinct docs), not O(bytes).
Checkpointing makes batches effectively-once, exactly like the incremental
FTS index (streaming/index.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sec_dl_spark.functions.analysis import fingerprint

REGISTRY_PREFIX_BUCKETS = 64


def _fingerprints(batch_df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return batch_df.withColumn("_fp", fingerprint(F.col(text_col))).withColumn(
        "_fp_bucket", F.abs(F.hash("_fp")) % REGISTRY_PREFIX_BUCKETS
    )


def incremental_dedup_sink(
    docs_stream: DataFrame,
    accepted_path: str,
    registry_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """docs readStream → historical-exact-dedup → accepted parquet append.

    The registry holds (fingerprint, doc_id of the canonical copy); a
    batch's candidate fingerprints anti-join it (broadcast of the batch's
    distinct fingerprints against the bucket-pruned registry would be the
    100 TB refinement; at any scale the join is keyed by fingerprint, so
    it shuffles hashes, never text).
    """
    import os

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fp = _fingerprints(batch_df, id_col, text_col)
        # in-batch dedup: first id per fingerprint wins (deterministic)
        w = Window.partitionBy("_fp").orderBy(id_col)
        fresh = fp.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
        if os.path.isdir(registry_path) and any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(registry_path)
            for f in fs
        ):
            seen = spark.read.parquet(registry_path)
            fresh = fresh.join(seen.select("_fp"), "_fp", "left_anti")
        survivors = fresh.drop("_rn").localCheckpoint(eager=True)
        (
            survivors.drop("_fp", "_fp_bucket")
            .write.mode("append")
            .parquet(accepted_path)
        )
        (
            survivors.select("_fp", "_fp_bucket", F.col(id_col).alias("canonical_id"))
            .write.mode("append")
            .partitionBy("_fp_bucket")
            .parquet(registry_path)
        )

    return (
        docs_stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
