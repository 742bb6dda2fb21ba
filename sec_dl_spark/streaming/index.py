"""Incremental inverted-index maintenance over a document stream — the
engine-native analog of the reference's "near real time full text search"
(README.md:7): there, a tsvector trigger indexes each filing as its text
lands (init_tables.py:59-67); here, each micro-batch's postings append to
the persisted token-bucket index, so a search sees a document one batch
after it arrives.

Append-only by design: new documents add postings; amended documents are
deduplicated upstream (watermark + dropDuplicates on the stream) before
they reach the index. A full rebuild (operators/fts.py:write_index) stays
the compaction path, exactly like reindexing in the reference's PG."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sec_dl_spark.operators.fts import build_inverted_index


def incremental_index_sink(
    docs_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
):
    """docs readStream → per-batch postings appended to the bucketed index.

    Each batch: tokenize + posexplode + per-doc position lists (the same
    build as the batch index), bucket by token hash, append. Checkpointing
    makes delivery effectively-once — a replayed batch re-appends, which
    dedup at read time would mask; in practice the checkpoint prevents it.
    """

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        postings = build_inverted_index(batch_df, id_col=id_col, text_col=text_col)
        (
            postings.withColumn("token_bucket", F.abs(F.hash("token")) % buckets)
            .write.mode("append")
            .partitionBy("token_bucket")
            .parquet(index_path)
        )

    return (
        docs_stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
