"""Streaming form of the corpus build: the batch pipeline's STATELESS
stages (clean → quality gate → leakage-free split) applied to the
micro-batch stream, with the STATEFUL stage (cross-batch exact dedup)
delegated to the existing registry-backed gate.

This is deliberately a composition, not a reimplementation: Structured
Streaming runs stateless projections/filters on a stream exactly as on a
batch frame, so the prep stages are the same Column expressions
etl/corpus.py uses, and every cross-batch guarantee (idempotent
(run, batch) commits, per-batch source fingerprints, optional atomic/OCC
manifest log, registry reads excluding own batch) is inherited from
incremental_dedup_sink rather than re-proved. Near-dedup gating for
streams stays with the MinHash/winnow/semantic gates (streaming/dedup.py)
— chain them on the accepted output if the workload needs them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sec_dl_spark.etl.corpus import assign_split
from sec_dl_spark.functions import analysis as A
from sec_dl_spark.functions.text import clean_filing_text, tokenize
from sec_dl_spark.streaming.dedup import incremental_dedup_sink


def prepare_corpus_stream(
    docs_stream: DataFrame,
    min_quality: float = 0.25,
    text_col: str = "text",
) -> DataFrame:
    """Stateless corpus prep on a (streaming or batch) documents frame:
    clean the text, drop empty/low-quality docs, attach the content-hashed
    split column. Pure Column expressions — no state, no shuffle — so the
    same function serves readStream micro-batches and batch frames."""
    cleaned = docs_stream.withColumn(text_col, clean_filing_text(F.col(text_col)))
    toks = tokenize(F.col(text_col))
    return (
        cleaned.withColumn("_toks", toks)
        .where(F.size("_toks") > 0)
        .where(A.quality_score_of(F.col("_toks"), F.col(text_col)) >= F.lit(min_quality))
        .withColumn("split", assign_split(F.col(text_col)))
        .drop("_toks")
    )


def incremental_corpus_sink(
    docs_stream: DataFrame,
    accepted_path: str,
    registry_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.25,
    commit_mode: str = "overwrite",
):
    """readStream documents → clean/quality/split prep → cross-batch exact
    dedup against the persisted fingerprint registry → accepted parquet
    commits. The accepted rows carry the ``split`` column, so downstream
    train/val/test consumers partition-prune committed output directly.
    Commit semantics (idempotence, replay detection, atomic/OCC mode) are
    exactly incremental_dedup_sink's."""
    prepped = prepare_corpus_stream(docs_stream, min_quality=min_quality, text_col=text_col)
    return incremental_dedup_sink(
        prepped,
        accepted_path,
        registry_path,
        checkpoint_dir,
        id_col=id_col,
        text_col=text_col,
        commit_mode=commit_mode,
    )
