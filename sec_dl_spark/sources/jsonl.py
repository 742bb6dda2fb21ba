"""JSONL corpus interchange: read/write newline-delimited JSON documents.

JSONL is the de-facto wire format of LLM training corpora (one JSON object
per line: text + metadata), so the engine must both ingest arbitrary
third-party JSONL dumps and emit shards other tools consume. The reference
has no streaming corpus format — its nearest analog is the ad-hoc
JSON/CSV handling of its seed loads (/root/reference/sec_dl/utils/
init_tables.py:72-100) — so this module is part of the §2.11 north-star
surface, not a port.

Scale design (100 TB):
- Always an EXPLICIT schema. ``inferSchema``/schema-of-JSON sampling reads
  the data twice and infers per-file variants that make union-by-name
  plans fragile; a corpus contract is a schema.
- PERMISSIVE parse with a ``_corrupt_record`` quarantine column: at
  billions of lines some WILL be malformed, and a hard-fail or a silent
  drop are both wrong. ``read_jsonl_corpus`` splits good rows from
  quarantined raw lines so the caller can count/route them; the bad-line
  fraction is a pipeline health metric.
- Compressed inputs (``.jsonl.gz``/``.zst`` where the codec is available)
  decode line-splitting-free through Spark's text codecs; gzip files are
  NOT splittable, so the read parallelism equals the file count — shard
  producers accordingly (``write_jsonl_shards`` does).
- Writes shard by TARGET BYTES, not a fixed file count: a fixed count
  under-parallelizes small runs and makes huge files at 100 TB. Estimated
  from a bounded sample of serialized row sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sec_dl_spark.session import pin

CORRUPT_COL = "_corrupt_record"

#: Default document-corpus contract (matches the documents fixture plus
#: the optional metadata LLM dumps commonly carry).
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    multiline: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) for a JSONL corpus at ``path``.

    ``good`` carries exactly ``schema``'s columns for rows that parsed;
    ``quarantine`` carries (``_corrupt_record``) raw lines that did not —
    malformed JSON, or JSON whose types contradict the schema. A row
    missing optional fields is NOT corrupt (nulls), matching JSONL
    convention.

    Both frames derive from ONE cached parse: Spark's PERMISSIVE-mode
    corrupt-column contract requires the corrupt column referenced and the
    parsed frame cached before filtering on it (the documented
    from-file-sources caveat — otherwise Spark re-parses and the filter
    sees only nulls).

    EAGER: the parse runs at call time (sec_dl_spark.session.pin), and the
    pinned blocks are executor-local by default — not recomputable under
    executor loss / preemption. Preemptible fleets: set
    ``spark.sec_dl_spark.reliableCheckpoint=true`` + ``setCheckpointDir``.
    """
    read_schema = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    # one materialization backs BOTH returned frames (good + quarantine),
    # so the permissive parse runs once; pin (checkpoint) rather than
    # cache so the blocks release with the frames instead of staying
    # CacheManager-pinned for the session (one leaked parse per call)
    raw = pin(
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", multiline)
        .json(path)
    )
    good = raw.where(F.col(CORRUPT_COL).isNull()).select(
        *[f.name for f in schema.fields]
    )
    quarantine = raw.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, quarantine


def jsonl_health(good: DataFrame, quarantine: DataFrame) -> dict:
    """Pipeline health counters for an ingest: rows kept, rows quarantined,
    bad-line fraction. Two bounded counts — call once per ingest batch."""
    n_good = good.count()
    n_bad = quarantine.count()
    total = n_good + n_bad
    return {
        "rows": n_good,
        "quarantined": n_bad,
        "bad_fraction": (n_bad / total) if total else 0.0,
    }


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    target_shard_bytes: int = 256 * 1024 * 1024,
    compression: str | None = "gzip",
    sample_rows: int = 2_000,
    mode: str = "overwrite",
) -> int:
    """Write ``df`` as JSONL shards sized ~``target_shard_bytes`` each
    (pre-compression). Returns the shard count used.

    Shard count = ceil(estimated serialized bytes / target): estimated
    from a bounded sample of ``to_json`` line lengths times the row count
    — two cheap jobs, no full serialization pass. Gzip output is not
    splittable, so the shard size IS the downstream read parallelism
    quantum; 256 MB default matches a comfortable executor task.
    ``repartition(n)`` round-robins rows so shards are even (a hash column
    would skew; evenness matters more than locality for interchange
    dumps)."""
    n_rows = df.count()
    if n_rows == 0:
        shards = 1
    else:
        sample = (
            df.limit(sample_rows)
            .select(
                (F.length(F.to_json(F.struct(*df.columns))) + 1).alias("n")
            )
            .agg(F.avg("n").alias("avg_n"))
            .collect()[0]["avg_n"]
        )
        est_bytes = int(sample * n_rows)
        shards = max(1, -(-est_bytes // target_shard_bytes))
    writer = df.repartition(shards).write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
    return shards


def parse_jsonl_lines(
    lines: DataFrame,
    schema: T.StructType = DOCUMENT_SCHEMA,
    line_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) from a frame of raw JSONL lines — the parse stage
    shared by the batch and streaming readers.

    Uses ``from_json`` with the corrupt-record column declared IN the
    parse schema, which reproduces the file source's PERMISSIVE semantics
    (malformed line → corrupt; type-mismatched field → corrupt with the
    parseable fields kept; missing optional field → null, NOT corrupt)
    while sidestepping the file source's restriction that a corrupt-column
    filter needs the parsed frame cached first — ``from_json`` is a plain
    projection, legal on streams, where ``.cache()`` is not."""
    read_schema = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = lines.select(
        F.col(line_col),
        F.from_json(
            F.col(line_col),
            read_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_rec"),
    )
    good = parsed.where(F.col(f"_rec.{CORRUPT_COL}").isNull()).select(
        *[F.col(f"_rec.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.where(F.col(f"_rec.{CORRUPT_COL}").isNotNull()).select(
        F.col(line_col).alias(CORRUPT_COL)
    )
    return good, quarantine


def stream_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming (good, quarantine) over a JSONL drop directory — the
    readStream twin of :func:`read_jsonl_corpus`, for feeding
    ``streaming/corpus.py:incremental_corpus_sink`` (good side) and a
    quarantine audit sink (bad side) as new dumps land.

    Reads through the TEXT source (newline framing IS the JSONL record
    framing; gzip decodes transparently) and parses with
    :func:`parse_jsonl_lines`, so the corrupt-record split works on the
    stream without the file-json source's cache-first restriction. Both
    returned frames derive from ONE source stream; attaching two sinks to
    them creates two independent queries with separate checkpoints, each
    tracking file progress on its own — file sources are replay-stable,
    so the two sides never disagree about a file's contents."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.load(path)
    return parse_jsonl_lines(lines, schema)
