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
    """
    read_schema = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", multiline)
        .json(path)
        .cache()
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
