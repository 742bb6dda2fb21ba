"""Atomic batch commits via a rename-based manifest log.

The partition-overwrite commit (``commit.py``) is idempotent for RETRIES
of a single writer, but two CONCURRENT writers sharing a sink can
interleave their dynamic overwrites — the parquet committer is not
transactional across independent jobs, so reference behavior
(``/root/reference/sec_dl/utils/scrape_all_filings.py`` runs 20 workers
against one PostgreSQL table, where the database serializes writers)
needs an explicit commit protocol on a file sink. This module provides
the primitive Delta-/Iceberg-style logs are built on:

1. Each attempt writes its data to a WRITE-ONCE staging directory with a
   unique suffix — never overwritten, never read by anyone yet.
2. The commit is ONE atomic ``FileSystem.rename`` of a small manifest
   file into ``_commits/<run>-<batch>.json``. Rename-if-absent is the
   arbiter: exactly one writer per (run, batch) wins; the loser's rename
   returns false and it deletes its own staging directory — no partial
   state, no interleaving, nothing to repair.
3. Readers list ``_commits/`` and read ONLY published directories, so
   half-written staging output is invisible by construction.

A lost commit is not an error for idempotent producers (same (run,
batch) content): the data is already published by the winner. Producers
with diverging content for the same (run, batch) are the replay hazard
``check_source_marker`` guards; here the first writer simply wins.

Scope: rename atomicity holds on HDFS and POSIX local filesystems.
Object stores without atomic rename (S3) need a coordination service or
a full table format (Delta/Iceberg) — the documented trade-off carried
from the round-3 design note, now closed for every filesystem Spark's
default committers target. This layer serializes PHYSICAL commits of
one (run, batch); two logically distinct runs racing to admit the same
content into one corpus additionally need optimistic conflict detection
at the registry level (re-validate the anti-join against commits that
landed while the batch was in flight) — Delta's ConcurrentAppend model,
noted here as the boundary of what file-level atomicity can give.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    """(Hadoop FileSystem for ``path``, Path constructor)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm.org.apache.hadoop.fs.Path


def atomic_commit_batch(
    df: DataFrame, path: str, run: str, batch_id: int
) -> bool:
    """Publish ``df`` as the committed output of (run, batch). Returns
    True if this attempt won the commit, False if another writer already
    published this (run, batch) — in which case this attempt's staging
    output is deleted and the sink is untouched.

    The data write targets a unique staging dir (no two attempts ever
    share one), so the only contended operation is the manifest rename —
    atomic on HDFS/POSIX — and a reader can never observe a torn batch.
    """
    return atomic_commit_outputs({"data": (df, path)}, path, run, batch_id)


def atomic_commit_outputs(
    outputs: dict[str, tuple[DataFrame, str]],
    log_path: str,
    run: str,
    batch_id: int,
    partition_by: dict[str, list[str]] | None = None,
) -> bool:
    """Publish SEVERAL named outputs as ONE atomic (run, batch) commit —
    the multi-sink form a dedup gate needs: the accepted documents and
    their registry rows become visible together or not at all, so the
    'batch dies between the two writes' window of the partition-overwrite
    commit does not exist here, and a zombie writer's late duplicate
    commit loses the manifest rename cleanly instead of interleaving.

    ``outputs`` maps name → (DataFrame, target root); each stages under
    its own root (data stays local to its sink) while the single manifest
    lives under ``log_path``/_commits. ``partition_by`` optionally keys a
    physical layout per output (e.g. the registry's fingerprint-bucket
    dirs) — staging preserves it, so committed reads prune the same way
    a direct write would."""
    spark = next(iter(outputs.values()))[0].sparkSession
    fs, Path = _fs(spark, log_path)
    attempt = uuid.uuid4().hex[:12]
    staged: dict[str, str] = {}
    for name, (df, root) in outputs.items():
        staging = f"{root}/_staging/{run}-{batch_id}-{attempt}/{name}"
        writer = df.write.mode("error")
        cols = (partition_by or {}).get(name)
        if cols:
            writer = writer.partitionBy(*cols)
        writer.parquet(staging)
        staged[name] = staging

    manifest = json.dumps(
        {"dirs": staged, "ingest_run": run, "ingest_batch": batch_id}
    )
    tmp = Path(f"{log_path}/_staging/.manifest-{run}-{batch_id}-{attempt}.json")
    out = fs.create(tmp, True)
    try:
        out.write(manifest.encode("utf-8"))
    finally:
        out.close()

    commits_dir = Path(f"{log_path}/_commits")
    fs.mkdirs(commits_dir)
    dst = Path(f"{log_path}/_commits/{run}-{batch_id}.json")
    won = fs.rename(tmp, dst)
    if not won:
        # another writer holds this (run, batch): withdraw this attempt
        for name, staging in staged.items():
            sfs, SPath = _fs(spark, staging)
            sfs.delete(SPath(f"{outputs[name][1]}/_staging/{run}-{batch_id}-{attempt}"), True)
        fs.delete(tmp, False)
    return bool(won)


def is_committed(spark: SparkSession, path: str, run: str, batch_id: int) -> bool:
    """True if some writer already published (run, batch) — lets a
    restarted producer skip the data write entirely."""
    fs, Path = _fs(spark, path)
    return bool(fs.exists(Path(f"{path}/_commits/{run}-{batch_id}.json")))


def read_committed(
    spark: SparkSession, path: str, name: str = "data"
) -> DataFrame | None:
    """Union of all PUBLISHED batches of the ``name`` output
    (manifest-listed directories only — staging output is invisible),
    with ingest_run/ingest_batch columns restored from the manifests.
    None if nothing has committed yet."""
    from pyspark.sql import functions as F

    fs, Path = _fs(spark, path)
    commits = Path(f"{path}/_commits")
    if not fs.exists(commits):
        return None
    manifests = [
        json.loads(bytes(_read_small_file(fs, st.getPath())).decode("utf-8"))
        for st in fs.listStatus(commits)
        if st.getPath().getName().endswith(".json")
    ]
    dirs = [
        (m["dirs"][name], m["ingest_run"], m["ingest_batch"])
        for m in manifests
        if name in m.get("dirs", {})
    ]
    if not dirs:
        return None
    parts = [
        spark.read.parquet(d)
        .withColumn("ingest_run", F.lit(run))
        .withColumn("ingest_batch", F.lit(batch))
        for d, run, batch in dirs
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _read_small_file(fs, jpath) -> bytearray:
    """Read a (tiny) manifest through the Hadoop stream API."""
    stream = fs.open(jpath)
    try:
        buf = bytearray()
        while True:
            b = stream.read()
            if b < 0:
                break
            buf.append(b)
        return buf
    finally:
        stream.close()
