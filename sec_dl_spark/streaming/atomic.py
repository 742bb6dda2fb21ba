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
    entries = [
        (st.getPath().getName(), json.loads(bytes(_read_small_file(fs, st.getPath())).decode("utf-8")))
        for st in fs.listStatus(commits)
        if st.getPath().getName().endswith(".json")
    ]
    checkpoints = [(f, m) for f, m in entries if "checkpoint" in m]
    covered: set[str] = set()
    parts = []
    if checkpoints:
        # latest checkpoint supersedes everything it covers; its data
        # already carries the ingest_run/ingest_batch columns
        _, latest = max(checkpoints, key=lambda fm: fm[1]["checkpoint"])
        covered = set(latest["covers"])
        if name in latest.get("dirs", {}):
            parts.append(spark.read.parquet(latest["dirs"][name]))
    for fname, m in entries:
        if "checkpoint" in m or fname in covered or name not in m.get("dirs", {}):
            continue
        parts.append(
            spark.read.parquet(m["dirs"][name])
            .withColumn("ingest_run", F.lit(m["ingest_run"]))
            .withColumn("ingest_batch", F.lit(m["ingest_batch"]))
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_committed(spark: SparkSession, log_path: str) -> bool:
    """Checkpoint the manifest log (the Delta-checkpoint analog): rewrite
    every currently-committed batch of every output into one consolidated
    directory per output, publish a single ``checkpoint-<g>.json``
    manifest that supersedes the covered manifests, then delete the
    covered manifests and their now-redundant staged data. Without this,
    a long-running sink's readers union one parquet read per batch ever
    committed — compaction restores O(1) manifests + O(outputs) reads.

    Safe under the same rename arbitration as batch commits: generation
    ``g`` increments per compaction, two racing compactors collide on the
    ``checkpoint-<g>.json`` rename and the loser withdraws. A writer
    committing a NEW batch during compaction is untouched — its manifest
    is not in ``covers`` and stays visible beside the checkpoint. Returns
    False if this attempt lost the race (state unchanged).

    Vacuum caveat (same as any table format): covered data dirs are
    deleted immediately after the checkpoint publishes, so a reader that
    listed manifests BEFORE the compaction and reads data AFTER it can
    miss files — long-lived readers should re-list, or deletion can be
    deferred by the caller."""
    from pyspark.sql import functions as F  # noqa: F401 — parity with read path

    fs, Path = _fs(spark, log_path)
    commits = Path(f"{log_path}/_commits")
    if not fs.exists(commits):
        return False
    entries = [
        (st.getPath().getName(), json.loads(bytes(_read_small_file(fs, st.getPath())).decode("utf-8")))
        for st in fs.listStatus(commits)
        if st.getPath().getName().endswith(".json")
    ]
    if not entries:
        return False
    gen = 1 + max(
        (m.get("checkpoint", 0) for _, m in entries), default=0
    )
    names = sorted({n for _, m in entries for n in m.get("dirs", {})})
    attempt = uuid.uuid4().hex[:12]
    staged: dict[str, str] = {}
    for name in names:
        df = read_committed(spark, log_path, name)
        out_dir = f"{log_path}/_checkpoints/{gen}-{attempt}/{name}"
        df.write.mode("error").parquet(out_dir)
        staged[name] = out_dir

    manifest = json.dumps(
        {
            "checkpoint": gen,
            "dirs": staged,
            "covers": sorted(fname for fname, _ in entries),
        }
    )
    tmp = Path(f"{log_path}/_staging/.checkpoint-{gen}-{attempt}.json")
    out = fs.create(tmp, True)
    try:
        out.write(manifest.encode("utf-8"))
    finally:
        out.close()
    dst = Path(f"{log_path}/_commits/checkpoint-{gen}.json")
    won = fs.rename(tmp, dst)
    if not won:
        fs.delete(Path(f"{log_path}/_checkpoints/{gen}-{attempt}"), True)
        fs.delete(tmp, False)
        return False
    # vacuum the superseded manifests and their staged data
    for fname, m in entries:
        for d in m.get("dirs", {}).values():
            fs.delete(Path(d), True)
        fs.delete(Path(f"{log_path}/_commits/{fname}"), False)
    return True


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
