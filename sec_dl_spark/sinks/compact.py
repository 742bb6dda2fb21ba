"""Small-files compaction — the maintenance operator every long-running
partitioned ingest needs (each micro-batch/quarterly append writes small
files; scans degrade as file counts grow).

The reference never needs this (Postgres heap), but a 100 TB parquet lake
does: compaction rewrites a partition to ~target-sized files, preserving
the partitioning columns and layout.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    target_rows_per_file: int | None = None,
) -> dict[str, int]:
    """Rewrite a partitioned parquet dataset with consolidated files.

    Scope split with ``operators/layout.py:compact_small_files``: this
    form preserves a PARTITIONED layout (partition dirs survive, sized
    per-partition via repartition on the partition columns); the layout
    module's form is the filesystem-agnostic flat-directory rewrite
    (Hadoop FS listing) the corpus pipeline uses.

    Sizes output by rows (estimated from the dataset's bytes/row when
    target_rows_per_file is not given). Writes to <path>__compact then
    atomically swaps directories — readers never see a half-written layout.
    Returns {files_before, files_after}.
    """
    import glob
    import os
    import shutil

    def count_files(p: str) -> int:
        return sum(1 for f in glob.glob(f"{p}/**/*.parquet", recursive=True))

    df = spark.read.parquet(path)
    if target_rows_per_file is None:
        n_rows = df.count()
        total_bytes = sum(
            os.path.getsize(f) for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
        )
        bytes_per_row = max(total_bytes / max(n_rows, 1), 1.0)
        target_rows_per_file = max(int(target_file_bytes / bytes_per_row), 1)

    before = count_files(path)
    tmp = f"{path}__compact"
    writer = df.repartition(*partition_cols) if partition_cols else df.coalesce(1)
    (
        writer.write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .partitionBy(*partition_cols)
        .parquet(tmp)
    )
    old = f"{path}__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return {"files_before": before, "files_after": count_files(path)}


def merge_upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates,
    key_cols: list[str],
    partition_cols: list[str],
) -> None:
    """MERGE (upsert) into a partitioned parquet table, rewriting ONLY the
    partitions the updates touch — dynamic partition overwrite, the
    K4-at-scale pattern: a quarterly batch of amended filings rewrites a
    handful of (year, qtr) directories, never the table.

    Requires every update row to carry its partition columns. Updates win
    over existing rows on key_cols within the touched partitions.
    """
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        touched = updates.select(*partition_cols).distinct()
        existing = spark.read.parquet(target_path).join(
            F.broadcast(touched), partition_cols, "left_semi"
        )
        kept = existing.join(updates.select(*key_cols), key_cols, "left_anti")
        merged = kept.unionByName(updates.select(*existing.columns))
        # overwrite rewrites only the partitions present in `merged` —
        # exactly the touched set (kept ∪ updates live in those partitions)
        merged.write.mode("overwrite").partitionBy(*partition_cols).parquet(target_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def delete_rows_partitioned(
    spark: SparkSession,
    target_path: str,
    keys,
    key_cols: list[str],
    partition_cols: list[str],
) -> int:
    """Targeted row deletion from a partitioned parquet table (takedown /
    right-to-be-forgotten — a first-class training-data-lake operation):
    locates the partitions containing the doomed keys, rewrites ONLY those
    via dynamic partition overwrite, leaves everything else byte-identical.
    Returns the number of rows deleted.

    ``keys``: DataFrame of key_cols values to remove (broadcast — takedown
    batches are small).

    Dynamic partition overwrite only rewrites partitions PRESENT in the
    written frame, so a partition whose every row is doomed would survive
    untouched on disk. Touched partitions with zero survivors are therefore
    deleted explicitly (their directories removed) after the overwrite.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    data = spark.read.parquet(target_path)
    doomed = data.join(F.broadcast(keys), key_cols, "left_semi")
    n_doomed = doomed.count()
    if n_doomed == 0:
        return 0
    touched = doomed.select(*partition_cols).distinct()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        survivors = (
            data.join(F.broadcast(touched), partition_cols, "left_semi")
            .join(F.broadcast(keys), key_cols, "left_anti")
        )
        # Partitions the takedown fully empties never appear in `survivors`,
        # so the dynamic overwrite skips them — compute them up front (takedown
        # scope is small by contract; both collects are broadcast-sized).
        surviving_parts = {
            tuple(r) for r in survivors.select(*partition_cols).distinct().collect()
        }
        emptied = [
            tuple(r) for r in touched.collect() if tuple(r) not in surviving_parts
        ]
        survivors.write.mode("overwrite").partitionBy(*partition_cols).parquet(target_path)
        for part_vals in emptied:
            part_dir = os.path.join(
                target_path,
                *(
                    f"{c}={_escape_partition_value(v)}"
                    for c, v in zip(partition_cols, part_vals)
                ),
            )
            if os.path.isdir(part_dir):
                shutil.rmtree(part_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return n_doomed


def _escape_partition_value(v) -> str:
    """Render a partition value the way Spark names partition directories
    (Hive-style): NULL → __HIVE_DEFAULT_PARTITION__, special characters
    percent-escaped (ExternalCatalogUtils.escapePathName's charset)."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    s = str(v)
    unsafe = set('"#%\'*/:=?\\\x7f{[]^')
    out = []
    for ch in s:
        if ch in unsafe or ord(ch) < 0x20:
            out.append("%{:02X}".format(ord(ch)))
        else:
            out.append(ch)
    return "".join(out)
