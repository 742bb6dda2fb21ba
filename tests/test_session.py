"""Session helpers: spread()'s split estimation must stay robust — a wrong
estimate either pins per-row-expensive stages to one task (under-estimate
disabled) or adds a gratuitous shuffle to already-parallel plans."""

import pytest

from sec_dl_spark.session import _estimated_scan_splits, _parse_bytes, spread

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    ("raw", "expect"),
    [
        ("134217728", 134217728),
        ("128m", 128 << 20),
        ("128mb", 128 << 20),
        (" 4M ", 4 << 20),
        ("1g", 1 << 30),
        ("512k", 512 << 10),
        ("garbage", 999),
        (None, 999),
    ],
)
def test_parse_bytes_handles_spark_size_suffixes(raw, expect):
    assert _parse_bytes(raw, 999) == expect


def test_spread_repartitions_single_split_scan(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    assert _estimated_scan_splits(df) < spark.sparkContext.defaultParallelism
    assert spread(df).rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_spread_estimate_survives_size_suffixed_conf(spark):
    """A size-suffixed maxPartitionBytes ('128m') must not disable the
    estimate (a bare int() would throw → 'assume parallel' → spread
    becomes a no-op on single-split local scans, its whole purpose)."""
    before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        df = spark.read.parquet(f"{SF}/documents.parquet")
        assert _estimated_scan_splits(df) < 1 << 20
        assert spread(df).rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", before)


def test_spread_in_memory_frame_uses_actual_partition_count(spark):
    """Non-file frames fall back to the real RDD partition count instead of
    pretending single-split: an already-parallel in-memory frame must not
    pay a repartition shuffle."""
    df = spark.range(0, 1000, numPartitions=8)
    assert _estimated_scan_splits(df) == 8
    assert spread(df) is df


def test_pin_reliable_mode_checkpoints_to_reliable_storage(spark, tmp_path):
    """pin() (ADVICE r8): default mode is localCheckpoint (executor-local,
    non-recomputable blocks); reliable mode — per-call or via the
    spark.sec_dl_spark.reliableCheckpoint conf — must write a TRUE
    checkpoint under the SparkContext checkpoint dir so blocks survive
    executor loss, and must fail with actionable guidance (naming
    setCheckpointDir) when no checkpoint dir is configured."""
    import os

    from sec_dl_spark.session import RELIABLE_CHECKPOINT_CONF, pin

    df = spark.range(100).withColumnRenamed("id", "v")

    # default: local checkpoint, same rows, checkpointed lineage
    local = pin(df)
    assert local.count() == 100

    # reliable without a checkpoint dir: actionable error
    sc = spark.sparkContext
    if not sc.getCheckpointDir():
        with pytest.raises(RuntimeError, match="setCheckpointDir"):
            pin(df, reliable=True)

    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    rel = pin(df, reliable=True)
    assert sorted(r.v for r in rel.collect()) == list(range(100))
    # files landed under the reliable dir — the executor-loss guarantee
    found = any(files for _, _, files in os.walk(ckpt))
    assert found, "reliable pin wrote nothing under the checkpoint dir"

    # the session-wide conf flips the default
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, "true")
    try:
        via_conf = pin(df)
        assert via_conf.count() == 100
    finally:
        spark.conf.set(RELIABLE_CHECKPOINT_CONF, "false")
