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
