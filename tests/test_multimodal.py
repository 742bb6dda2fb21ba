"""Multimodal binary-column plumbing: schema, batch shape, determinism,
and the explicitly-marked decoder stub."""

import pytest
from pyspark.sql import functions as F

from sec_dl_spark.operators.multimodal import FEATURE_DIM, docs_as_media, extract_features


def test_binary_roundtrip_and_features(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "something else")],
        "doc_id long, text string",
    )
    media = docs_as_media(docs)
    assert dict(media.dtypes)["content"] == "binary"

    feats = extract_features(media).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["n_bytes"] == len(b"hello world")
    assert len(by_id[1]["features"]) == FEATURE_DIM
    # deterministic: identical payloads → identical features
    assert by_id[1]["features"] == by_id[2]["features"]
    assert by_id[1]["features"] != by_id[3]["features"]


def test_real_decoder_stub_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(Exception) as exc_info:
        extract_features(docs_as_media(docs), with_real_decoders=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or "real decoders" in str(exc_info.value)
