"""Multimodal binary-column plumbing (decode stubbed, dataflow real)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from kgforge.functions.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    fake_decode_meta,
)


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


def test_fake_decode_deterministic():
    a = fake_decode_meta(b"payload")
    b = fake_decode_meta(b"payload")
    assert a == b
    w, h, feat = a
    assert 16 <= w < 80 and 16 <= h < 80 and len(feat) == FEATURE_DIM


def test_extract_features_spark(spark):
    df = spark.createDataFrame(
        [(i, f"blob-{i}".encode()) for i in range(20)],
        "doc_id long, payload binary",
    )
    out = extract_features(df).collect()
    assert len(out) == 20
    for r in out:
        payload = f"blob-{r.doc_id}".encode()
        assert r.n_bytes == len(payload)
        assert r.payload_sha == hashlib.sha256(payload).hexdigest()
        w, h, feat = fake_decode_meta(payload)
        assert (r.width, r.height) == (w, h)
        assert [round(x, 5) for x in r.feature] == [round(x, 5) for x in feat]


def test_features_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"blob-{i}".encode()) for i in range(50)],
        "doc_id long, payload binary",
    )
    a = {(r.doc_id, r.payload_sha) for r in extract_features(df.repartition(1)).collect()}
    b = {(r.doc_id, r.payload_sha) for r in extract_features(df.repartition(7)).collect()}
    assert a == b
