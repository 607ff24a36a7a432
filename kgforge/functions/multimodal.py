"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video land as ``binary`` columns with metadata structs.  The
image/audio codec libraries are NOT in this container, so the actual decode
is stubbed (``decode_image`` raises NotImplementedError); everything
Spark-side — schema, Arrow batch shape, mapInPandas signature, bounded
batch width — is real and tested against a deterministic fake decoder.

At scale: payloads stay opaque bytes end-to-end (no base64 inflation, no
driver collect); feature extraction is one Arrow-batched pass; partition
width is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` x
max payload size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_image(payload: bytes) -> "object":
    """REAL decode path — requires PIL/libjpeg, absent in this container.

    The deterministic fake below exercises the identical dataflow; swap
    this in (behind the same signature) where codec wheels exist.
    """
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_decode_meta for hermetic tests"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in decoder: metadata + feature vector derived
    from the payload bytes (sha-seeded, no randomness)."""
    h = hashlib.sha256(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    feature = [((h[2 + i] / 255.0) * 2.0 - 1.0) for i in range(FEATURE_DIM)]
    return width, height, feature


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(doc_id, payload: binary) -> metadata + feature rows, one Arrow pass."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(getattr(r, payload_col))
                w, hgt, feat = fake_decode_meta(payload)
                rows.append(
                    (
                        r.doc_id,
                        len(payload),
                        hashlib.sha256(payload).hexdigest(),
                        w,
                        hgt,
                        feat,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURES_SCHEMA.fields]
            )

    return df.mapInPandas(gen, FEATURES_SCHEMA)
