"""Stage 2 — mention detection (M1+M2: encode + BIO tag + span decode).

The reference runs a PLM forward + EntDecoder head + argmax BIO decode
(models/theta.py:297-331, models/ner_model.py:131-323).  Here the encoder
is the deterministic surrogate (kgforge.core.surrogate) behind the
``SurrogateModel`` interface; a real ONNX/torch encoder drops in without
touching the Spark plan (SURVEY.md §7.0).

Spark shape: one Arrow-batched pandas UDF, units in -> mention arrays out.
No shuffle: tagging is row-local.  UDFs capture only the model NAME; the
model rebuilds from its seed per executor (core/model.get_model is
lru_cached) — the local-mode equivalent of SparkFiles weight shipping.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StructField,
    StructType,
)

from ..core.surrogate import detect_mentions, tokenize

MENTION_TYPE = ArrayType(
    StructType(
        [
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
            StructField("ent_type", IntegerType()),
        ]
    )
)


def make_detect_mentions_udf(model_name: str):
    @F.pandas_udf(MENTION_TYPE)
    def detect_mentions_udf(texts: pd.Series) -> pd.Series:
        from ..core.model import get_model

        model = get_model(model_name)
        out = []
        for text in texts:
            ments = detect_mentions(tokenize(text or ""), model)
            out.append([{"start": s, "end": e, "ent_type": t} for s, e, t in ments])
        return pd.Series(out)

    return detect_mentions_udf


def tag_mentions(units: DataFrame, model_name: str = "repos") -> DataFrame:
    """units(+text) -> + ``mentions: array<struct<start,end,ent_type>>``."""
    return units.withColumn("mentions", make_detect_mentions_udf(model_name)(F.col("text")))


def explode_mentions(tagged: DataFrame) -> DataFrame:
    """Flatten to one row per mention (for the relational pair path and for
    canonicalization).  ``m_id`` = position of the mention in its unit."""
    return tagged.select(
        "repo",
        "path",
        "commit",
        "unit_id",
        "content_sha",
        "text",
        F.posexplode("mentions").alias("m_id", "m"),
    ).select(
        "repo",
        "path",
        "commit",
        "unit_id",
        "content_sha",
        "text",
        "m_id",
        F.col("m.start").alias("start"),
        F.col("m.end").alias("end"),
        F.col("m.ent_type").alias("ent_type"),
    )
