"""Stage 3 — candidate-pair generation, scoring, hard filter, top-k (M3).

Reference semantics (models/entity_pair_filter.py:356-423 +
re_model.py:184-342): ordered mention pairs (J1, i != j), static
type-constraint pruning via a broadcast allow-table (J4), cheap score +
threshold (P5), score-desc ranking (W1), top-k truncation (W2).

Two Spark realizations:

* ``pair_relational`` — the literal DataFrame program: self-join on the
  unit key, broadcast-hash join against the 6x6 type allow-table, pandas
  UDF score, window ``row_number() <= k``.  This is the oracle-checkable
  form and the right plan when mentions/unit is large (the self-join
  shuffles on (repo, path, unit_id) — co-partitioned, skew handled by AQE).

* the fused form lives in ``rel.py`` — for the common case (mentions/unit
  <= 64) pair enumeration is sentence-local, so doing it inside the same
  Arrow batch as tagging avoids an n^2-row shuffle entirely.  At 100 TB the
  fused plan moves ZERO bytes between stages 2-4; the relational plan would
  shuffle ~n^2 x 100 B per unit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..core.surrogate import score_pair, tokenize
from ..core.vocab import allowed_type_pairs


def make_score_pair_udf(model_name: str):
    @F.pandas_udf(DoubleType())
    def score_pair_udf(
        text: pd.Series,
        sub_start: pd.Series,
        sub_end: pd.Series,
        sub_type: pd.Series,
        obj_start: pd.Series,
        obj_end: pd.Series,
        obj_type: pd.Series,
    ) -> pd.Series:
        from ..core.model import get_model

        model = get_model(model_name)
        out = []
        for t, ss, se, st, os_, oe, ot in zip(
            text, sub_start, sub_end, sub_type, obj_start, obj_end, obj_type
        ):
            toks = tokenize(t or "")
            out.append(score_pair(toks, (ss, se, st), (os_, oe, ot), model))
        return pd.Series(out, dtype=float)

    return score_pair_udf


def type_allow_table(spark) -> DataFrame:
    """The broadcastable (sub_type, obj_type) allow-table (J4 analog of the
    reference's hard_filter_table, entity_pair_filter.py:90)."""
    return spark.createDataFrame(
        allowed_type_pairs(), schema="sub_type int, obj_type int"
    )


def pair_relational(
    mentions: DataFrame,
    model_name: str = "repos",
    threshold: float | None = None,
    top_k: int | None = None,
) -> DataFrame:
    """Exploded mentions -> scored, filtered, ranked candidate pairs.

    Output: one row per surviving ordered pair with sub_*/obj_* columns.
    """
    from ..core.model import get_model

    m = get_model(model_name)
    threshold = m.score_threshold if threshold is None else threshold
    top_k = m.top_k_pairs if top_k is None else top_k
    spark = mentions.sparkSession
    key = ["repo", "path", "unit_id"]
    sub = mentions.select(
        *key,
        "commit",
        "content_sha",
        "text",
        F.col("m_id").alias("sub_id"),
        F.col("start").alias("sub_start"),
        F.col("end").alias("sub_end"),
        F.col("ent_type").alias("sub_type"),
    )
    obj = mentions.select(
        *key,
        F.col("m_id").alias("obj_id"),
        F.col("start").alias("obj_start"),
        F.col("end").alias("obj_end"),
        F.col("ent_type").alias("obj_type"),
    )
    pairs = sub.join(obj, on=key).filter(F.col("sub_id") != F.col("obj_id"))
    # broadcast-hash join on the static 6x6 table — never a shuffle
    pairs = pairs.join(
        F.broadcast(type_allow_table(spark)), on=["sub_type", "obj_type"]
    )
    scored = pairs.withColumn(
        "score",
        make_score_pair_udf(model_name)(
            "text", "sub_start", "sub_end", "sub_type",
            "obj_start", "obj_end", "obj_type",
        ),
    ).filter(F.col("score") > F.lit(threshold))
    # total-order ranking: score desc then span key, parallelism-invariant
    w = Window.partitionBy(*key).orderBy(
        F.desc("score"), "sub_start", "sub_end", "obj_start", "obj_end"
    )
    return (
        scored.withColumn("pair_rank", F.row_number().over(w))
        .filter(F.col("pair_rank") <= top_k)
    )
