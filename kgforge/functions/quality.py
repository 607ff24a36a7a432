"""Text-quality scoring / filtering for training-data curation.

The keep/drop decision every LLM-data pipeline runs in front of training:
cheap, fully JVM-side heuristics (length, stopword density, token-shape
sanity), with the decision AND the first-failing reason materialized per
row — drops are attributable and countable, never silent (repo rule).

All thresholds are deliberately simple constants: the operator shape
(vectorized flags + reason attribution + drop accounting) is the product;
swap the rule set per corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_TOKENS = 5
MAX_STOP_RATIO = 0.6
MIN_MEAN_TOK_LEN = 2.0
MAX_MEAN_TOK_LEN = 12.0
STOPWORDS = ("a", "the")


def quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add n_tokens, stop_ratio, mean_tok_len, keep, reason columns.

    reason = first failing rule in a fixed order ('too_short',
    'stopword_heavy', 'weird_tokens'), else 'ok' — deterministic and
    SQL-mirrorable.  Null text folds to '' (one empty token -> too_short):
    a null document must NEVER pass the gate — with raw null every rule
    predicate evaluates null and the CASE falls through to 'ok'."""
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n = F.size(toks)
    stops = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    stop_ratio = stops / n
    mean_len = (
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        / n
    )
    reason = (
        F.when(n < MIN_TOKENS, "too_short")
        .when(stop_ratio > MAX_STOP_RATIO, "stopword_heavy")
        .when(
            (mean_len < MIN_MEAN_TOK_LEN) | (mean_len > MAX_MEAN_TOK_LEN),
            "weird_tokens",
        )
        .otherwise("ok")
    )
    return (
        df.withColumn("n_tokens", n.cast("bigint"))
        .withColumn("stop_ratio", F.round(stop_ratio, 4))
        .withColumn("mean_tok_len", F.round(mean_len, 4))
        .withColumn("reason", reason)
        .withColumn("keep", F.col("reason") == "ok")
    )


def drop_stats(flagged: DataFrame) -> DataFrame:
    """Per-reason drop accounting for the filter above."""
    return flagged.groupBy("reason").agg(F.count("*").alias("n_docs"))
