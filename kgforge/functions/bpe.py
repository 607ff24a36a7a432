"""BPE merge-table TRAINING over pre-tokenized counts — the vocabulary-
building primitive a training-data pipeline runs over raw text.

Real byte-pair-encoding training (r2 honest-labeling fix: token_counts_bpe
is pre-tokenization wordcount only, no merges): start from GPT-2-style
pre-tokens with corpus counts, symbols = characters; each round counts
adjacent symbol pairs (weighted by pre-token count, overlapping positions
included, classic BPE), picks the globally most frequent pair
(tie: lexicographic left then right symbol — parallelism-invariant), and
merges it greedily left-to-right inside every word.  The emitted merge
table IS the trained tokenizer; no merges cross pre-token boundaries
(GPT-2 semantics).

Scale shape: the corpus-wide pre-token count is ONE groupBy with map-side
combine over the raw text; every round after that operates on the VOCAB
table (distinct pre-tokens — orders of magnitude smaller than the corpus):
one pair aggregation + one fold rewrite, ``localCheckpoint`` per round
truncating lineage exactly like the CC pointer-jump loop (link/cc.py).
The per-round top-pair pick is a driver-side 1-row collect — iterative
algorithms need driver control flow, same as CC's convergence check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2-style pre-tokenization: letter runs | digit runs | single
# punctuation (same pattern as the token_counts_bpe query).
PRETOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def pretoken_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (tok, cnt) vocabulary table (one map-side-combined agg)."""
    toks = F.regexp_extract_all(F.lower(text_col), F.lit(PRETOKEN_RE), F.lit(0))
    return (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )


def train_bpe_merges(words: DataFrame, n_merges: int = 5) -> DataFrame:
    """words(tok, cnt) -> merge table
    (merge_rank, left_sym, right_sym, pair_count), rank 1 = first merge.

    Stops early if no adjacent pair remains (every word fused to one
    symbol) — never silently pads."""
    spark = words.sparkSession
    chars = F.transform(
        F.sequence(F.lit(1), F.length("tok")),
        lambda i: F.col("tok").substr(i, F.lit(1)),
    )
    w = words.select("cnt", chars.alias("syms")).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        pair_structs = F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i).alias("a"),
                F.element_at("syms", i + 1).alias("b"),
            ),
        )
        top = (
            w.filter(F.size("syms") >= 2)
            .select("cnt", F.explode(pair_structs).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pair_count"))
            .orderBy(F.desc("pair_count"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, pc = top[0].a, top[0].b, int(top[0].pair_count)
        merges.append((r + 1, a, b, pc))
        # greedy left-to-right non-overlapping rewrite: fold symbols into
        # the output, fusing when the accumulator tail + current == (a, b)
        merged = F.aggregate(
            F.transform("syms", lambda s: F.array(s)),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (F.element_at(x, 1) == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, x)),
        )
        w = w.select("cnt", merged.alias("syms")).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        "merge_rank bigint, left_sym string, right_sym string, pair_count bigint",
    )


def apply_bpe(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Replay a trained merge list over (tok, ...) rows -> + ``syms``
    column (the tokenized form).  Pure expressions — usable as the
    vectorized encode step of the trained tokenizer."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("tok")),
        lambda i: F.col("tok").substr(i, F.lit(1)),
    )
    syms = chars
    for a, b in merges:
        def _fold(a=a, b=b, syms=syms):
            return F.aggregate(
                F.transform(syms, lambda s: F.array(s)),
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(a))
                    & (F.element_at(x, 1) == F.lit(b)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                    ),
                ).otherwise(F.concat(acc, x)),
            )

        syms = _fold()
    return words.withColumn("syms", syms)
