"""End-to-end extraction: repos table -> triples DataFrame.

Flagship dataflow (SURVEY.md §7.5): scan -> extract_units -> tag ->
pairs -> classify -> dedup, with provenance (content_sha) on every row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .ner import explode_mentions, tag_mentions
from .pairs import pair_relational
from .rel import classify_pairs, extract_triples_fused
from .units import extract_units


def extract_pipeline(
    repos: DataFrame, strategy: str = "fused", model_name: str = "repos"
) -> DataFrame:
    """repos(repo, path, commit, lang, content) -> triples.

    strategy='fused'      — single Arrow pass, zero intermediate shuffle
                            (the 100 TB plan).
    strategy='relational' — mentions self-join + broadcast type filter +
                            window top-k + classify UDF (the plan whose
                            stages are individually oracle-checkable).
    Both strategies produce identical triples (tested).
    """
    units = extract_units(repos)
    if strategy == "fused":
        return extract_triples_fused(units, model_name)
    if strategy == "relational":
        tagged = tag_mentions(units, model_name)
        mentions = explode_mentions(tagged)
        pairs = pair_relational(mentions, model_name)
        return classify_pairs(pairs, model_name)
    raise ValueError(f"unknown strategy: {strategy}")
