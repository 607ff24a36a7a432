"""Incremental graph maintenance: merge a delta batch into existing
nodes/edges tables.

Pairs with kgforge/streaming.py: streamed triples accumulate append-only;
per maintenance epoch the delta is folded into the materialized graph
without recomputing history.  All merges are pure aggregations keyed on
the graph keys — idempotent given exactly-once deltas (which the stream
checkpoint provides), associative (merge(merge(a,b),c) == merge(a, b∪c)),
and shuffle only on the small aggregated key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_edges(existing: DataFrame, delta: DataFrame, n_provenance: int = 3) -> DataFrame:
    """Fold delta edges (src, dst, pred, weight, provenance) into existing:
    weights add, provenance stays a deterministic min-k sample."""
    unioned = existing.select("src", "dst", "pred", "weight", "provenance").unionByName(
        delta.select("src", "dst", "pred", "weight", "provenance")
    )
    return unioned.groupBy("src", "dst", "pred").agg(
        F.sum("weight").alias("weight"),
        F.slice(
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("provenance")))),
            1,
            n_provenance,
        ).alias("provenance"),
    )


def merge_nodes(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold delta nodes (canonical_id, ent_type, surface_forms,
    mention_count): counts add, surface-form sets union."""
    unioned = existing.select(
        "canonical_id", "ent_type", "surface_forms", "mention_count"
    ).unionByName(
        delta.select("canonical_id", "ent_type", "surface_forms", "mention_count")
    )
    return unioned.groupBy("canonical_id", "ent_type").agg(
        F.sort_array(
            F.array_distinct(F.flatten(F.collect_list("surface_forms")))
        ).alias("surface_forms"),
        F.sum("mention_count").alias("mention_count"),
    )
