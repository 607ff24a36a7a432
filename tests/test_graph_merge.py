"""Incremental merge == full recompute (the associativity contract)."""

import pytest
from pyspark.sql import functions as F

from kgforge.extract.pipeline import extract_pipeline
from kgforge.fixtures import gen_repo_rows
from kgforge.graph.materialize import (
    attach_canonical_ids,
    build_edges,
    build_nodes,
    canonical_entities,
    mention_counts,
)
from kgforge.graph.merge import merge_edges, merge_nodes


@pytest.fixture(scope="module")
def split_corpus(spark):
    rows = gen_repo_rows(100)
    full = extract_pipeline(spark.createDataFrame(rows), "fused")
    a = extract_pipeline(spark.createDataFrame(rows[:60]), "fused")
    b = extract_pipeline(spark.createDataFrame(rows[60:]), "fused")
    # shared canonicalization dim so ids agree across batches (incremental
    # runs resolve against the accumulated entity dim)
    can = canonical_entities(full).localCheckpoint(eager=True)
    return can, full, a, b


def _edges(can, triples):
    return build_edges(attach_canonical_ids(triples, can))


def _nodes(can, triples):
    linked = attach_canonical_ids(triples, can)
    return build_nodes(can).join(
        mention_counts(linked), on="canonical_id", how="inner"
    )


def test_merge_edges_equals_full(spark, split_corpus):
    can, full, a, b = split_corpus
    merged = merge_edges(_edges(can, a), _edges(can, b))
    want = {
        (r.src, r.dst, r.pred, r.weight)
        for r in _edges(can, full).collect()
    }
    got = {(r.src, r.dst, r.pred, r.weight) for r in merged.collect()}
    assert got == want


def test_merge_nodes_counts_add(spark, split_corpus):
    can, full, a, b = split_corpus
    merged = merge_nodes(_nodes(can, a), _nodes(can, b))
    want = {
        (r.canonical_id, r.mention_count) for r in _nodes(can, full).collect()
    }
    got = {(r.canonical_id, r.mention_count) for r in merged.collect()}
    assert got == want


def test_merge_idempotent_on_empty_delta(spark, split_corpus):
    can, full, _a, _b = split_corpus
    e = _edges(can, full)
    empty = e.limit(0)
    again = merge_edges(e, empty)
    assert sorted(map(lambda r: (r.src, r.dst, r.pred, r.weight), again.collect())) == sorted(
        map(lambda r: (r.src, r.dst, r.pred, r.weight), e.collect())
    )