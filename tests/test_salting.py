"""Skew-salting correctness: the two-phase salted aggregation must be
exactly equivalent to the unsalted aggregate, for any salt width."""

import pytest
from pyspark.sql import functions as F

from kgforge.extract.pipeline import extract_pipeline
from kgforge.fixtures import gen_repo_rows
from kgforge.graph.materialize import attach_canonical_ids, build_edges, canonical_entities
from kgforge.link.canonical import lsh_bucket_stats, entity_vertices


@pytest.fixture(scope="module")
def linked(spark):
    rows = gen_repo_rows(100)
    t = extract_pipeline(spark.createDataFrame(rows), "fused")
    can = canonical_entities(t)
    return attach_canonical_ids(t, can).localCheckpoint(eager=True)


def test_salted_edges_invariant_to_salt_width(spark, linked):
    key = lambda r: (r.src, r.dst, r.pred, r.weight)  # noqa: E731
    base = {key(r) for r in build_edges(linked, salt=1).collect()}
    for s in (4, 16, 64):
        got = {key(r) for r in build_edges(linked, salt=s).collect()}
        assert got == base, f"salt={s} changed edge weights"


def test_salted_provenance_deterministic(spark, linked):
    a = {
        (r.src, r.dst, r.pred, tuple(map(tuple, r.provenance)))
        for r in build_edges(linked, salt=16).collect()
    }
    b = {
        (r.src, r.dst, r.pred, tuple(map(tuple, r.provenance)))
        for r in build_edges(linked, salt=16).collect()
    }
    assert a == b


def test_lsh_bucket_stats_accounts_everything(spark, linked):
    """Every (vertex, band) row lands in exactly one counted bucket —
    dropped mega-buckets are visible, never silent."""
    from kgforge.link.canonical import N_BANDS

    verts = entity_vertices(linked.select("subj", "subj_type", "obj", "obj_type"))
    stats = lsh_bucket_stats(verts).collect()
    n_vertices = verts.count()
    total_band_rows = sum(r.bucket_size * r.n_buckets for r in stats)
    assert total_band_rows == n_vertices * N_BANDS
