"""dedup_semantic_prune: the SemDeDup keep rule is lowest-cos-to-centroid,
NOT min vec_id — pinned on a constructed cluster where the two differ."""

import pytest
from pyspark.sql import functions as F  # noqa: F401


@pytest.fixture(scope="module")
def prune_dir(spark, tmp_path_factory):
    """A tmp sf_dir with one embeddings.parquet: a 3-member semantic
    cluster whose least-prototypical member has the HIGHEST vec_id, plus
    one isolated vector in a different sign bucket."""
    rows = [
        (10, [1.0, 0.05, 0.05, 0.05], 0),
        (11, [0.95, 0.10, 0.05, 0.05], 0),
        (12, [0.60, 0.80, 0.05, 0.05], 0),  # atypical member, max id
        (20, [-1.0, -1.0, -0.05, -0.05], 1),  # different bucket, no pairs
    ]
    d = tmp_path_factory.mktemp("semprune")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_keep_rule_is_least_prototypical(spark, prune_dir):
    from kgforge.queries import ALL_QUERIES

    out = ALL_QUERIES["dedup_semantic_prune"](spark, prune_dir).collect()
    assert len(out) == 1  # the isolated vector never enters a cluster
    r = out[0]
    # cluster id is the CC canonical (min member), the KEPT member is the
    # one farthest from the centroid — here the max id, so the two differ.
    assert r.cluster_id == 10
    assert r.keep_vec == 12
    assert r.cluster_size == 3
    assert r.n_pruned == 2
    assert 0.0 < r.keep_cos < 1.0


def test_pruned_members_are_cluster_minus_keep(spark, prune_dir):
    """Retained set = keeps + vectors outside any cluster; pruned count
    accounts for everything else exactly."""
    from kgforge.queries import ALL_QUERIES

    out = ALL_QUERIES["dedup_semantic_prune"](spark, prune_dir)
    agg = out.agg(
        F.sum("cluster_size").alias("in_clusters"),
        F.sum("n_pruned").alias("pruned"),
        F.count("*").alias("kept"),
    ).collect()[0]
    assert agg.in_clusters == agg.kept + agg.pruned


# ---------- dedup_repeated_spans ----------

@pytest.fixture(scope="module")
def span_dir(spark, tmp_path_factory):
    """Three docs sharing two distinct 8-token phrases: doc 1 carries
    both (separated by unique filler), docs 2 and 3 one each."""
    pa = "alpha beta gamma delta epsilon zeta eta theta"
    pb = "iota kappa lam mu nu xi omi pi"
    rows = [
        (1, pa + " f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 " + pb, "en", "s", 0),
        (2, "g1 g2 g3 " + pa, "en", "s", 0),
        (3, pb, "en", "s", 0),
    ]
    d = tmp_path_factory.mktemp("spans")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_repeated_spans_islands(spark, span_dir):
    from kgforge.queries import ALL_QUERIES

    out = {
        (r.doc_id, r.span_start, r.span_end): (r.span_tokens, r.n_grams)
        for r in ALL_QUERIES["dedup_repeated_spans"](spark, span_dir).collect()
    }
    # doc 1: TWO maximal islands (the filler gap > 8 splits them)
    assert out == {
        (1, 0, 7): (8, 1),
        (1, 18, 25): (8, 1),
        (2, 3, 10): (8, 1),
        (3, 0, 7): (8, 1),
    }
