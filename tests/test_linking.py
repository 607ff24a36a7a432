"""Canonicalization (MinHash-LSH) + connected components + graph
materialization."""

import pytest
from pyspark.sql import functions as F

from kgforge.extract.pipeline import extract_pipeline
from kgforge.fixtures import gen_repo_rows
from kgforge.graph.materialize import (
    attach_canonical_ids,
    build_edges,
    build_nodes,
    canonical_entities,
)
from kgforge.link.canonical import lsh_candidate_pairs, minhash_signature
from kgforge.link.cc import connected_components


@pytest.fixture(scope="module")
def triples(spark):
    rows = gen_repo_rows(120)
    t = extract_pipeline(spark.createDataFrame(rows), "fused")
    return t.localCheckpoint(eager=True)


def test_minhash_identical_strings_identical_sigs(spark):
    df = spark.createDataFrame(
        [("anchor model",), ("anchor model",), ("prism index",)], "norm string"
    )
    sigs = minhash_signature(df).select("norm", "sig").collect()
    by_norm = {}
    for r in sigs:
        by_norm.setdefault(r.norm, []).append(tuple(r.sig))
    assert len(set(by_norm["anchor model"])) == 1


def test_lsh_links_near_duplicates(spark):
    df = spark.createDataFrame(
        [
            ("anchor model", 1), ("anchor model system", 1),
            ("prism index", 2), ("quartz sampler", 0),
        ],
        "surface string, ent_type int",
    ).withColumn("norm", F.col("surface")).withColumn(
        "entity_id", F.abs(F.xxhash64("norm", "ent_type"))
    )
    pairs = lsh_candidate_pairs(df).collect()
    assert len(pairs) == 1  # only the anchor-model variant pair
    assert all(p.jaccard >= 0.5 for p in pairs)


def test_cc_hand_built_graph(spark):
    verts = spark.createDataFrame([(i,) for i in range(1, 8)], "entity_id bigint")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "src bigint, dst bigint"
    )
    labels = {r.entity_id: r.canonical_id for r in connected_components(verts, edges).collect()}
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[5] == labels[6] == 5
    assert labels[4] == 4 and labels[7] == 7  # isolated


def test_cc_long_chain_converges(spark):
    n = 40
    verts = spark.createDataFrame([(i,) for i in range(n)], "entity_id bigint")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    labels = connected_components(verts, edges).collect()
    assert {r.canonical_id for r in labels} == {0}


def test_canonicalization_idempotent(spark, triples):
    c1 = canonical_entities(triples)
    m1 = {(r.entity_id, r.canonical_id) for r in c1.collect()}
    c2 = canonical_entities(triples)
    m2 = {(r.entity_id, r.canonical_id) for r in c2.collect()}
    assert m1 == m2


def test_variants_share_canonical_id(spark, triples):
    """Lexicon near-dup variants ('X' vs 'X system') must land in one
    canonical group when both surface in the corpus."""
    can = canonical_entities(triples)
    rows = can.select("surface", "ent_type", "canonical_id").collect()
    by_surface = {(r.surface.lower(), r.ent_type): r.canonical_id for r in rows}
    merged = 0
    for (surf, t), cid in by_surface.items():
        for suffix in (" system", " variant", " v2"):
            v = by_surface.get((surf + suffix, t))
            if v is not None:
                assert v == cid, f"variant {surf!r}+{suffix!r} not linked"
                merged += 1
    assert merged > 0, "corpus contained no variant pairs — weak test"


def test_nodes_edges_consistency(spark, triples):
    can = canonical_entities(triples)
    linked = attach_canonical_ids(triples, can)
    nodes = build_nodes(can)
    edges = build_edges(linked)
    node_ids = {r.canonical_id for r in nodes.select("canonical_id").collect()}
    for r in edges.select("src", "dst").collect():
        assert r.src in node_ids and r.dst in node_ids
    # weights sum to linked triple count
    total_w = edges.agg(F.sum("weight")).collect()[0][0]
    assert total_w == linked.count()
    # provenance bounded and deterministic
    for r in edges.select("provenance").collect():
        assert 1 <= len(r.provenance) <= 3

def test_case_variant_surfaces_no_duplicate_fanout(spark):
    """Case/punct variants share entity_id (derived from the normalized
    form); CC must not receive duplicate vertex rows (ADVICE r1: the
    pointer-jump self-join multiplies dupes and fans out linked triples)."""
    rows = [
        ("r", "p", 0, "Anchor Model", "Method", "USED-FOR", "prism index", "Task"),
        ("r", "p", 1, "anchor model", "Method", "USED-FOR", "prism index", "Task"),
        ("r", "p", 2, "anchor model", "Method", "USED-FOR", "quartz sampler", "Task"),
    ]
    t = spark.createDataFrame(
        rows,
        "repo string, path string, unit_id long, subj string, subj_type string,"
        " pred string, obj string, obj_type string",
    )
    can = canonical_entities(t)
    # exactly one canonical row per (surface, ent_type) — no label dupes
    assert can.count() == can.dropDuplicates(["surface", "ent_type"]).count()
    # both case variants resolve to one entity_id and one canonical_id
    variants = can.filter(F.lower("surface") == "anchor model").collect()
    assert len(variants) == 2
    assert len({r.entity_id for r in variants}) == 1
    assert len({r.canonical_id for r in variants}) == 1
    # the canonical join must not fan out triples
    linked = attach_canonical_ids(t, can)
    assert linked.count() == t.count()


def test_lsh_delta_pairs_match_involving(spark):
    """The delta-bucket pairing (one map-side pass over the dim) produces
    exactly the involving-filtered pairs for new-endpoint pairs; any
    extra old-old rows it emits share a hot bucket (tolerated by the
    incremental caller: old-old verdicts already live in prior clusters)."""
    from pyspark.sql import functions as F

    from kgforge.extract.pipeline import extract_pipeline
    from kgforge.fixtures import gen_repo_rows
    from kgforge.link.canonical import (
        entity_vertices,
        lsh_candidate_pairs,
        lsh_candidate_pairs_delta,
        minhash_signature,
    )

    rows = gen_repo_rows(80)
    ta = extract_pipeline(spark.createDataFrame(rows[:50]), "fused")
    tb = extract_pipeline(spark.createDataFrame(rows[50:]), "fused")
    old = minhash_signature(entity_vertices(ta)).localCheckpoint(eager=True)
    new = (
        minhash_signature(entity_vertices(tb))
        .join(
            old.select("surface", "ent_type"),
            on=["surface", "ent_type"], how="left_anti",
        )
        .localCheckpoint(eager=True)
    )
    allv = old.unionByName(new.select(*old.columns))
    new_ids = {r.entity_id for r in new.select("entity_id").distinct().collect()} - {
        r.entity_id for r in old.select("entity_id").distinct().collect()
    }

    key = lambda r: (r.src, r.dst, round(r.jaccard, 6))  # noqa: E731
    inv = lsh_candidate_pairs(
        allv, involving=spark.createDataFrame(
            [(i,) for i in new_ids], "entity_id bigint"
        )
    )
    delta = lsh_candidate_pairs_delta(allv, new)
    inv_set = {key(r) for r in inv.collect()}
    delta_new = {
        key(r) for r in delta.collect()
        if r.src in new_ids or r.dst in new_ids
    }
    assert inv_set == delta_new and len(inv_set) > 0
