"""Size-gated broadcast (kgforge/functions/joins.maybe_broadcast).

r5 VERDICT finding #1: four graph queries force-broadcast O(|V|)
degree/rank dims; the gate must (a) hint under the threshold, (b) emit
NO hint above it so the planner falls back to a shuffle join, and (c)
leave results identical either way.  The hint is asserted on the
OPTIMIZED LOGICAL plan (where a broadcast hint survives as
``strategy=broadcast`` on the join) — independent of runtime
autoBroadcastJoinThreshold / AQE decisions.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _joined(spark, dim_wrapper):
    big = spark.range(1000).withColumnRenamed("id", "k")
    dim = spark.range(10).withColumnRenamed("id", "k")
    return big.join(dim_wrapper(dim), on="k")


def test_hint_present_under_gate(spark):
    from kgforge.functions.joins import maybe_broadcast

    plan = _optimized(_joined(spark, lambda d: maybe_broadcast(d, max_rows=100)))
    assert "broadcast" in plan.lower()


def test_hint_absent_over_gate(spark):
    from kgforge.functions.joins import maybe_broadcast

    plan = _optimized(_joined(spark, lambda d: maybe_broadcast(d, max_rows=5)))
    assert "broadcast" not in plan.lower()


def test_precounted_rows_skip_the_count(spark):
    """n_rows is trusted verbatim — callers pass a count already taken
    off a checkpointed 1:1 precursor (e.g. the degree table under a
    rank dim)."""
    from kgforge.functions.joins import maybe_broadcast

    over = _optimized(
        _joined(spark, lambda d: maybe_broadcast(d, n_rows=10**9))
    )
    under = _optimized(_joined(spark, lambda d: maybe_broadcast(d, n_rows=1)))
    assert "broadcast" not in over.lower()
    assert "broadcast" in under.lower()


def test_module_gate_is_monkeypatchable(spark, monkeypatch):
    """max_rows=None reads the module constant at CALL time, so a
    deployment (or this test) can turn the gate without touching call
    sites."""
    import kgforge.functions.joins as joins

    monkeypatch.setattr(joins, "BROADCAST_DIM_MAX_ROWS", 0)
    plan = _optimized(_joined(spark, joins.maybe_broadcast))
    assert "broadcast" not in plan.lower()


def test_link_against_graph_gate_and_dedupe(spark, monkeypatch):
    """predict_job.link_against_graph: (a) the surface dim drops its
    broadcast hint when it exceeds the gate; (b) a surface appearing
    under two canonical ids of the same type (cross-epoch merge
    leftovers) links each triple exactly ONCE, to the dominant
    (highest mention_count) id — no left-join fan-out (r5 ADVICE)."""
    import kgforge.functions.joins as joins
    from jobs.predict_job import link_against_graph

    nodes = spark.createDataFrame(
        [
            (10, "Tool", ["spark", "apache spark"], 7),
            (11, "Tool", ["spark"], 2),  # stale duplicate assignment
            (20, "Lang", ["python"], 5),
        ],
        "canonical_id bigint, ent_type string, "
        "surface_forms array<string>, mention_count bigint",
    )
    triples = spark.createDataFrame(
        [
            ("r", "p", 1, "spark", "Tool", "uses", "python", "Lang"),
            ("r", "p", 2, "flink", "Tool", "uses", "python", "Lang"),
        ],
        "repo string, path string, unit_id bigint, subj string, "
        "subj_type string, pred string, obj string, obj_type string",
    )

    linked = link_against_graph(triples, nodes)
    rows = {r.subj: r for r in linked.collect()}
    assert linked.count() == 2  # no fan-out despite the duplicate dim row
    assert rows["spark"].src == 10  # dominant assignment wins
    assert rows["spark"].dst == 20
    assert rows["flink"].src is None  # novel entity survives, unlinked
    assert "broadcast" in _optimized(linked).lower()

    monkeypatch.setattr(joins, "BROADCAST_DIM_MAX_ROWS", 0)
    ungated = link_against_graph(triples, nodes)
    assert "broadcast" not in _optimized(ungated).lower()
    assert ungated.count() == 2


def test_graph_query_results_identical_above_gate(spark, monkeypatch):
    """kg_assortativity (one of the four newly gated queries) returns
    the same result whether its degree dim broadcasts or shuffles."""
    import kgforge.functions.joins as joins
    from kgforge.queries import ALL_QUERIES

    q = ALL_QUERIES["kg_assortativity"]
    hinted = q(spark, SF).collect()
    monkeypatch.setattr(joins, "BROADCAST_DIM_MAX_ROWS", 0)
    shuffled = q(spark, SF).collect()
    assert hinted == shuffled
    assert hinted[0].n_endpoints > 0
