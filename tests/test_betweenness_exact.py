"""Exact Brandes (until_empty all-seeds) vs the truncated estimator on a
planted graph where they DIFFER (r6 VERDICT #5): the path 0-1-2-3-4 has
diameter 4, so a 3-hop horizon loses exactly the (0,4) ordered pair —
interior vertices each drop 2.0 of dependency.  Hand-derived exact
(ordered-pair accumulation, i.e. 2x the unordered convention):
bc(1)=6, bc(2)=8, bc(3)=6, endpoints 0.
"""

from __future__ import annotations


def _sym_path(spark, n=5):
    edges = [(i, i + 1) for i in range(n - 1)]
    sym = edges + [(b, a) for a, b in edges]
    return spark.createDataFrame(sym, "a long, b long")


def test_exact_brandes_on_path(spark):
    from kgforge.graph.algo import betweenness

    sym = _sym_path(spark)
    verts = sym.select("a").distinct().withColumnRenamed("a", "v")
    stats: dict = {}
    bc = {
        r.v: r.bc
        for r in betweenness(
            sym, verts, until_empty=True, stats=stats
        ).collect()
    }
    assert stats["depth"] == 4  # the path's diameter
    assert bc[1] == 6.0 and bc[2] == 8.0 and bc[3] == 6.0
    assert bc[0] == 0.0 and bc[4] == 0.0


def test_truncated_undercounts_on_path(spark):
    from kgforge.graph.algo import betweenness

    sym = _sym_path(spark)
    verts = sym.select("a").distinct().withColumnRenamed("a", "v")
    bc = {
        r.v: r.bc for r in betweenness(sym, verts, depth=3).collect()
    }
    # the distance-4 pair (0,4) is invisible at a 3-hop horizon:
    # each interior vertex loses the 2 ordered contributions
    assert bc[1] == 4.0 and bc[2] == 6.0 and bc[3] == 4.0


def test_until_empty_guard_raises(spark):
    import pytest

    from kgforge.graph.algo import betweenness

    sym = _sym_path(spark, n=6)
    verts = sym.select("a").distinct().withColumnRenamed("a", "v")
    with pytest.raises(RuntimeError, match="exceeded 2 rounds"):
        betweenness(sym, verts, until_empty=True, max_rounds=2)
