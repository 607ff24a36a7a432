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


def _und(spark, pairs):
    return spark.createDataFrame(
        sorted({(min(a, b), max(a, b)) for a, b in pairs}),
        "a bigint, b bigint",
    )


def _edge_set(df):
    return {(r.a, r.b) for r in df.collect()}


def test_ktruss_k4_keeps_k4_drops_attached_triangle(spark):
    """K4 is its own 4-truss (every edge in 2 triangles).  A triangle
    glued onto one K4 edge contributes two support-1 edges — dropped in
    one round — while the shared edge keeps support 2 and survives."""
    from kgforge.graph.algo import ktruss

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    glued = [(0, 9), (1, 9)]  # triangle (0, 1, 9) on K4 edge (0, 1)
    out = ktruss(_und(spark, k4 + glued), k=4, rounds=None)
    assert _edge_set(out) == set(k4)


def test_ktruss_single_triangle_below_k4(spark):
    """A lone triangle has support 1 everywhere: empty 4-truss, but it
    IS a 3-truss (support >= 1)."""
    from kgforge.graph.algo import ktruss

    tri = [(0, 1), (0, 2), (1, 2)]
    assert ktruss(_und(spark, tri), k=4, rounds=None).count() == 0
    assert _edge_set(ktruss(_und(spark, tri), k=3, rounds=None)) == set(tri)


def _cascade_edges():
    """Three-layer support-dependency tree: level-1 edges have support 1
    (die round 1), destroying the triangles that held level-2 edges at
    support 3 (die round 2, down to 1), destroying the two triangles
    that held the apex edge (0,1) at support 2 (dies round 3).  Peeling
    provably CASCADES — each round's drop is caused by the previous
    round's, not visible in the initial supports."""
    edges = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]  # apex + 2 triangles
    w = 10
    for u, v in [(0, 2), (1, 2), (0, 3), (1, 3)]:  # 2 side triangles each
        for _ in range(2):
            edges += [(u, w), (v, w)]
            w += 1
    return edges


def test_ktruss_cascade_needs_three_rounds(spark):
    """The dependency tree unravels one layer per round: after 2 rounds
    the apex edge still stands (the unrolled oracle snapshot provably
    differs from the empty fixed point); convergence takes 3."""
    from kgforge.graph.algo import ktruss

    und = _und(spark, _cascade_edges())
    after2 = ktruss(und, k=4, rounds=2)
    assert _edge_set(after2) == {(0, 1)}
    stats: dict = {}
    converged = ktruss(und, k=4, rounds=None, stats=stats)
    assert converged.count() == 0
    assert stats["rounds"] == 3


def test_ktruss_nonsilent_guard(spark):
    import pytest

    from kgforge.graph.algo import ktruss

    with pytest.raises(RuntimeError, match="did not stabilize"):
        ktruss(_und(spark, _cascade_edges()), k=4, rounds=None, max_rounds=2)


def _sym(spark, pairs):
    both = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    return spark.createDataFrame(sorted(both), "a bigint, b bigint")


def _seeds(spark, vs):
    return spark.createDataFrame([(v,) for v in vs], "v bigint")


def test_betweenness_path_matches_brandes_by_hand(spark):
    """P5 (0-1-2-3-4), all vertices as seeds, horizon covers the whole
    graph: exact Brandes values 0, 6, 8, 6, 0."""
    from kgforge.graph.algo import betweenness

    sym = _sym(spark, [(i, i + 1) for i in range(4)])
    out = {
        r.v: r.bc
        for r in betweenness(sym, _seeds(spark, range(5)), depth=4).collect()
    }
    assert {v: round(b, 9) for v, b in out.items()} == {
        0: 0.0, 1: 6.0, 2: 8.0, 3: 6.0, 4: 0.0
    }


def test_betweenness_c4_splits_sigma(spark):
    """C4: each vertex sits on exactly half the two shortest paths
    between its two opposite-corner pairs — bc = 1/2 + 1/2 = 1.  Pins
    the sigma (path-count) arithmetic, not just reachability."""
    from kgforge.graph.algo import betweenness

    sym = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    out = {
        r.v: r.bc
        for r in betweenness(sym, _seeds(spark, range(4)), depth=3).collect()
    }
    assert {v: round(b, 9) for v, b in out.items()} == {
        0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0
    }


def test_betweenness_depth_truncation(spark):
    """depth=1: only length-1 paths exist inside the horizon, and no
    vertex is interior to one — all dependencies are 0, while n_seeds
    still counts the seeds that reached each vertex."""
    from kgforge.graph.algo import betweenness

    sym = _sym(spark, [(i, i + 1) for i in range(4)])
    rows = betweenness(sym, _seeds(spark, range(5)), depth=1).collect()
    assert rows and all(r.bc == 0.0 for r in rows)
    n_seeds = {r.v: r.n_seeds for r in rows}
    assert n_seeds[2] == 2  # reached by 1 and 3 within one hop


# ---------- modularity ----------

def test_modularity_two_triangle_bridge_hand_computed(spark):
    """Two triangles joined by one bridge, ground-truth partition:
    m=7, each triangle has e_in=3, deg_sum=7 ->
    Q_c = 3/7 - (7/14)^2 = 0.178571 each, global Q = 0.357143."""
    from kgforge.graph.algo import modularity

    und = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "a bigint, b bigint",
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)],
        "v bigint, label bigint",
    )
    rows = {r.community: r for r in modularity(und, labels).collect()}
    assert set(rows) == {1, 4}
    for c in (1, 4):
        assert rows[c].n_members == 3
        assert rows[c].e_in == 3
        assert rows[c].deg_sum == 7
        assert rows[c].q_contrib == pytest.approx(3 / 7 - 0.25, abs=1e-6)
    assert sum(r.q_contrib for r in rows.values()) == pytest.approx(
        0.357143, abs=1e-6
    )


def test_modularity_single_community_is_zero(spark):
    """Everything in one community: e_in=m, deg_sum=2m -> Q = 0 exactly."""
    from kgforge.graph.algo import modularity

    und = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "a bigint, b bigint")
    labels = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9)], "v bigint, label bigint"
    )
    [r] = modularity(und, labels).collect()
    assert (r.e_in, r.deg_sum, r.q_contrib) == (3, 6, 0.0)


# ---------- random walks ----------

@pytest.fixture(scope="module")
def walk_graph(spark):
    """Path 1-2-3-4 plus a pendant 5 on 2: mixed degrees (1, 2, 3)."""
    und = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("b", "e")], "a string, b string"
    )
    return (
        und.select(F.col("a").alias("v"), F.col("b").alias("u"))
        .unionByName(und.select(F.col("b").alias("v"), F.col("a").alias("u")))
        .localCheckpoint(eager=True)
    )


def test_random_walks_every_hop_is_an_edge(spark, walk_graph):
    from kgforge.graph.algo import random_walks

    corpus = random_walks(walk_graph, length=3).collect()
    edges = {(r.v, r.u) for r in walk_graph.collect()}
    bywalk = {}
    for r in corpus:
        bywalk.setdefault(r.walk_id, {})[r.pos] = r.node
    assert len(bywalk) == 5  # one walk per vertex
    for wid, seq in bywalk.items():
        assert sorted(seq) == [0, 1, 2, 3]  # full length, no dead ends
        assert seq[0] == wid  # walk starts at its id
        for t in range(3):
            assert (seq[t], seq[t + 1]) in edges


def test_random_walks_deterministic(spark, walk_graph):
    from kgforge.graph.algo import random_walks

    a = {(r.walk_id, r.pos, r.node) for r in random_walks(walk_graph, 3).collect()}
    b = {(r.walk_id, r.pos, r.node) for r in random_walks(walk_graph, 3).collect()}
    assert a == b and len(a) == 20


# ---------- HITS ----------

def test_hits_two_rounds_hand_computed(spark):
    """a->c, b->c, c->d.  Worked by hand (L2 norm each half-round):
    after round 2 auth: c=4/sqrt(17), d=1/sqrt(17);
    hub: a=b=4/sqrt(33), c=1/sqrt(33); all else 0."""
    import math

    from kgforge.graph.algo import hits

    de = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    got = {r.v: (r.hub, r.auth) for r in hits(de, rounds=2).collect()}
    s17, s33 = math.sqrt(17), math.sqrt(33)
    exp = {
        "a": (4 / s33, 0.0),
        "b": (4 / s33, 0.0),
        "c": (1 / s33, 4 / s17),
        "d": (0.0, 1 / s17),
    }
    assert set(got) == set(exp)
    for v, (h, a) in exp.items():
        assert abs(got[v][0] - h) < 1e-12 and abs(got[v][1] - a) < 1e-12


def test_hits_convergence_mode_reaches_fixpoint(spark):
    """rounds=None iterates the SAME loop to tol: at the fixed point one
    more fixed-round step from the converged vectors changes nothing
    beyond tol, and the symmetric hubs (a, b) stay exactly tied."""
    from kgforge.graph.algo import hits

    de = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    stats = {}
    fixed = {
        r.v: (r.hub, r.auth)
        for r in hits(de, rounds=None, tol=1e-9, max_rounds=100, stats=stats).collect()
    }
    assert stats["last_delta"] < 1e-9
    assert abs(fixed["a"][0] - fixed["b"][0]) < 1e-12
    # principal-eigenvector structure: c dominates authorities
    assert fixed["c"][1] > fixed["d"][1] > 0


def test_hits_nonconvergence_raises(spark):
    from kgforge.graph.algo import hits

    de = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        hits(de, rounds=None, tol=1e-15, max_rounds=1)


# ---------- node2vec biased walks ----------

def _cycle_nbrs(spark, n=20):
    """Undirected n-cycle as a symmetric neighbor list."""
    edges = [(f"v{i:02d}", f"v{(i + 1) % n:02d}") for i in range(n)]
    und = spark.createDataFrame(edges, "a string, b string")
    return (
        und.select(F.col("a").alias("v"), F.col("b").alias("u"))
        .unionByName(und.select(F.col("b").alias("v"), F.col("a").alias("u")))
        .localCheckpoint(eager=True)
    )


def test_node2vec_every_hop_is_an_edge_and_deterministic(spark, walk_graph):
    from kgforge.graph.algo import node2vec_walks

    corpus = node2vec_walks(walk_graph, length=3).collect()
    edges = {(r.v, r.u) for r in walk_graph.collect()}
    bywalk = {}
    for r in corpus:
        bywalk.setdefault(r.walk_id, {})[r.pos] = r.node
    assert len(bywalk) == 5
    for wid, seq in bywalk.items():
        assert sorted(seq) == [0, 1, 2, 3]
        assert seq[0] == wid
        for t in range(3):
            assert (seq[t], seq[t + 1]) in edges
    again = {
        (r.walk_id, r.pos, r.node)
        for r in node2vec_walks(walk_graph, length=3).collect()
    }
    assert again == {(r.walk_id, r.pos, r.node) for r in corpus}


def test_node2vec_outward_bias_on_cycle(spark):
    """On a cycle every biased hop chooses between returning (alpha
    1/p = 0.25) and advancing (alpha 1/q = 4.0): backtrack probability
    is 0.25/4.25 ~ 5.9% per hop vs 50% uniform.  40 biased hops -> a
    handful of backtracks at most; uniform walks on the same graph
    backtrack ~half the time.  Deterministic, so the counts are pinned
    by the hash, not flaky."""
    from kgforge.graph.algo import node2vec_walks, random_walks

    nbr = _cycle_nbrs(spark, 20)

    def backtracks(corpus):
        bywalk = {}
        for r in corpus:
            bywalk.setdefault(r.walk_id, {})[r.pos] = r.node
        n = 0
        for seq in bywalk.values():
            for t in range(2, max(seq) + 1):
                if seq[t] == seq[t - 2]:
                    n += 1
        return n

    biased = backtracks(node2vec_walks(nbr, length=3).collect())
    uniform = backtracks(random_walks(nbr, length=3).collect())
    assert biased <= 8  # E ~ 2.4 of 40
    assert uniform >= 9  # E ~ 20 of 40 (weak-hash uniform drifts low)
    assert biased < uniform


def test_node2vec_rejects_non_power_of_two(spark, walk_graph):
    from kgforge.graph.algo import node2vec_walks

    with pytest.raises(AssertionError, match="powers of two"):
        node2vec_walks(walk_graph, length=2, p=3.0, q=0.5)


# ---------- PageRank warm start ----------

def test_pagerank_warm_start_from_fixpoint_converges_immediately(spark):
    """init = the converged vector -> the first delta is already below
    tol: one round, and the ranks are unchanged (it IS the fixpoint)."""
    edges = _chain_edges(spark, n=10)
    cold_stats = {}
    cold = pagerank(edges, rounds=None, tol=1e-8, max_rounds=200, stats=cold_stats)
    warm_stats = {}
    warm = pagerank(
        edges, rounds=None, tol=1e-8, max_rounds=200, stats=warm_stats,
        init=cold,
    )
    assert warm_stats["rounds"] == 1
    assert cold_stats["rounds"] > 3
    cm, wm = _pr_map(cold), _pr_map(warm)
    assert all(abs(cm[v] - wm[v]) < 1e-7 for v in cm)


def test_pagerank_warm_start_after_delta_saves_rounds(spark):
    """Converge on the 12-chain, append one edge (and its new vertex),
    re-converge warm vs cold: warm needs strictly fewer rounds and
    reaches the same fixpoint (1e-9 agreement after rounding)."""
    edges = _chain_edges(spark, n=12)
    prev = pagerank(edges, rounds=None, tol=1e-9, max_rounds=300)
    edges2 = edges.unionByName(
        spark.createDataFrame([(11, 12)], "src bigint, dst bigint")
    )
    cold_stats, warm_stats = {}, {}
    cold = pagerank(edges2, rounds=None, tol=1e-9, max_rounds=300, stats=cold_stats)
    warm = pagerank(
        edges2, rounds=None, tol=1e-9, max_rounds=300, stats=warm_stats,
        init=prev,
    )
    assert warm_stats["rounds"] < cold_stats["rounds"]
    cm, wm = _pr_map(cold), _pr_map(warm)
    assert set(cm) == set(wm)
    assert all(abs(cm[v] - wm[v]) < 1e-7 for v in cm)


def test_pagerank_warm_start_rejects_seeded_mode(spark):
    edges = _chain_edges(spark, n=5)
    prev = pagerank(edges, rounds=3)
    with pytest.raises(ValueError, match="global mode"):
        pagerank(edges, rounds=3, seed=0, init=prev)


# ---------- weighted PageRank ----------

def test_pagerank_weight_one_reduces_to_uniform_bitwise(spark):
    """An explicit w=1.0 column must give BIT-IDENTICAL ranks to the
    unweighted call (1.0·pr/SUM(1.0) == pr/COUNT in IEEE754) — the
    invariant that keeps every existing unrolled oracle green."""
    edges = _chain_edges(spark, n=9)
    plain = _pr_map(pagerank(edges, rounds=3))
    w1 = _pr_map(pagerank(edges.withColumn("w", F.lit(1.0)), rounds=3))
    assert plain == w1


def test_pagerank_weights_redirect_mass(spark):
    """Fork 0->{1,2} with w(0->1)=9, w(0->2)=1: vertex 1 must outrank
    vertex 2, and the exact round-1 split is 0.15/3 + 0.85·(1/3)·(9/10)
    vs ·(1/10) (hand-computed, dangling mass from 1 and 2 uniform)."""
    de = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 1.0)], "src bigint, dst bigint, w double"
    )
    got = _pr_map(pagerank(de, rounds=1))
    third = 1.0 / 3.0
    dang = 2 * third  # vertices 1 and 2 dangle
    base = 0.15 / 3 + 0.85 * (dang / 3)
    assert abs(got[1] - (base + 0.85 * third * 0.9)) < 1e-12
    assert abs(got[2] - (base + 0.85 * third * 0.1)) < 1e-12
    assert abs(got[0] - base) < 1e-12
    assert got[1] > got[2]


# ---------- randomized invariants (seeded, deterministic) ----------

def _random_digraph(spark, seed, n=14, m=30):
    import random

    rng = random.Random(seed)
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
    edges = sorted((a, b) for a, b in edges if a != b)
    return spark.createDataFrame(edges, "src bigint, dst bigint")


def test_hits_norms_on_random_graphs(spark):
    """On any digraph: both vectors L2-normalize to 1 each round and all
    scores are non-negative (raw sums of non-negatives)."""
    from kgforge.graph.algo import hits

    for seed in (7, 23):
        de = _random_digraph(spark, seed)
        rows = hits(de, rounds=2).collect()
        h2 = sum(r.hub ** 2 for r in rows)
        a2 = sum(r.auth ** 2 for r in rows)
        assert abs(h2 - 1.0) < 1e-9 and abs(a2 - 1.0) < 1e-9
        assert all(r.hub >= 0 and r.auth >= 0 for r in rows)


def test_weighted_pagerank_conserves_mass_on_random_graphs(spark):
    """Uniform restart + uniform dangling redistribution conserve total
    rank mass 1 regardless of edge weights."""
    import random

    for seed in (3, 11):
        de = _random_digraph(spark, seed)
        rng = random.Random(seed + 100)
        wde = de.withColumn(
            "w", (F.pmod(F.xxhash64("src", "dst"), F.lit(7)) + 1).cast("double")
        )
        pr = pagerank(wde, rounds=4)
        mass = sum(r.pr for r in pr.collect())
        assert abs(mass - 1.0) < 1e-9


def test_node2vec_valid_on_random_graph(spark):
    """Biased walks on a random undirected graph: every hop is an edge,
    one full-length walk per vertex, byte-deterministic."""
    from kgforge.graph.algo import node2vec_walks

    de = _random_digraph(spark, 42)
    und = de.filter(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    nbr = (
        und.select(F.col("a").alias("v"), F.col("b").alias("u"))
        .unionByName(und.select(F.col("b").alias("v"), F.col("a").alias("u")))
        .localCheckpoint(eager=True)
    )
    n_verts = nbr.select("v").distinct().count()
    corpus = node2vec_walks(nbr, length=3).collect()
    edges = {(r.v, r.u) for r in nbr.collect()}
    bywalk = {}
    for r in corpus:
        bywalk.setdefault(r.walk_id, {})[r.pos] = r.node
    assert len(bywalk) == n_verts
    for seq in bywalk.values():
        assert sorted(seq) == [0, 1, 2, 3]
        for t in range(3):
            assert (seq[t], seq[t + 1]) in edges
    again = {
        (r.walk_id, r.pos, r.node)
        for r in node2vec_walks(nbr, length=3).collect()
    }
    assert again == {(r.walk_id, r.pos, r.node) for r in corpus}


def _scc_sets(spark, edges):
    from kgforge.graph.algo import scc

    de = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = {}
    for r in scc(de).collect():
        out.setdefault(r.scc_id, set()).add(r.v)
    return out


def test_scc_planted_graphs(spark):
    """Hand-derived SCCs: chain (all singletons — the trim fast path),
    cycle feeding a cycle (two multi-member SCCs resolving across
    peel layers), an upstream label SMALLER than a cycle's members
    (the peel-ordering case: 0 -> cycle{5,6} must not pollute the
    cycle's label), and a self-loop-only vertex (singleton)."""
    assert _scc_sets(spark, [(1, 2), (2, 3)]) == {1: {1}, 2: {2}, 3: {3}}
    assert _scc_sets(
        spark, [(1, 2), (2, 3), (3, 1), (3, 5), (5, 6), (6, 5), (7, 7)]
    ) == {1: {1, 2, 3}, 5: {5, 6}, 7: {7}}
    assert _scc_sets(spark, [(0, 5), (5, 6), (6, 5)]) == {
        0: {0}, 5: {5, 6},
    }


def test_scc_matches_undirected_cc_on_symmetric_graph(spark):
    """On a symmetric edge set SCC == undirected CC (every undirected
    component is strongly connected when both directions exist) — the
    cross-algorithm consistency pin between graph/algo.scc and
    link/cc.connected_components."""
    from kgforge.graph.algo import scc
    from kgforge.link.cc import connected_components

    sym = [(1, 2), (2, 1), (2, 3), (3, 2), (8, 9), (9, 8)]
    de = spark.createDataFrame(sym, "src bigint, dst bigint")
    got = {(r.v, r.scc_id) for r in scc(de).collect()}
    verts = (
        de.select(F.col("src").alias("entity_id"))
        .unionByName(de.select(F.col("dst").alias("entity_id")))
        .distinct()
    )
    cc = {
        (r.entity_id, r.canonical_id)
        for r in connected_components(verts, de).collect()
    }
    assert got == cc


def test_scc_loud_guard(spark):
    """max_outer exhaustion raises instead of returning a partial
    labeling (non-silent-guard rule)."""
    import pytest as _pytest

    from kgforge.graph.algo import scc

    # long chain of 2-cycles: {0,1} -> {2,3} -> ... peels one layer per
    # outer round (trim never fires: every vertex has in+out edges)
    edges = []
    for i in range(0, 8, 2):
        edges += [(i, i + 1), (i + 1, i)]
        if i + 2 < 8:
            edges += [(i + 1, i + 2)]
    de = spark.createDataFrame(edges, "src bigint, dst bigint")
    with _pytest.raises(RuntimeError, match="outer rounds"):
        scc(de, max_outer=1)
    # and with room it resolves fully
    out = _scc_sets(spark, edges)
    assert out == {0: {0, 1}, 2: {2, 3}, 4: {4, 5}, 6: {6, 7}}
