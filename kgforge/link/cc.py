"""Connected components by iterative DataFrame joins (entity linking).

Min-label propagation with pointer jumping: every vertex adopts the
minimum label in its closed neighborhood, then compresses paths via
``l(v) <- l(l(v))`` (the doubling step of classic PRAM CC; same asymptotics
as GraphFrames' large-star/small-star).  Converges in O(log n) rounds;
each round is two shuffles (neighbor agg + label self-join).  ``localCheckpoint``
per iteration truncates lineage so the plan doesn't grow exponentially
(SURVEY.md §4.3); an iteration cap + convergence metric guard runaway
inputs (never silent).

Reference analog: ``RuntimeGraph`` over networkx.DiGraph
(models/runtime_graph.py:44-146) — registered but disabled there; linking
is required by the north rule, so it is first-class here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITERATIONS = 25


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "entity_id",
    max_iterations: int = MAX_ITERATIONS,
) -> DataFrame:
    """Return ``(entity_id, canonical_id)`` — canonical_id = min vertex id
    reachable in the undirected graph ``edges(src, dst)``.

    Isolated vertices map to themselves.
    """
    # Undirected closure: both directions + self loop.
    # Materialized once: every round's convergence count is a separate
    # action, and without this the union+distinct (a full edge shuffle)
    # re-executes per round — at 100x that recompute, not the label
    # joins, is the growing term.
    from ..functions.joins import maybe_broadcast

    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = vertices.select(
        F.col(vertex_col).alias("a"), F.col(vertex_col).alias("canonical_id")
    ).localCheckpoint(eager=True)
    # r8: the label table and its per-round derivatives are vertex-scale
    # dims — SIZE-GATED broadcasts (one count here gates every round;
    # labels stays 1:1 with the vertex set).  Under the gate a round is
    # one exchange (the neighbor-min groupBy) instead of four; above it
    # every join falls back to the keyed shuffle.  All label math is
    # integer min — broadcast-join row-order changes cannot perturb it.
    n_v = labels.count()

    for _ in range(max_iterations):
        # min over closed neighborhood: own label ∧ min(neighbor labels)
        nbr_min = (
            sym.join(
                maybe_broadcast(labels.withColumnRenamed("a", "b"), n_rows=n_v),
                on="b",
            )
            .groupBy("a")
            .agg(F.min("canonical_id").alias("nbr_min"))
        )
        new_labels = labels.join(
            maybe_broadcast(nbr_min, n_rows=n_v), on="a", how="left"
        ).select(
            "a",
            F.least(
                F.col("canonical_id"), F.coalesce("nbr_min", "canonical_id")
            ).alias("canonical_id"),
            F.col("canonical_id").alias("_prev"),
        )
        # pointer jumping (path compression): l(v) <- l(l(v)).  Labels are
        # vertex ids, so the self-join resolves; this is what turns 1-hop
        # propagation into O(log n) convergence on long chains.  The
        # PRE-round label rides along as _prev so the convergence check
        # below is a scan of the frame this round materializes anyway —
        # not an extra labels-vs-labels shuffle join per round.  Paired
        # 100x study (BENCH/single_kg_cc_components_100x.json): best
        # flat, median 0.95x — this corpus converges in ~2 rounds, so
        # the saving is one shuffle per round; the structural case is
        # long-chain graphs where rounds (and the per-round join's
        # label-table shuffle) multiply.
        parent = new_labels.select(
            F.col("a").alias("p"), F.col("canonical_id").alias("p_label")
        )
        parent = maybe_broadcast(parent, n_rows=n_v)
        new_labels = (
            new_labels.join(parent, new_labels.canonical_id == parent.p, "left")
            .select(
                "a",
                F.least(
                    F.coalesce("p_label", "canonical_id"), F.col("canonical_id")
                ).alias("canonical_id"),
                F.col("_prev"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.filter(F.col("canonical_id") != F.col("_prev"))
            .limit(1)
            .count()
        )
        labels = new_labels.select("a", "canonical_id")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    return labels.withColumnRenamed("a", vertex_col)
