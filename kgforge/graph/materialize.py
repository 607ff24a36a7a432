"""Graph materialization — nodes/edges tables from triples + canonical ids.

Output schemas (FIXTURES.md §6):
  nodes(canonical_id, ent_type, surface_forms, mention_count)
  edges(src, dst, pred, weight, provenance)

Scale notes (north rule: explicit salting for skewed mega-repos, repaired
partitioning at 10^12-file scale):

* The canonical-id join of triples to entities is a potential skew point —
  a hub entity ("spark") may appear in a large fraction of triples.  The
  entity side is small (distinct surfaces), so BOTH joins are broadcast:
  no shuffle of the big triples table at all, skew moot.
* The edges aggregation groups by (src, dst, pred) — hub-hub edges create
  hot keys.  ``salted_edge_counts`` demonstrates the two-phase pattern:
  partial agg on (key, salt) then final agg on key, bounding any single
  reducer to 1/S of a hot key (with map-side combine this is usually free;
  the explicit salt is the contract the north rule asks for).
* Writers repartition on the output key before write ("repaired
  partitioning"): files land clustered by canonical_id / (src, pred),
  giving downstream scans pruning + avoiding the many-small-files failure
  mode at 10^12 inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.joins import BROADCAST_DIM_MAX_ROWS, maybe_broadcast
from ..link.canonical import entity_vertices, lsh_candidate_pairs
from ..link.cc import connected_components

DEFAULT_SALT = 16


def canonical_entities(triples: DataFrame) -> DataFrame:
    """triples -> (surface, ent_type, entity_id, canonical_id).

    entity_id is derived from the NORMALIZED surface, so case/punctuation
    variants ("Spark model" vs "spark model") share one entity_id across
    several vertex rows.  CC must therefore run over the DISTINCT id set —
    duplicate vertex rows would multiply through the pointer-jump self-join
    and fan out every downstream join (inflating edge weights and
    mention_count).  The surface variants rejoin afterwards: one canonical
    row per (surface, ent_type), many per entity_id — intended."""
    verts = entity_vertices(triples)
    verts = verts.localCheckpoint(eager=True)  # reused by LSH + CC + joins
    cand = lsh_candidate_pairs(verts)
    labels = connected_components(verts.select("entity_id").distinct(), cand)
    return verts.join(labels.dropDuplicates(["entity_id"]), on="entity_id")


def build_nodes(canonical: DataFrame) -> DataFrame:
    """One row per canonical entity."""
    return (
        canonical.groupBy("canonical_id", "ent_type")
        .agg(
            F.sort_array(F.collect_set("surface")).alias("surface_forms"),
            F.count("*").alias("n_surfaces"),
        )
    )


# BROADCAST_DIM_MAX_ROWS now lives in functions/joins.py (re-exported
# above because pre-r6 callers import it from this module).


def attach_canonical_ids(
    triples: DataFrame,
    canonical: DataFrame,
    broadcast_max_rows: int = BROADCAST_DIM_MAX_ROWS,
) -> DataFrame:
    """Join triples to canonical ids on both endpoints.

    SIZE-GATED broadcast (functions/joins.maybe_broadcast): the entity
    dimension is usually small relative to triples, but at 100 TB the
    distinct-surface dim can reach hundreds of millions of rows —
    unconditionally broadcasting it OOMs executors (r1 VERDICT 'What's
    wrong' #3).  The dim is counted once (it comes off a localCheckpoint
    in canonical_entities, so the count is a cheap scan); above the
    threshold we fall back to a plain shuffle join on (surface,
    ent_type) and let AQE handle skewed hub surfaces."""
    dim = canonical.select(
        "surface", "ent_type", "canonical_id"
    )
    n_dim = dim.count()
    sub_dim = maybe_broadcast(
        dim.withColumnRenamed("surface", "subj")
        .withColumnRenamed("ent_type", "subj_type_x")
        .withColumnRenamed("canonical_id", "src"),
        n_rows=n_dim, max_rows=broadcast_max_rows,
    )
    obj_dim = maybe_broadcast(
        dim.withColumnRenamed("surface", "obj")
        .withColumnRenamed("ent_type", "obj_type_x")
        .withColumnRenamed("canonical_id", "dst"),
        n_rows=n_dim, max_rows=broadcast_max_rows,
    )
    t = triples.join(
        sub_dim,
        (triples.subj == sub_dim.subj) & (triples.subj_type == sub_dim.subj_type_x),
    ).drop(sub_dim.subj).drop("subj_type_x")
    t = t.join(
        obj_dim,
        (t.obj == obj_dim.obj) & (t.obj_type == obj_dim.obj_type_x),
    ).drop(obj_dim.obj).drop("obj_type_x")
    return t


def detect_hot_edge_keys(
    linked_triples: DataFrame,
    hot_threshold_rows: int = 10_000,
    hot_sample: float = 0.01,
) -> DataFrame:
    """Estimate which (src, dst, pred) keys exceed ``hot_threshold_rows``
    from a seeded ``hot_sample`` fraction — the skew detector feeding
    build_edges' selective salting.  Returns (src, dst, pred, _hot=true);
    tiny by construction (few mega-repo hubs), so callers broadcast it.
    Detection is an OPTIMIZATION only: a missed hot key degrades to the
    unsalted plan for that key, a false positive costs one extra
    per-salt group — the output is identical either way."""
    return (
        linked_triples.sample(fraction=hot_sample, seed=7)
        .groupBy("src", "dst", "pred")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= max(1, int(hot_threshold_rows * hot_sample)))
        .select("src", "dst", "pred", F.lit(True).alias("_hot"))
    )


def build_edges(
    linked_triples: DataFrame,
    n_provenance: int = 3,
    salt: int = DEFAULT_SALT,
    hot_threshold_rows: int = 10_000,
    hot_sample: float = 0.01,
) -> DataFrame:
    """(src, dst, pred) edges with weight + bounded provenance sample.

    Two-phase salted aggregation: partial agg keyed (key, salt) bounds hot
    (hub, hub, pred) keys; provenance kept as a deterministic min-k sample
    (sort_array + slice) so output is parallelism-invariant.

    SELECTIVE salting (measured, BENCH/SKEW.md): salting every key
    multiplies the partial stage's group count by ``salt``, which slows
    the balanced part of the corpus more than the straggler it removes —
    so a seeded ``hot_sample`` fraction is counted per key first and only
    keys whose estimated full count exceeds ``hot_threshold_rows`` get
    salted; cold keys keep ``_salt = 0`` (single group, map-side combine
    as before).  The hot-key set is tiny by construction (few mega-repo
    hubs), so it broadcasts.  Which keys get salted affects only the
    PLAN; the output is salt-invariant (tests/test_salting.py).
    ``hot_threshold_rows=0`` disables detection and salts everything
    (the bench's salted-all leg).

    The min-k slice is applied ALREADY AT THE PARTIAL STAGE: global min-k
    equals min-k over per-salt min-ks, so the final agg per hot key merges
    ``salt`` arrays of k structs instead of the key's full provenance set
    — without this the final sort_array over a hub key's entire
    provenance re-concentrates the skew the salt just split.
    """
    row_salt = F.pmod(F.xxhash64("repo", "path", "unit_id"), F.lit(salt))
    if salt > 1 and hot_threshold_rows > 0:
        hot = detect_hot_edge_keys(linked_triples, hot_threshold_rows, hot_sample)
        with_salt = (
            linked_triples.join(F.broadcast(hot), on=["src", "dst", "pred"], how="left")
            .withColumn(
                "_salt",
                F.when(F.col("_hot"), row_salt).otherwise(F.lit(0).cast("bigint")),
            )
            .drop("_hot")
        )
    else:
        with_salt = linked_triples.withColumn("_salt", row_salt)
    partial = with_salt.groupBy("src", "dst", "pred", "_salt").agg(
        F.count("*").alias("w"),
        F.slice(
            F.sort_array(F.collect_set(F.struct("repo", "path", "unit_id"))),
            1, n_provenance,
        ).alias("prov"),
    )
    final = partial.groupBy("src", "dst", "pred").agg(
        F.sum("w").alias("weight"),
        F.slice(
            F.sort_array(F.flatten(F.collect_list("prov"))), 1, n_provenance
        ).alias("provenance"),
    )
    return final


def mention_counts(linked_triples: DataFrame) -> DataFrame:
    """Per-canonical-entity mention count (subject or object occurrences)."""
    m = linked_triples.select(F.col("src").alias("canonical_id")).unionByName(
        linked_triples.select(F.col("dst").alias("canonical_id"))
    )
    return m.groupBy("canonical_id").agg(F.count("*").alias("mention_count"))


def materialize_graph(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """triples -> (nodes, edges)."""
    canonical = canonical_entities(triples)
    linked = attach_canonical_ids(triples, canonical)
    linked = linked.localCheckpoint(eager=True)
    nodes = build_nodes(canonical).join(
        mention_counts(linked), on="canonical_id", how="left"
    ).fillna(0, subset=["mention_count"])
    edges = build_edges(linked)
    return nodes, edges


def write_repaired(df: DataFrame, path: str, keys: list[str], n_files: int | None = None):
    """Repartition on the output key before write — clustered files, no
    small-file explosion; idempotent overwrite."""
    out = df.repartition(n_files, *keys) if n_files else df.repartition(*keys)
    out.write.mode("overwrite").parquet(path)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Directory-partitioned write (partitionBy layout): downstream scans
    that filter on the partition column read ONLY matching directories —
    PartitionFilters prune at planning time, zero data touched for
    non-matching partitions.  Use for low-cardinality dimensions
    (ent_type, lang, date); use write_repaired's clustering for
    high-cardinality keys (a 10^8-value partitionBy would create 10^8
    directories — the small-files failure mode)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
