"""Incremental MinHash-LSH document dedup against persisted signature
state (r4 VERDICT #1).

The production behavior: a corpus accumulates in batches; per batch we
want the near-dup pairs the NEW documents introduce — new-vs-old and
new-vs-new — without ever recomputing old signatures or rescanning old
documents' text.  This mirrors the delta re-linking pattern of
graph/merge.update_canonical (and the reference's cache-keyed dataset
reuse, data/data_module.py:55-67 — never recompute what's keyed).

State layout (one parquet dir per table; at cluster scale these are the
bucketed/Iceberg tables io/sinks.write_bucketed describes):

  state/sig/      (doc_id, s0..s3, n_sh)   — MinHash signatures + the
                                             doc's distinct-shingle count
  state/shingle/  (doc_id, sh)             — shingle inverted index,
                                             clustered by doc_id

Semantics (exact, not approximate — pinned by the two-batch == one-shot
property test): the emitted pairs equal the from-scratch
``dedup_minhash_pairs`` run over the ACCUMULATED corpus, restricted to
pairs with at least one endpoint in the new batch.  That includes the
hot-bucket cap: bucket sizes are counted over the accumulated band
table, so a bucket an old epoch paired on can saturate once the batch
pushes it past ``max_bucket`` — exactly what the one-shot run would do.

Cost shape at 10^12-doc scale: everything old-side is first semi-joined
down to the NEW batch's band buckets (buckets untouched by the batch
cannot produce a pair touching the batch), so the per-epoch work scales
with the delta's bucket neighborhood, not the accumulated corpus —
the same property that keeps update_canonical viable.  The old shingle
index is read only for the candidate docs that survive banding.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashing import (
    minhash_from_arrays,
    shingle_arrays,
    signature_bands,
)
from .functions.joins import maybe_broadcast

MAX_BUCKET = 64  # as in link/canonical.py — a degenerate bucket of d docs
#                  would contribute d^2/2 candidates
THRESHOLD = 0.5


def build_state(docs: DataFrame) -> dict[str, DataFrame]:
    """Signature state for an initial corpus batch (doc_id, text).

    r8: signatures come from the row-local array fold
    (minhash_from_arrays — bit-identical to the explode+groupBy form),
    so building state costs one corpus pass with NO shuffle; the
    persisted state layout (exploded shingle index + sig table) is
    unchanged."""
    sharr = shingle_arrays(docs)
    sh = sharr.select("doc_id", F.explode("sh_arr").alias("sh"))
    return {"sig": minhash_from_arrays(sharr), "shingle": sh}


def save_state(state: dict[str, DataFrame], path: str, n_parts: int = 32) -> None:
    """Persist state clustered by its join keys.  Plain parquet with a
    keyed repartition here; the cluster deployment writes the same frames
    through io/sinks.write_bucketed (bucketBy doc_id) / an Iceberg table
    so epoch-over-epoch joins skip the exchange."""
    state["sig"].repartition(n_parts, "doc_id").write.mode("overwrite").parquet(
        os.path.join(path, "sig")
    )
    state["shingle"].repartition(n_parts, "doc_id").write.mode("overwrite").parquet(
        os.path.join(path, "shingle")
    )


def load_state(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    return {
        "sig": spark.read.parquet(os.path.join(path, "sig")),
        "shingle": spark.read.parquet(os.path.join(path, "shingle")),
    }


def _exact_jaccard_pairs(
    cand: DataFrame,
    sh_all: DataFrame,
    counts: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs against a shingle
    table: shared-shingle count per (doc_a, doc_b) joined to each
    endpoint's distinct-shingle count.  ``counts`` is (doc_id, n);
    ``sh_all`` is (doc_id, sh) covering at least every candidate doc."""
    sh_a = sh_all.select(F.col("doc_id").alias("doc_a"), "sh")
    sh_b = sh_all.select(F.col("doc_id").alias("doc_b"), "sh")
    shared = (
        cand.join(sh_a, on="doc_a")
        .join(sh_b, on=["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    j = (
        cand.join(shared, on=["doc_a", "doc_b"], how="left")
        .fillna(0, subset=["shared"])
        .join(
            counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"),
            on="doc_a",
        )
        .join(
            counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"),
            on="doc_b",
        )
        .withColumn(
            "jac",
            F.col("shared")
            / (F.col("na") + F.col("nb") - F.col("shared") + F.lit(1e-12)),
        )
    )
    return j.filter(F.col("jac") >= threshold).select(
        "doc_a", "doc_b", F.round("jac", 4).alias("jaccard")
    )


def pairs_from_state(
    state: dict[str, DataFrame],
    *,
    max_bucket: int = MAX_BUCKET,
    threshold: float = THRESHOLD,
) -> DataFrame:
    """FROM-SCRATCH pair set over the accumulated corpus, computed
    entirely from persisted state (sig + shingle) — text is never
    rescanned, signatures never recomputed.

    Semantics == the one-shot ``dedup_minhash_incremental(docs, None)``
    over the same corpus: band buckets and the hot-bucket cap are
    evaluated on the FULL accumulated band table, so a bucket that
    saturated only across epochs is suppressed here exactly as a
    rebuild would suppress it.  This is the reconciliation path for the
    epoch-union's strict-superset caveat —
    streaming.compact_epochs(rebuild_pairs=True) swaps the accumulated
    pair union for this set at compaction time."""
    sig = state["sig"]
    bands = signature_bands(sig)
    hot = (
        bands.groupBy("band", "k0", "k1")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > max_bucket)
        .select("band", "k0", "k1")
        # two consumers below when gated (count + join probe): pay the
        # aggregate once
        .localCheckpoint(eager=True)
    )
    # size-gated, NOT F.broadcast: the hot-bucket dim is data-dependent —
    # it grows with saturated buckets on boilerplate-heavy ACCUMULATED
    # corpora, exactly the class maybe_broadcast exists for (r5 rule;
    # r6 ADVICE, low).  Above the gate the anti-join falls back to
    # shuffle and AQE handles it.
    kept = bands.join(
        maybe_broadcast(hot), on=["band", "k0", "k1"], how="left_anti"
    )
    cand = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.k0") == F.col("b.k0"))
            & (F.col("a.k1") == F.col("b.k1"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_needed = state["shingle"].join(cand_docs, on="doc_id", how="left_semi")
    counts = sig.select("doc_id", F.col("n_sh").alias("n"))
    return _exact_jaccard_pairs(cand, sh_needed, counts, threshold)


def dedup_minhash_incremental(
    new_docs: DataFrame,
    state: dict[str, DataFrame] | None,
    *,
    max_bucket: int = MAX_BUCKET,
    threshold: float = THRESHOLD,
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """Near-dup pairs introduced by ``new_docs`` against the accumulated
    corpus, plus the evolved state.

    Returns ``(pairs, new_state)`` where pairs is (doc_a, doc_b, jaccard)
    with doc_a < doc_b, at least one endpoint in the new batch, exact
    Jaccard >= threshold; and new_state is the input state extended with
    the batch's signatures/shingles (old rows carried forward verbatim —
    never recomputed).  doc_ids must be globally unique across batches.
    """
    # r8: ONE checkpointed array pass per batch; the exploded index and
    # the signatures are row-local projections of it (no groupBy shuffle,
    # bit-identical signatures)
    new_arr = shingle_arrays(new_docs).localCheckpoint(eager=True)
    new_sh = new_arr.select("doc_id", F.explode("sh_arr").alias("sh"))
    new_sig = minhash_from_arrays(new_arr)
    new_bands = signature_bands(new_sig)

    if state is None:
        old_sig = None
        old_bands_touched = new_bands.limit(0)
    else:
        old_sig = state["sig"]
        # prune the old band table to the batch's bucket neighborhood:
        # a bucket with no new member cannot yield a pair touching the
        # batch.  signature_bands is a projection of the persisted sig
        # table — old hashes are read, never recomputed.
        # delta-bounded but still data-dependent (a backfill batch can be
        # arbitrarily large) — size-gate the hint like the hot dims
        touched = (
            new_bands.select("band", "k0", "k1")
            .distinct()
            .localCheckpoint(eager=True)
        )
        old_bands_touched = signature_bands(old_sig).join(
            maybe_broadcast(touched), on=["band", "k0", "k1"], how="left_semi"
        )

    # accumulated bucket sizes (over old∪new members of touched buckets)
    # drive the hot-bucket cap — identical to the one-shot run's counts
    # for every bucket that can produce a batch-touching pair.
    all_bands = new_bands.unionByName(old_bands_touched).localCheckpoint(eager=True)
    hot = (
        all_bands.groupBy("band", "k0", "k1")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > max_bucket)
        .select("band", "k0", "k1")
        .localCheckpoint(eager=True)
    )
    # same size gate as pairs_from_state: the saturated-bucket dim is
    # data-dependent (counted over the accumulated epoch union here)
    hot = maybe_broadcast(hot)
    kept_new = new_bands.join(hot, on=["band", "k0", "k1"], how="left_anti")
    kept_all = all_bands.join(hot, on=["band", "k0", "k1"], how="left_anti")

    # new-vs-(new∪old) banded join; normalize to doc_a < doc_b.  A
    # new-new pair matches twice (once per orientation) — the distinct
    # collapses it, same as the one-shot self-join's a < b.
    cand = (
        kept_new.alias("a")
        .join(
            kept_all.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.k0") == F.col("b.k0"))
            & (F.col("a.k1") == F.col("b.k1"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    # exact-Jaccard verification — shingles of candidate endpoints only:
    # the old inverted index is semi-joined down to candidate docs before
    # the shared-shingle join touches it.
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_all = new_sh
    sig_all = new_sig
    if state is not None:
        old_sh_needed = state["shingle"].join(cand_docs, on="doc_id", how="left_semi")
        sh_all = new_sh.unionByName(old_sh_needed)
        sig_all = new_sig.unionByName(old_sig.select(*new_sig.columns))

    counts = sig_all.select("doc_id", F.col("n_sh").alias("n"))
    pairs = _exact_jaccard_pairs(cand, sh_all, counts, threshold)

    # delta_sig/delta_shingle are the BATCH's rows alone — the streaming
    # epoch store persists only these (O(batch) write per epoch, the
    # accumulated tables re-assemble by unioning epoch deltas at read
    # time); sig/shingle stay the accumulated views for the batch API.
    if state is None:
        new_state = {"sig": new_sig, "shingle": new_sh}
    else:
        new_state = {
            "sig": state["sig"].select(*new_sig.columns).unionByName(new_sig),
            "shingle": state["shingle"].unionByName(new_sh),
        }
    new_state["delta_sig"] = new_sig
    new_state["delta_shingle"] = new_sh
    return pairs, new_state
