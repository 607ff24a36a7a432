"""Mergeable frequency sketches — count-min over a token stream.

The sketch is plain relational state: a (j, bucket, cell_n) table of at
most ``CMS_D x CMS_W`` rows whose cells are SUMS — so two sketches merge
by unioning their cell tables and re-summing, and a sketch over a corpus
equals the merge of sketches over any partition of that corpus EXACTLY
(not approximately; the approximation lives only in the estimate-time
min-over-rows).  That identity is what makes the sketch incremental:
per-epoch cell tables accumulate under the same fold discipline as the
dedup signature state, and estimates read the running sum.

Hashes are the repo-shared charfold family (functions/hashing), so
DuckDB replays every cell bit-identically — sketch state itself is
oracle-checkable.

Public method: Cormode & Muthukrishnan 2005 (count-min sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import MINHASH_AB, MOD, charfold

# Width sized below real vocabularies on purpose in the measurement
# query (see token_cms_topk); production sizing is W ~ e/epsilon.
CMS_W = 8
CMS_D = 3
CMS_JAB = [(j, a, b) for j, (a, b) in enumerate(MINHASH_AB[:CMS_D])]


def _bucket_array(h_col) -> F.Column:
    """array of CMS_D bucket ids for one hashed key."""
    return F.array(
        *[
            ((F.lit(a) * h_col + F.lit(b)) % MOD % CMS_W).cast("bigint")
            for _, a, b in CMS_JAB
        ]
    )


def cms_cells(keys: DataFrame, key_col: str = "tok") -> DataFrame:
    """Sketch a key stream into (j, bucket, cell_n) cells: ONE groupBy
    with map-side combine — each executor reduces its partitions to
    <= CMS_D x CMS_W partial cells before the shuffle, which is the
    mergeable-sketch property in dataflow form."""
    return (
        keys.withColumn("h", charfold(F.col(key_col)))
        .select(F.posexplode(_bucket_array(F.col("h"))).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cell_n"))
    )


def cms_merge(parts: list[DataFrame]) -> DataFrame:
    """Merge sketches by cell-wise sum.  cms_merge([cells(b) for b in
    batches]) == cells(union of batches) EXACTLY (pinned by
    tests/test_sketches.py)."""
    it = iter(parts)
    u = next(it)
    for p in it:
        u = u.unionByName(p)
    return u.groupBy("j", "bucket").agg(F.sum("cell_n").alias("cell_n"))


def cms_estimate(cells: DataFrame, keys: DataFrame, key_col: str = "tok") -> DataFrame:
    """Point estimates for a table of DISTINCT keys (caller guarantees
    distinctness): min over the D probed cells.  Every non-key column of
    ``keys`` rides through unchanged, so callers estimate in one pass
    without a re-join.  ``cells`` is <= CMS_D x CMS_W rows BY
    CONSTRUCTION — the one broadcast that needs no size gate."""
    cols = keys.columns
    probes = keys.withColumn("h", charfold(F.col(key_col))).select(
        *cols, F.posexplode(_bucket_array(F.col("h"))).alias("j", "bucket")
    )
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy(*cols)
        .agg(F.min("cell_n").alias("cms_est"))
    )
