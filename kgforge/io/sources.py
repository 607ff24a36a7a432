"""Input-table readers: Iceberg when a catalog is configured, parquet
otherwise (SURVEY.md §7.1 io/sources).

The north rule names an Iceberg table of source-code repositories
(repo, path, commit, lang, content).  The Iceberg runtime jar is not in
this sandbox, so the Iceberg branch is gated on the catalog actually
resolving; the parquet branch carries identical semantics.  Both attach
the sha256 provenance column (F14) and validate the expected schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPOS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def _validate(df: DataFrame) -> DataFrame:
    missing = [c for c in REPOS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"repos table missing columns: {missing}")
    return df.select(*REPOS_COLUMNS)


def read_repos(
    spark: SparkSession,
    source: str,
    with_sha: bool = True,
    min_partitions: int | None = None,
) -> DataFrame:
    """Read the repos input table.

    source = ``table:<catalog.db.name>`` for an Iceberg/catalog table,
    anything else is treated as a parquet path.  ``min_partitions``
    guards against tiny local inputs collapsing to one scan split (the
    single-split trap, docs/PLANS.md §2).
    """
    if source.startswith("table:"):
        df = spark.read.table(source.split(":", 1)[1])
    else:
        df = spark.read.parquet(source)
    df = _validate(df)
    if min_partitions and df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    if with_sha:
        df = df.withColumn("content_sha", F.sha2(F.col("content"), 256))
    return df
