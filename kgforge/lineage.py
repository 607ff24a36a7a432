"""Per-stage checkpoint + lineage manifest (north rule: every stage
checkpoints per-partition lineage + triple-count metrics to support
resume-from-failure).

Reference analog: the tensor-cache sink/source keyed by config tag
(S6, data/data_module.py:55-67) — generalized to a manifest-gated
per-stage parquet checkpoint.

Contract (SURVEY.md §7.6): a stage writes its data partition, then appends
``(run_id, stage, partition_id, rows_out, triple_count, content_sha_agg,
wall_ms)`` rows plus a ``_COMPLETE`` marker.  On restart, a stage whose
marker exists is read back, not recomputed.  The marker is written AFTER
the data — a crash mid-write leaves no marker, so the stage reruns
(idempotent overwrite).
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLS = [
    "run_id",
    "stage",
    "partition_id",
    "rows_out",
    "triple_count",
    "content_sha_agg",
    "wall_ms",
]


class StageRunner:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        run_id: str = "run0",
        config: dict | None = None,
    ):
        """``config`` is the stage-relevant parameter set (strategy, model
        name, ...).  Its hash is stored in each ``_COMPLETE`` marker and
        VALIDATED on resume: re-running in the same workdir with different
        parameters reruns the stage instead of silently returning the
        previous configuration's data (ADVICE r1).  run_id is lineage
        metadata only — the same config may resume across run ids."""
        self.spark = spark
        self.workdir = Path(workdir)
        self.run_id = run_id
        self.config = dict(config) if config else {}
        self.config_hash = hashlib.sha256(
            json.dumps(self.config, sort_keys=True).encode()
        ).hexdigest()
        self.workdir.mkdir(parents=True, exist_ok=True)

    def _stage_dir(self, stage: str) -> Path:
        return self.workdir / stage

    def is_complete(self, stage: str) -> bool:
        marker = self._stage_dir(stage) / "_COMPLETE"
        if not marker.exists():
            return False
        try:
            meta = json.loads(marker.read_text())
        except (ValueError, OSError):
            return False  # unreadable marker: treat as incomplete, rerun
        return meta.get("config_hash") == self.config_hash

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(str(self._stage_dir(stage) / "data"))

    def run(self, stage: str, build: Callable[[], DataFrame]) -> DataFrame:
        """Build-or-resume: skip ``build`` entirely when the stage is
        already complete for this workdir."""
        d = self._stage_dir(stage)
        if self.is_complete(stage):
            return self.read(stage)
        t0 = time.monotonic()
        df = build()
        data_path = str(d / "data")
        df.write.mode("overwrite").parquet(data_path)
        wall_ms = int((time.monotonic() - t0) * 1000)

        written = self.spark.read.parquet(data_path)
        has_sha = "content_sha" in written.columns
        per_part = (
            written.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(
                F.count("*").cast("bigint").alias("rows_out"),
                F.count("*").cast("bigint").alias("triple_count"),
                (
                    F.sum(F.crc32(F.col("content_sha"))) if has_sha else F.lit(0)
                )
                .cast("bigint")
                .alias("content_sha_agg"),
            )
            .withColumn("run_id", F.lit(self.run_id))
            .withColumn("stage", F.lit(stage))
            .withColumn("wall_ms", F.lit(wall_ms).cast("bigint"))
            .withColumn("partition_id", F.col("partition_id").cast("int"))
            .select(*LINEAGE_COLS)
        )
        per_part.write.mode("overwrite").parquet(str(d / "lineage"))
        (d / "_COMPLETE").write_text(
            json.dumps(
                {
                    "run_id": self.run_id,
                    "stage": stage,
                    "wall_ms": wall_ms,
                    "config_hash": self.config_hash,
                    "config": self.config,
                }
            )
        )
        return self.read(stage)

    def lineage(self) -> DataFrame:
        """All recorded lineage rows across stages."""
        parts = sorted(str(p) for p in self.workdir.glob("*/lineage"))
        if not parts:
            raise FileNotFoundError(f"no lineage under {self.workdir}")
        return self.spark.read.parquet(*parts)


def run_kg_pipeline(
    spark: SparkSession,
    repos: DataFrame,
    workdir: str,
    run_id: str = "run0",
    strategy: str = "fused",
    model_name: str = "repos",
    context_window: int = 0,
    cross_ner: bool = False,
    edge_salt: int | None = None,
    hot_threshold_rows: int | None = None,
) -> dict[str, DataFrame]:
    """The full checkpointed pipeline: repos -> triples -> canonical ->
    nodes/edges, each stage resumable.

    ``edge_salt`` / ``hot_threshold_rows`` tune build_edges' selective
    skew salting (defaults: DEFAULT_SALT=16 with 10k-row hot detection;
    hot_threshold_rows=0 salts every key, edge_salt=1 disables).  They
    are part of the lineage config, so changing them invalidates the
    cached edges stage rather than silently reusing a differently-salted
    plan's output (output is salt-invariant, but the manifest records
    what actually ran)."""
    from .extract.pipeline import extract_pipeline
    from .graph.materialize import (
        attach_canonical_ids,
        build_edges,
        build_nodes,
        canonical_entities,
        mention_counts,
    )

    runner = StageRunner(
        spark, workdir, run_id,
        config={
            "strategy": strategy,
            "model_name": model_name,
            "context_window": context_window,
            "cross_ner": cross_ner,
            "edge_salt": edge_salt,
            "hot_threshold_rows": hot_threshold_rows,
        },
    )
    triples = runner.run(
        "triples",
        lambda: extract_pipeline(
            repos, strategy, model_name,
            context_window=context_window, cross_ner=cross_ner,
        ),
    )
    canonical = runner.run("canonical", lambda: canonical_entities(triples))
    linked = runner.run("linked", lambda: attach_canonical_ids(triples, canonical))
    nodes = runner.run(
        "nodes",
        lambda: build_nodes(canonical)
        .join(mention_counts(linked), on="canonical_id", how="left")
        .fillna(0, subset=["mention_count"]),
    )
    edge_kw = {}
    if edge_salt is not None:
        edge_kw["salt"] = edge_salt
    if hot_threshold_rows is not None:
        edge_kw["hot_threshold_rows"] = hot_threshold_rows
    edges = runner.run("edges", lambda: build_edges(linked, **edge_kw))
    return {
        "triples": triples,
        "canonical": canonical,
        "linked": linked,
        "nodes": nodes,
        "edges": edges,
        "runner": runner,
    }
