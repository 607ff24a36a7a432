"""Cluster job entry point — the spark-submit deliverable (north rule).

    ./scripts/make_pyfiles.sh
    spark-submit --py-files dist/kgforge.zip jobs/kg_job.py \
        --input  /path/to/repos_table \
        --workdir /path/to/checkpoints \
        --output /path/to/kg_out \
        [--strategy fused] [--model repos] [--run-id r1]

Reads the repos table (parquet; Iceberg catalogs plug in via
``--input table:<name>`` when the runtime ships the Iceberg jar), runs
the full checkpointed pipeline, writes triples/nodes/edges with repaired
partitioning, and prints a one-line JSON job summary.

On a real cluster nothing changes except ``--master``/executor conf —
the plan is identical to local mode (kgforge/session.py).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--strategy", default="fused")
    ap.add_argument("--model", default="repos")
    ap.add_argument("--run-id", default="run0")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from kgforge.graph.materialize import write_repaired
    from kgforge.lineage import run_kg_pipeline

    # spark-submit owns master/conf; just get-or-create
    spark = SparkSession.builder.appName("kgforge-kg-job").getOrCreate()

    if args.input.startswith("table:"):
        repos = spark.read.table(args.input.split(":", 1)[1])
    else:
        repos = spark.read.parquet(args.input)

    t0 = time.monotonic()
    out = run_kg_pipeline(
        spark, repos, args.workdir, run_id=args.run_id,
        strategy=args.strategy, model_name=args.model,
    )
    write_repaired(out["triples"], f"{args.output}/triples", ["repo", "path"])
    write_repaired(out["nodes"], f"{args.output}/nodes", ["canonical_id"])
    write_repaired(out["edges"], f"{args.output}/edges", ["src", "pred"])

    summary = {
        "run_id": args.run_id,
        "triples": out["triples"].count(),
        "nodes": out["nodes"].count(),
        "edges": out["edges"].count(),
        "wall_sec": round(time.monotonic() - t0, 1),
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
