"""Measure approx_count_distinct (HLL++) error vs exact on the
retention-cohort cells (r5 VERDICT #5).  One aggregate computes both
legs per (cohort_day, day_offset) cell at sf0.1; reports max/mean
relative error per rsd and the bound the EXTRA query
q_retention_cohorts_approx asserts.  Writes BENCH/APPROX.md.

Usage: python scripts/bench_approx.py  [env SPARK_GRAFT_SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RSDS = [0.05, 0.02, 0.01]


def main() -> None:
    from pyspark.sql import functions as F

    from kgforge.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-approx", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    f = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    j = (
        e.join(f, on="user_id")
        .withColumn(
            "day_offset",
            F.datediff(F.to_date("ts"), F.col("d0")).cast("bigint"),
        )
        .filter(F.col("day_offset") <= 7)
        .localCheckpoint(eager=True)
    )

    rows = []
    for rsd in RSDS:
        t0 = time.monotonic()
        g = j.groupBy(
            F.col("d0").cast("string").alias("cohort_day"), "day_offset"
        ).agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=rsd).alias("approx"),
        )
        s = g.select(
            F.count("*").alias("cells"),
            F.max(
                F.abs(F.col("approx") - F.col("exact")) / F.col("exact")
            ).alias("max_rel"),
            F.avg(
                F.abs(F.col("approx") - F.col("exact")) / F.col("exact")
            ).alias("mean_rel"),
            F.min("exact").alias("min_exact"),
            F.max("exact").alias("max_exact"),
        ).collect()[0]
        rows.append((rsd, s, time.monotonic() - t0))

    lines = [
        "# approx_count_distinct error vs exact (retention cells, "
        f"`{sf_dir}`, measured r6)",
        "",
        "HLL++ is hash-deterministic: these errors are properties of "
        "the dataset, not samples.  The EXTRA query "
        "`q_retention_cohorts_approx` (rsd=0.02) asserts per-cell "
        "|approx-exact| <= 10% of exact in its oracle row; the driver "
        "keeps the exact form (q_retention_cohorts) as its oracle.  At "
        "100 TB the exact COUNT(DISTINCT) expands every (cell, user) "
        "pair through the shuffle; the sketch is fixed-size per cell "
        "and merges map-side.",
        "",
        "| rsd | cells | max rel err | mean rel err | exact range | wall (s) |",
        "|---|---|---|---|---|---|",
    ]
    for rsd, s, w in rows:
        lines.append(
            f"| {rsd} | {s.cells} | {s.max_rel:.4f} | {s.mean_rel:.4f} "
            f"| {s.min_exact}-{s.max_exact} | {w:.1f} |"
        )
    lines.append("")
    md = "\n".join(lines)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "APPROX.md",
    )
    with open(out, "w") as f2:
        f2.write(md)
    print(md)
    spark.stop()


if __name__ == "__main__":
    main()
