"""Measure sketch error vs exact (r5 VERDICT #5 + the r7 quantile
twin).  Two studies into BENCH/APPROX.md:

1. approx_count_distinct (HLL++) vs exact on the retention-cohort
   cells: max/mean relative error per rsd (what the EXTRA query
   q_retention_cohorts_approx asserts per cell).
2. percentile_approx (Greenwald-Khanna) vs the exact rank values per
   (event_type, percentile): measured RANK error of the returned
   element vs the analytic bound n/accuracy (what the EXTRA query
   q_event_quantiles_approx asserts per group).

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

    # ---- GK quantile rank error (r7) ----------------------------------
    from pyspark.sql import Window

    ev = e.filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n", F.count("*").over(Window.partitionBy("event_type"))
        )
        .localCheckpoint(eager=True)
    )
    qlines = [
        "## percentile_approx (Greenwald-Khanna) rank error vs exact "
        "(events.value per event_type)",
        "",
        "The GK contract is a RANK guarantee — the returned element's "
        "rank is within n/accuracy of ceil(p*n) — so the honest error "
        "metric is rank displacement, not value distance.  The EXTRA "
        "query `q_event_quantiles_approx` asserts the equivalent "
        "value-domain bracket per group; `SPARK_GRAFT_QUANTILE_ACCURACY` "
        "(default 100) is the knob, baked into both the plan and the "
        "bound.  The bracket column is what the query actually allows — "
        "ceil(n/acc)+1: the continuous eps*n guarantee plus the discrete "
        "rounding slack of anchoring the target at ceil(p*n) while the "
        "bracket ends take floor((p-eps)n)/ceil((p+eps)n), and the "
        "measured rank here is the FIRST-occurrence rank under ties "
        "(conservative).  At 100 TB the exact leg is the measurement "
        "tool (full per-group sort); GK state is O(accuracy*log n) per "
        "group and merges map-side.",
        "",
        "| accuracy | groups | max rank err | bracket (max ceil(n/acc)+1) | "
        "max rel rank err | wall (s) |",
        "|---|---|---|---|---|---|",
    ]
    for acc in (50, 100, 1000):
        t0 = time.monotonic()
        ap = ev.groupBy("event_type").agg(
            F.percentile_approx("value", [0.50, 0.90, 0.99], acc).alias("ap")
        )
        # rank of each returned element = rn of the first value >= it
        hits = (
            ranked.join(ap, on="event_type")
            .select(
                "event_type", "rn", "n",
                *[
                    (F.col("value") >= F.element_at("ap", i + 1)).alias(f"ge{i}")
                    for i in range(3)
                ],
            )
            .groupBy("event_type")
            .agg(
                F.max("n").alias("n"),
                *[
                    F.min(F.when(F.col(f"ge{i}"), F.col("rn"))).alias(f"r{i}")
                    for i in range(3)
                ],
            )
        )
        err = hits.select(
            "event_type", "n",
            *[
                F.abs(
                    F.col(f"r{i}")
                    - F.ceil(F.lit(p) * F.col("n")).cast("bigint")
                ).alias(f"e{i}")
                for i, p in enumerate((0.50, 0.90, 0.99))
            ],
        ).select(
            F.count("*").alias("groups"),
            F.greatest(F.max("e0"), F.max("e1"), F.max("e2")).alias("max_err"),
            F.max(F.ceil(F.col("n") / acc).cast("bigint") + 1).alias("bound"),
            F.round(
                F.greatest(
                    F.max(F.col("e0") / F.col("n")),
                    F.max(F.col("e1") / F.col("n")),
                    F.max(F.col("e2") / F.col("n")),
                ),
                6,
            ).alias("max_rel"),
        ).collect()[0]
        qlines.append(
            f"| {acc} | {err.groups} | {err.max_err} | {err.bound} "
            f"| {err.max_rel} | {time.monotonic() - t0:.1f} |"
        )
    qlines.append("")
    lines.extend(qlines)
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
