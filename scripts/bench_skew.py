"""Skewed-corpus bench leg (r3 VERDICT #2): prove the salted edge
aggregation actually carries mega-repo skew, with straggler-task
evidence, not just unit tests.

Input: a synthesized linked-triples table (the exact shape build_edges
consumes in the pipeline) where ONE hub (src, dst, pred) key — the
"mega-repo" edge — holds ~30% of all rows, the rest spread over ~100k
cold keys.  Every row carries distinct (repo, path, unit_id) provenance,
so the hot key's reducer must merge a provenance set the size of the hub
share.

Legs (interleaved, best-of-N, one session local[32]):
  * salted_hot — build_edges(salt=16) default: SELECTIVE salting — a 1%
                 sample detects hot keys, only those are split; cold
                 keys keep single groups
  * salted_all — build_edges(salt=16, hot_threshold_rows=0): every key
                 salted (the r3 shape) — demonstrates the cold-key
                 group-blowup cost selective salting removes
  * unsalted   — build_edges(salt=1): the hot key lands on ONE reducer

Straggler evidence: per-leg max/median task duration of the heaviest
completed stage, read from the Spark UI REST API (the leg's new stages
only).  Writes BENCH/SKEW.md + prints one JSON line.

    python scripts/bench_skew.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
HUB_SHARE = 0.3
PASSES = 3


def make_input(spark, n_rows: int):
    """linked-triples shape: 30% of rows on one hub edge key, the rest on
    ~100k cold keys; provenance distinct per row."""
    from pyspark.sql import functions as F

    df = spark.range(n_rows).select(
        F.col("id"),
        (F.col("id") % 10 < int(HUB_SHARE * 10)).alias("hub"),
    )
    df = df.select(
        F.when(F.col("hub"), F.lit(1))
        .otherwise(1000 + F.col("id") % 50_000).alias("src"),
        F.when(F.col("hub"), F.lit(2))
        .otherwise(100_000 + (F.col("id") * 7) % 50_000).alias("dst"),
        F.when(F.col("hub"), F.lit("USED-FOR"))
        .otherwise(
            F.element_at(
                F.array(*[F.lit(p) for p in
                          ("USED-FOR", "FEATURE-OF", "HYPONYM-OF", "PART-OF",
                           "COMPARE", "CONJUNCTION", "EVALUATE-FOR")]),
                (F.col("id") % 7 + 1).cast("int"),
            )
        ).alias("pred"),
        F.when(F.col("hub"), F.lit("mega-repo"))
        .otherwise(F.concat(F.lit("repo_"), (F.col("id") % 500))).alias("repo"),
        F.concat(F.lit("src/f"), (F.col("id") % 1000), F.lit(".py")).alias("path"),
        F.col("id").alias("unit_id"),
    )
    return df.repartition(32).localCheckpoint(eager=True)


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.loads(r.read())


def stage_ids(spark) -> set[int]:
    app = _api(spark, "applications")[0]["id"]
    return {s["stageId"] for s in _api(spark, f"applications/{app}/stages")}


def straggler_stats(spark, before: set[int]) -> dict:
    """max/median task duration (ms) of the heaviest NEW completed stage."""
    app = _api(spark, "applications")[0]["id"]
    stages = _api(
        spark,
        f"applications/{app}/stages?status=COMPLETE&withSummaries=true"
        "&quantiles=0.0,0.5,1.0",
    )
    best = None
    for s in stages:
        if s["stageId"] in before:
            continue
        dist = s.get("taskMetricsDistributions")
        if not dist:
            continue
        lo, med, hi = dist["executorRunTime"]
        if best is None or hi > best["max_task_ms"]:
            best = {
                "stage_id": s["stageId"],
                "n_tasks": s["numCompleteTasks"],
                "med_task_ms": round(med, 1),
                "max_task_ms": round(hi, 1),
                "max_over_med": round(hi / max(med, 1e-9), 1),
            }
    return best or {}


def main() -> None:
    from kgforge.graph.materialize import build_edges
    from kgforge.session import get_spark

    spark = get_spark(
        "kgforge-skew-bench",
        master="local[32]",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    inp = make_input(spark, N_ROWS)
    n = inp.count()
    hub_n = inp.filter("src = 1 AND dst = 2").count()

    legs = {
        "salted_hot": dict(salt=16),
        "salted_all": dict(salt=16, hot_threshold_rows=0),
        "unsalted": dict(salt=1),
    }
    # untimed warmup leg (JIT/codegen/first-shuffle noise)
    build_edges(inp.limit(50_000), salt=2).write.mode("overwrite").parquet(
        "/tmp/kgforge_skew_warmup"
    )
    walls: dict[str, list[float]] = {k: [] for k in legs}
    best_wall: dict[str, float] = {}
    stragglers: dict[str, dict] = {}
    for p in range(PASSES):
        for name, kw in legs.items():
            before = stage_ids(spark)
            t0 = time.monotonic()
            build_edges(inp, **kw).write.mode("overwrite").parquet(
                f"/tmp/kgforge_skew_out_{name}"
            )
            wall = time.monotonic() - t0
            walls[name].append(round(wall, 2))
            st = straggler_stats(spark, before)
            # keep the straggler stats of the BEST pass per leg
            if name not in best_wall or wall < best_wall[name]:
                best_wall[name] = wall
                stragglers[name] = st
            print(f"pass {p} {name:9s} {wall:6.2f}s straggler={st}")

    # same output rows all three ways (the salt must not change semantics)
    outs = {
        k: spark.read.parquet(f"/tmp/kgforge_skew_out_{k}").localCheckpoint(
            eager=True
        )
        for k in legs
    }
    ref = outs["unsalted"]
    rows_equal = all(
        o.count() == ref.count()
        and o.exceptAll(ref).count() == 0
        and ref.exceptAll(o).count() == 0
        for o in outs.values()
    )

    best = {k: min(v) for k, v in walls.items()}
    result = {
        "metric": "skewed_edge_agg",
        "n_rows": n,
        "hub_rows": hub_n,
        "hub_share": round(hub_n / n, 3),
        "walls": walls,
        "best": best,
        "speedup_hot_vs_unsalted": round(best["unsalted"] / best["salted_hot"], 3),
        "speedup_hot_vs_all": round(best["salted_all"] / best["salted_hot"], 3),
        "stragglers": stragglers,
        "rows_equal": rows_equal,
    }
    print(json.dumps(result))

    rows_md = "\n".join(
        f"| {name} | {best[name]} | {walls[name]} "
        f"| {stragglers[name].get('max_task_ms')} "
        f"| {stragglers[name].get('med_task_ms')} "
        f"| {stragglers[name].get('max_over_med')} |"
        for name in legs
    )
    with open("BENCH/SKEW.md", "w") as f:
        f.write(f"""# Skewed-corpus bench — selective salting of the edge aggregation

Generated by `python scripts/bench_skew.py {N_ROWS}` (interleaved
best-of-{PASSES}, one session, local[32], untimed warmup first).

Input: {n:,} linked-triple rows; ONE hub edge key (the mega-repo edge)
holds {hub_n:,} rows ({result['hub_share']:.0%}); remaining rows spread
over ~100k cold keys; provenance distinct per row.

| leg | best wall (s) | walls | max task (ms) | median task (ms) | max/med |
|---|---|---|---|---|---|
{rows_md}

* hot-only salting vs unsalted: **{result['speedup_hot_vs_unsalted']}x**
* hot-only salting vs salt-everything: **{result['speedup_hot_vs_all']}x**
* outputs row-identical across legs: **{rows_equal}** (the salt changes
  the plan, never the result)

Reading: unsalted, the hub key's provenance set merges and sorts on ONE
reducer — its max/median task ratio IS the straggler, and it scales with
the mega-repo's row count (at 100 TB that one task processes the whole
hub).  Salting EVERY key (the r3 shape) removes the straggler but
multiplies the partial stage's group count by the salt for the ~100k cold
keys, costing more than the straggler saved.  Selective salting — a 1%
seeded sample finds keys above ~10k estimated rows, only those get split
— keeps the balanced part's single-group map-side combine AND bounds the
hot key's reducer to row_count/salt.  The min-k provenance slice happens
already at the partial stage, so the final merge per hot key touches only
salt x k structs.
""")
    print("wrote BENCH/SKEW.md")


if __name__ == "__main__":
    main()
