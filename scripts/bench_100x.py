"""Single-leg 100x headline run (r6 VERDICT #2): the whole bench.py
HEADLINE list executed IN ONE SESSION against the 100x fixture
(/tmp/sf10_vet, scripts/gen_vet_data.py scale=100 — 500k docs / 200k
embeddings / 10M events), plus the repos-corpus extraction leg at 100k
files.  The r6 per-family vetting (docs/SCALE.md) proved no per-query
cliffs; THIS run additionally proves no cross-query interference
(accumulated localCheckpoint blocks, executor memory pressure,
checkpoint-dir growth) and gives the 2x-bar a same-methodology 100x
anchor next to the sf0.1 table in BENCH/BASELINE.md.

TPC-H-star queries are skipped (the fixture has no lineitem et al.) and
COUNTED — never silently dropped.  Emits a markdown table to
BENCH/BASELINE_100x.md and one JSON line to stdout.

Usage:
    SPARK_GRAFT_EMB_PLANES=12 SPARK_GRAFT_NGRAM_DF_CAP=64 \
        nohup python scripts/bench_100x.py [sf_dir] \
        > /tmp/bench100x.log 2>&1 &

BOTH production knobs must be set at this scale — each default is a
measured 100x cliff (docs/SCALE.md):
  * SPARK_GRAFT_EMB_PLANES=12 (similarity.N_PLANES): at the default 4
    the sign-LSH bucket self-joins are the r6b/r6c DNF cliff;
  * SPARK_GRAFT_NGRAM_DF_CAP=64: at the default 1000 the inverted-index
    join is spill-bound (did not finish in 9.5 min at 100x — r6's
    one real cliff; cost = CAP x postings).
The knobs are read at import and baked into BOTH engines' plans, so
the measured form and the oracle-checked form stay the same code.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_vet"
    repos_files = int(os.environ.get("SPARK_GRAFT_100X_REPOS", "100000"))

    import bench as bench_mod
    from kgforge.queries import ALL_QUERIES
    from kgforge.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("bench-100x", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    skipped: list[str] = []
    t_suite = time.monotonic()
    for name in bench_mod.HEADLINE:
        gc.collect()
        t0 = time.monotonic()
        try:
            n = ALL_QUERIES[name](spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                skipped.append(name)
                print(f"# {name}: SKIP (table not in fixture)", flush=True)
                continue
            raise
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", flush=True)
    suite_wall = round(time.monotonic() - t_suite, 3)

    # repos extraction leg at 100k files — single pass (this is the
    # interference leg, not a best-of-N estimator; BASELINE.md carries
    # the best-of-3 sf-default numbers)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgforge.extract.pipeline import extract_pipeline
    from kgforge.fixtures import gen_repo_rows

    corpus_dir = f"/tmp/kgforge_bench_corpus_{repos_files}"
    if not os.path.exists(f"{corpus_dir}/_SUCCESS"):
        rows = gen_repo_rows(repos_files)
        os.makedirs(corpus_dir, exist_ok=True)
        shard = max(1, len(rows) // 32)
        for i in range(0, len(rows), shard):
            pq.write_table(
                pa.Table.from_pylist(rows[i : i + shard]),
                f"{corpus_dir}/part-{i // shard:04d}.parquet",
            )
        open(f"{corpus_dir}/_SUCCESS", "w").close()
    repos = (
        spark.read.parquet(corpus_dir)
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    t0 = time.monotonic()
    n_triples = extract_pipeline(repos, "fused").count()
    dt = time.monotonic() - t0
    tps = round(n_triples / dt, 1)
    timings["kg_pipeline_repos_100k"] = round(dt, 3)
    print(
        f"# kg_pipeline_repos: {n_triples} triples from {repos_files} files "
        f"in {dt:.1f}s ({tps} triples/s)",
        flush=True,
    )

    out = {
        "metric": "headline_suite_seconds_100x",
        "value": suite_wall,
        "unit": "sec",
        "queries": timings,
        "skipped_missing_tables": skipped,
        "sf_dir": sf_dir,
        "emb_planes": os.environ.get("SPARK_GRAFT_EMB_PLANES", "4"),
        "ngram_df_cap": os.environ.get("SPARK_GRAFT_NGRAM_DF_CAP", "1000"),
        "repos_files": repos_files,
        "triples_per_sec": tps,
    }

    md_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "BASELINE_100x.md",
    )
    with open(md_path, "w") as f:
        f.write(
            "# 100x single-leg headline run\n\n"
            "One session, whole HEADLINE list in bench.py order against\n"
            f"`{sf_dir}` (gen_vet_data scale=100), then the repos\n"
            f"extraction leg at {repos_files} files.  Complements the\n"
            "per-family vetting in docs/SCALE.md: same queries, but run\n"
            "back-to-back to expose cross-query interference.  Single\n"
            "pass per query (NOT best-of-N — compare shapes, not\n"
            "milliseconds; this host's session noise is documented in\n"
            "BENCH/BASELINE.md).\n\n"
            f"- suite wall (headline, excl. repos leg): **{suite_wall}s**\n"
            f"- repos leg: **{tps} triples/s** over {repos_files} files\n"
            f"- SPARK_GRAFT_EMB_PLANES={out['emb_planes']}, "
            f"SPARK_GRAFT_NGRAM_DF_CAP={out['ngram_df_cap']} (production\n"
            "  knob settings at this scale — each default is a measured\n"
            "  100x cliff, docs/SCALE.md; oracle agreement under the\n"
            "  overrides re-verified at sf0.001 — see docs/ROUND7.md)\n"
            f"- skipped (fixture has no TPC-H star): {', '.join(skipped)}\n\n"
            "| query | wall (s) |\n|---|---|\n"
        )
        for name, t in timings.items():
            f.write(f"| {name} | {t} |\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
