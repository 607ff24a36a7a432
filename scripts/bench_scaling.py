"""Two-parallelism scaling evidence (north rule: N vs 4N executors,
sandboxed per driver instruction as two parallelism levels on the same
input) -> BENCH/BASELINE.md.

Methodology (docs/PLANS.md has the investigation):
  * ONE Spark session (local[32]); the parallelism of each measured run is
    set by the partition count of its pre-staged input — a 2-partition job
    occupies exactly 2 task slots / 2 cores, an 8-partition job 8, etc.
    This removes cross-session drift (this VM jitters 20-40% BETWEEN
    sessions), because all levels are measured interleaved in one process.
  * 3 interleaved passes per level, best wall per level (min is the
    standard noise-robust estimator).
  * Levels 2 -> 8 is the primary N -> 4N pair: on a real cluster each
    executor owns its cores; 2 and 8 busy cores of 32 both run
    unsaturated, exactly like 2 vs 8 separate executors.  The saturated
    8 -> 32 pair is reported too (it understates intrinsic scaling: at 32
    busy cores the JVM's shuffle/serde/GC threads time-share the measured
    cores — bare multiprocessing of the same kernel does 0.90 there).

Usage: python scripts/bench_scaling.py [n_files]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LEVELS = [2, 8, 32]
PASSES = 4


def stage_corpus(n_files: int) -> str:
    """Rich-file corpus (8-40 sentences/file, like real source files):
    more python compute per Arrow row keeps the measurement
    compute-dominated rather than serde-dominated."""
    corpus = f"/tmp/kgforge_bench_corpus_rich_{n_files}"
    if not os.path.exists(f"{corpus}/_SUCCESS"):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from kgforge.fixtures import gen_repo_rows

        rows = gen_repo_rows(n_files, min_sents=8, max_sents=40)
        os.makedirs(corpus, exist_ok=True)
        shard = max(1, len(rows) // 32)
        for i in range(0, len(rows), shard):
            pq.write_table(
                pa.Table.from_pylist(rows[i : i + shard]),
                f"{corpus}/part-{i // shard:04d}.parquet",
            )
        open(f"{corpus}/_SUCCESS", "w").close()
    return corpus


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    sys.path.insert(0, str(REPO))
    from kgforge.extract.pipeline import extract_pipeline
    from kgforge.session import get_spark

    corpus = stage_corpus(n_files)
    spark = get_spark("kgforge-scaling", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    plans, n_triples = {}, 0
    for lvl in LEVELS:
        staged = (
            spark.read.parquet(corpus).repartition(lvl).localCheckpoint(eager=True)
        )
        plans[lvl] = extract_pipeline(staged, "fused")
    n_triples = plans[LEVELS[0]].count()  # also warms every python worker

    best: dict[int, float] = {lvl: float("inf") for lvl in LEVELS}
    for p in range(PASSES):
        for lvl in LEVELS:
            t0 = time.monotonic()
            assert plans[lvl].count() == n_triples
            dt = time.monotonic() - t0
            best[lvl] = min(best[lvl], dt)
            print(f"# pass {p} level {lvl}: {dt:.1f}s (best {best[lvl]:.1f})",
                  file=sys.stderr)
    spark.stop()

    thr = {lvl: round(n_triples / best[lvl], 1) for lvl in LEVELS}
    eff_2_8 = (thr[8] / thr[2]) / 4.0
    eff_8_32 = (thr[32] / thr[8]) / 4.0

    # one full headline bench at 32 cores for the per-query table
    out = subprocess.run(
        [sys.executable, "bench.py", "--cores", "32", "--repos-files", str(n_files)],
        cwd=REPO, capture_output=True, text=True, timeout=3600, check=True,
    )
    r32 = json.loads(out.stdout.strip().splitlines()[-1])

    md = f"""# BENCH — measured numbers (this repo)

KG extraction pipeline (fused cascade: scan -> units -> tag -> pair ->
classify -> dedup) over the synthetic repos corpus ({n_files} files,
{n_triples} triples, deterministic seed).  All parallelism levels measured
in ONE session with interleaved passes (best of {PASSES}); a level's
parallelism = its input partition count, so an N-partition run occupies
exactly N cores — the sandbox stand-in for N executors (driver
instruction; no real cluster available).

| parallelism (cores busy) | wall (s) | triples/sec |
|---|---|---|
| 2  | {best[2]:.1f} | {thr[2]} |
| 8  | {best[8]:.1f} | {thr[8]} |
| 32 | {best[32]:.1f} | {thr[32]} |

**Scaling efficiency (N -> 4N, target >= 0.8):**

| pair | efficiency | note |
|---|---|---|
| 2 -> 8 | **{eff_2_8:.3f}** | primary: both levels unsaturated — models separate executors that own their cores |
| 8 -> 32 | {eff_8_32:.3f} | saturated host: JVM shuffle/serde/GC threads time-share the 32 measured cores; bare multiprocessing of the same python kernel scales at ~0.90 on this pair (docs/PLANS.md) |

`local-cluster[N,4,2304]` with code shipped via
``addPyFile(dist/kgforge.zip)`` (the spark-submit --py-files path) also
runs end-to-end; it hits the same single-host saturation at N=8.

Per-query timings at local[32], sf={r32["sf"]}:

| query | seconds |
|---|---|
""" + "\n".join(f"| {k} | {v} |" for k, v in sorted(r32["queries"].items())) + "\n"

    (REPO / "BENCH").mkdir(exist_ok=True)
    # Preserve hand-curated sections: everything from the first "## "
    # heading onward survives regeneration (the generated part is only
    # the header + scaling tables above it).
    target = REPO / "BENCH" / "BASELINE.md"
    if target.exists():
        prev = target.read_text()
        cut = prev.find("\n## ")
        if cut != -1:
            md = md + prev[cut:]
    target.write_text(md)
    print(json.dumps({
        "efficiency_2_8": round(eff_2_8, 3),
        "efficiency_8_32": round(eff_8_32, 3),
        "thr": {str(k): v for k, v in thr.items()},
    }))


if __name__ == "__main__":
    main()
