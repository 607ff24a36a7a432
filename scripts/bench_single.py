"""Focused paired A/B for ONE query (r4 VERDICT #4: settle kg_mentions).

Same methodology as bench_ab.py — alternating base/head subprocess legs,
one JVM at a time, per-leg best-of-3 inside the JVM, cross-leg min — but
measuring a single query, so passes are cheap enough for best-of-many.

Usage: python scripts/bench_single.py <query> [passes] [base_commit]
Writes BENCH/single_<query>.json.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WORKTREE = REPO / ".ab_worktree" / "base"

LEG = r"""
import os, sys, time
from kgforge.session import get_spark
from kgforge.queries import ALL_QUERIES
spark = get_spark("bench-single", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
q = ALL_QUERIES[sys.argv[1]]
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# SPARK_GRAFT_BENCH_COLD=1: one cold pass per JVM (for legs too long to
# triple, e.g. the 100x vet fixture); default: warm + best-of-3
if os.environ.get("SPARK_GRAFT_BENCH_COLD") == "1":
    t0 = time.monotonic(); q(spark, sf).count()
    best = time.monotonic() - t0
else:
    q(spark, sf).count()  # warm (scan cache, codegen)
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic(); q(spark, sf).count()
        best = min(best, time.monotonic() - t0)
print(f"BEST {best:.4f}")
"""


def run_leg(cwd: Path, query: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", LEG, query], cwd=cwd,
        capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("BEST")][-1]
    return float(line.split()[1])


def main() -> None:
    query = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    base_commit = sys.argv[3] if len(sys.argv) > 3 else "d9dc731"
    if not (WORKTREE / "bench.py").exists():
        WORKTREE.parent.mkdir(exist_ok=True)
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(WORKTREE), base_commit],
            cwd=REPO, check=True,
        )
    base_times, head_times = [], []
    for p in range(passes):
        base_times.append(run_leg(WORKTREE, query))
        head_times.append(run_leg(REPO, query))
        print(f"pass {p + 1}/{passes}: base={base_times[-1]:.3f} "
              f"head={head_times[-1]:.3f}", flush=True)
    rec = {
        "query": query,
        "passes": passes,
        "base_commit": base_commit,
        "base_best": min(base_times),
        "head_best": min(head_times),
        "base_median": statistics.median(base_times),
        "head_median": statistics.median(head_times),
        "ratio_best": round(min(head_times) / min(base_times), 3),
        "ratio_median": round(
            statistics.median(head_times) / statistics.median(base_times), 3
        ),
        "base_times": [round(t, 4) for t in base_times],
        "head_times": [round(t, 4) for t in head_times],
    }
    out = REPO / "BENCH" / f"single_{query}.json"
    out.write_text(json.dumps(rec, indent=1))
    print(json.dumps({k: rec[k] for k in
                      ("ratio_best", "ratio_median", "base_best", "head_best")}))


if __name__ == "__main__":
    main()
