"""Scale-vetting sweep (r4 VERDICT #3): run every registered query
against a (usually larger-SF) table dir and report wall time + rows,
flagging cliffs.  Correctness is NOT checked here — that is
check_oracles' job at sf0.001/0.01; this sweep exists to catch the
quadratic blowups that only appear a decade up (the r4 simhash-fusion
lesson: noise-pair rate x corpus^2 is the cliff).

Queries whose tables aren't present in the dir (the TPC-H star schema
at /tmp vetting scale) are skipped and counted, not silently dropped.

Usage: python scripts/vet_scale.py [sf_dir] [query ...]
       default sf_dir /tmp/sf1_vet (generate with scripts/gen_vet_data.py)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgforge.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_vet"
    only = set(sys.argv[2:])

    from kgforge.queries import ALL_QUERIES

    # vetting runs a decade above the tuned SF: size the (local-mode)
    # JVM for it, and gc between queries so each query's localCheckpoint
    # RDDs are context-cleaned instead of accumulating across the sweep
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("vet-scale", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    import gc

    results, skipped, failed = [], [], []
    names = [n for n in ALL_QUERIES if not only or n in only]
    for name in names:
        gc.collect()
        t0 = time.monotonic()
        try:
            n_rows = ALL_QUERIES[name](spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                skipped.append(name)
            else:
                failed.append((name, msg.splitlines()[0][:120]))
            continue
        dt = time.monotonic() - t0
        results.append((dt, name, n_rows))
        print(f"{dt:8.1f}s  {name:32s} {n_rows} rows", flush=True)

    results.sort(reverse=True)
    print(f"\n=== slowest (of {len(results)} run, "
          f"{len(skipped)} skipped for missing tables) ===")
    for dt, name, n_rows in results[:15]:
        print(f"{dt:8.1f}s  {name:32s} {n_rows} rows")
    if failed:
        print("\n=== FAILED ===")
        for name, msg in failed:
            print(f"  {name}: {msg}")
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
