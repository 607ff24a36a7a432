"""Extra measurement harness for the optimization round (guide §1).

NOT the driver contract — bench.py stays frozen.  This tool:
  * times individual registered queries, either with the bench's
    ``.count()`` methodology (comparable to BENCH_r*.json) or with the
    noop sink (guide §1.4: computes every column, isolates computation
    from the count-only column pruning);
  * captures ``.explain("formatted")`` per query into plans/<tag>/;
  * labels jobs so any future UI/eventlog read maps back to queries.

Usage:
  python bench_extra.py q1 q2 ...            # count-timing, best-of-3
  python bench_extra.py --mode noop q ...
  python bench_extra.py --explain-dir plans/r08 --suffix _before q ...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--mode", choices=["count", "noop"], default="count")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    from kgforge.queries import ALL_QUERIES
    from kgforge.session import get_spark

    spark = get_spark("kgforge-bench-extra", master=f"local[{args.cores}]",
                      shuffle_partitions=max(int(args.cores), 8))
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()

    results: dict[str, dict] = {}
    for name in args.queries:
        fn = ALL_QUERIES[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        for _ in range(args.passes):
            t0 = time.monotonic()
            df = fn(spark, args.sf_dir)
            if args.mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"min": min(samples), "samples": samples}
        print(f"# {name}: min {min(samples)}s  {samples}")
    print(json.dumps({"mode": args.mode, "sf_dir": args.sf_dir, "results": results}))


if __name__ == "__main__":
    main()
