"""Config-sweep driver — the xjobs.py analog (reference §3.3).

Grid-expands inference configs (score threshold x top-k — the analog of
the reference's threshold sweep {0.10..0.20} and count strategies), runs
the eval harness per combo, records results sorted on the main metric,
and applies the reference's skip-threshold regression gate
(xjobs.py:60: skip_value on test_f1).

Configs travel inside the model NAME ("repos@t=0.05,k=30",
kgforge/core/model.get_model), so every executor python worker rebuilds
the identical model — no driver-side state to ship.

Usage: python scripts/sweep.py [eval_docs.jsonl]
       (generates a fixture eval set if no path given)
"""

from __future__ import annotations

import itertools
import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SKIP_VALUE = 0.68  # reference regression gate, xjobs.py:60


def main():
    from kgforge.eval import evaluate
    from kgforge.session import get_spark

    if len(sys.argv) > 1:
        eval_path = sys.argv[1]
    else:
        from kgforge.fixtures import gen_eval_docs

        tmp = tempfile.mkdtemp()
        eval_path = f"{tmp}/eval_docs.jsonl"
        with open(eval_path, "w") as f:
            for d in gen_eval_docs(60):
                f.write(json.dumps(d) + "\n")

    spark = get_spark("kgforge-sweep", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    grid = list(itertools.product([0.02, 0.05, 0.2], [10, 30]))
    results = []
    for thresh, top_k in grid:
        m = evaluate(spark, eval_path, model_name=f"repos@t={thresh},k={top_k}")
        row = {
            "threshold": thresh, "top_k": top_k, **m,
            "skipped": m["test_f1"] < SKIP_VALUE,
        }
        results.append(row)
        print(json.dumps(row))

    results.sort(key=lambda r: -r["test_f1"])
    print(json.dumps({"best": results[0]}))
    spark.stop()


if __name__ == "__main__":
    main()
