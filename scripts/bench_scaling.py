"""Two-parallelism scaling run (north rule: N vs 4N executors, sandboxed
as local[8] vs local[32] on the same input) -> BENCH/BASELINE.md.

Efficiency = (throughput@32 / throughput@8) / 4.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(cores: int, repos_files: int) -> dict:
    out = subprocess.run(
        [
            sys.executable, "bench.py", "--cores", str(cores),
            "--repos-files", str(repos_files),
        ],
        cwd=REPO, capture_output=True, text=True, timeout=3600, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    repos_files = int(sys.argv[1]) if len(sys.argv) > 1 else 16000
    r8 = run(8, repos_files)
    r32 = run(32, repos_files)
    thr8 = r8["triples_per_sec"]
    thr32 = r32["triples_per_sec"]
    eff = (thr32 / thr8) / 4.0
    # suite-level wall-clock speedup as a secondary signal
    suite_speedup = r8["value"] / r32["value"]

    md = f"""# BENCH — measured numbers (this repo)

KG extraction pipeline (fused cascade) over the synthetic repos corpus
({repos_files} files, deterministic seed), same input at two parallelism
levels (the sandbox stand-in for N vs 4N executors — driver instruction):

| cores | triples/sec | headline suite (s) |
|---|---|---|
| local[8]  | {thr8} | {r8['value']} |
| local[32] | {thr32} | {r32['value']} |

**Scaling efficiency (throughput@32 / throughput@8) / 4 = {eff:.3f}**
(target >= 0.8; suite-level wall speedup {suite_speedup:.2f}x).

Per-query timings at local[32], sf={r32['sf']}:

| query | seconds |
|---|---|
""" + "\n".join(
        f"| {k} | {v} |" for k, v in sorted(r32["queries"].items())
    ) + "\n"

    out_dir = REPO / "BENCH"
    out_dir.mkdir(exist_ok=True)
    (out_dir / "BASELINE.md").write_text(md)
    print(json.dumps({"efficiency": round(eff, 3), "thr8": thr8, "thr32": thr32}))


if __name__ == "__main__":
    main()
