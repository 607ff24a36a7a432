"""Paired A/B benchmark: round-2 final code vs the working tree, run
ALTERNATED in one wall-clock session (r2 VERDICT #5: single-shot suite
numbers cannot prove round-over-round deltas on this time-shared host —
its wall swings 17-60s across identical runs, dwarfing real changes).

Methodology (same reasoning as scripts/bench_scaling.py):
  * The r2 code is checked out into a git worktree (.ab_worktree/r2,
    gitignored); each side runs `python bench.py --skip-repos` in its own
    subprocess/JVM so both sides execute EXACTLY their own code.
  * Legs alternate A,B,A,B,... so slow host phases hit both sides
    equally; per-query best-of-N (min) is the noise-robust estimator.
  * One Spark JVM alive at a time (sequential legs) — concurrent JVMs
    time-share cores and poison every number.

Writes BENCH/ab_r2_r3.json (machine-readable; bench.py attaches it to
its one-line JSON as `paired_vs_r2`) and BENCH/AB_r2_r3.md (the table).

Usage: python scripts/bench_ab.py [passes] [r2_commit]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
R2_COMMIT = "4f25682"
WORKTREE = REPO / ".ab_worktree" / "r2"


def ensure_worktree(commit: str) -> Path:
    if not (WORKTREE / "bench.py").exists():
        WORKTREE.parent.mkdir(exist_ok=True)
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(WORKTREE), commit],
            cwd=REPO, check=True,
        )
    return WORKTREE


def run_leg(cwd: Path, sf_dir: str, cores: str) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py", "--skip-repos",
         "--sf-dir", sf_dir, "--cores", cores],
        cwd=cwd, check=True, capture_output=True, text=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    commit = sys.argv[2] if len(sys.argv) > 2 else R2_COMMIT
    sf_dir = "/root/testdata/sf0.1"
    cores = "32"
    wt = ensure_worktree(commit)
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    legs: dict[str, list[dict]] = {"r2": [], "head": []}
    for p in range(passes):
        for side, cwd in (("r2", wt), ("head", REPO)):
            t0 = time.time()
            res = run_leg(cwd, sf_dir, cores)
            legs[side].append(res)
            print(
                f"pass {p + 1}/{passes} {side}: suite={res['value']}s "
                f"(leg wall {time.time() - t0:.0f}s)", file=sys.stderr,
            )

    def best(side: str) -> dict[str, float]:
        names = legs[side][0]["queries"].keys()
        return {
            n: min(leg["queries"][n] for leg in legs[side] if n in leg["queries"])
            for n in names
        }

    b2, bh = best("r2"), best("head")
    common = [n for n in b2 if n in bh]
    summary = {
        "method": f"interleaved best-of-{passes}, alternating subprocess legs,"
                  " one JVM at a time, sf0.1 local[32], --skip-repos",
        "r2_commit": commit,
        "head_commit": head,
        "suite_best_r2": round(min(l["value"] for l in legs["r2"]), 3),
        "suite_best_head": round(min(l["value"] for l in legs["head"]), 3),
        "queries": {
            n: {
                "r2": b2[n], "head": bh[n],
                "ratio": round(bh[n] / b2[n], 3) if b2[n] else None,
            }
            for n in common
        },
    }
    summary["suite_ratio"] = round(
        summary["suite_best_head"] / summary["suite_best_r2"], 3
    )
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "ab_r2_r3.json").write_text(json.dumps(summary, indent=2))

    lines = [
        "# Paired r2 vs r3 benchmark (same-session, interleaved)",
        "",
        f"- method: {summary['method']}",
        f"- r2 = `{commit}`, head = `{head}`",
        f"- headline suite best-of-{passes}: r2 {summary['suite_best_r2']}s, "
        f"head {summary['suite_best_head']}s, ratio "
        f"**{summary['suite_ratio']}** (head/r2; <1 = faster)",
        "",
        "| query | r2 best (s) | head best (s) | ratio |",
        "|---|---|---|---|",
    ]
    for n in common:
        q = summary["queries"][n]
        lines.append(f"| {n} | {q['r2']} | {q['head']} | {q['ratio']} |")
    (REPO / "BENCH" / "AB_r2_r3.md").write_text("\n".join(lines) + "\n")
    # leave no checkout behind: the worktree doubles the repo's on-disk
    # source tree (and any filesystem LoC count) if it lingers
    subprocess.run(
        ["git", "worktree", "remove", "--force", str(WORKTREE)],
        cwd=REPO, check=False,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
